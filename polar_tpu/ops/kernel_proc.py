"""Per-stage kernel-input LLR processors (device-side, batched).

TPU-native replacement for the reference's per-kernel C++ processors
(SURVEY.md C4/C5: direct f/g for the 2x2 Arikan kernel, trellis processing
for the 16x16 eBCH kernel; mount empty, §0). The design is uniform:

1. Prior decisions u_0..u_{i-1} are absorbed as a *coset sign flip* of the
   output LLRs: lam' = lam * (1 - 2 * coset) with
   coset = (masked prior u) @ K mod 2.
2. The input-i LLR is then the min-sum (max-log) marginal over the free
   tail bits: with T_i = +-1 table of all tail codewords span(rows i+1..)
   and s_i = (1 - 2 * row_i),
       llr_i = (max(lam' @ T_i) - max((lam' * s_i) @ T_i)) / 2.

This is mathematically identical to the reference's trellis min-sum pass
(both compute the exact max-log marginal) but maps to the MXU as a batched
matmul + max-reduce instead of a sequential Viterbi recursion. For the
2x2 kernel the formula collapses to the classic closed forms
    i=0: f(a,b) = sign(a)sign(b) min(|a|,|b|),   i=1: a' + b,
which we special-case. A Viterbi min-plus trellis backend (cheaper for
small i on large kernels, where the tail table is huge but the minimal
trellis has few states) lives in polar_tpu.kernels.trellis.

Array layout: batch LAST (lanes), i.e. lam views are [P, l, n, B] with
P = list paths, l = kernel size, n = positions, B = codewords.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.kernels.arikan import f_exact, f_minsum

_CHUNK = 512  # max tail-table columns materialized at once


def tree_corr(lam_adj: jnp.ndarray, t) -> jnp.ndarray:
    """Correlations of lam_adj [..., l, n, B] against table columns
    t [l, C] -> [..., C, n, B], summed over l as a FIXED pairwise tree
    ((0+1)+(2+3))+... — not einsum/dot, whose float reduction order is
    backend-defined. The Pallas mega-kernel (ops/pallas_scl.py) evaluates
    the same expression tree, so XLA and Mosaic produce bit-identical
    correlations (the repo's cross-backend bit-match tests rely on it)."""
    t = jnp.asarray(t, dtype=lam_adj.dtype)
    l = t.shape[0]
    pre = (1,) * (lam_adj.ndim - 3)
    terms = [lam_adj[..., j, None, :, :] * t[j].reshape(pre + (-1, 1, 1))
             for j in range(l)]
    while len(terms) > 1:
        nxt = [terms[k] + terms[k + 1] for k in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _tail_table(kernel: np.ndarray, i: int) -> np.ndarray:
    """All codewords of span(rows i+1..l-1) as a +-1 matrix [l, 2^(l-1-i)]."""
    l = kernel.shape[0]
    n_free = l - 1 - i
    msgs = ((np.arange(1 << n_free)[:, None] >> np.arange(n_free)[None, :]) & 1)
    x = (msgs.astype(np.int64) @ kernel[i + 1:].astype(np.int64)) % 2
    return (1.0 - 2.0 * x.T).astype(np.float32)  # [l, C]


class StageProcessor:
    """LLR processor for one kernel stage. Host-built, device-applied.

    f_mode (bit-match knob, SURVEY.md §2.3 item 5): "minsum" computes
    max-log (min-sum) input marginals — f/g closed forms for the 2x2
    kernel, trellis/max-correlation for large kernels. "exact" computes
    true sum-product marginals: boxplus for the 2x2 kernel, logsumexp
    over the full coset tables for large kernels (tables for every i;
    correctness/bit-match path, not a throughput path).

    pallas_big: run the l>2 trellis/table input LLRs as standalone
    Pallas kernels with VMEM-resident state (ops/pallas_stage.py) —
    bit-identical, far less HBM traffic; requires batch % 128 == 0 on a
    real TPU (pallas_interpret=True for CPU tests).
    """

    def __init__(self, kernel: np.ndarray, f_mode: str = "minsum",
                 pallas_big: bool = False, pallas_interpret: bool = False):
        # All static tables stay host-side numpy: jnp closure constants that
        # live on a remote-tunnelled TPU device cost a blocking device fetch
        # *per constant* at MLIR lowering time; numpy constants embed free.
        if f_mode not in ("minsum", "exact"):
            raise ValueError(f"unknown f_mode {f_mode!r}")
        self.kernel = np.asarray(kernel, dtype=np.uint8)
        self.l = int(kernel.shape[0])
        self.f_mode = f_mode
        self.pallas_big = pallas_big and self.l > 2 and f_mode == "minsum"
        self.pallas_interpret = pallas_interpret
        self.k_f32 = self.kernel.astype(np.float32)
        self.row_signs = 1.0 - 2.0 * self.kernel.astype(np.float32)
        if self.l > 2 and f_mode == "exact":
            # exact marginals need the full coset enumeration: table
            # backend for every input (the min-plus trellis computes the
            # max-log semiring only)
            self.backend = ["table"] * self.l
            self.tables = [_tail_table(self.kernel, i) for i in range(self.l)]
        elif self.l > 2:
            from polar_tpu.kernels.trellis import (tail_syndrome_cols,
                                                   tail_trellis)

            kb = self.kernel.tobytes()
            self.trellises = [tail_trellis(kb, self.l, i)
                              for i in range(self.l)]
            # per-input backend: the tail-coset table costs O(2^(l-1-i))
            # columns, the minimal trellis O(l * S_i^2) min-adds; pick the
            # cheaper (SURVEY.md C5 — trellis where the reference must use
            # one, dense MXU enumeration where the coset is small).
            self.backend = [
                "trellis" if self.trellises[i].s_max ** 2 < (1 << (self.l - 1 - i))
                else "table"
                for i in range(self.l)]
            self.tables = [None if self.backend[i] == "trellis"
                           else _tail_table(self.kernel, i)
                           for i in range(self.l)]
            # trellis-backend inputs run as a *syndrome* trellis: identical
            # reachable-state partition, so float-identical costs to the
            # minimal-trellis pass (kernels/trellis.syndrome_min_cost;
            # relied on by the Pallas-vs-XLA bitwise tests), but O(S) work
            # per section instead of the O(S^2) dense min-plus product —
            # profiled 42% of the mixed_scl32 decode before the switch.
            self.syn = [tail_syndrome_cols(kb, self.l, i)
                        if self.backend[i] == "trellis" else None
                        for i in range(self.l)]

    # ---- coset handling -------------------------------------------------

    def coset_signs(self, dec_g: jnp.ndarray, i) -> jnp.ndarray:
        """Sign flips from prior decisions.

        dec_g: [l, P, n, B] gathered prior child decisions (rows >= i are
        ignored via mask). i may be traced. Returns [P, l, n, B] of +-1.
        """
        mask = (jnp.arange(self.l) < i).astype(jnp.float32)  # [l]
        d = dec_g.astype(jnp.float32) * mask[:, None, None, None]
        coset = jnp.einsum("jPnB,jk->PknB", d, jnp.asarray(self.k_f32)) % 2.0
        return (1.0 - 2.0 * coset)

    # ---- per-input LLR --------------------------------------------------

    def _maxcorr(self, lam_adj: jnp.ndarray, i: int) -> jnp.ndarray:
        """max over tail codewords of correlation; lam_adj [.., l, n, B]."""
        t = jnp.asarray(self.tables[i], dtype=lam_adj.dtype)  # [l, C]
        c = t.shape[1]
        # contraction output is [..., C, n, B] — tail-codeword axis C
        # leads so the batch keeps the lane dimension (C < 128 in lanes
        # would starve the VPU)
        if c <= _CHUNK:
            corr = tree_corr(lam_adj, t)
            return jnp.max(corr, axis=-3)
        n_chunks = (c + _CHUNK - 1) // _CHUNK
        pad = n_chunks * _CHUNK - c
        # pad table with zero columns; mask them to -inf after the matmul
        tp = jnp.pad(t, ((0, 0), (0, pad)))
        chunks = tp.reshape(self.l, n_chunks, _CHUNK).transpose(1, 0, 2)
        valid = (jnp.arange(n_chunks * _CHUNK).reshape(n_chunks, _CHUNK) < c)

        def body(carry, xs):
            tc, vc = xs
            corr = tree_corr(lam_adj, tc)
            corr = jnp.where(vc[:, None, None], corr, -jnp.inf)
            return jnp.maximum(carry, jnp.max(corr, axis=-3)), None

        init = jnp.full(lam_adj.shape[:-3] + lam_adj.shape[-2:], -jnp.inf,
                        dtype=lam_adj.dtype)
        out, _ = jax.lax.scan(body, init, (chunks, valid))
        return out

    def _lsecorr(self, lam_adj: jnp.ndarray, i: int) -> jnp.ndarray:
        """logsumexp over tail codewords of correlation/2 (exact marginal
        counterpart of _maxcorr); lam_adj [.., l, n, B]."""
        t = jnp.asarray(self.tables[i], dtype=jnp.float32)   # [l, C]
        c = t.shape[1]
        la = lam_adj.astype(jnp.float32)
        if c <= _CHUNK:
            corr = jnp.einsum("...lnB,lc->...cnB", la, t)
            return jax.nn.logsumexp(0.5 * corr, axis=-3)
        n_chunks = (c + _CHUNK - 1) // _CHUNK
        pad = n_chunks * _CHUNK - c
        tp = jnp.pad(t, ((0, 0), (0, pad)))
        chunks = tp.reshape(self.l, n_chunks, _CHUNK).transpose(1, 0, 2)
        valid = (jnp.arange(n_chunks * _CHUNK).reshape(n_chunks, _CHUNK) < c)

        def body(carry, xs):
            tc, vc = xs
            corr = 0.5 * jnp.einsum("...lnB,lc->...cnB", la, tc)
            corr = jnp.where(vc[:, None, None], corr, -jnp.inf)
            return jnp.logaddexp(carry, jax.nn.logsumexp(corr, axis=-3)), None

        init = jnp.full(la.shape[:-3] + la.shape[-2:], -jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, (chunks, valid))
        return out

    def _llr_static(self, i: int, lam_adj: jnp.ndarray) -> jnp.ndarray:
        """Input-i LLR from coset-adjusted llrs. lam_adj [P, l, n, B]."""
        if self.l == 2:
            a, b = lam_adj[:, 0], lam_adj[:, 1]
            if i == 0:
                return (f_exact(a, b) if self.f_mode == "exact"
                        else f_minsum(a, b))
            return a + b  # g with u0 absorbed into the coset sign of a
        if i == self.l - 1:  # single tail codeword: plain correlation diff
            row = self.kernel[i].astype(np.float32).reshape(self.l, 1)
            return tree_corr(lam_adj, row)[..., 0, :, :]
        if self.pallas_big:
            from polar_tpu.ops.pallas_stage import build_down_kernel

            p0, _, n, b = lam_adj.shape
            fn = build_down_kernel(self.kernel, i, p0, n,
                                   batch_tile=min(128, b),
                                   interpret=self.pallas_interpret)
            return fn(lam_adj)
        both = jnp.stack(
            [lam_adj,
             lam_adj * jnp.asarray(self.row_signs[i],
                                   dtype=lam_adj.dtype)[None, :, None, None]])
        if self.f_mode == "exact":
            lse = self._lsecorr(both, i)   # [2, P, n, B]
            return (lse[0] - lse[1]).astype(lam_adj.dtype)
        if self.backend[i] == "trellis":
            from polar_tpu.kernels.trellis import syndrome_min_cost

            S, cols = self.syn[i]
            cost = syndrome_min_cost(S, cols, both)        # [2, P, n, B]
            return cost[1] - cost[0]
        corr = self._maxcorr(both, i)  # [2, P, n, B]
        return 0.5 * (corr[0] - corr[1])

    def fresh_llr(self, lam_view: jnp.ndarray) -> jnp.ndarray:
        """Input-0 LLR (new node, no prior decisions). lam_view [P,l,n,B]."""
        return self._llr_static(0, lam_view)

    def dynamic_llr(self, i, lam_view: jnp.ndarray,
                    dec_g: jnp.ndarray) -> jnp.ndarray:
        """Input-i LLR with traced i; dec_g [l, P, n, B] prior decisions."""
        lam_adj = lam_view * self.coset_signs(dec_g, i)
        branches = [functools.partial(self._llr_static, j)
                    for j in range(self.l)]
        return jax.lax.switch(i, branches, lam_adj)

    def static_llr(self, i: int, lam_view: jnp.ndarray,
                   dec_g: jnp.ndarray) -> jnp.ndarray:
        """Input-i LLR with *static* i (unrolled op program): no lax.switch,
        and for the 2x2 kernel the coset matmul collapses to a single sign
        flip of the first output (g's u0 term)."""
        if self.l == 2 and i == 1:
            a = lam_view[:, 0] * (1.0 - 2.0 * dec_g[0].astype(lam_view.dtype))
            return a + lam_view[:, 1]
        lam_adj = lam_view * self.coset_signs(dec_g, i)
        return self._llr_static(i, lam_adj)

    # ---- re-encode ------------------------------------------------------

    def reencode(self, dec_g: jnp.ndarray) -> jnp.ndarray:
        """Hard re-encode a completed node: dec_g [l, P, n, B] child bits ->
        output block [P, l, n, B] (x = u @ K mod 2 along the kernel axis)."""
        if self.l == 2:  # Arikan: x = (u0^u1, u1) — pure int8 XOR, no f32
            return jnp.stack([dec_g[0] ^ dec_g[1], dec_g[1]], axis=1)
        x = jnp.einsum("jPnB,jk->PknB", dec_g.astype(jnp.float32),
                       jnp.asarray(self.k_f32)) % 2.0
        return x.astype(jnp.int8)
