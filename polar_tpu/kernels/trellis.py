"""Minimal-trellis construction + batched min-plus Viterbi kernel pass.

TPU-native equivalent of the reference's trellis-based processing for
large BCH kernels (SURVEY.md C5, §3.5; BASELINE.json:5 "trellis-based
processing for large BCH kernels"; mount empty, §0). The reference walks a
per-codeword Viterbi recursion; here the trellis is precomputed on the
host into dense per-section min-plus transition tensors, and the device
pass is a `lax.scan` of batched (state x state) min-plus products — every
section a wide vector op over (paths, positions, batch) lanes.

Semantics are *identical* to the table backend in ops/kernel_proc.py
(both compute the exact min-sum path metric over the tail code); which
backend runs is a per-(kernel, input) cost choice:
tables cost O(2^(l-1-i)) columns, the trellis costs O(16 * S_i^2) with
S_i the max state count of span(rows i+1..l-1) — tiny for small i where
the tail code is nearly the full SPC code.

Host construction: states at boundary t are cosets of the past-projection
of the tail code modulo codewords supported entirely in the past
(standard BCJR/minimal-trellis state space); built by direct enumeration
(k <= 15 for the 16x16 kernel).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.utils.gf2 import gf2_rank, gf2_rref

INF = np.float32(3e38) / 4


@dataclasses.dataclass(frozen=True)
class Trellis:
    """Dense minimal trellis: trans[t, b] is [S, S] with 0 where a section-t
    edge labelled bit b connects the states, +INF elsewhere."""
    n: int
    s_max: int
    trans: np.ndarray  # [n, 2, S, S] float32 (0 / INF)
    state_profile: tuple[int, ...]


def _subcode_basis(basis: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Basis of codewords supported entirely within columns [lo, hi)."""
    if basis.size == 0:
        return basis.reshape(0, basis.shape[1] if basis.ndim == 2 else 0)
    n = basis.shape[1]
    # rref on reordered columns: outside-support columns first, so rows with
    # pivots only inside [lo,hi) are exactly the supported subcode... simpler:
    # enumerate via rref of the generator with columns outside zeroed must be
    # zero. Use linear algebra: solve basis^T x has support in [lo,hi).
    # Direct method: rows of the rref of [outside | inside] whose outside
    # part is zero span the subcode.
    outside = [c for c in range(n) if not (lo <= c < hi)]
    inside = [c for c in range(n) if lo <= c < hi]
    perm = outside + inside
    rr, _ = gf2_rref(basis[:, perm])
    keep = [r for r in range(rr.shape[0])
            if rr[r, :len(outside)].max(initial=0) == 0 and rr[r].any()]
    out = np.zeros((len(keep), n), dtype=np.uint8)
    inv = np.argsort(perm)
    for j, r in enumerate(keep):
        out[j] = rr[r][inv]
    return out


def build_trellis(basis: np.ndarray, n: int) -> Trellis:
    """Minimal trellis of the code spanned by `basis` rows (length n)."""
    basis = np.asarray(basis, dtype=np.uint8).reshape(-1, n)
    k = gf2_rank(basis) if basis.size else 0
    if k > 16:
        raise ValueError("trellis enumeration limited to k <= 16")
    msgs = ((np.arange(1 << basis.shape[0])[:, None]
             >> np.arange(basis.shape[0])[None, :]) & 1).astype(np.uint8)
    words = (msgs.astype(np.int64) @ basis.astype(np.int64) % 2).astype(np.uint8)
    words = np.unique(words, axis=0)

    # state labels per boundary: quotient of past-projections by the
    # past-supported subcode's projection
    labels = []
    profile = []
    for t in range(n + 1):
        past = words[:, :t]
        past_sub = _subcode_basis(basis, 0, t)[:, :t] if t else \
            np.zeros((0, 0), np.uint8)
        # canonical label: reduce past by past_sub basis (mod out)
        red = past.copy()
        if past_sub.size:
            rr, piv = gf2_rref(past_sub)
            for r, p in zip(rr, piv):
                flip = red[:, p] == 1
                red[flip] ^= r[None, :]
        uniq, ids = np.unique(red, axis=0, return_inverse=True)
        labels.append(ids)
        profile.append(len(uniq))
    s_max = max(profile)

    trans = np.full((n, 2, s_max, s_max), INF, dtype=np.float32)
    for t in range(n):
        src = labels[t]
        dst = labels[t + 1]
        bit = words[:, t]
        trans[t, bit, src, dst] = 0.0
    return Trellis(n=n, s_max=s_max, trans=trans,
                   state_profile=tuple(profile))


@lru_cache(maxsize=None)
def tail_trellis(kernel_bytes: bytes, l: int, i: int) -> Trellis:
    kernel = np.frombuffer(kernel_bytes, dtype=np.uint8).reshape(l, l)
    return build_trellis(kernel[i + 1:], l)


@lru_cache(maxsize=None)
def tail_syndrome_cols(kernel_bytes: bytes, l: int, i: int
                       ) -> tuple[int, tuple[int, ...]]:
    """Syndrome-trellis form of `tail_trellis`: the tail code
    span(rows i+1..l-1) as its parity-check matrix H [r, l], returned as
    (n_states=2^r, per-position syndrome columns as ints).

    The syndrome trellis (states = partial syndromes s_t, transition on
    bit 1 = XOR with column t, valid paths end at syndrome 0) has the
    same reachable-state partition as the minimal trellis, so a min-plus
    pass over it produces float-identical path costs to `min_path_cost`
    — but the bit-1 transition is a pure XOR relabeling of the state
    axis, which the Pallas mega-kernel exploits: states live as a Python
    list of arrays and the XOR permutation is free at trace time
    (ops/pallas_scl.py)."""
    from polar_tpu.utils.gf2 import gf2_null_space

    kernel = np.frombuffer(kernel_bytes, dtype=np.uint8).reshape(l, l)
    h = gf2_null_space(kernel[i + 1:])           # [r, l]
    h = np.atleast_2d(h).reshape(-1, l)
    r = h.shape[0]
    cols = tuple(int((h[:, t].astype(np.int64) << np.arange(r)).sum())
                 for t in range(l))
    return (1 << r), cols


def syndrome_min_cost(n_states: int, cols, lam_adj: jnp.ndarray
                      ) -> jnp.ndarray:
    """min_path_cost over the syndrome trellis; same I/O contract
    ([..., l, n, B] -> [..., n, B]) and float-identical results (each
    alpha update is a 2-operand add + an order-free min, in the same
    section order). jnp reference for the in-kernel Pallas version."""
    l = lam_adj.shape[-3]
    alpha = [jnp.zeros(lam_adj.shape[:-3] + lam_adj.shape[-2:], jnp.float32)
             if s == 0 else None for s in range(n_states)]
    inf = jnp.full(lam_adj.shape[:-3] + lam_adj.shape[-2:], INF, jnp.float32)
    alpha = [a if a is not None else inf for a in alpha]
    for t in range(l):
        lam_t = lam_adj[..., t, :, :]
        pen0 = jnp.maximum(-lam_t, 0.0)
        pen1 = jnp.maximum(lam_t, 0.0)
        c = cols[t]
        alpha = [jnp.minimum(alpha[s] + pen0, alpha[s ^ c] + pen1)
                 for s in range(n_states)]
    return alpha[0]


def min_path_cost(trellis: Trellis, lam_adj: jnp.ndarray) -> jnp.ndarray:
    """Min-sum path cost over the trellis.

    lam_adj: [..., l, n, B] coset-adjusted LLRs (kernel axis third-from-
    last, as in ops/kernel_proc). Returns [..., n, B] min over codewords c
    of sum_t |lam_t| * [hard(lam_t) != c_t].

    The state axis leads and the batch stays in the lane (last) dimension
    — with S states trailing instead, every vector op runs on S(<16)
    lanes of the 128 and the pass is ~64x off the VPU's width.
    """
    s = trellis.s_max
    lam_scan = jnp.moveaxis(lam_adj, -3, 0)      # [l, ..., n, B]
    trans = jnp.asarray(trellis.trans)           # [l, 2, S, S]

    batch_shape = lam_adj.shape[:-3] + lam_adj.shape[-2:]
    alpha0 = jnp.full((s,) + batch_shape, INF, jnp.float32).at[0].set(0.0)

    def section(alpha, xs):
        tr, lam_t = xs                           # [2, S, S'], [..., n, B]
        pen = jnp.stack([jnp.maximum(-lam_t, 0.0),
                         jnp.maximum(lam_t, 0.0)])       # [2, ..., n, B]
        # alpha'[s'] = min over (bit b, state s) of
        #   alpha[s] + tr[b, s, s'] + pen[b]
        nd = alpha.ndim - 1
        tr_b = tr.reshape((2, s, s) + (1,) * nd)
        expanded = alpha[None, :, None] + tr_b           # [2, S, S', ...]
        best = jnp.min(expanded, axis=1) + pen[:, None]  # [2, S', ...]
        return jnp.min(best, axis=0), None

    alpha, _ = jax.lax.scan(section, alpha0, (trans, lam_scan))
    return jnp.min(alpha, axis=0)
