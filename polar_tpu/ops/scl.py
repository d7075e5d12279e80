"""Batched SC / CRC-aided SC-list decoder (device-side, XLA).

TPU-native redesign of the reference's C++ `ScDecoder`/`ListDecoder`
(SURVEY.md C8/C9, §3.3-3.4; BASELINE.json:5 "SC and CRC-aided SC-list
decoding ... with vectorized f/g (min-sum) updates ... and an on-device
top-L path-metric sort"; reference mount empty, §0). Key inversions of the
pointer-rich per-codeword C++ design (SURVEY.md §7.0):

- A batch of B codewords x L list paths decodes in lockstep; every op is a
  wide vector op with the batch in the lane (last) dimension.
- The depth-first recursion becomes a `lax.fori_loop` over a
  host-precomputed pruned-tree op program (polar_tpu.ops.program):
  fast-SSC(L) constituent nodes (R0/REP/R1/SPC) collapse whole subtrees
  into single steps; DOWN/UP stage ops and single-LEAF forks cover the
  rest. A `lax.switch` dispatches per-op branches (one branch per
  (op kind, tree level) — shapes static per branch).
- Tal-Vardy lazy path copies become per-stage path->slot index maps
  (rlam/rdec, [P, B] int32): on path survival only the tiny maps are
  permuted; bulk LLR/decision state is never copied — reads gather through
  the maps, writes always land at identity slots. A node's own input LLR
  buffer is always written immediately before its ops, so node branches
  read it at identity slots with no gather.
- Sorts are `lax.top_k` on negated path metrics (single-leaf forks and
  REP: candidate order bit-major, ties prefer bit 0 then lower path index
  — matching polar_tpu.oracle; R1 fast forks: keep/flip order per
  Fast-SSCL).
- Per-op survival permutations are recorded as genealogy; decided u
  vectors are reconstructed afterwards (unroll mode: one associative-scan
  suffix composition over the ~n_ops perms + static per-op gathers; fori
  mode: a backward scan over leaves) — no O(N*L) per-leaf state copies.
- All cross-path indexing is `pgather` (one-hot select+reduce): a real
  per-lane gather serializes on TPU, and the one-hot form must be a
  single broadcast op, not a Python loop, to keep the unrolled trace
  compilable at large P (see pgather docstring).

Path metric: PM += |llr| on sign mismatch (arXiv:1411.7282) — by the
telescoping identity this equals the min cost over codewords consistent
with the path, for any kernel with exact max-log input marginals, which
is what makes the R0/REP/R1/SPC node updates exact (see ops/program.py).
SC is the list_size=1 specialization (no sorts).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.kernel_proc import StageProcessor
from polar_tpu.ops.program import build_program, staged_inverse_kernels
from polar_tpu.ops.schedule import build_schedule

BIG = np.float32(1e30)  # host scalar: no device init at import


class DecodeResult(NamedTuple):
    u: jnp.ndarray        # [B, N] best path's u decisions
    payload: jnp.ndarray  # [B, K + n_crc] unfrozen slots of u
    crc_ok: jnp.ndarray   # [B] bool: best path passed CRC (True if no CRC)
    pm: jnp.ndarray       # [B] best path metric


def pgather(x, idx, axis, n_paths):
    """take_along_axis(x, idx, axis) over the path axis as a one-hot
    select-reduce. XLA lowers a generic per-lane gather to a *serialized*
    scalar loop on TPU (~1 element/cycle — measured ~9 ms per op at
    [8, 512, 2048]); the one-hot form stays on the VPU. Expressed as one
    broadcast select + sum (not a Python loop over paths) so the traced
    equation count is O(1) in n_paths — trace size limits compile time
    for large-P unrolled programs. idx must have x's rank and broadcast
    against it like jnp.take_along_axis."""
    ax = axis % x.ndim
    squeeze = x.dtype == jnp.bool_
    if squeeze:
        x = x.astype(jnp.int8)
    xm = jnp.moveaxis(x, ax, 0)                    # [P_src, rest]
    im = jnp.moveaxis(idx, ax, 0)                  # [P_out, rest']
    iota = jnp.arange(n_paths, dtype=idx.dtype).reshape(
        (n_paths,) + (1,) * im.ndim)
    oh = im[None] == iota                          # [P_src, P_out, rest']
    y = jnp.sum(jnp.where(oh, xm[:, None], jnp.zeros((), x.dtype)),
                axis=0, dtype=x.dtype)             # [P_out, rest]
    y = jnp.moveaxis(y, 0, ax)
    return y.astype(jnp.bool_) if squeeze else y


def scl_epilogue(spec: CodeSpec, P: int, entries, traj_bit, pm,
                 genie: bool = False) -> DecodeResult:
    """Genealogy backtrack + CRC path selection, shared by the unrolled
    XLA decoder and the Pallas mega-kernel (ops/pallas_scl.py).

    entries: per traj-op (t0, n, perm [P, B] i32) in leaf order with
    disjoint spans covering [0, N); perm is the op's survival permutation;
    traj_bit [N, P, B] holds each op's decided bits in post-op path
    indexing; pm [P, B] final path metrics.
    """
    frozen_np = spec.frozen.astype(np.bool_)
    bsz = pm.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[:, None],
                            (P, bsz))
    if P == 1:
        pieces = [traj_bit[t0:t0 + n] for (t0, n, _) in entries]
        u_all = traj_bit
    else:
        # S_q = perm_{q+1} o ... o perm_{Q-1} (exclusive suffix
        # composition): u bits of op q, stored in op-q path indexing, map
        # to final path indexing through S_q.
        perms = jnp.stack([p for _, _, p in entries])      # [Q, P, B]

        def comp(a, b):                # b o a per lane
            return pgather(b, a, -2, P)

        inc = jax.lax.associative_scan(comp, perms, reverse=True)
        pieces = []
        for q, (t0, n, _) in enumerate(entries):
            s_q = inc[q + 1] if q + 1 < len(entries) else iota
            pieces.append(pgather(traj_bit[t0:t0 + n], s_q[None], 1, P))
        u_all = jnp.concatenate(pieces, axis=0)            # [N, P, B]
    # payload rows assembled per op from static slices (a K-row static
    # gather over u_all also serializes on TPU)
    ppieces = []
    for (t0, n, _), g in zip(entries, pieces):
        fr = frozen_np[t0:t0 + n]
        if genie or not fr.any():
            ppieces.append(g)
        elif not fr.all():
            rows = np.nonzero(fr == 0)[0]
            ppieces.append(jnp.concatenate(
                [g[int(j)][None] for j in rows], axis=0))
    if genie:
        payload_all = jnp.concatenate(ppieces, axis=0)[
            jnp.asarray(spec.info_positions)]
    else:
        payload_all = jnp.concatenate(ppieces, axis=0)
    return finalize(spec, P, u_all, payload_all, pm)


def finalize(spec: CodeSpec, P: int, u_all, payload_all, pm) -> DecodeResult:
    """CRC check per path, best-path selection, [B]-major outputs."""
    bsz = pm.shape[-1]
    if spec.crc is not None:
        k = spec.K
        g = jnp.asarray(spec.crc.generator_matrix(k).astype(np.float32))
        off = jnp.asarray(spec.crc.offset_bits(k).astype(np.float32))
        bits = (jnp.einsum("kPB,kw->wPB",
                           payload_all[:k].astype(jnp.float32), g)
                + off[:, None, None]) % 2.0
        ok = jnp.all(bits.astype(jnp.int8) == payload_all[k:], axis=0)
        score = pm + BIG * (1.0 - ok.astype(jnp.float32))
    else:
        ok = jnp.ones((P, bsz), bool)
        score = pm
    best = jnp.argmin(score, axis=0)
    sel = best[None, None, :]
    u_best = pgather(u_all, sel, 1, P)[:, 0, :]
    payload = pgather(payload_all, sel, 1, P)[:, 0, :]
    crc_ok = pgather(ok, best[None, :], 0, P)[0]
    pm_best = pgather(pm, best[None, :], 0, P)[0]
    return DecodeResult(u=u_best.T, payload=payload.T,
                        crc_ok=crc_ok, pm=pm_best)


def build_scl_decoder(spec: CodeSpec, list_size: int, genie: bool = False,
                      fast: bool = True, fast_r1_scl: bool = True,
                      llr_dtype=jnp.float32, unroll: bool = True,
                      f_mode: str = "minsum", pm_mode: str = "abs",
                      big_stage_backend: str = "xla",
                      subtree_backend: str = "none",
                      pallas_interpret: bool = False):
    """Returns decode(llrs: [B, N] f32) -> DecodeResult. Jit the result.

    fast: use the pruned fast-SSC(L) node program (exact; see
    ops/program.py). fast_r1_scl: allow Fast-SSCL R1 nodes for L>1
    (identical survivors/metrics; tie ordering may differ from
    leaf-sequential SCL). genie (list_size must be 1): all leaves decided
    as the true all-zero codeword; returned u records per-leaf LLR sign
    errors (Monte-Carlo construction aid, SURVEY.md C6). llr_dtype:
    bfloat16 halves LLR memory traffic (HBM is the usual TPU bottleneck);
    path metrics stay float32. Default float32 preserves oracle
    bit-exactness. unroll: trace the (static) op program as straight-line
    XLA code instead of `fori_loop`+`switch` — every t0-derived index
    becomes a compile-time constant (static slices, no per-input
    `lax.switch`, frozen leaves skip the fork), letting XLA fuse across op
    boundaries; same math, bit-identical results, larger compile.

    Bit-match knobs (SURVEY.md §2.3 items 4-5 — conventions a real
    reference may use, flippable without touching decoder code):
    f_mode: "minsum" (default) or "exact" — exact boxplus / sum-product
    kernel marginals (kernels/arikan.f_exact, kernel_proc exact tables).
    pm_mode: "abs" (default; PM += |llr| on sign mismatch, arXiv:1411.7282
    hard variant) or "smooth" (PM += log1p(exp(-(1-2u)·llr)), the exact
    Balatsoukas-Stimming metric). Either non-default knob disables the
    fast-SSC(L) node shortcuts (they rely on the min-sum/abs telescoping
    identity) — the decoder falls back to the leaf-sequential program.

    big_stage_backend: "xla" or "pallas" — how l>2 kernel-input LLRs are
    computed. "pallas" runs each trellis/table DOWN op as a standalone
    VMEM-resident Pallas kernel (ops/pallas_stage.py; bit-identical, the
    hybrid fast path for configs beyond the mega-kernel's VMEM envelope
    such as mixed_scl32). Requires batch % 128 == 0 on a real TPU;
    pallas_interpret=True runs those kernels interpreted (CPU tests).

    subtree_backend: "none" or "pallas" (r4) — with "pallas", every
    depth-1 subtree that does not collapse to a single classified node
    runs as ONE Pallas mega-kernel dispatch (ops/pallas_scl.py
    subtree=True): the kernel consumes the stage-1 DOWN's LLR block +
    path metrics and returns ordinary traj entries, the net survival
    permutation, and the re-encoded child block. Bit-identical to the
    plain program (the sub-program's classification and fork order are
    the same ops); collapses mixed_scl32's ~900 sequential dispatches
    to ~35. Requires unroll, P >= 1, no genie, default f/pm modes.
    """
    if genie and list_size != 1:
        raise ValueError("genie mode requires list_size=1")
    if pm_mode not in ("abs", "smooth"):
        raise ValueError(f"unknown pm_mode {pm_mode!r}")
    if f_mode != "minsum" or pm_mode != "abs":
        fast = False  # node shortcuts assume min-sum/abs telescoping
    m = len(spec.factors)
    P = int(list_size)
    if big_stage_backend not in ("xla", "pallas"):
        raise ValueError(f"unknown big_stage_backend {big_stage_backend!r}")
    sched = build_schedule(spec)
    procs = [StageProcessor(k, f_mode=f_mode,
                            pallas_big=(big_stage_backend == "pallas"),
                            pallas_interpret=pallas_interpret)
             for k in spec.kernels]
    inv_kernels = staged_inverse_kernels(spec)
    n_sizes = spec.block_sizes
    factors = spec.factors
    N = spec.N
    program = build_program(spec, scl=(P > 1), classify=fast,
                            fast_r1_scl=fast_r1_scl, genie=genie)

    if pm_mode == "smooth":
        def _pen_neg(lam):   # penalty for deciding u with (1-2u)·llr = lam
            return jax.nn.softplus(-lam.astype(jnp.float32))
    else:
        def _pen_neg(lam):
            return jnp.maximum(-lam.astype(jnp.float32), 0.0)

    # numpy schedule tables — wrapped with jnp.asarray only inside traced
    # code, so they embed as MLIR constants without a device fetch (the
    # remote-tunnel TPU plugin makes per-device-constant fetches very slow).
    digits_np = sched.digits
    frozen_np = sched.frozen.astype(np.bool_)
    info_pos_np = spec.info_positions

    def _iota_pb(b):
        return jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[:, None], (P, b))

    def _pgather(x, idx, axis):
        return pgather(x, idx, axis, P)

    def _tset(tup, idx, val):
        return tup[:idx] + (val,) + tup[idx + 1:]

    # ---------------- shared helpers ----------------

    def _apply_perm(state, perm):
        """Permute all path->slot maps by survival permutation [P, B].

        unroll mode also bumps the trace-time fork epoch: a buffer whose
        write epoch equals the current epoch is provably identity-mapped
        (maps reset to iota on write and only forks disturb them), so
        reads of it skip the one-hot gather entirely."""
        state = dict(state)
        # one batched gather over all stacked maps instead of 3m separate
        # P-way gathers: same data volume, ~20x fewer traced equations —
        # the unrolled program's trace size is the compile-time limiter
        # for large-P configs (mixed N=4096 L=32)
        both = jnp.concatenate(
            [jnp.stack(state["rlam"])] + list(state["rdec"]), axis=0)
        g = _pgather(both, perm[None], 1)
        state["rlam"] = tuple(g[s] for s in range(m))
        off = m
        rdec = []
        for s in range(m):
            rdec.append(g[off:off + factors[s]])
            off += factors[s]
        state["rdec"] = tuple(rdec)
        if unroll:
            state["epoch"] = state["epoch"] + 1
        return state

    def _write_dec(state, d, t0, block):
        """Record a depth-d node's hard output block [P, n_d, B] as child
        digits[t0, d-1] of its parent's kernel."""
        if isinstance(t0, (int, np.integer)):
            idx = int(digits_np[t0, d - 1])
        else:
            idx = jnp.asarray(digits_np)[t0, d - 1]
        b = block.shape[-1]
        state = dict(state)
        state["dec"] = _tset(state["dec"], d - 1,
                             state["dec"][d - 1].at[idx].set(block))
        state["rdec"] = _tset(state["rdec"], d - 1,
                              state["rdec"][d - 1].at[idx].set(_iota_pb(b)))
        if unroll:
            eps = list(state["dec_ep"][d - 1])
            eps[idx] = state["epoch"]
            state["dec_ep"] = _tset(state["dec_ep"], d - 1, tuple(eps))
        return state

    def _dec_child(state, s, j):
        """Child j's decisions [P, n_s, B] at stage s, path-correct."""
        if unroll and state["dec_ep"][s - 1][j] == state["epoch"]:
            return state["dec"][s - 1][j]          # identity-mapped
        return _pgather(state["dec"][s - 1][j],
                        state["rdec"][s - 1][j][:, None, :], 0)

    def _dec_children(state, s, count):
        """Children 0..count-1 decisions at stage s as a list of
        [P, n_s, B]: epoch-elided children read directly, the rest through
        ONE batched gather (trace size, see _apply_perm)."""
        rows = [None] * count
        stale = []
        for j in range(count):
            if unroll and state["dec_ep"][s - 1][j] == state["epoch"]:
                rows[j] = state["dec"][s - 1][j]
            else:
                stale.append(j)
        if len(stale) == 1:
            rows[stale[0]] = _dec_child(state, s, stale[0])
        elif stale:
            xs = jnp.stack([state["dec"][s - 1][j] for j in stale])
            idx = jnp.stack([state["rdec"][s - 1][j] for j in stale])
            g = _pgather(xs, idx[:, :, None, :], 1)
            for t, j in enumerate(stale):
                rows[j] = g[t]
        return rows

    def _write_traj(state, t0, n, perm_first, bits_pnb):
        """Genealogy for a node covering leaves [t0, t0+n): composed perm at
        the first leaf, identity elsewhere; bits in final path indexing.

        unroll mode records one perm per traj op instead (ops cover disjoint
        leaf ranges in increasing t0 order), letting the final backtrack run
        as an associative scan over ~n_ops perms rather than a sequential
        N-step scan."""
        b = bits_pnb.shape[-1]
        state = dict(state)
        bits = jnp.moveaxis(bits_pnb, 1, 0).astype(jnp.int8)   # [n, P, B]
        state["traj_bit"] = jax.lax.dynamic_update_slice(
            state["traj_bit"], bits, (t0, 0, 0))
        if unroll:
            state["traj_perms"] = state["traj_perms"] + (
                (int(t0), int(n), perm_first.astype(jnp.int32)),)
            return state
        par = jnp.broadcast_to(_iota_pb(b)[None], (n, P, b)).astype(jnp.int8)
        par = par.at[0].set(perm_first.astype(jnp.int8))
        state["traj_parent"] = jax.lax.dynamic_update_slice(
            state["traj_parent"], par, (t0, 0, 0))
        return state

    def _extract_mins(absl, count):
        """count smallest values + positions along axis 1 of [P, n, B], in
        ascending order, ties to the lowest index (== lax.top_k on the
        negated transposed array, without the transpose or the sort).
        Returns (vals, poss): lists of [P, B] f32 / int32."""
        iota_col = jnp.arange(absl.shape[1], dtype=jnp.int32)[None, :, None]
        vals, poss = [], []
        work = absl
        for _ in range(count):
            vals.append(jnp.min(work, axis=1))
            a = jnp.argmin(work, axis=1).astype(jnp.int32)
            poss.append(a)
            work = jnp.where(iota_col == a[:, None, :], BIG, work)
        return vals, poss

    def _defer_flips(perms, flips_raw, b):
        """Map per-round flip bits to final path indexing.

        flip_r is recorded in post-round-r indexing; rounds r+1..q-1 each
        permute state by perm_{r'} (A -> A[perm]). Hence
        flips_fin[r] = flip_r[perm_{r+1} o ... o perm_{q-1}]; the suffix
        compositions come from one associative scan and the q gathers are
        one batched gather (trace size, see _apply_perm)."""
        q = len(perms)
        if q == 1:
            return [flips_raw[0]]
        iota = _iota_pb(b)

        def comp(a, bb):               # bb o a per lane
            return _pgather(bb, a, -2)

        inc = jax.lax.associative_scan(comp, jnp.stack(perms), reverse=True)
        suffix = jnp.concatenate([inc[1:], iota[None]], axis=0)  # [q, P, B]
        fin = _pgather(jnp.stack(flips_raw), suffix, 1)
        return [fin[r] for r in range(q)]

    def _fork2(pm, pen0, pen1):
        """Bit-major 2-way fork + top-L: returns (pm', perm, bit)."""
        b = pm.shape[-1]
        pen0 = pen0.astype(jnp.float32)
        pen1 = pen1.astype(jnp.float32)
        cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)   # [2P, B]
        vals, idx = jax.lax.top_k(-cand.T, P)
        c = idx.T.astype(jnp.int32)
        return -vals.T, c % P, (c // P).astype(jnp.int8)

    def _apply_inverse(d, x_bits):
        """u = x @ (K_{d+1} kron ... kron K_m)^-1 for blocks [P, n_d, B]."""
        below = factors[d:]
        p_, n, b = x_bits.shape
        if all(f == 2 for f in below):
            # Arikan F is self-inverse over GF(2): butterfly XORs in int8
            t = x_bits.reshape((p_,) + tuple(below) + (b,))
            for ax in range(len(below)):
                x0 = jax.lax.index_in_dim(t, 0, 1 + ax, keepdims=True)
                x1 = jax.lax.index_in_dim(t, 1, 1 + ax, keepdims=True)
                t = jnp.concatenate([x0 ^ x1, x1], axis=1 + ax)
            return t.reshape(p_, n, b)
        t = x_bits.astype(jnp.float32).reshape((p_,) + tuple(below) + (b,))
        for ax, s in enumerate(range(d, m)):
            ki = jnp.asarray(inv_kernels[s])
            t = jnp.tensordot(t, ki, axes=[[1 + ax], [0]])
            t = jnp.mod(jnp.moveaxis(t, -1, 1 + ax), 2.0)
        return t.reshape(p_, n, b).astype(jnp.int8)

    # ---------------- stage ops (DOWN / UP) ----------------

    def _parent_view(state, s, lam0):
        l, n = factors[s - 1], n_sizes[s]
        if s == 1:
            b = lam0.shape[-1]
            return lam0.reshape(1, l, n, b)
        if unroll and state["lam_ep"][s - 2] == state["epoch"]:
            lam_prev = state["lam"][s - 2]         # identity-mapped
        else:
            lam_prev = _pgather(
                state["lam"][s - 2], state["rlam"][s - 2][:, None, :], 0)
        return lam_prev.reshape(P, l, n, lam_prev.shape[-1])

    def _dec_gather(state, s):
        rd = state["rdec"][s - 1][:, :, None, :]
        return _pgather(state["dec"][s - 1], rd, 1)

    def _down(state, s, t0, fresh):
        view = _parent_view(state, s, lam0=state["lam0"])
        proc = procs[s - 1]
        if fresh:
            llr = proc.fresh_llr(view)
        elif isinstance(t0, (int, np.integer)):
            i = int(digits_np[t0, s - 1])
            # only children < i feed the coset; skip their gathers when the
            # write epoch proves the maps are identity, zero-fill the rest
            rows = _dec_children(state, s, i)
            zero = jnp.zeros_like(rows[0]) if rows else None
            dec_g = jnp.stack(rows + [zero] * (factors[s - 1] - i))
            llr = proc.static_llr(i, view, dec_g)
        else:
            i = jnp.asarray(digits_np)[t0, s - 1]
            llr = proc.dynamic_llr(i, view, _dec_gather(state, s))
        b = llr.shape[-1]
        # single choke point for the LLR dtype: mixed-precision helpers may
        # promote to f32; the carried buffers stay llr_dtype
        llr = jnp.broadcast_to(llr, (P, n_sizes[s], b)).astype(llr_dtype)
        state = dict(state)
        state["lam"] = _tset(state["lam"], s - 1, llr)
        state["rlam"] = _tset(state["rlam"], s - 1, _iota_pb(b))
        if unroll:
            state["lam_ep"] = _tset(state["lam_ep"], s - 1, state["epoch"])
        return state

    def _up(state, s, t0):
        if unroll:
            dec_g = jnp.stack(_dec_children(state, s, factors[s - 1]))
        else:
            dec_g = _dec_gather(state, s)
        x = procs[s - 1].reencode(dec_g)                   # [P, l, n_s, B]
        x = x.reshape(P, n_sizes[s - 1], x.shape[-1])
        return _write_dec(state, s - 1, t0, x)

    # ---------------- node ops ----------------

    def _r0(state, d, t0):
        lam = state["lam"][d - 1]                          # [P, n_d, B]
        n = n_sizes[d]
        state = dict(state)
        state["pm"] = state["pm"] + jnp.sum(
            jnp.maximum(-lam, 0.0), axis=1).astype(jnp.float32)
        zeros = jnp.zeros_like(lam, dtype=jnp.int8)
        state = _write_traj(state, t0, n, _iota_pb(lam.shape[-1]), zeros)
        if d >= 1:
            state = _write_dec(state, d, t0, zeros)
        return state

    def _rep(state, d, t0):
        lam = state["lam"][d - 1]
        n = n_sizes[d]
        b = lam.shape[-1]
        s0 = jnp.sum(jnp.maximum(-lam, 0.0), axis=1).astype(jnp.float32)
        s1 = jnp.sum(jnp.maximum(lam, 0.0), axis=1).astype(jnp.float32)
        if P == 1:
            bit = (s1 < s0).astype(jnp.int8)
            pm = state["pm"] + jnp.where(bit == 1, s1, s0)
            perm = _iota_pb(b)
        else:
            pm, perm, bit = _fork2(state["pm"], s0, s1)
            state = _apply_perm(state, perm)
        state = dict(state)
        state["pm"] = pm
        ubits = jnp.zeros((P, n, b), jnp.int8).at[:, n - 1, :].set(bit)
        state = _write_traj(state, t0, n, perm, ubits)
        xhat = jnp.broadcast_to(bit[:, None, :], (P, n, b)).astype(jnp.int8)
        return _write_dec(state, d, t0, xhat)

    def _r1(state, d, t0):
        lam = state["lam"][d - 1]
        n = n_sizes[d]
        b = lam.shape[-1]
        hd = (lam < 0).astype(jnp.int8)                    # [P, n, B]
        if P == 1:
            u = _apply_inverse(d, hd)
            state = _write_traj(state, t0, n, _iota_pb(b), u)
            return _write_dec(state, d, t0, hd)
        # Fast-SSCL: q keep/flip forks on the least reliable positions.
        # Least-reliable extraction is q sequential (min, argmin, mask)
        # passes in the native [P, n, B] layout — no lane transpose, no
        # XLA sort; tie order (lowest index first) matches lax.top_k.
        # Per-round flips are NOT permuted online (that costs O(q^2 P)
        # selects per node — prohibitive trace/compute at P=32); they are
        # recorded raw and mapped to final path indexing afterwards via
        # the suffix compositions of the round perms (O(q P)).
        q = min(P - 1, n)
        vals, poss = _extract_mins(jnp.abs(lam).astype(jnp.float32), q)
        node_map = _iota_pb(b)
        perms, flips_raw = [], []
        pm = state["pm"]
        for r in range(q):
            v = _pgather(vals[r], node_map, 0)
            pm, perm, flip = _fork2(pm, jnp.zeros_like(v), v)
            node_map = _pgather(node_map, perm, 0)
            perms.append(perm)
            flips_raw.append(flip)
        flips_fin = _defer_flips(perms, flips_raw, b)
        hd_g = _pgather(hd, node_map[:, None, :], 0)
        xhat = hd_g
        iota_n = jnp.arange(n, dtype=jnp.int32)
        for r in range(q):
            pos_g = _pgather(poss[r], node_map, 0)         # [P, B]
            onehot = (iota_n[None, :, None] == pos_g[:, None, :])
            xhat = xhat ^ (onehot & (flips_fin[r][:, None, :] == 1)
                           ).astype(jnp.int8)
        state = _apply_perm(state, node_map)
        state = dict(state)
        state["pm"] = pm
        u = _apply_inverse(d, xhat)
        state = _write_traj(state, t0, n, node_map, u)
        return _write_dec(state, d, t0, xhat)

    def _spc(state, d, t0):
        """Single-parity-check node. SC: hd + flip the least-reliable
        position on parity failure. SCL: Fast-SSCL-SPC — mandatory parity
        fix, then min(L, n-1) keep/flip pair-forks with a per-path parity
        state eta tracking whether the least-reliable bit is currently
        flipped (exact PM accounting: total = sum of selected |lam_ir| +
        eta_final * |lam_i0|)."""
        lam = state["lam"][d - 1]
        n = n_sizes[d]
        b = lam.shape[-1]
        hd = (lam < 0).astype(jnp.int8)
        par = (jnp.sum(hd, axis=1) % 2).astype(jnp.int8)   # [P, B]
        absl = jnp.abs(lam)
        iota_n = jnp.arange(n, dtype=jnp.int32)
        if P == 1:
            minabs = jnp.min(absl, axis=1).astype(jnp.float32)
            amin = jnp.argmin(absl, axis=1).astype(jnp.int32)
            onehot = (iota_n[None, :, None] == amin[:, None, :])
            xhat = hd ^ (onehot & (par[:, None, :] == 1)).astype(jnp.int8)
            state = dict(state)
            state["pm"] = state["pm"] + minabs * par.astype(jnp.float32)
            u = _apply_inverse(d, xhat)
            state = _write_traj(state, t0, n, _iota_pb(b), u)
            return _write_dec(state, d, t0, xhat)
        # ---- SCL ----
        q = min(P, n - 1)
        vals, poss = _extract_mins(absl.astype(jnp.float32), q + 1)
        v0 = vals[0]                                          # |lam_i0|
        pm = state["pm"] + par.astype(jnp.float32) * v0       # mandatory fix
        eta = par                                             # i0 flipped?
        node_map = _iota_pb(b)
        perms, flips_raw = [], []
        for r in range(1, q + 1):
            v_r = _pgather(vals[r], node_map, 0)
            v0_g = _pgather(v0, node_map, 0)
            pen_flip = v_r + (1.0 - 2.0 * eta.astype(jnp.float32)) * v0_g
            pm, perm, flip = _fork2(pm, jnp.zeros_like(pen_flip), pen_flip)
            node_map = _pgather(node_map, perm, 0)
            eta = _pgather(eta, perm, 0) ^ flip
            perms.append(perm)
            flips_raw.append(flip)
        flips_fin = _defer_flips(perms, flips_raw, b)
        hd_g = _pgather(hd, node_map[:, None, :], 0)
        xhat = hd_g
        # i0 flip per final eta state
        pos0_g = _pgather(poss[0], node_map, 0)
        onehot0 = (iota_n[None, :, None] == pos0_g[:, None, :])
        xhat = xhat ^ (onehot0 & (eta[:, None, :] == 1)).astype(jnp.int8)
        for r in range(1, q + 1):
            pos_g = _pgather(poss[r], node_map, 0)
            onehot = (iota_n[None, :, None] == pos_g[:, None, :])
            xhat = xhat ^ (onehot & (flips_fin[r - 1][:, None, :] == 1)
                           ).astype(jnp.int8)
        state = _apply_perm(state, node_map)
        state = dict(state)
        state["pm"] = pm
        u = _apply_inverse(d, xhat)
        state = _write_traj(state, t0, n, node_map, u)
        return _write_dec(state, d, t0, xhat)

    def _leaf(state, t):
        b = state["pm"].shape[-1]
        lam_leaf = state["lam"][m - 1][:, 0, :]
        pen0 = _pen_neg(lam_leaf)
        pen1 = _pen_neg(-lam_leaf)
        iota = _iota_pb(b)
        if genie:
            bit = jnp.zeros((P, b), jnp.int8)
            err = (lam_leaf < 0).astype(jnp.int8)
            state = dict(state)
            state["pm"] = state["pm"] + pen0
            state = _write_traj(state, t, 1, iota, err[:, None, :])
            return _write_dec(state, m, t, bit[:, None, :])
        if isinstance(t, (int, np.integer)):
            # static leaf (unrolled program): frozen-ness is compile-time
            if bool(frozen_np[t]):
                bit = jnp.zeros((P, b), jnp.int8)
                state = dict(state)
                state["pm"] = state["pm"] + pen0
                state = _write_traj(state, t, 1, iota, bit[:, None, :])
                return _write_dec(state, m, t, bit[:, None, :])
            if P == 1:
                bit = (lam_leaf < 0).astype(jnp.int8)
                pm = state["pm"] + jnp.where(bit == 1, pen1, pen0)
                perm = iota
            else:
                pm, perm, bit = _fork2(state["pm"], pen0, pen1)
                state = _apply_perm(state, perm)
            state = dict(state)
            state["pm"] = pm
            state = _write_traj(state, t, 1, perm, bit[:, None, :])
            return _write_dec(state, m, t, bit[:, None, :])
        frozen_t = jnp.asarray(frozen_np)[t]
        if P == 1:
            bit = jnp.where(frozen_t, 0, (lam_leaf < 0).astype(jnp.int8))
            pm = state["pm"] + jnp.where(bit == 1, pen1, pen0)
            perm = iota
        else:
            def fr(pm):
                return pm + pen0, iota, jnp.zeros((P, b), jnp.int8)

            def info(pm):
                return _fork2(pm, pen0, pen1)

            pm, perm, bit = jax.lax.cond(frozen_t, fr, info, state["pm"])
            state = _apply_perm(state, perm)
        state = dict(state)
        state["pm"] = pm
        state = _write_traj(state, t, 1, perm, bit[:, None, :])
        return _write_dec(state, m, t, bit[:, None, :])

    # ---------------- branch table ----------------

    def _branch(kind, level):
        if kind == "DOWN_FRESH":
            return lambda st, t0: _down(st, level, t0, True)
        if kind == "DOWN_DYN":
            return lambda st, t0: _down(st, level, t0, False)
        if kind == "UP":
            return lambda st, t0: _up(st, level, t0)
        if kind == "R0":
            return lambda st, t0: _r0(st, level, t0)
        if kind == "REP":
            return lambda st, t0: _rep(st, level, t0)
        if kind == "R1":
            return lambda st, t0: _r1(st, level, t0)
        if kind == "SPC":
            return lambda st, t0: _spc(st, level, t0)
        if kind == "LEAF":
            return _leaf
        raise ValueError(kind)

    branches = [_branch(k, lvl) for k, lvl in program.branch_keys]
    op_code_np = program.op_code
    op_t0_np = program.op_t0
    n_ops = len(program.ops)

    # ---------------- depth-1 subtree offload (r4) ----------------
    # Replace each depth-1 subtree's op run with one Pallas mega-kernel
    # dispatch. Children that collapse to a single classified node (R0
    # etc.) stay in XLA. Kernels are cached by frozen-mask slice.
    merged_items = None
    if subtree_backend == "pallas":
        if (not unroll or genie or f_mode != "minsum"
                or pm_mode != "abs" or llr_dtype != jnp.float32):
            raise ValueError("subtree_backend='pallas' requires the "
                             "unrolled default-mode program with "
                             "llr_dtype=float32 (the subtree kernel "
                             "computes in f32; a bf16 outer program "
                             "would silently break bit-identity)")
        from polar_tpu.ops.pallas_scl import build_pallas_scl_kernel
        n1 = n_sizes[1]
        merged_items = []
        sub_cache: dict = {}
        j = 0
        while j < n_ops:
            op = program.ops[j]
            if op.kind in ("DOWN_FRESH", "DOWN_DYN") and op.level == 1:
                k = j + 1
                while k < n_ops and not (
                        program.ops[k].level == 1
                        and program.ops[k].kind in ("DOWN_FRESH",
                                                    "DOWN_DYN")):
                    k += 1
                merged_items.append(("op", j))
                if k - j - 1 <= 1:          # single classified node
                    for jj in range(j + 1, k):
                        merged_items.append(("op", jj))
                else:
                    t0 = int(op.t0)
                    fr = tuple(int(v) for v in frozen_np[t0:t0 + n1])
                    if fr not in sub_cache:
                        sub_spec = CodeSpec(
                            N=n1, K=n1 - sum(fr), factors=factors[1:],
                            frozen_mask=fr, crc=None)
                        sub_cache[fr] = build_pallas_scl_kernel(
                            sub_spec, P, subtree=True,
                            interpret=pallas_interpret)
                    merged_items.append(("sub", t0) + sub_cache[fr])
                j = k
            else:
                merged_items.append(("op", j))
                j += 1

    def _subtree_item(state, t0, core_sub, spans_sub):
        lam1 = state["lam"][0]              # just written: identity maps
        bits, perms, netp, xblk, pm = core_sub(
            lam1.astype(jnp.float32), state["pm"])
        state = _apply_perm(state, netp)
        state = dict(state)
        state["pm"] = pm
        for q, (ts, nn) in enumerate(spans_sub):
            state["traj_perms"] = state["traj_perms"] + (
                (t0 + int(ts), int(nn), perms[q]),)
        # bits arrive [N, P, B] since the r5 kernel layout flip — the
        # outer traj_bit layout already; xblk transposes back to the
        # XLA-side [P, n, B] convention (fused transpose, HBM-level)
        state["traj_bit"] = jax.lax.dynamic_update_slice(
            state["traj_bit"], bits, (t0, 0, 0))
        return _write_dec(state, 1, t0, jnp.moveaxis(xblk, 0, 1))

    # ---------------- decode ----------------

    def decode(llrs: jnp.ndarray) -> DecodeResult:
        bsz = llrs.shape[0]
        lam0 = llrs.T.astype(llr_dtype)
        iota = _iota_pb(bsz)
        pm0 = jnp.zeros((P, bsz), jnp.float32)
        if P > 1:
            pm0 = pm0.at[1:].set(BIG)
        state = {
            "lam0": lam0,
            "lam": tuple(jnp.zeros((P, n_sizes[s], bsz), llr_dtype)
                         for s in range(1, m + 1)),
            "dec": tuple(jnp.zeros((factors[s - 1], P, n_sizes[s], bsz),
                                   jnp.int8) for s in range(1, m + 1)),
            "rlam": tuple(iota for _ in range(m)),
            "rdec": tuple(jnp.broadcast_to(
                iota[None], (factors[s - 1], P, bsz)).astype(jnp.int32)
                for s in range(1, m + 1)),
            "pm": pm0,
            "traj_bit": jnp.zeros((N, P, bsz), jnp.int8),
        }
        if unroll:
            state["traj_perms"] = ()
            # trace-time fork-epoch bookkeeping (see _apply_perm)
            state["epoch"] = 0
            state["lam_ep"] = tuple(-1 for _ in range(m))
            state["dec_ep"] = tuple(tuple(-1 for _ in range(factors[s]))
                                    for s in range(m))
        else:
            state["traj_parent"] = jnp.zeros((N, P, bsz), jnp.int8)

        if unroll:
            # straight-line trace of the static op program: all indices
            # derived from t0 are compile-time constants, XLA fuses freely
            if merged_items is not None:
                for item in merged_items:
                    if item[0] == "op":
                        jj = item[1]
                        state = branches[int(op_code_np[jj])](
                            state, int(op_t0_np[jj]))
                    else:
                        state = _subtree_item(state, item[1], item[2],
                                              item[3])
            else:
                for j in range(n_ops):
                    state = branches[int(op_code_np[j])](
                        state, int(op_t0_np[j]))
        else:
            def body(j, st):
                return jax.lax.switch(jnp.asarray(op_code_np)[j], branches,
                                      st, jnp.asarray(op_t0_np)[j])

            state = jax.lax.fori_loop(0, n_ops, body, state)

        if unroll:
            return scl_epilogue(spec, P, state["traj_perms"],
                                state["traj_bit"], state["pm"], genie=genie)
        def bt(p_state, xs):
            par_t, bit_t = xs
            bit = jnp.take_along_axis(bit_t, p_state, axis=0)
            p_next = jnp.take_along_axis(par_t.astype(jnp.int32),
                                         p_state, axis=0)
            return p_next, bit

        _, bits_rev = jax.lax.scan(
            bt, iota,
            (state["traj_parent"][::-1], state["traj_bit"][::-1]))
        u_all = bits_rev[::-1]                             # [N, P, B]
        payload_all = u_all[jnp.asarray(info_pos_np)]
        return finalize(spec, P, u_all, payload_all, state["pm"])

    return decode


def build_sc_decoder(spec: CodeSpec):
    """Plain SC = SCL with list_size 1 (SURVEY.md: SCL(L=1) ≡ SC)."""
    return build_scl_decoder(spec, 1)
