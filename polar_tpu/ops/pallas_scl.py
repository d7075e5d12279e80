"""Pallas TPU mega-kernel SCL decoder: one kernel per batch tile, state
resident in VMEM for the entire decode.

Motivation (ARCHITECTURE.md §1b, §8): the unrolled XLA decoder is
dispatch/HBM-bound — every one of the ~316 program ops is a separate
fusion whose inputs and outputs round-trip HBM. This kernel runs the whole
fast-SSCL op program (ops/program.py) inside a single `pallas_call`: per
128-lane batch tile, all per-stage LLR/decision buffers live in VMEM
(~15 MB for N=1024, L=8 select mode since the r5 [n, P, BT] flip), every
op is straight-line VPU code, and only the channel LLRs (in) and the
best path's u/meta (out) touch HBM.

Replaces the reference's per-codeword C++ `ListDecoder` recursion
(SURVEY.md C9, §3.4; mount empty, §0) at the other end of the design
space: batch-lockstep, static schedule, sort-free top-L.

TPU-specific choices:
- **Rank-select instead of sort** for the 2L->L fork: candidate c's rank =
  #{c' : metric smaller, ties by index} computed with 2L-1 sublane rolls;
  survivors extracted by one-hot sums. Bit-identical to `lax.top_k` on
  negated metrics (survivors sorted by (metric, candidate index)).
- **No argmin**: least-reliable positions come from (min, first-match-min)
  reduction pairs, ties to the lowest index, matching ops/scl.py exactly.
- **Native sublane path gathers** (r5): all per-stage state lives in
  [n, P, BT] layout — the list axis P sits in SUBLANES, so every
  path gather (survival rebinds, decision reads, map composition) is a
  per-register `tpu.dynamic_gather` (`jnp.take_along_axis` on the
  [P, BT] trailing dims), ONE hardware op per (8,128) register instead
  of the r4 one-hot select+sum's ~3P ops. Leading-dim n slices/concats
  are whole-register renames, so the f/g butterflies stay free.
- **Trace-time fork epochs** (ops/scl.py `_apply_perm`): reads of buffers
  written since the last fork skip the gather entirely.

- **BCH / mixed kernels** (SURVEY.md C5; BASELINE north star "trellis-
  based processing for large BCH kernels"): l>2 DOWN ops run in-kernel.
  Small inputs i use a *syndrome trellis* min-plus pass — states are a
  Python list of [2, P, n, BT] arrays, so the bit-1 transition (XOR of
  the state index by the position's syndrome column) is a free trace-time
  relabeling and each section is 3 VPU ops per state; float-identical to
  the XLA minimal-trellis scan (kernels/trellis.syndrome_min_cost).
  Large i use the tail-coset max-correlation with the same fixed-order
  pairwise tree contraction as the XLA path (ops/kernel_proc.tree_corr)
  — Mosaic and XLA evaluate the same expression DAG, so the backends
  stay bit-identical. The per-input backend split mirrors
  kernel_proc.StageProcessor exactly.

Practical envelope: the whole decode state must fit VMEM per batch tile,
so very large (P, n) combinations of BCH stages (e.g. mixed N=4096 L=32)
exceed the tile budget — those run on the XLA path. Outputs feed the same
genealogy-backtrack + CRC-selection epilogue as the XLA path, shared via
`scl_epilogue`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.program import build_program, staged_inverse_kernels

BIG = np.float32(1e30)
INF = np.float32(3e38) / 4          # kernels/trellis.INF (min-plus padding)

# Trace-time element-op tally (benchmarks/kernel_opcount.py). When set to a
# dict, the kernel helpers record their exact VPU element-op counts per
# (program-op kind, helper) bucket while the kernel traces — shapes are
# static, so the counts are exact for the emitted expression DAG. This is
# the repo's non-XLA-proxied speed-of-light accounting (VERDICT r3 weak 2):
# unlike XLA's cost_analysis "flops", it counts where/select/cmp/roll ops
# the way Mosaic actually executes them. None (default) = zero overhead.
_TALLY: dict | None = None


def _tln(helper: str, n) -> None:
    if _TALLY is not None:
        key = (_TALLY.get("ctx", "?"), helper)
        c = _TALLY.setdefault("counts", {})
        c[key] = c.get(key, 0) + int(n)
_TERM_BUDGET = 8 * 1024 * 1024      # max bytes per table-correlation chunk
VMEM_BUDGET = 20 * 2**20            # ~VMEM/core is 16 MiB (pallas_guide.md)
# but Mosaic's scoped allocation tolerates modest oversubscription: the
# r5 flagship select kernel (15.4 MiB nominal) compiles and runs; bt=256
# and mixed_scl32 bt=128 (46+ MiB) die in Mosaic scratch allocation.


def vmem_footprint(spec: CodeSpec, list_size: int, batch_tile: int,
                   Q: int, mc: bool = False, counters: bool = False,
                   select: bool = False, subtree: bool = False,
                   nz_rows: int | None = None) -> dict:
    """Exact bytes of the kernel's VMEM-resident blocks at one batch tile
    (mirrors scratch_shapes + block specs below). Q = number of
    trajectory spans (len of `spans` returned by build_pallas_scl_kernel).
    The r3 rmaps scratch is gone (path->slot maps are lazy trace-time
    values now, a few [P, BT] i32 live temporaries). mc/counters adjust
    the io term to each variant's actual blocks (ADVICE r3)."""
    P, BT = int(list_size), int(batch_tile)
    m = len(spec.factors)
    ns = spec.block_sizes
    lam = sum(P * ns[s] * BT * 4 for s in range(1, m + 1))
    # dec is f32 [l, n, P, BT] since the r5 layout flip: 0/1 values are
    # consumed as f32 everywhere, and an i8 store would pad 4x anyway
    # ((32,128) i8 tiling vs P<=32 sublanes) while adding relayouts
    dec = sum(4 * spec.factors[s - 1] * P * ns[s] * BT
              for s in range(1, m + 1))
    W = spec.crc.width if ((mc or select) and spec.crc is not None) else 0
    W8 = max(8, W)
    if counters:
        io = 8 * BT * 4                       # counter out-block only
    elif subtree:
        io = (P * spec.N * BT * 4             # lam in-block
              + 2 * P * spec.N * BT           # bits + x out-blocks (i8)
              + Q * P * BT * 4                # perms out-block
              + 3 * P * BT * 4)               # pm in + net/pm out
    elif select:
        nzr = spec.N if nz_rows is None else int(nz_rows)
        io = (spec.N * BT * 4                 # llr in-block
              + spec.N * BT + 8 * BT * 4      # u + meta out-blocks
              + nzr * P * BT * 4)             # traj-bit scratch (f32,
        #                       not-all-frozen span rows only since r5)
        if W:
            io += W8 * nzr * 4 + W8 * 128 * 4       # gsel + off in-blocks
    else:
        io = (spec.N * P * BT                 # traj_bit out-block (i8)
              + Q * P * BT * 4                # traj_perm out-block
              + P * BT * 4)                   # pm out-block
        if mc:
            io += spec.N * BT                 # u_true out-block (i8)
    if mc:
        io += spec.N * 128 * 4                # data-mask in-block
        if spec.N * spec.N * 2 <= 4 * 2**20:
            io += spec.N * spec.N * 2         # MXU-encode generator (bf16)
        if W:
            io += W8 * spec.N * 4 + W8 * 128 * 4    # gext + off in-blocks
        if counters and W:
            io += W8 * P * BT * 4             # crc_acc live accumulator
    else:
        io += spec.N * BT * 4                 # llr in-block
    return {"lam": lam, "dec": dec, "io": io,
            "total": lam + dec + io}


class _BigStage:
    """Host-side metadata for an l>2 kernel stage, mirroring
    ops/kernel_proc.StageProcessor's backend split input-for-input."""

    def __init__(self, kernel: np.ndarray):
        from polar_tpu.kernels.trellis import tail_trellis, tail_syndrome_cols

        self.kernel = np.asarray(kernel, np.uint8)
        self.l = int(kernel.shape[0])
        kb = self.kernel.tobytes()
        self.backend, self.syn = [], []
        for i in range(self.l):
            tr = tail_trellis(kb, self.l, i)
            if tr.s_max ** 2 < (1 << (self.l - 1 - i)):
                self.backend.append("trellis")
                self.syn.append(tail_syndrome_cols(kb, self.l, i))
            else:
                self.backend.append("table")
                self.syn.append(None)


class _Dead:
    """Sentinel: a path->slot map invalidated by liveness analysis (the
    buffer will be rewritten before its next read, so no fork needs to
    keep its map current). Reading through it is a liveness bug."""

    def __repr__(self):
        return "<dead map>"


_DEAD = _Dead()


def _map_liveness(program, factors, digits_np, m, subtree=False):
    """Static liveness of the per-buffer path->slot maps.

    For each buffer (lam[s] / dec[s][j]) and op index k, live[k] is True
    iff the next access of that buffer at an op > k is a READ (so a fork
    inside op k must keep the buffer's map composed) and False if it is a
    WRITE or there is none (the map may be dropped at the fork). Node-op
    reads of their own input lam happen before any fork of the same op,
    so only strictly-later ops matter — which is exactly what "op > k"
    encodes. Returns (live_lam [m][n_ops], live_dec [m][l][n_ops])."""
    n_ops = len(program.ops)
    lam_ev = [dict() for _ in range(m)]          # op_idx -> 'r'|'w'
    dec_ev = [[dict() for _ in range(factors[s])] for s in range(m)]
    for k, op in enumerate(program.ops):
        kind, s, t0 = op.kind, op.level, op.t0
        if kind in ("DOWN_FRESH", "DOWN_DYN"):
            if s >= 2:
                lam_ev[s - 2][k] = "r"
            if kind == "DOWN_DYN":
                i = int(digits_np[t0, s - 1])
                for j in range(i if factors[s - 1] > 2 else 1):
                    dec_ev[s - 1][j][k] = "r"
            lam_ev[s - 1][k] = "w"
        elif kind == "UP":
            for j in range(factors[s - 1]):
                dec_ev[s - 1][j][k] = "r"
            dec_ev[s - 2][int(digits_np[t0, s - 2])][k] = "w"
        else:                                    # R0/REP/R1/SPC/LEAF
            lam_ev[s - 1][k] = "r"
            dec_ev[s - 1][int(digits_np[t0, s - 1])][k] = "w"

    def scan(ev, tail_read=False):
        out = np.zeros(n_ops, np.bool_)
        # tail_read: the buffer is read after the whole program (subtree
        # mode's root re-encode reads every dec[0][j] at the end)
        state = bool(tail_read)
        for j in range(n_ops - 1, -1, -1):
            e = ev.get(j)
            # A fork inside op j runs after op j's reads but before its
            # write: an own-op write kills the map; an own-op read does
            # not need it kept.
            out[j] = False if e == "w" else state
            if e is not None:
                state = e == "r"
        return out

    return ([scan(lam_ev[s]) for s in range(m)],
            [[scan(dec_ev[s][j], tail_read=subtree and s == 0)
              for j in range(factors[s])]
             for s in range(m)])


def _traj_ops(program):
    """(t0, n) spans of ops that decide bits (leaf order)."""
    kinds = {"R0", "REP", "R1", "SPC", "LEAF"}
    return [(op.t0, op.level, op.kind) for op in program.ops
            if op.kind in kinds]


def build_pallas_scl_kernel(spec: CodeSpec, list_size: int,
                            batch_tile: int = 128, interpret: bool = False,
                            mc: bool = False, counters: bool = False,
                            select: bool = False, mc_noise: bool = False,
                            subtree: bool = False):
    """Returns core(llrs [B, N] f32) -> (traj_bit [N, P, B] i8,
    traj_perm [Q, P, B] i32, pm [P, B] f32, spans) — the decode front end;
    feed to `scl_epilogue`. B must be a multiple of batch_tile.

    mc=True builds the *fused Monte-Carlo* variant instead: the kernel
    generates random info bits (pltpu PRNG), computes the CRC (one MXU
    matmul against the u-domain-extended generator matrix — no gathers),
    Kronecker-encodes, adds AWGN (Box-Muller) and forms channel LLRs
    entirely in VMEM, then runs the same decode body. Signature:
    core(seed i32 [2], sigma f32 [1,1], B) -> (traj_bit, traj_perm, pm,
    u_true [N, B] i8). The decode path is untouched (bit-identical);
    only the source of the LLRs changes, so FER statistics are the
    contract, per-frame equality with the XLA harness is not (different
    PRNG streams).

    counters=True (requires mc) goes further: NO genealogy/trajectory is
    emitted at all. Per-path CRC syndromes and info-bit-error counts are
    accumulated *during* the decode — each fork's survival permutation
    rebinds the tiny [W, P, BT]/[P, BT] accumulators alongside the
    existing index maps, so the final CRC check, best-path selection and
    error counting happen in-kernel and the kernel's only output is an
    [8, B] i32 counter block (rows: frame-error flag, bit errors).
    Signature: core(seed, sigma, B) -> counters [8, B] i32. This is the
    harness hot path: it eliminates the XLA epilogue and all traj HBM
    traffic. Equality with the full mode's XLA-epilogue counts is pinned
    by tests/test_pallas_mc.py.

    select=True (decode variant, r4): the genealogy backtrack, per-path
    CRC check, and best-path selection ALL run in-kernel at the end of
    the decode — trajectory bits go to a VMEM scratch (never HBM), the
    suffix permutation compositions are 2Q tiny [P, BT] gathers (same
    math as scl_epilogue's associative scan), the CRC is one MXU matmul
    per unfrozen span against the u-domain-extended generator, and the
    kernel's only outputs are the best path's u [N, B] i8 plus an
    [8, B] meta block (rows: pm_best, crc_ok). Replaces the XLA
    epilogue (~22%% of decode wall at r3's shapes) and shrinks HBM out
    from N*P + 4*Q*P to N + 32 bytes/codeword. Signature:
    core(llrs [B, N] f32) -> (u [N, B] i8, meta [8, B] f32)."""
    assert mc or not counters, "counters mode requires mc=True"
    assert not (mc and select), "select mode is the plain-decode variant"
    assert mc or not mc_noise, "mc_noise requires mc=True"
    assert not (subtree and (mc or select)), "subtree is its own variant"
    # subtree=True: the kernel decodes `spec` as a SUB-code whose parent
    # stage lives outside (ops/scl.py subtree_backend="pallas"): input is
    # the parent-computed LLR block lam [P, N, B] (path-bound, current
    # indexing; transposed to the in-kernel [N, P, B] layout XLA-side)
    # + path metrics pm [P, B]; outputs are the per-span u bits
    # [N, P, B] i8 in post-op indexing, the per-op survival perms
    # [Q*P, B] i32 (ordinary traj entries for the outer epilogue's
    # associative scan), the NET survival permutation [P, B] (one outer
    # _apply_perm == the in-kernel fork sequence), the re-encoded root
    # decision block x [N, P, B] i8 (what the outer UP would produce),
    # and pm' [P, B]. The sub-program's node classification and fork
    # order are identical to the corresponding span of the full-tree
    # program, so the composition is bit-exact vs the XLA decoder. This
    # collapses each depth-1 subtree of configs too big for the full
    # mega-kernel (mixed N=4096 L=32) into ONE dispatch.
    # mc_noise=True adds a channel-noise INPUT [N, B] f32 consumed in
    # place of the in-kernel Box-Muller draw (ADVICE r3: the TPU-semantics
    # interpreter's PRNG is constant, so CPU tests of the counters path
    # otherwise never see a frame error). Signature gains a trailing
    # noise argument: core(seed, sigma, B, noise).
    P = int(list_size)
    m = len(spec.factors)
    N = spec.N
    n_sizes = spec.block_sizes
    factors = spec.factors
    l_max = max(factors)
    kernels_np = [np.asarray(k, np.uint8) for k in spec.kernels]
    program = build_program(spec, scl=(P > 1), classify=True,
                            fast_r1_scl=True)
    digits_np = np.asarray(build_digits(spec))
    frozen_np = spec.frozen.astype(np.bool_)
    spans = [(t0, n_sizes[lvl]) for (t0, lvl, _) in _traj_ops(program)]
    Q = len(spans)
    BT = int(batch_tile)

    # batch_tile > 128 dies in Mosaic's ApplyVectorLayoutPass
    # (vector_extract_rule -> Array::Slice "limits[i] <= dim(i) (2 vs 1)",
    # measured on chip 2026-08-20, see RESULTS.md): kernel blocks spanning
    # two lane-tiles hit an unimplemented extract-slice layout, regardless
    # of VMEM footprint. Fail informatively at build time.
    if BT > 128 and not interpret:
        raise ValueError(
            f"batch_tile={BT} > 128 is rejected by Mosaic's vector layout "
            "pass (extract-slice across >1 lane-tile); use batch_tile=128")

    # VMEM envelope guard (VERDICT r2 item 5): fail informatively at build
    # time instead of deep inside Mosaic scratch allocation. Interpret mode
    # runs on host memory, so the envelope does not apply there.
    nz_early = sum(n for (t0, n) in spans
                   if not frozen_np[t0:t0 + n].all())
    fp = vmem_footprint(spec, P, BT, Q, mc=mc, counters=counters,
                        select=select, subtree=subtree, nz_rows=nz_early)
    if fp["total"] > VMEM_BUDGET and not interpret:
        raise ValueError(
            f"pallas SCL kernel for (N={spec.N}, L={P}, batch_tile={BT}) "
            f"needs {fp['total'] / 2**20:.1f} MiB of VMEM per tile "
            f"(budget ~{VMEM_BUDGET / 2**20:.0f} MiB; breakdown MiB: "
            + ", ".join(f"{k}={v / 2**20:.1f}" for k, v in fp.items()
                        if k != "total")
            + ") — use backend='xla', a smaller list size, or a smaller "
            "batch_tile")

    live_lam, live_dec = _map_liveness(program, factors, digits_np, m,
                                       subtree=subtree)
    big = {s: _BigStage(kernels_np[s - 1]) for s in range(1, m + 1)
           if factors[s - 1] > 2}
    inv_kernels = ([k.astype(np.uint8) for k in staged_inverse_kernels(spec)]
                   if big else None)

    # ---- fused-MC / select constants (host-side numpy, become kernel
    # INPUTS — Pallas kernels cannot capture array constants) -----------
    W = spec.crc.width if ((mc or select) and spec.crc is not None) else 0
    W8 = max(8, W)                    # sublane-pad the CRC matmul rows
    if mc or select:
        info_pos = np.asarray(spec.info_positions)
        crc_pos = info_pos[spec.K:] if W else np.zeros(0, np.int64)
        data_pos = info_pos[:spec.K] if W else info_pos
        # 1.0 at positions that carry fresh random bits (info slots)
        data_mask_np = np.zeros((N, 128), np.float32)
        data_mask_np[data_pos] = 1.0
        if W:
            # u-domain-extended CRC generator: crc_w = sum_pos gext[w,pos]
            # * u[pos] (mod 2) — one [W, N] @ [N, BT] MXU matmul instead
            # of gathering the K info rows (gathers serialize on TPU)
            g_np = spec.crc.generator_matrix(spec.K).astype(np.float32)
            gext_np = np.zeros((W8, N), np.float32)
            gext_np[:W, data_pos] = g_np.T
            # self-columns at the crc positions: harmless for generation
            # (u's crc rows are still zero at matmul time) and they make
            # the counters-mode syndrome exactly "computed == stored":
            # (G_data·u + u[crc_pos] + off) mod 2 == 0
            gext_np[np.arange(W), crc_pos] += 1.0
            off_np = np.zeros((W8, 128), np.float32)
            off_np[:W] = spec.crc.offset_bits(spec.K).astype(
                np.float32)[:, None]
    if select:
        # traj-bit scratch stores ONLY the not-all-frozen spans (frozen
        # spans decode to zeros and are reconstructed as such): scr_off
        # maps span index q -> row offset in the packed scratch. The
        # packed order equals the gext column order, so the CRC stays
        # ONE matmul against gsel below.
        frozen_for_cols = spec.frozen.astype(np.bool_)
        scr_off, NZ = {}, 0
        for q_i, (t0, n) in enumerate(spans):
            if not frozen_for_cols[t0:t0 + n].all():
                scr_off[q_i] = NZ
                NZ += n
        if W:
            # gext columns for the concatenated unfrozen traj spans (leaf
            # order == span order): the select epilogue's CRC is ONE
            # matmul against this matrix
            sel_cols = np.concatenate([
                np.arange(t0, t0 + n) for (t0, n) in spans
                if not frozen_for_cols[t0:t0 + n].all()])
            gsel_np = gext_np[:, sel_cols]
            assert len(sel_cols) == NZ
    # Kronecker encode as ONE MXU matmul against the host-precomputed
    # generator (r4): the stagewise in-kernel butterfly emits ~nnz(K)
    # chained VPU ops per stage, and for l=16 stages with post=1 those
    # run on 1-sublane slices (1/8 vreg utilization + relayouts) —
    # measured 3x slowdown of the whole fused bch_sc step. 0/1 products
    # are exact in bf16; accumulation is f32 (sums <= N << 2^24); mod 2
    # restores GF(2). Gated by generator size (bf16 bytes) fitting VMEM.
    MXU_ENC = mc and (N * N * 2 <= 4 * 2**20)
    if MXU_ENC:
        g_full = np.eye(1, dtype=np.uint8)
        for kk in kernels_np:
            g_full = np.kron(g_full, kk) & 1
        genc_np = g_full.T.astype(jnp.bfloat16)     # x = G^T @ u

    def kernel(*refs):
        lam_in_ref = pm_in_ref = bits_ref = perms_ref = None
        netp_ref = x_ref = None
        if mc:
            if W:
                fro_ref, gext_ref, off_ref, seed_ref, sig_ref = refs[:5]
                rest = refs[5:]
            else:
                fro_ref, seed_ref, sig_ref = refs[:3]
                rest = refs[3:]
            noise_ref = genc_ref = None
            if MXU_ENC:
                genc_ref, rest = rest[0], rest[1:]
            if mc_noise:
                noise_ref, rest = rest[0], rest[1:]
            if counters:
                cnt_ref = rest[0]
                bit_ref = perm_ref = pm_ref = utrue_ref = None
                scratch = rest[1:]
            else:
                bit_ref, perm_ref, pm_ref, utrue_ref = rest[:4]
                scratch = rest[4:]
            llr_ref = None
        elif subtree:
            (lam_in_ref, pm_in_ref, bits_ref, perms_ref, netp_ref,
             x_ref, pm_ref) = refs[:7]
            scratch = refs[7:]
            llr_ref = bit_ref = perm_ref = None
        elif select:
            if W:
                llr_ref, gsel_ref, off_ref, u_ref, meta_ref = refs[:5]
                scratch = refs[5:]
            else:
                llr_ref, u_ref, meta_ref = refs[:3]
                scratch = refs[3:]
            bit_ref = perm_ref = pm_ref = None
        else:
            llr_ref, bit_ref, perm_ref, pm_ref = refs[:4]
            scratch = refs[4:]

        # ---- fused-MC prologue: RNG -> CRC -> encode -> AWGN -> LLRs ---
        chan_llr = None
        if mc:
            # two independent 32-bit key words (a single word
            # birthday-collides across the 1e4-1e5 dispatches of a long
            # sweep, silently replaying whole batches, ADVICE r3); Mosaic
            # caps prng_seed at 2 scalars, so the tile index rides word 0
            # via a golden-ratio stride (distinct per tile, and the
            # 64-bit (word0, word1) state keeps collisions negligible)
            pltpu.prng_seed(
                seed_ref[0, 0]
                + pl.program_id(0) * jnp.int32(-1640531527),
                seed_ref[0, 1])

            def _u24(bits):        # top-24 uniform bits as f32 in [0, 2^24)
                ub = jax.lax.bitcast_convert_type(bits, jnp.uint32)
                sh = jax.lax.shift_right_logical(ub, jnp.uint32(8))
                # Mosaic has no u32->f32 cast; the 24-bit value is
                # non-negative, so reinterpret as i32 first
                return jax.lax.bitcast_convert_type(
                    sh, jnp.int32).astype(jnp.float32)

            b0 = pltpu.prng_random_bits((N, BT))
            lsb = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(b0, jnp.uint32)
                & jnp.uint32(1), jnp.int32).astype(jnp.float32)
            u_true = lsb * fro_ref[:, :BT]
            if W:
                cw = jax.lax.dot_general(
                    gext_ref[:], u_true, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cw = jnp.mod(cw + off_ref[:, :BT], 2.0)      # [W8, BT]
                iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
                for w in range(W):
                    u_true = jnp.where(iota_n == int(crc_pos[w]),
                                       cw[w:w + 1, :], u_true)
            if not counters:
                utrue_ref[:] = u_true.astype(jnp.int8)
            # Kronecker encode x = u · (K_1 ⊗ … ⊗ K_m) over GF(2):
            # one MXU matmul against the precomputed generator when it
            # fits VMEM (see MXU_ENC above), else the stagewise butterfly
            # on 0/1 f32 (XOR = |a-b|) — both identical GF(2) results to
            # ops/encode.encode_u's tensordot chain
            if MXU_ENC:
                x = jnp.mod(jax.lax.dot_general(
                    genc_ref[:], u_true.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), 2.0)
            else:
                x = u_true
                pre = 1
                for s in range(m):
                    lf = factors[s]
                    post = N // (pre * lf)
                    t = x.reshape(pre, lf, post, BT)
                    cols = []
                    for a in range(lf):
                        par = None
                        for j in range(lf):
                            if kernels_np[s][j, a]:
                                xj = t[:, j:j + 1]
                                par = (xj if par is None
                                       else jnp.abs(par - xj))
                        cols.append(par if par is not None
                                    else jnp.zeros_like(t[:, 0:1]))
                    x = jnp.concatenate(cols, axis=1).reshape(N, BT)
                    pre *= lf
            # BPSK-AWGN channel + LLRs (sim/channel.py conventions):
            # Box-Muller, using BOTH outputs of each (u1, u2) pair — the
            # transcendentals (log/sqrt/cos/sin are multi-op polynomial
            # lowerings on the VPU) dominate the prologue, and pairing
            # halves the log+sqrt count
            sigma = sig_ref[0, 0]
            if mc_noise:
                gauss = noise_ref[:]
            else:
                Nh = N // 2
                u1 = (_u24(pltpu.prng_random_bits((Nh, BT))) + 1.0) * \
                    jnp.float32(2.0 ** -24)                   # (0, 1]
                u2 = _u24(pltpu.prng_random_bits((Nh, BT))) * \
                    jnp.float32(2.0 ** -24)                   # [0, 1)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                th = jnp.float32(2.0 * np.pi) * u2
                gauss = jnp.concatenate([r * jnp.cos(th),
                                         r * jnp.sin(th)], axis=0)
            y = (1.0 - 2.0 * x) + sigma * gauss
            chan_llr = (2.0 / (sigma * sigma)) * y
        lam = list(scratch[:m])                 # lam[s]: [n_{s+1}, P, BT] f32
        dec = list(scratch[m:2 * m])    # dec[s]: [l_s, n_{s+1}, P, BT] f32
        bit_scr = scratch[2 * m] if select else None   # [NZ, P, BT] f32

        iota_p = jax.lax.broadcasted_iota(jnp.int32, (P, BT), 0)
        iota2p = jax.lax.broadcasted_iota(jnp.int32, (2 * P, BT), 0)

        # ---- trace-time mutable decode context ------------------------
        # Path->slot maps are lazy trace-time VALUES (r4), not VMEM
        # scratch: None == identity (buffer untouched by forks since its
        # write), _DEAD == invalidated by liveness (rewritten before its
        # next read). apply_perm composes only the live, non-uniform,
        # non-identity maps — buffers written in the same inter-fork
        # window share one map object, so the composition is computed
        # once per distinct map (id()-cached), not once per buffer.
        ctx = {
            # .at[].set lowers to an (unsupported) scatter in Mosaic —
            # express all masked writes as where() on an iota instead
            "pm": pm_in_ref[:] if subtree
            else (jnp.where(iota_p == 0, 0.0, BIG)
                  if P > 1 else jnp.zeros((P, BT), jnp.float32)),
            # trace-time: True when pm is sorted ascending by (value,
            # path index) — every fork2 output is; per-path additions
            # (R0, frozen leaves, SPC parity fix) clear it. Lets R1/SPC
            # round-0 forks use fork2_sorted too when it still holds.
            "pm_sorted": not subtree,   # [0, BIG, ..., BIG] is sorted
            "rlam": [None] * m,
            "rdec": [[None] * factors[s] for s in range(m)],
            "op_idx": 0,
            # trace-time uniformity: True when a buffer's P rows are
            # bit-identical (fresh-descent LLR chains from the channel,
            # R0 all-zero decisions, UPs of uniform children) — any path
            # gather of such a buffer is the identity, so reads skip the
            # one-hot pgather entirely even across fork epochs (r4)
            "lam_uni": [False] * m,
            "dec_uni": [[False] * factors[s] for s in range(m)],
            "q": 0,
            "traj": [],       # select mode: (t0, n, perm) per traj op
            # subtree mode: current-path -> kernel-entry index map (the
            # net survival perm so far). The parent-computed lam input is
            # PATH-BOUND at entry, so every stage-1 DOWN after a fork
            # must gather it through this map — unlike the channel
            # input, which is path-invariant.
            "netmap": None,
        }
        if counters:
            # per-path CRC syndrome + info-bit-error accumulators: they
            # ride along the fork permutations (rebound in apply_perm),
            # so no genealogy is needed to count errors at the end
            if W:
                ctx["crc_acc"] = jnp.zeros((W8, P, BT), jnp.float32)
            ctx["be_acc"] = jnp.zeros((P, BT), jnp.float32)

        def pgather(x, idx):
            """x [..., P, BT], idx [P, BT] -> y[..., p, b] = x[..., idx
            [p, b], b]. The P axis lives in SUBLANES (r5 layout), so a
            2-D take_along_axis lowers to one native tpu.dynamic_gather
            per (8,128) register; leading dims are whole-register
            slices. Replaces the r4 one-hot select+sum (~3P ops/reg)."""
            _tln("pgather", np.prod(x.shape))
            if x.ndim == 2:
                return jnp.take_along_axis(x, idx, axis=0,
                                           mode="promise_in_bounds")
            return jnp.stack([
                jnp.take_along_axis(x[j], idx, axis=0,
                                    mode="promise_in_bounds")
                for j in range(x.shape[0])])

        def apply_perm(perm):
            if _TALLY is not None:
                _TALLY["ctx"] = _TALLY.get("ctx", "?") + "/apply_perm"
            cache = {}

            def upd(mp):
                if mp is None:          # identity at fork time -> perm
                    return perm
                key = id(mp)
                if key not in cache:
                    cache[key] = pgather(mp, perm)
                return cache[key]

            k = ctx["op_idx"]
            for s in range(m):
                if ctx["lam_uni"][s]:
                    continue
                ctx["rlam"][s] = (upd(ctx["rlam"][s]) if live_lam[s][k]
                                  else _DEAD)
            for s in range(m):
                for j in range(factors[s]):
                    if ctx["dec_uni"][s][j]:
                        continue
                    ctx["rdec"][s][j] = (upd(ctx["rdec"][s][j])
                                         if live_dec[s][j][k] else _DEAD)
            if subtree:
                ctx["netmap"] = (perm if ctx["netmap"] is None
                                 else pgather(ctx["netmap"], perm))
            if counters:
                if W:
                    # crc_acc [W8, P, BT]: P already in sublanes
                    ctx["crc_acc"] = pgather(ctx["crc_acc"], perm)
                ctx["be_acc"] = pgather(ctx["be_acc"], perm)
            if _TALLY is not None:
                _TALLY["ctx"] = _TALLY["ctx"].rsplit("/", 1)[0]

        def fork2(pm, pen0, pen1):
            """Exact lax.top_k(-cand, P) equivalent via rank select.
            Returns (pm' [P,BT], perm [P,BT] i32, bit [P,BT] i8).

            Candidate c's rank = #{c': cand[c'] < cand[c], ties by lower
            index} — a strict total order, so compares are antisymmetric:
            L_d[c] := [cand[c+d] before cand[c]] satisfies
            L_{2P-d}[c] = 1 - L_d[c-d] = 1 - roll(L_d, d)[c]. Only the P
            offsets d=1..P are compared; the other P-1 come from rolls of
            already-computed masks (r4: halves the rank pass vs the
            2P-1-offset form). Extraction pulls the winning candidate
            INDEX c and metric per rank row; perm/bit are 2-op algebra on
            c (c = perm + P*bit) instead of two more select-sum chains."""
            cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)
            _tln("fork2", (P * 8 + P + (P - 1) * 2) * 2 * P * BT
                 + P * 5 * 2 * P * BT + 8 * P * BT)
            rank = jnp.full((2 * P, BT), P - 1, jnp.int32)
            for d in range(1, P + 1):
                other = pltpu.roll(cand, 2 * P - d, 0)  # other[c]=cand[c+d]
                # index tie-break: oidx=(c+d)%2P < c  <=>  c >= 2P-d
                tie = iota2p >= (2 * P - d)
                less = ((other < cand) | ((other == cand) & tie)
                        ).astype(jnp.int32)
                rank = rank + less
                if d < P:
                    rank = rank - pltpu.roll(less, d, 0)
            return _fork_extract(cand, rank)

        def _fork_extract(cand, rank):
            pm_rows, c_rows = [], []
            candf = iota2p.astype(jnp.float32)
            for p in range(P):
                sel = rank == p
                pm_rows.append(jnp.sum(jnp.where(sel, cand, 0.0), axis=0))
                c_rows.append(jnp.sum(jnp.where(sel, candf, 0.0), axis=0))
            c = jnp.stack(c_rows)                        # [P, BT] f32
            bit = jnp.where(c >= P, 1.0, 0.0)            # bits stay f32:
            # i1 masks cannot be relayouted between the f32 (8,128) and i8
            # (32,128) tilings in Mosaic, so ALL bit math in this kernel is
            # 0.0/1.0 f32 (XOR = |a-b|); int8 only at the ref boundary.
            perm = (c - jnp.float32(P) * bit).astype(jnp.int32)
            return jnp.stack(pm_rows), perm, bit

        def fork2_sorted(pm, pen):
            """fork2(pm, 0, pen) specialized to pm sorted ascending by
            (value, path index) — true for every fork2/fork2_sorted
            OUTPUT, hence for rounds r >= 1 of the R1/SPC keep/flip
            loops. The keep half A = pm is already rank-ordered among
            itself (rank_A = iota + cross-count) and B-half ties always
            lose to A (indices P+j), so every compare runs on [P, BT]
            halves — about half the rank-pass work of the general form.
            Bit-identical to fork2 (same strict total order)."""
            if P == 1:
                return fork2(pm, jnp.zeros_like(pen), pen)
            A, Bc = pm, pm + pen
            half = P // 2
            # Offsets d=1..half are compared; their antisymmetric partners
            # P-d come from rolls. Even P: d=half is self-paired (P-d==d),
            # so no roll at d=half and the identity contributes half-1
            # constant terms -> init P+half-1. Odd P: no self-pair, rolls
            # apply for ALL d=1..half and the identity contributes half
            # constants -> init P+half. (r5: odd-P init/roll fix.)
            n_roll = half - 1 if P % 2 == 0 else half
            _tln("fork2", (P * 5 + 2 * (P - 1)                 # cross
                           + half * 6 + n_roll * 2             # B-internal
                           + 4) * P * BT
                 + P * 5 * 2 * P * BT + 8 * P * BT)
            crossA = crossBr = None
            for d in range(P):
                Bd = Bc if d == 0 else pltpu.roll(Bc, P - d, 0)
                ld = (Bd < A).astype(jnp.int32)   # B[(c+d)%P] beats A[c]
                crossA = ld if crossA is None else crossA + ld
                ldr = ld if d == 0 else pltpu.roll(ld, d, 0)
                crossBr = ldr if crossBr is None else crossBr + ldr
            rank_a = iota_p + crossA
            # rank_B = #{A[j] before B[c]} + #{B[j] before B[c]}; the first
            # term is P - sum_d [B[c] < A[(c+d)%P]] = P - crossBr[c]; the
            # second uses the same offset-halving antisymmetry as fork2.
            init_b = P + half - 1 if P % 2 == 0 else P + half
            rank_b = jnp.full((P, BT), init_b, jnp.int32) - crossBr
            for d in range(1, half + 1):
                other = pltpu.roll(Bc, P - d, 0)   # B[(c+d)%P]
                tie = iota_p >= (P - d)
                less = ((other < Bc) | ((other == Bc) & tie)
                        ).astype(jnp.int32)
                rank_b = rank_b + less
                if d < half or P % 2 == 1:
                    rank_b = rank_b - pltpu.roll(less, d, 0)
            cand = jnp.concatenate([A, Bc], axis=0)
            rank = jnp.concatenate([rank_a, rank_b], axis=0)
            return _fork_extract(cand, rank)

        def defer_flips(perms, flips_raw):
            """Map per-round flip bits to final path indexing (same math
            as ops/scl._defer_flips, sequential trace-time form): flip_r
            is recorded in post-round-r indexing; rounds r+1..q-1 permute
            state by A <- A[perm], so flips_fin[r] = flip_r[suffix_r],
            suffix_r = perm_{r+1}[perm_{r+2}[...perm_{q-1}[p]]]. Replaces
            the r3 online [P, q, BT] flip-matrix permute every round
            (O(q^2 P^2 BT) selects per node) with 2q tiny [P, BT]
            gathers."""
            q = len(perms)
            fin = [None] * q
            suf = None                       # None == identity
            for r in range(q - 1, -1, -1):
                fin[r] = (flips_raw[r] if suf is None
                          else pgather(flips_raw[r], suf))
                if r > 0:
                    suf = (perms[r] if suf is None
                           else pgather(perms[r], suf))
            return fin

        def extract_mins(absl, count):
            """count smallest (val, pos) along axis 0 of [n, P, BT],
            ascending, ties to lowest index (no argmin primitive).
            Leading-axis reductions are pairwise register mins — no
            sublane relayout."""
            n = absl.shape[0]
            _tln("extract_mins", count * 5 * P * n * BT)
            iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, P, BT), 0)
            vals, poss = [], []
            work = absl
            for _ in range(count):
                v = jnp.min(work, axis=0)
                at = jnp.where(work == v[None], iota_col, n)
                pos = jnp.min(at, axis=0)
                vals.append(v)
                poss.append(pos)
                work = jnp.where(iota_col == pos[None], BIG, work)
            return vals, poss

        def dec_child(s, j):
            """Child j decisions [n_s, P, BT] f32 of stage s (1-based)."""
            mp = ctx["rdec"][s - 1][j]
            if mp is None or ctx["dec_uni"][s - 1][j]:
                return dec[s - 1][j]
            assert mp is not _DEAD, f"liveness bug: dec[{s-1}][{j}]"
            return pgather(dec[s - 1][j], mp)

        def write_dec(d, t0, block, uniform=False):
            idx = int(digits_np[t0, d - 1])
            dec[d - 1][idx] = block
            ctx["rdec"][d - 1][idx] = None
            ctx["dec_uni"][d - 1][idx] = bool(uniform)

        def write_traj(t0, n, perm, bits_npb):
            """bits [n, P, BT] in post-op path indexing."""
            q = ctx["q"]
            ctx["q"] = q + 1
            _tln("write_traj", np.prod(bits_npb.shape))
            if counters:
                # accumulate instead of emitting genealogy. Fully-frozen
                # spans (R0, frozen leaves) contribute nothing: their
                # gext columns and fro rows are all zero.
                if bool(frozen_np[t0:t0 + n].all()):
                    return
                if W:
                    g_sl = gext_ref[:, t0:t0 + n]           # [W8, n]
                    ctx["crc_acc"] = ctx["crc_acc"] + jax.lax.dot_general(
                        g_sl, bits_npb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                fro_sl = fro_ref[t0:t0 + n, :BT]            # [n, BT]
                ut_sl = u_true[t0:t0 + n]                   # [n, BT] f32
                d = jnp.abs(bits_npb - ut_sl[:, None, :]) \
                    * fro_sl[:, None, :]
                ctx["be_acc"] = ctx["be_acc"] + jnp.sum(d, axis=0)
                return
            if select:
                # packed [NZ, P, BT] f32 scratch: only not-all-frozen
                # spans are stored (frozen spans reconstruct as zeros);
                # leading-dim slice writes are whole-register stores
                if q in scr_off:
                    o = scr_off[q]
                    bit_scr[o:o + n] = jnp.broadcast_to(
                        bits_npb, (n, P, BT))
                ctx["traj"].append((t0, n, perm))
                return
            if subtree:
                bits_ref[t0:t0 + n] = jnp.broadcast_to(
                    bits_npb, (n, P, BT)).astype(jnp.int8)
                ctx["traj"].append((t0, n, perm))
                return
            bits = jnp.broadcast_to(bits_npb, (n, P, BT)) \
                .reshape(n * P, BT)             # already (t, p)-major
            perm_ref[q * P:(q + 1) * P] = perm
            bit_ref[t0 * P:(t0 + n) * P] = bits.astype(jnp.int8)

        # ---- ops -------------------------------------------------------
        def tree_fold(terms):
            """Fixed pairwise-tree sum — same order as kernel_proc.tree_corr
            so Mosaic and XLA produce bit-identical correlations."""
            while len(terms) > 1:
                nxt = [terms[k] + terms[k + 1]
                       for k in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            return terms[0]

        def down_big(s, i, prev):
            """l>2 kernel-input-i LLR from the parent view prev
            [l, n, P|1, BT] — mirrors StageProcessor._llr_static op-for-op
            (coset sign folds exact in {0,1}; syndrome trellis float-equal
            to the XLA minimal-trellis scan; table path shares the
            tree_corr expression DAG)."""
            bs = big[s]
            l, n = bs.l, n_sizes[s]
            K = bs.kernel
            if i == 0:
                lam_adj = [prev[k] for k in range(l)]
            else:
                children = [dec_child(s, j) for j in range(i)]  # 0/1 f32
                lam_adj = []
                for k in range(l):
                    par = None
                    for j in range(i):
                        if K[j, k]:
                            par = (children[j] if par is None
                                   else jnp.abs(par - children[j]))
                    lam_adj.append(prev[k] if par is None
                                   else prev[k] * (1.0 - 2.0 * par))
            if i == l - 1:   # single tail codeword: correlation with row i
                return tree_fold([lam_adj[k] * float(K[i, k])
                                  for k in range(l)])
            if bs.backend[i] == "trellis":
                S, cols = bs.syn[i]
                sh = jnp.broadcast_shapes(*(a.shape for a in lam_adj))
                zero = jnp.zeros((2,) + sh, jnp.float32)
                inf = jnp.full((2,) + sh, INF, jnp.float32)
                alpha = [zero if st == 0 else inf for st in range(S)]
                for t in range(l):
                    lam_t = lam_adj[t]
                    flip = lam_t * -1.0 if K[i, t] else lam_t
                    lam_t2 = jnp.stack([jnp.broadcast_to(lam_t, sh),
                                        jnp.broadcast_to(flip, sh)])
                    pen0 = jnp.maximum(-lam_t2, 0.0)
                    pen1 = jnp.maximum(lam_t2, 0.0)
                    c = cols[t]
                    alpha = [jnp.minimum(alpha[st] + pen0,
                                         alpha[st ^ c] + pen1)
                             for st in range(S)]
                cost = alpha[0]                       # [2, ..., n, BT]
                return cost[1] - cost[0]
            # table path: max-correlation over the 2^(l-1-i) tail
            # codewords. Pallas kernels cannot capture array constants, so
            # the +-1 columns are regenerated in-kernel from an iota (bit
            # tests of the message index + parity folds over generator
            # rows) — exactly the column order of kernel_proc._tail_table,
            # and exact +-1.0 values, so the correlations stay
            # bit-identical to the XLA tree_corr path.
            d_free = l - 1 - i
            C = 1 << d_free
            sz = int(np.prod(jnp.broadcast_shapes(
                *(a.shape for a in lam_adj))))
            # budget covers ALL l live terms of the tree_fold, not one:
            # at P=32 the l=16 un-divided form kept 16 x 8 MB alive at
            # once and blew Mosaic's scoped-vmem stack (measured 114 MB
            # vs the 100 MB limit on the mixed_scl32 subtree kernel)
            cc = max(1, min(C, _TERM_BUDGET // max(1, l * sz * 4)))
            corr = [None, None]                       # running max per hyp
            for h in range(2):
                lam_h = (lam_adj if h == 0 else
                         [lam_adj[j] * -1.0 if K[i, j] else lam_adj[j]
                          for j in range(l)])
                for c0 in range(0, C, cc):
                    # message-index axis at the FRONT: lam_h terms are
                    # [n, P|1, BT], the chunk broadcasts to
                    # [cc, n, P|1, BT] and the max reduces axis 0 (max
                    # is exact/commutative, so the axis move keeps the
                    # correlations bit-identical to the XLA tree_corr)
                    msg = jax.lax.broadcasted_iota(
                        jnp.int32, (cc, 1, 1, 1), 0) + c0
                    gbits = [((msg >> g) & 1).astype(jnp.float32)
                             for g in range(d_free)]
                    terms = []
                    for j in range(l):
                        par = None
                        for g in range(d_free):
                            if K[i + 1 + g, j]:
                                par = (gbits[g] if par is None
                                       else jnp.abs(par - gbits[g]))
                        terms.append(
                            lam_h[j][None] if par is None
                            else lam_h[j][None] * (1.0 - 2.0 * par))
                    mx = jnp.max(tree_fold(terms), axis=0)
                    corr[h] = mx if corr[h] is None \
                        else jnp.maximum(corr[h], mx)
            return 0.5 * (corr[0] - corr[1])

        def down(s, t0, fresh):
            l, n = factors[s - 1], n_sizes[s]
            if s == 1:
                if subtree:
                    # parent-computed LLR block: path-BOUND at kernel
                    # entry — reads after in-kernel forks gather through
                    # the accumulated net survival map
                    if ctx["netmap"] is None:
                        prev = lam_in_ref[:]
                    else:
                        prev = pgather(lam_in_ref[:], ctx["netmap"])
                    prev = prev.reshape(l, n, P, BT)
                    prev_uni = False
                else:
                    base = chan_llr if chan_llr is not None else llr_ref[:]
                    prev = base.reshape(l, n, 1, BT)
                    prev_uni = True
            else:
                prev_uni = ctx["lam_uni"][s - 2]
                mp = ctx["rlam"][s - 2]
                if mp is None or prev_uni:
                    prev = lam[s - 2][:]
                else:
                    assert mp is not _DEAD, f"liveness bug: lam[{s-2}]"
                    prev = pgather(lam[s - 2][:], mp)
                prev = prev.reshape(l, n, P, BT)
            if l == 2:
                a, b = prev[0], prev[1]
                _tln("fg", (7 if fresh else 4) * np.prod(a.shape)
                     + P * n * BT)
                if fresh:
                    # exact f_minsum convention: sign(0) == +1 (arikan.py)
                    sgn = jnp.where((a < 0) ^ (b < 0), -1.0, 1.0)
                    out = sgn * jnp.minimum(jnp.abs(a), jnp.abs(b))
                    out_uni = prev_uni
                else:
                    u0 = dec_child(s, 0)
                    out = b + (1.0 - 2.0 * u0) * a
                    out_uni = prev_uni and ctx["dec_uni"][s - 1][0]
            else:
                i = 0 if fresh else int(digits_np[t0, s - 1])
                out = down_big(s, i, prev)
                out_uni = prev_uni and all(ctx["dec_uni"][s - 1][j]
                                           for j in range(i))
            lam[s - 1][:] = jnp.broadcast_to(out, (n, P, BT))
            ctx["rlam"][s - 1] = None
            ctx["lam_uni"][s - 1] = out_uni

        def up(s, t0):
            l = factors[s - 1]
            uni = all(ctx["dec_uni"][s - 1][j] for j in range(l))
            if l == 2:
                u0 = dec_child(s, 0)
                u1 = dec_child(s, 1)
                x = jnp.concatenate([jnp.abs(u0 - u1), u1], axis=0)  # XOR
            else:
                K = kernels_np[s - 1]
                ch = [dec_child(s, j) for j in range(l)]
                cols = []
                for k in range(l):
                    par = None
                    for j in range(l):
                        if K[j, k]:
                            par = ch[j] if par is None \
                                else jnp.abs(par - ch[j])
                    cols.append(par if par is not None
                                else jnp.zeros_like(ch[0]))
                x = jnp.concatenate(cols, axis=0)
            write_dec(s - 1, t0, x, uniform=uni)

        def apply_inverse(d, x):
            """u = x @ (K_{d+1} kron .. kron K_m)^-1 on 0/1 f32 [n, P, BT]
            (kept <= 5-D for Mosaic; same math as ops/scl.py). All n-axis
            reshapes/slices/concats act on LEADING dims — whole-register
            renames under the r5 layout."""
            n = x.shape[0]
            below = factors[d:]
            _tln("apply_inverse", 2 * len(below) * P * n * BT)
            if all(f == 2 for f in below):
                h = n // 2
                while h >= 1:
                    t = x.reshape(n // (2 * h), 2, h, P, BT)
                    x0 = t[:, 0:1]
                    x1 = t[:, 1:2]
                    x = jnp.concatenate([jnp.abs(x0 - x1), x1],
                                        axis=1).reshape(n, P, BT)
                    h //= 2
                return x
            pre = 1
            for ax, s in enumerate(range(d, m)):
                lf = factors[s]
                post = n // (pre * lf)
                t = x.reshape(pre, lf, post, P, BT)
                ki = inv_kernels[s]
                cols = []
                for kk in range(lf):
                    par = None
                    for j in range(lf):
                        if ki[j, kk]:
                            xj = t[:, j:j + 1]
                            par = xj if par is None else jnp.abs(par - xj)
                    cols.append(par if par is not None
                                else jnp.zeros_like(t[:, 0:1]))
                x = jnp.concatenate(cols, axis=1).reshape(n, P, BT)
                pre *= lf
            return x

        def node_r0(d, t0):
            lm = lam[d - 1][:]
            n = n_sizes[d]
            _tln("node_misc", 3 * P * n * BT)
            ctx["pm"] = ctx["pm"] + jnp.sum(jnp.maximum(-lm, 0.0), axis=0)
            ctx["pm_sorted"] = P == 1
            zeros = jnp.zeros((n, P, BT), jnp.float32)
            write_traj(t0, n, iota_p, zeros)
            write_dec(d, t0, zeros, uniform=True)

        def node_rep(d, t0):
            lm = lam[d - 1][:]
            n = n_sizes[d]
            _tln("node_misc", 7 * P * n * BT)
            s0 = jnp.sum(jnp.maximum(-lm, 0.0), axis=0)
            s1 = jnp.sum(jnp.maximum(lm, 0.0), axis=0)
            if P == 1:
                bit = jnp.where(s1 < s0, 1.0, 0.0)
                ctx["pm"] = ctx["pm"] + jnp.minimum(s0, s1)
                perm = iota_p
            else:
                pm, perm, bit = fork2(ctx["pm"], s0, s1)
                apply_perm(perm)
                ctx["pm"] = pm
                ctx["pm_sorted"] = True
            iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, P, BT), 0)
            ubits = jnp.where(iota_col == n - 1, bit[None], 0.0)
            write_traj(t0, n, perm, ubits)
            write_dec(d, t0, jnp.broadcast_to(bit[None], (n, P, BT)))

        def node_r1(d, t0):
            lm = lam[d - 1][:]
            n = n_sizes[d]
            _tln("node_misc", 2 * P * n * BT)
            hd = jnp.where(lm < 0, 1.0, 0.0)
            if P == 1:
                write_traj(t0, n, iota_p, apply_inverse(d, hd))
                write_dec(d, t0, hd)
                return
            q = min(P - 1, n)
            vals, poss = extract_mins(jnp.abs(lm), q)
            node_map = iota_p
            perms, flips_raw = [], []
            pm = ctx["pm"]
            for r in range(q):
                v = pgather(vals[r], node_map)
                if r > 0 or ctx["pm_sorted"]:
                    pm, perm, flip = fork2_sorted(pm, v)
                else:
                    pm, perm, flip = fork2(pm, jnp.zeros_like(v), v)
                node_map = pgather(node_map, perm)
                perms.append(perm)
                flips_raw.append(flip)
            flips_fin = defer_flips(perms, flips_raw)
            xhat = pgather(hd, node_map)
            iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, P, BT), 0)
            _tln("onehot_flip", q * 5 * P * n * BT)
            for r in range(q):
                pos_g = pgather(poss[r], node_map)
                onehot = jnp.where(iota_col == pos_g[None], 1.0, 0.0)
                xhat = jnp.abs(xhat - onehot * flips_fin[r][None])
            apply_perm(node_map)
            ctx["pm"] = pm
            ctx["pm_sorted"] = True
            write_traj(t0, n, node_map, apply_inverse(d, xhat))
            write_dec(d, t0, xhat)

        def node_spc(d, t0):
            lm = lam[d - 1][:]
            n = n_sizes[d]
            _tln("node_misc", 6 * P * n * BT)
            hd = jnp.where(lm < 0, 1.0, 0.0)
            par = jnp.mod(jnp.sum(hd, axis=0), 2.0)      # exact: sum <= n
            absl = jnp.abs(lm)
            iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, P, BT), 0)
            if P == 1:
                vals, poss = extract_mins(absl, 1)
                onehot = jnp.where(iota_col == poss[0][None], 1.0, 0.0)
                xhat = jnp.abs(hd - onehot * par[None])
                ctx["pm"] = ctx["pm"] + vals[0] * par
                ctx["pm_sorted"] = False
                write_traj(t0, n, iota_p, apply_inverse(d, xhat))
                write_dec(d, t0, xhat)
                return
            q = min(P, n - 1)
            vals, poss = extract_mins(absl, q + 1)
            v0 = vals[0]
            pm = ctx["pm"] + par * v0
            eta = par
            node_map = iota_p
            perms, flips_raw = [], []
            for r in range(1, q + 1):
                v_r = pgather(vals[r], node_map)
                v0_g = pgather(v0, node_map)
                pen = v_r + (1.0 - 2.0 * eta) * v0_g
                # r=1's pm carries the per-path parity fix => unsorted
                if r > 1:
                    pm, perm, flip = fork2_sorted(pm, pen)
                else:
                    pm, perm, flip = fork2(pm, jnp.zeros_like(pen), pen)
                node_map = pgather(node_map, perm)
                eta = jnp.abs(pgather(eta, perm) - flip)
                perms.append(perm)
                flips_raw.append(flip)
            flips_fin = defer_flips(perms, flips_raw)
            xhat = pgather(hd, node_map)
            pos0 = pgather(poss[0], node_map)
            onehot0 = jnp.where(iota_col == pos0[None], 1.0, 0.0)
            xhat = jnp.abs(xhat - onehot0 * eta[None])
            _tln("onehot_flip", q * 5 * P * n * BT)
            for r in range(1, q + 1):
                pos_g = pgather(poss[r], node_map)
                onehot = jnp.where(iota_col == pos_g[None], 1.0, 0.0)
                xhat = jnp.abs(xhat - onehot * flips_fin[r - 1][None])
            apply_perm(node_map)
            ctx["pm"] = pm
            ctx["pm_sorted"] = True
            write_traj(t0, n, node_map, apply_inverse(d, xhat))
            write_dec(d, t0, xhat)

        def node_leaf(t):
            lam_leaf = lam[m - 1][:][0]
            pen0 = jnp.maximum(-lam_leaf, 0.0)
            pen1 = jnp.maximum(lam_leaf, 0.0)
            if bool(frozen_np[t]):
                bit = jnp.zeros((P, BT), jnp.float32)
                ctx["pm"] = ctx["pm"] + pen0
                ctx["pm_sorted"] = P == 1
                write_traj(t, 1, iota_p, bit[None])
                write_dec(m, t, bit[None], uniform=True)
                return
            if P == 1:
                bit = jnp.where(lam_leaf < 0, 1.0, 0.0)
                ctx["pm"] = ctx["pm"] + jnp.where(lam_leaf < 0, pen1, pen0)
                perm = iota_p
            else:
                pm, perm, bit = fork2(ctx["pm"], pen0, pen1)
                apply_perm(perm)
                ctx["pm"] = pm
                ctx["pm_sorted"] = True
            write_traj(t, 1, perm, bit[None])
            write_dec(m, t, bit[None])

        # ---- run the static program ------------------------------------
        for oi, op in enumerate(program.ops):
            k, lvl, t0 = op.kind, op.level, op.t0
            ctx["op_idx"] = oi
            if _TALLY is not None:
                _TALLY["ctx"] = f"{k}@{lvl}"
            if k == "DOWN_FRESH":
                down(lvl, t0, True)
            elif k == "DOWN_DYN":
                down(lvl, t0, False)
            elif k == "UP":
                up(lvl, t0)
            elif k == "R0":
                node_r0(lvl, t0)
            elif k == "REP":
                node_rep(lvl, t0)
            elif k == "R1":
                node_r1(lvl, t0)
            elif k == "SPC":
                node_spc(lvl, t0)
            elif k == "LEAF":
                node_leaf(t0)
            else:
                raise ValueError(k)
        assert ctx["q"] == Q
        if subtree:
            # per-op survival perms: ordinary traj entries for the outer
            # epilogue's associative scan (bits stay in post-op indexing)
            for q2, (_, _, perm2) in enumerate(ctx["traj"]):
                perms_ref[q2 * P:(q2 + 1) * P] = perm2
            # net survival perm: A <- A[net] once == the whole in-kernel
            # fork sequence; maintained forward in apply_perm (it also
            # rebinds the lam input)
            netp_ref[:] = (ctx["netmap"] if ctx["netmap"] is not None
                           else iota_p)
            # root re-encode in final path indexing: what the outer UP
            # would produce for this depth-1 child
            l0 = factors[0]
            K0 = kernels_np[0]
            ch = [dec_child(1, j) for j in range(l0)]
            cols = []
            for k2 in range(l0):
                par = None
                for j in range(l0):
                    if K0[j, k2]:
                        par = ch[j] if par is None \
                            else jnp.abs(par - ch[j])
                cols.append(par if par is not None
                            else jnp.zeros_like(ch[0]))
            x_ref[:] = jnp.concatenate(cols, axis=0).astype(jnp.int8)
            pm_ref[:] = ctx["pm"]
            return
        if select:
            # ---- in-kernel epilogue: backtrack + CRC + best-path ------
            # Span q's bits are recorded in post-op-q path indexing; the
            # exclusive suffix composition S_q = perm_{q+1}[...[p]...]
            # maps them to final indexing (same derivation as
            # defer_flips / scl_epilogue's associative scan).
            if _TALLY is not None:
                _TALLY["ctx"] = "EPILOGUE"
            sufs: list = [None] * Q
            suf = None
            ubs = {}
            for qq in range(Q - 1, -1, -1):
                t0, n, perm = ctx["traj"][qq]
                sufs[qq] = suf
                if qq > 0:
                    suf = perm if suf is None else pgather(perm, suf)
                if W and qq in scr_off:
                    o = scr_off[qq]
                    bits = bit_scr[o:o + n]                 # [n, P, BT]
                    ubs[qq] = (bits if sufs[qq] is None
                               else pgather(bits, sufs[qq]))
            if W:
                # ONE MXU matmul over the concatenated unfrozen spans
                # (gsel_ref holds the matching gext columns) instead of a
                # tiny matmul per span
                ub_all = jnp.concatenate(
                    [ubs[qq] for qq in sorted(ubs)], axis=0)
                crc_acc = jax.lax.dot_general(
                    gsel_ref[:], ub_all, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cw = jnp.mod(crc_acc + off_ref[:, :BT][:, None, :], 2.0)
                bad = jnp.max(cw[:W], axis=0)               # [P, BT] 0/1
                score = ctx["pm"] + BIG * bad
                okp = 1.0 - bad
            else:
                score = ctx["pm"]
                okp = jnp.ones((P, BT), jnp.float32)
            bs = jnp.min(score, axis=0)
            at = jnp.where(score == bs[None], iota_p, P)
            bp = jnp.min(at, axis=0)                        # [BT] argmin
            sel = jnp.where(iota_p == bp[None], 1.0, 0.0)   # [P, BT]
            pm_best = jnp.sum(sel * ctx["pm"], axis=0)
            ok_best = jnp.sum(sel * okp, axis=0)
            for qq in range(Q):
                t0, n, _ = ctx["traj"][qq]
                if qq not in scr_off:
                    u_ref[t0:t0 + n] = jnp.zeros((n, BT), jnp.int8)
                    continue
                o = scr_off[qq]
                bits = bit_scr[o:o + n]                     # [n, P, BT]
                s_q = sufs[qq]
                # best path's index in this span's post-op indexing
                if s_q is None:
                    idx = bp
                else:
                    idx = jnp.sum(sel * s_q.astype(jnp.float32),
                                  axis=0).astype(jnp.int32)
                _tln("u_best", 3 * P * n * BT)
                # one-hot row select over the sublane (P) axis: exact,
                # bits are 0/1 and selq is one-hot per lane
                selq = jnp.where(iota_p == idx[None], 1.0, 0.0)
                u_ref[t0:t0 + n] = jnp.sum(
                    bits * selq[None], axis=1).astype(jnp.int8)
            iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, BT), 0)
            meta = jnp.where(iota8 == 0, pm_best[None],
                             jnp.zeros((8, BT), jnp.float32))
            meta = jnp.where(iota8 == 1, ok_best[None], meta)
            meta_ref[:] = meta
            return
        if counters:
            # in-kernel finalize: CRC check per path (same algebra as
            # ops/scl.finalize), best-path select (min + first-match-min,
            # matching argmin's first-index tie-break), error counting
            if W:
                off_v = off_ref[:, :BT]                    # [W8, BT]
                cw = jnp.mod(ctx["crc_acc"] + off_v[:, None, :], 2.0)
                bad = jnp.max(cw[:W], axis=0)              # [P, BT] 0/1
                score = ctx["pm"] + BIG * bad
            else:
                score = ctx["pm"]
            bs = jnp.min(score, axis=0)                    # [BT]
            at = jnp.where(score == bs[None], iota_p, P)
            bp = jnp.min(at, axis=0)                       # [BT]
            sel = jnp.where(iota_p == bp[None], 1.0, 0.0)  # [P, BT]
            be_best = jnp.sum(sel * ctx["be_acc"], axis=0)
            fe_best = jnp.where(be_best > 0, 1.0, 0.0)
            iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, BT), 0)
            out = jnp.where(iota8 == 0, fe_best[None],
                            jnp.zeros((8, BT), jnp.float32))
            out = jnp.where(iota8 == 1, be_best[None], out)
            cnt_ref[:] = out.astype(jnp.int32)
            return
        pm_ref[:] = ctx["pm"]

    scratch_shapes = (
        [pltpu.VMEM((n_sizes[s], P, BT), jnp.float32)
         for s in range(1, m + 1)]
        + [pltpu.VMEM((factors[s - 1], n_sizes[s], P, BT), jnp.float32)
           for s in range(1, m + 1)]
    )

    if mc:
        def _mc_ins(seed, sigma, noise=None):
            ins = [jnp.asarray(data_mask_np)]
            in_specs = [pl.BlockSpec((N, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
            if W:
                ins += [jnp.asarray(gext_np), jnp.asarray(off_np)]
                in_specs += [
                    pl.BlockSpec((W8, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
            ins += [jnp.asarray(seed, jnp.int32).reshape(1, 2),
                    jnp.asarray(sigma, jnp.float32).reshape(1, 1)]
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                         pl.BlockSpec(memory_space=pltpu.SMEM)]
            if MXU_ENC:
                ins.append(jnp.asarray(genc_np))
                in_specs.append(pl.BlockSpec((N, N), lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
            if mc_noise:
                ins.append(jnp.asarray(noise, jnp.float32))
                in_specs.append(pl.BlockSpec((N, BT), lambda i: (0, i),
                                             memory_space=pltpu.VMEM))
            return ins, in_specs

        if counters:
            def core_cnt(seed: jnp.ndarray, sigma: jnp.ndarray, B: int,
                         noise=None):
                if B % BT:
                    raise ValueError(
                        f"batch {B} not a multiple of tile {BT}")
                nt = B // BT
                ins, in_specs = _mc_ins(seed, sigma, noise)
                cnt = pl.pallas_call(
                    kernel,
                    grid=(nt,),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec((8, BT), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
                    scratch_shapes=scratch_shapes,
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                    interpret=pltpu.InterpretParams() if interpret
                    else False,
                )(*ins)
                return cnt

            return core_cnt, spans

        def core_mc(seed: jnp.ndarray, sigma: jnp.ndarray, B: int,
                    noise=None):
            if B % BT:
                raise ValueError(f"batch {B} not a multiple of tile {BT}")
            nt = B // BT
            ins, in_specs = _mc_ins(seed, sigma, noise)
            bit, perm, pm, utrue = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((N * P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Q * P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N * P, B), jnp.int8),
                    jax.ShapeDtypeStruct((Q * P, B), jnp.int32),
                    jax.ShapeDtypeStruct((P, B), jnp.float32),
                    jax.ShapeDtypeStruct((N, B), jnp.int8),
                ),
                scratch_shapes=scratch_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                # the generic interpreter has no rule for the TPU PRNG
                # primitives — use the TPU-semantics interpreter for the
                # fused-MC kernel's CPU tests
                interpret=pltpu.InterpretParams() if interpret else False,
            )(*ins)
            return (bit.reshape(N, P, B), perm.reshape(Q, P, B), pm,
                    utrue)

        return core_mc, spans

    if subtree:
        def core_sub(lam1: jnp.ndarray, pm: jnp.ndarray):
            B = lam1.shape[-1]
            if B % BT:
                raise ValueError(f"batch {B} not a multiple of tile {BT}")
            nt = B // BT
            bits, perms, netp, xblk, pmo = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((N, P, BT), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((N, P, BT), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Q * P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, P, BT), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N, P, B), jnp.int8),
                    jax.ShapeDtypeStruct((Q * P, B), jnp.int32),
                    jax.ShapeDtypeStruct((P, B), jnp.int32),
                    jax.ShapeDtypeStruct((N, P, B), jnp.int8),
                    jax.ShapeDtypeStruct((P, B), jnp.float32),
                ),
                scratch_shapes=scratch_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(jnp.moveaxis(lam1.astype(jnp.float32), 0, 1), pm)
            # bits/xblk come back [N, P, B] (r5 layout); the outer
            # epilogue's traj_bit is [N, P, B] already, xblk is
            # transposed back XLA-side in ops/scl._subtree_item
            return bits, perms.reshape(Q, P, B), netp, xblk, pmo

        return core_sub, spans

    if select:
        def core_sel(llrs: jnp.ndarray):
            B = llrs.shape[0]
            if B % BT:
                raise ValueError(f"batch {B} not a multiple of tile {BT}")
            nt = B // BT
            llrT = llrs.T.astype(jnp.float32)       # [N, B]
            ins = [llrT]
            in_specs = [pl.BlockSpec((N, BT), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)]
            if W:
                ins += [jnp.asarray(gsel_np), jnp.asarray(off_np)]
                in_specs += [
                    pl.BlockSpec((W8, NZ), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
            u, meta = pl.pallas_call(
                kernel,
                grid=(nt,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((N, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N, B), jnp.int8),
                    jax.ShapeDtypeStruct((8, B), jnp.float32),
                ),
                scratch_shapes=scratch_shapes
                + [pltpu.VMEM((max(NZ, 1), P, BT), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(*ins)
            return u, meta

        return core_sel, spans

    def core(llrs: jnp.ndarray):
        B = llrs.shape[0]
        if B % BT:
            raise ValueError(f"batch {B} not a multiple of tile {BT}")
        nt = B // BT
        llrT = llrs.T.astype(jnp.float32)           # [N, B]
        bit, perm, pm = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((N, BT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((N * P, BT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q * P, BT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, BT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N * P, B), jnp.int8),
                jax.ShapeDtypeStruct((Q * P, B), jnp.int32),
                jax.ShapeDtypeStruct((P, B), jnp.float32),
            ),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(llrT)
        traj_bit = bit.reshape(N, P, B)
        traj_perm = perm.reshape(Q, P, B)
        return traj_bit, traj_perm, pm

    return core, spans


def build_digits(spec: CodeSpec):
    from polar_tpu.ops.schedule import build_schedule
    return build_schedule(spec).digits


def build_pallas_mc_step(spec: CodeSpec, list_size: int,
                         batch_tile: int = 128, interpret: bool = False,
                         counters: bool = False, noise_input: bool = False):
    """Fused Monte-Carlo step: step(seed i32 [2], sigma f32, batch) ->
    (frame_errors i32, bit_errors i32, u_true [N, B] i8, result).

    The entire RNG -> CRC -> encode -> AWGN -> LLR -> SCL-decode chain
    runs inside one Pallas kernel per batch tile (see
    build_pallas_scl_kernel mc=True); only the genealogy epilogue, CRC
    path selection, and error counting remain in XLA. Replaces the
    reference's whole `simulate()` hot loop (SURVEY.md §3.1) with one
    fused device program. The decode path is bit-identical to the
    non-fused backends; the PRNG stream differs from the XLA harness
    (pltpu hardware PRNG vs threefry), so FER statistics — not per-frame
    equality — are the contract. Jit the result (batch static).

    counters=True: the error counting happens in-kernel too (see
    build_pallas_scl_kernel counters) — step returns (frame_errors,
    bit_errors, None, None); same numbers as the full mode on the same
    seed (pinned by tests), no genealogy/epilogue work at all.

    noise_input=True (test hook, ADVICE r3): the returned step takes a
    trailing `noise` [B-tiled N x B] f32 array used instead of the
    in-kernel Box-Muller draw, so CPU (interpret) tests can drive the
    counters machinery with real frame errors."""
    from polar_tpu.ops.scl import scl_epilogue

    core, spans = build_pallas_scl_kernel(spec, list_size,
                                          batch_tile=batch_tile,
                                          interpret=interpret, mc=True,
                                          counters=counters,
                                          mc_noise=noise_input)
    info_mask_np = np.zeros(spec.N, bool)
    info_mask_np[np.asarray(spec.info_positions)[:spec.K]] = True

    if counters:
        def step_cnt(seed: jnp.ndarray, sigma: jnp.ndarray, batch: int,
                     noise=None):
            cnt = core(seed, sigma, batch, noise)        # [8, B] i32
            return jnp.sum(cnt[0]), jnp.sum(cnt[1]), None, None

        return step_cnt

    def step(seed: jnp.ndarray, sigma: jnp.ndarray, batch: int,
             noise=None):
        traj_bit, traj_perm, pm, u_true = core(seed, sigma, batch, noise)
        entries = [(t0, n, traj_perm[q]) for q, (t0, n) in enumerate(spans)]
        res = scl_epilogue(spec, list_size, entries, traj_bit, pm)
        mask = jnp.asarray(info_mask_np)
        diff = (res.u.astype(jnp.int8) != u_true.T) & mask[None, :]
        frame_err = jnp.sum(jnp.any(diff, axis=1)).astype(jnp.int32)
        bit_err = jnp.sum(diff).astype(jnp.int32)
        return frame_err, bit_err, u_true, res

    return step


def build_pallas_scl_decoder(spec: CodeSpec, list_size: int,
                             batch_tile: int = 128,
                             interpret: bool = False,
                             select: bool | None = None):
    """decode(llrs [B, N] f32) -> DecodeResult, bit-identical to
    ops/scl.build_scl_decoder(spec, list_size). Jit the result.

    select (default: list_size > 1): backtrack/CRC/selection run
    in-kernel (build_pallas_scl_kernel select mode) — the XLA side only
    slices the payload rows out of the returned u. At list_size 1 the
    XLA epilogue is a trivial slice-up (no permutations), so the r3
    shape is kept there (measured faster: 2.26M vs 2.0M cw/s on
    bch_sc). select=False keeps the r3 shape everywhere (useful for
    debugging the genealogy outputs; bit-identical either way)."""
    from polar_tpu.ops.scl import DecodeResult, scl_epilogue

    if select is None:
        select = list_size > 1
    core, spans = build_pallas_scl_kernel(spec, list_size,
                                          batch_tile=batch_tile,
                                          interpret=interpret,
                                          select=select)
    if not select:
        def decode(llrs: jnp.ndarray):
            traj_bit, traj_perm, pm = core(llrs)
            entries = [(t0, n, traj_perm[q])
                       for q, (t0, n) in enumerate(spans)]
            return scl_epilogue(spec, list_size, entries, traj_bit, pm)

        return decode

    # payload rows = unfrozen positions of u, sliced as contiguous runs
    # (a K-row dynamic gather serializes on TPU; unfrozen positions
    # cluster, so the run count is small)
    pos = np.nonzero(~spec.frozen.astype(np.bool_))[0]
    runs = []
    start = prev = int(pos[0])
    for r in pos[1:]:
        r = int(r)
        if r == prev + 1:
            prev = r
            continue
        runs.append((start, prev - start + 1))
        start = prev = r
    runs.append((start, prev - start + 1))

    def decode(llrs: jnp.ndarray):
        u, meta = core(llrs)                       # [N, B] i8, [8, B] f32
        payload = jnp.concatenate([u[s:s + ln] for s, ln in runs], axis=0)
        return DecodeResult(u=u.T, payload=payload.T,
                            crc_ok=meta[1] > 0.5, pm=meta[0])

    return decode
