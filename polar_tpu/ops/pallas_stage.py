"""Standalone Pallas TPU kernels for l>2 kernel-input LLR processing
(the hybrid path: XLA op program + VMEM-resident big-kernel DOWN ops).

Motivation (VERDICT r2 item 2; profiled on chip, RESULTS.md r3): the
mixed_scl32 (N=4096, L=32) decode is dominated by the stage-1/2 16x16
kernel-processing ops. In XLA each syndrome-trellis section round-trips
S state arrays of [2, P, n, B] floats through HBM (the i=4 trellis alone
was 42% of decode before the S^2->S syndrome switch), and the tail-table
max-correlations scan chunked [2, P, C, n, B] intermediates. The whole
config exceeds the Pallas *mega*-kernel's VMEM envelope
(ops/pallas_scl.py: ~46 MiB/tile), but each DOWN op individually fits
easily: this module runs ONE kernel-input LLR computation per
`pallas_call`, gridded over (n, batch) tiles, with the trellis state /
table-correlation accumulators resident in VMEM.

Bit-exactness contract: the in-kernel math mirrors the XLA backends
expression-for-expression, exactly as ops/pallas_scl.down_big does —
syndrome-trellis min-plus (float-identical to
kernels/trellis.syndrome_min_cost: same 2-operand adds, same order-free
mins, same section order) and tail-coset max-correlation with the same
fixed-order pairwise tree contraction as ops/kernel_proc.tree_corr and
in-kernel +-1 column regeneration in _tail_table's column order. The
hybrid decoder is therefore bit-identical to the pure-XLA decoder
(tested in tests/test_pallas_stage.py and on-chip via the mixed golden
record replay).

Replaces the hot inner loop of the reference's per-codeword C++ trellis
processor (SURVEY.md C5, §3.5; mount empty, §0) at TPU batch scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.float32(3e38) / 4          # kernels/trellis.INF (min-plus padding)
_TERM_BUDGET = 8 * 1024 * 1024      # max bytes per table-correlation chunk
_VMEM_BUDGET = 10 * 2**20           # per-invocation working-set target


def _tree_fold(terms):
    """Fixed pairwise-tree sum — same order as kernel_proc.tree_corr."""
    while len(terms) > 1:
        nxt = [terms[k] + terms[k + 1] for k in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


@functools.lru_cache(maxsize=None)
def _builder_cache(kernel_bytes: bytes, l: int, i: int, P: int, n: int,
                   batch_tile: int, interpret: bool):
    kernel = np.frombuffer(kernel_bytes, dtype=np.uint8).reshape(l, l)
    return _build(kernel, i, P, n, batch_tile, interpret)


def build_down_kernel(kernel: np.ndarray, i: int, P: int, n: int,
                      batch_tile: int = 128, interpret: bool = False):
    """Returns fn(lam_adj [P, l, n, B] f32) -> [P, n, B] f32 — the
    input-i LLR of an l x l kernel from coset-adjusted output LLRs,
    float-identical to StageProcessor._llr_static(i, lam_adj) for the
    trellis and table backends. B must be a multiple of batch_tile."""
    kernel = np.asarray(kernel, np.uint8)
    return _builder_cache(kernel.tobytes(), int(kernel.shape[0]), int(i),
                          int(P), int(n), int(batch_tile), bool(interpret))


def _build(K: np.ndarray, i: int, P: int, n: int, BT: int, interpret: bool):
    from polar_tpu.kernels.trellis import tail_trellis, tail_syndrome_cols

    l = int(K.shape[0])
    if not (0 <= i < l - 1):
        raise ValueError("build_down_kernel covers 0 <= i < l-1 "
                         "(i = l-1 is a single correlation; use XLA)")
    kb = K.tobytes()
    use_trellis = tail_trellis(kb, l, i).s_max ** 2 < (1 << (l - 1 - i))
    S, cols = tail_syndrome_cols(kb, l, i) if use_trellis else (0, None)
    row_i = K[i]

    # The trellis/table marginal is independent per (position, batch)
    # element, so (n, B) flattens into ONE lane axis M = n*B, tiled by MT
    # (a multiple of the 128-lane tile; Mosaic requires the last block dim
    # % 128 == 0 and the second-to-last % 8 == 0 — P and l are >= 8 here).
    def pick_mt(M):
        state_arrays = (S + 4) if use_trellis else 12
        per_lane = (l * P + 2 * P + state_arrays * 2 * P) * 4
        mt = BT
        for cand in range(BT, M + 1, BT):
            if M % cand == 0 and per_lane * cand <= _VMEM_BUDGET:
                mt = cand
        return mt

    def kernel_fn(mt, lam_ref, out_ref):
        # lam_ref: [P, l, MT]; out_ref: [P, MT]
        lam = [lam_ref[:, j] for j in range(l)]     # each [P, MT]
        if use_trellis:
            # syndrome trellis over both hypotheses at once: axis 0 of
            # [2, P, MT] is (u_i = 0, u_i = 1); the u_i = 1 hypothesis is
            # the row_i sign flip folded per section. Float-identical to
            # kernels/trellis.syndrome_min_cost (same adds, same order).
            sh = (2, P, mt)
            zero = jnp.zeros(sh, jnp.float32)
            inf = jnp.full(sh, INF, jnp.float32)
            alpha = [zero if st == 0 else inf for st in range(S)]
            for t in range(l):
                lam_t = lam[t]
                flip = lam_t * -1.0 if row_i[t] else lam_t
                lam_t2 = jnp.stack([lam_t, flip])          # [2, P, MT]
                pen0 = jnp.maximum(-lam_t2, 0.0)
                pen1 = jnp.maximum(lam_t2, 0.0)
                c = cols[t]
                alpha = [jnp.minimum(alpha[st] + pen0, alpha[st ^ c] + pen1)
                         for st in range(S)]
            cost = alpha[0]                                # [2, P, MT]
            out_ref[:] = cost[1] - cost[0]
            return
        # table: max-correlation over the 2^(l-1-i) tail codewords, +-1
        # columns regenerated in-kernel from an iota in _tail_table's
        # column order (Pallas kernels cannot capture array constants);
        # max chunk order is irrelevant (max is exact & order-free).
        d_free = l - 1 - i
        C = 1 << d_free
        cc = max(1, min(C, _TERM_BUDGET // max(1, P * mt * 4)))
        corr = [None, None]
        for h in range(2):
            lam_h = (lam if h == 0 else
                     [lam[j] * -1.0 if row_i[j] else lam[j]
                      for j in range(l)])
            for c0 in range(0, C, cc):
                msg = jax.lax.broadcasted_iota(jnp.int32, (cc, 1, 1), 0) + c0
                gbits = [((msg >> g) & 1).astype(jnp.float32)
                         for g in range(d_free)]
                terms = []
                for j in range(l):
                    par = None
                    for g in range(d_free):
                        if K[i + 1 + g, j]:
                            par = (gbits[g] if par is None
                                   else jnp.abs(par - gbits[g]))
                    terms.append(lam_h[j][None] if par is None
                                 else lam_h[j][None] * (1.0 - 2.0 * par))
                mx = jnp.max(_tree_fold(terms), axis=0)    # [P, MT]
                corr[h] = mx if corr[h] is None \
                    else jnp.maximum(corr[h], mx)
        out_ref[:] = 0.5 * (corr[0] - corr[1])

    def fn(lam_adj: jnp.ndarray) -> jnp.ndarray:
        p0, l_, n_, B = lam_adj.shape
        if (p0, l_, n_) != (P, l, n):
            raise ValueError(f"expected [{P},{l},{n},B], got {lam_adj.shape}")
        M = n * B
        if M % BT:
            raise ValueError(f"n*batch {M} not a multiple of tile {BT}")
        mt = pick_mt(M)
        flat = lam_adj.astype(jnp.float32).reshape(P, l, M)
        out = pl.pallas_call(
            functools.partial(kernel_fn, mt),
            grid=(M // mt,),
            in_specs=[pl.BlockSpec((P, l, mt), lambda mi: (0, 0, mi),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((P, mt), lambda mi: (0, mi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, M), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(flat)
        return out.reshape(P, n, B)

    return fn
