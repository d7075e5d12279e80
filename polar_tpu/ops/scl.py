"""Batched SC / CRC-aided SC-list decoder (device-side, XLA).

TPU-native redesign of the reference's C++ `ScDecoder`/`ListDecoder`
(SURVEY.md C8/C9, §3.3-3.4; BASELINE.json:5 "SC and CRC-aided SC-list
decoding ... with vectorized f/g (min-sum) updates ... and an on-device
top-L path-metric sort"; reference mount empty, §0). Key inversions of the
pointer-rich per-codeword C++ design (SURVEY.md §7.0):

- A batch of B codewords x L list paths decodes in lockstep; every op is a
  wide vector op with the batch in the lane (last) dimension.
- The depth-first recursion becomes a `lax.fori_loop` over the N leaf bits
  driving two `lax.switch`es on host-precomputed schedule arrays
  (polar_tpu.ops.schedule): a "down" switch (which stages compute fresh
  kernel-input LLRs) and an "up" switch (which completed nodes re-encode).
- Tal-Vardy lazy path copies become per-stage path->slot index maps
  (rlam/rdec, [P, B] int32): on path survival only the tiny maps are
  permuted; bulk LLR/decision state is never copied — reads gather through
  the maps, writes always land at identity slots.
- The 2L->L sort is `lax.top_k` on negated path metrics (ties prefer bit 0
  then lower path index — matching polar_tpu.oracle).
- Per-leaf survival is recorded as (parent, bit) genealogy; the decided u
  vectors are reconstructed afterwards by a cheap backward scan, avoiding
  any O(N*L) per-leaf state gather.

Path metric: PM += |llr| on sign mismatch (arXiv:1411.7282). SC is the
list_size=1 specialization (no sort, no genealogy gathers of width 2L).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.kernel_proc import StageProcessor
from polar_tpu.ops.schedule import build_schedule

BIG = np.float32(1e30)  # host scalar: no device init at import


class DecodeResult(NamedTuple):
    u: jnp.ndarray        # [B, N] best path's u decisions
    payload: jnp.ndarray  # [B, K + n_crc] unfrozen slots of u
    crc_ok: jnp.ndarray   # [B] bool: best path passed CRC (True if no CRC)
    pm: jnp.ndarray       # [B] best path metric


def build_scl_decoder(spec: CodeSpec, list_size: int, genie: bool = False):
    """Returns decode(llrs: [B, N] f32) -> DecodeResult. Jit the result.

    genie=True (list_size must be 1): all leaves are decided as the true
    all-zero codeword regardless of the frozen mask, and the returned `u`
    records per-leaf LLR *sign errors* instead of decisions. Feeding
    all-zero-codeword channel LLRs then gives the genie-aided per-subchannel
    error indicators used for Monte-Carlo code construction (SURVEY.md C6).
    """
    if genie and list_size != 1:
        raise ValueError("genie mode requires list_size=1")
    m = len(spec.factors)
    P = int(list_size)
    sched = build_schedule(spec)
    procs = [StageProcessor(k) for k in spec.kernels]
    n_sizes = spec.block_sizes                       # n_0..n_m
    factors = spec.factors
    N = spec.N

    # numpy schedule tables — wrapped with jnp.asarray only inside traced
    # code, so they embed as MLIR constants without a device fetch (the
    # remote-tunnel TPU plugin makes per-device-constant fetches very slow).
    digits_np = sched.digits                         # [N, m]
    s_star_np = sched.s_star
    r_up_np = sched.r_up
    frozen_np = sched.frozen.astype(np.bool_)
    info_pos_np = spec.info_positions

    def _iota_pb(b):
        return jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[:, None], (P, b))

    # ---------------- stage ops ----------------

    def _parent_view(state, s, lam0):
        """Gathered parent llrs viewed [P(or 1), l_s, n_s, B]."""
        l, n = factors[s - 1], n_sizes[s]
        if s == 1:
            b = lam0.shape[-1]
            return lam0.reshape(1, l, n, b)
        lam_prev = jnp.take_along_axis(
            state["lam"][s - 2], state["rlam"][s - 2][:, None, :], axis=0)
        return lam_prev.reshape(P, l, n, lam_prev.shape[-1])

    def _dec_gather(state, s):
        """[l_s, P, n_s, B] prior child decisions through slot maps."""
        rd = state["rdec"][s - 1][:, :, None, :]     # [l, P, 1, B]
        return jnp.take_along_axis(
            state["dec"][s - 1], jnp.broadcast_to(rd, state["dec"][s - 1].shape),
            axis=1)

    def _down_op(state, s, i, lam0, fresh: bool):
        """Compute input-i LLR at stage s, write lam[s] and its map."""
        view = _parent_view(state, s, lam0)
        proc = procs[s - 1]
        if fresh:
            llr = proc.fresh_llr(view)
        else:
            llr = proc.dynamic_llr(i, view, _dec_gather(state, s))
        b = llr.shape[-1]
        llr = jnp.broadcast_to(llr, (P, n_sizes[s], b))
        state = dict(state)
        state["lam"] = _tset(state["lam"], s - 1, llr)
        state["rlam"] = _tset(state["rlam"], s - 1, _iota_pb(b))
        return state

    def _up_op(state, s, t):
        """Re-encode completed stage-s node into dec[s-1]."""
        d_prev = jnp.asarray(digits_np)[t, s - 2]
        x = procs[s - 1].reencode(_dec_gather(state, s))   # [P, l_s, n_s, B]
        b = x.shape[-1]
        x = x.reshape(P, n_sizes[s - 1], b)
        state = dict(state)
        state["dec"] = _tset(
            state["dec"], s - 2,
            state["dec"][s - 2].at[d_prev, :, :, :].set(x))
        state["rdec"] = _tset(
            state["rdec"], s - 2,
            state["rdec"][s - 2].at[d_prev].set(_iota_pb(b)))
        return state

    def _tset(tup, idx, val):
        return tup[:idx] + (val,) + tup[idx + 1:]

    # ---------------- leaf step ----------------

    def _leaf_step(state, t):
        b = state["pm"].shape[-1]
        lam_leaf = state["lam"][m - 1][:, 0, :]      # [P, B]
        pen0 = jnp.maximum(-lam_leaf, 0.0)
        pen1 = jnp.maximum(lam_leaf, 0.0)
        frozen_t = jnp.asarray(frozen_np)[t]
        iota = _iota_pb(b)

        if genie:
            # decisions forced to the true (all-zero) u; traj_bit records
            # whether SC *would have* erred at this leaf
            bit = jnp.zeros((P, b), jnp.int8)
            err = (lam_leaf < 0).astype(jnp.int8)
            pm = state["pm"] + pen0
            parent = jnp.zeros_like(iota)
            state = dict(state)
            state["pm"] = pm
            state["traj_parent"] = state["traj_parent"].at[t].set(
                parent.astype(jnp.int8))
            state["traj_bit"] = state["traj_bit"].at[t].set(err)
            d_m = jnp.asarray(digits_np)[t, m - 1]
            state["dec"] = _tset(
                state["dec"], m - 1,
                state["dec"][m - 1].at[d_m, :, 0, :].set(bit))
            state["rdec"] = _tset(
                state["rdec"], m - 1,
                state["rdec"][m - 1].at[d_m].set(iota))
            return state
        if P == 1:
            bit = jnp.where(frozen_t, 0, (lam_leaf < 0).astype(jnp.int8))
            pm = state["pm"] + jnp.where(bit == 1, pen1, pen0)
            parent = jnp.zeros_like(iota)
        else:
            def fr(pm):
                return pm + pen0, iota, jnp.zeros((P, b), jnp.int8)

            def info(pm):
                cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)  # [2P,B]
                vals, idx = jax.lax.top_k(-cand.T, P)   # [B, P] each
                c = idx.T.astype(jnp.int32)             # [P, B]
                return -vals.T, c % P, (c // P).astype(jnp.int8)

            pm, parent, bit = jax.lax.cond(frozen_t, fr, info, state["pm"])

        state = dict(state)
        state["pm"] = pm
        if P > 1:
            state["rlam"] = tuple(
                jnp.take_along_axis(r, parent, axis=0) for r in state["rlam"])
            state["rdec"] = tuple(
                jnp.take_along_axis(
                    r, jnp.broadcast_to(parent[None], r.shape), axis=1)
                for r in state["rdec"])
        state["traj_parent"] = state["traj_parent"].at[t].set(
            parent.astype(jnp.int8))
        state["traj_bit"] = state["traj_bit"].at[t].set(bit)
        # record the decision as child d_m of the deepest stage's node
        d_m = jnp.asarray(digits_np)[t, m - 1]
        state["dec"] = _tset(
            state["dec"], m - 1,
            state["dec"][m - 1].at[d_m, :, 0, :].set(bit))
        state["rdec"] = _tset(
            state["rdec"], m - 1,
            state["rdec"][m - 1].at[d_m].set(iota))
        return state

    # ---------------- branches ----------------

    def _down_branch(s_star, state, t, lam0):
        i = jnp.asarray(digits_np)[t, s_star - 1]
        state = _down_op(state, s_star, i, lam0, fresh=False)
        for s in range(s_star + 1, m + 1):
            state = _down_op(state, s, 0, lam0, fresh=True)
        return state

    def _up_branch(r, state, t):
        for s in range(m, m - r, -1):
            state = _up_op(state, s, t)
        return state

    # ---------------- decode ----------------

    def decode(llrs: jnp.ndarray) -> DecodeResult:
        bsz = llrs.shape[0]
        lam0 = llrs.T.astype(jnp.float32)            # [N, B]
        iota = _iota_pb(bsz)
        pm0 = jnp.zeros((P, bsz), jnp.float32)
        if P > 1:
            pm0 = pm0.at[1:].set(BIG)
        state = {
            "lam": tuple(jnp.zeros((P, n_sizes[s], bsz), jnp.float32)
                         for s in range(1, m + 1)),
            "dec": tuple(jnp.zeros((factors[s - 1], P, n_sizes[s], bsz),
                                   jnp.int8) for s in range(1, m + 1)),
            "rlam": tuple(iota for _ in range(m)),
            "rdec": tuple(jnp.broadcast_to(iota[None],
                                           (factors[s - 1], P, bsz)).astype(jnp.int32)
                          for s in range(1, m + 1)),
            "pm": pm0,
            "traj_parent": jnp.zeros((N, P, bsz), jnp.int8),
            "traj_bit": jnp.zeros((N, P, bsz), jnp.int8),
        }

        down_branches = [functools.partial(_down_branch, s) for s in range(1, m + 1)]
        up_branches = [functools.partial(_up_branch, r) for r in range(m)]

        def body(t, st):
            st = jax.lax.switch(jnp.asarray(s_star_np)[t] - 1, down_branches, st, t, lam0)
            st = _leaf_step(st, t)
            st = jax.lax.switch(jnp.asarray(r_up_np)[t], up_branches, st, t)
            return st

        state = jax.lax.fori_loop(0, N, body, state)

        # ---- genealogy backtrack: u for every surviving path ----
        def bt(p_state, xs):
            par_t, bit_t = xs
            bit = jnp.take_along_axis(bit_t, p_state, axis=0)
            p_next = jnp.take_along_axis(par_t.astype(jnp.int32), p_state, axis=0)
            return p_next, bit

        _, bits_rev = jax.lax.scan(
            bt, iota, (state["traj_parent"][::-1], state["traj_bit"][::-1]))
        u_all = bits_rev[::-1]                       # [N, P, B]

        # ---- CRC selection among survivors ----
        payload_all = u_all[jnp.asarray(info_pos_np)]    # [K+c, P, B]
        if spec.crc is not None:
            k = spec.K
            g = jnp.asarray(spec.crc.generator_matrix(k).astype(np.float32))
            off = jnp.asarray(spec.crc.offset_bits(k).astype(np.float32))
            bits = (jnp.einsum("kPB,kw->wPB",
                               payload_all[:k].astype(jnp.float32), g)
                    + off[:, None, None]) % 2.0
            ok = jnp.all(bits.astype(jnp.int8) == payload_all[k:], axis=0)  # [P,B]
            score = state["pm"] + BIG * (1.0 - ok.astype(jnp.float32))
        else:
            ok = jnp.ones((P, bsz), bool)
            score = state["pm"]
        best = jnp.argmin(score, axis=0)             # [B]
        sel = best[None, None, :]
        u_best = jnp.take_along_axis(u_all, sel, axis=1)[:, 0, :]        # [N, B]
        payload = jnp.take_along_axis(payload_all, sel, axis=1)[:, 0, :]
        crc_ok = jnp.take_along_axis(ok, best[None, :], axis=0)[0]
        pm_best = jnp.take_along_axis(state["pm"], best[None, :], axis=0)[0]
        return DecodeResult(u=u_best.T, payload=payload.T,
                            crc_ok=crc_ok, pm=pm_best)

    return decode


def build_sc_decoder(spec: CodeSpec):
    """Plain SC = SCL with list_size 1 (SURVEY.md: SCL(L=1) ≡ SC)."""
    return build_scl_decoder(spec, 1)
