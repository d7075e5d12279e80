"""Golden-file bit-match harness: record from a reference decoder, replay
through the TPU decoder, require identical hard decisions per codeword.

SURVEY.md §4 "Reference bit-match" / §2.3 item 6: to bit-match a reference
one must replay its exact (info, noise) vectors. This harness defines the
record format and the replay check. The recorder is pluggable: today it is
the independent native C++ golden decoder (polar_tpu.native); if the real
reference (`lizmoscow/polar-codes-with-bch-kernel`) binary ever becomes
available, a recorder producing the same .npz format slots straight in.

Record format (.npz):
    factors[int m], frozen[uint8 N], K, crc_width, crc_poly, crc_init,
    list_size, llrs[float64 B, N], u_ref[uint8 B, N]
"""
from __future__ import annotations

import pathlib

import numpy as np

from polar_tpu.models.polar import CodeSpec, CrcSpec


def record_golden(spec: CodeSpec, list_size: int, llrs: np.ndarray,
                  path: str | pathlib.Path) -> np.ndarray:
    """Decode llrs with the native golden decoder and write a record.

    LLRs are rounded to float32 before the native decode (VERDICT r2
    weak 7): the device replay runs in float32, so recording on exactly
    float32-representable values guarantees the two decoders see
    bit-identical inputs — no tie-adjacent LLR can flip a decision in
    the f64→f32 quantization.
    """
    from polar_tpu.native import NativeGolden

    llrs = np.asarray(llrs, np.float64).astype(np.float32).astype(np.float64)
    golden = NativeGolden(spec)
    u_ref = golden.decode(llrs, list_size)
    np.savez_compressed(
        path,
        factors=np.asarray(spec.factors, np.int64),
        frozen=spec.frozen.astype(np.uint8),
        K=np.int64(spec.K),
        crc_width=np.int64(spec.crc.width if spec.crc else 0),
        crc_poly=np.int64(spec.crc.poly if spec.crc else 0),
        crc_init=np.int64(spec.crc.init if spec.crc else 0),
        list_size=np.int64(list_size),
        llrs=np.asarray(llrs, np.float64),
        u_ref=u_ref)
    return u_ref


def load_golden(path: str | pathlib.Path):
    """-> (spec, list_size, llrs, u_ref)"""
    z = np.load(path)
    crc = None
    if int(z["crc_width"]):
        crc = CrcSpec(width=int(z["crc_width"]), poly=int(z["crc_poly"]),
                      init=int(z["crc_init"]))
    spec = CodeSpec(
        N=int(z["frozen"].size), K=int(z["K"]),
        factors=tuple(int(f) for f in z["factors"]),
        frozen_mask=tuple(int(v) for v in z["frozen"]), crc=crc)
    return spec, int(z["list_size"]), z["llrs"], z["u_ref"]


def replay_check(path: str | pathlib.Path, backend: str = "xla",
                 **decoder_kwargs) -> dict:
    """Replay a golden record through a device decoder backend.

    Returns {"frames", "mismatch_frames", "mismatch_bits"}; bit-match holds
    iff mismatch_frames == 0.
    """
    import jax
    import jax.numpy as jnp

    spec, list_size, llrs, u_ref = load_golden(path)
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}; use 'xla' or 'pallas'")
    if backend == "pallas":
        from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
        dec = jax.jit(build_pallas_scl_decoder(spec, list_size,
                                               **decoder_kwargs))
    else:
        from polar_tpu.ops.scl import build_scl_decoder
        dec = jax.jit(build_scl_decoder(spec, list_size, **decoder_kwargs))
    out = np.asarray(dec(jnp.asarray(llrs, jnp.float32)).u)
    mism = out != u_ref
    return {
        "frames": int(llrs.shape[0]),
        "mismatch_frames": int(mism.any(axis=1).sum()),
        "mismatch_bits": int(mism.sum()),
    }
