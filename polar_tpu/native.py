"""ctypes bindings for the native C++ golden decoder (native/polar_ref.cpp).

The golden decoder is an independent C++ implementation of the documented
decoding conventions (SURVEY.md §2.3 knobs), standing in for the missing
reference binary in the bit-match replay harness (SURVEY.md §4
"Reference bit-match"; PARITY.md C14). Builds on demand via native/build.sh.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from polar_tpu.models.polar import CodeSpec

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libpolar_ref.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["sh", str(_NATIVE_DIR / "build.sh")], check=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ref_create.restype = ctypes.c_void_p
    lib.ref_create.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
        ctypes.c_uint32]
    lib.ref_destroy.argtypes = [ctypes.c_void_p]
    lib.ref_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.ref_decode_scl.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


class NativeGolden:
    """Handle to a native golden codec for one CodeSpec."""

    def __init__(self, spec: CodeSpec):
        lib = _load()
        self.spec = spec
        m = len(spec.factors)
        factors = (ctypes.c_int * m)(*spec.factors)
        kflat = np.concatenate([k.reshape(-1) for k in spec.kernels]
                               ).astype(np.uint8)
        frozen = spec.frozen.astype(np.uint8)
        crc = spec.crc
        self._h = lib.ref_create(
            m, factors, kflat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            frozen.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            spec.N, spec.K,
            crc.width if crc else 0, crc.poly if crc else 0,
            crc.init if crc else 0)
        self._lib = lib
        # keep buffers alive for the duration of ref_create (copied inside,
        # but belt and braces)
        self._keep = (factors, kflat, frozen)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ref_destroy(self._h)
            self._h = None

    def encode(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u.astype(np.uint8).reshape(-1, self.spec.N))
        out = np.empty_like(u)
        self._lib.ref_encode(
            self._h, u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            u.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out

    def decode(self, llrs: np.ndarray, list_size: int) -> np.ndarray:
        llrs = np.ascontiguousarray(
            llrs.astype(np.float64).reshape(-1, self.spec.N))
        out = np.empty((llrs.shape[0], self.spec.N), np.uint8)
        self._lib.ref_decode_scl(
            self._h, llrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            llrs.shape[0], list_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
