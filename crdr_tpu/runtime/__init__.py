"""Host-side native runtime: rANS entropy coder + CDF quantizer (C++ via ctypes).

The shared library is built lazily from ``csrc/`` on first import (g++ is part of
the baked toolchain).  All functions take/return numpy arrays — no Python-list
marshalling (a deliberate throughput improvement over the reference's
pybind11-list interface).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_LIB_DIR, "libcrdr_rans.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    src = os.path.join(_LIB_DIR, "rans.cpp")
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return
    subprocess.run(["make", "-s", "-C", _LIB_DIR, "libcrdr_rans.so"], check=True)


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is None:
            _build()
            lib = ctypes.CDLL(_LIB_PATH)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)

            lib.pmf_to_quantized_cdf_c.restype = ctypes.c_int
            lib.pmf_to_quantized_cdf_c.argtypes = [f32p, ctypes.c_int,
                                                   ctypes.c_int, i32p]
            lib.rans_encode_with_indexes.restype = ctypes.c_int64
            lib.rans_encode_with_indexes.argtypes = [
                i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int, ctypes.c_int,
                i32p, i32p, u8p, ctypes.c_int64]
            lib.rans_decode_with_indexes.restype = ctypes.c_int64
            lib.rans_decode_with_indexes.argtypes = [
                u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int,
                ctypes.c_int, i32p, i32p, i32p]
            lib.rans_decoder_new.restype = ctypes.c_void_p
            lib.rans_decoder_new.argtypes = [u8p, ctypes.c_int64]
            lib.rans_decoder_decode.restype = None
            lib.rans_decoder_decode.argtypes = [
                ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int,
                ctypes.c_int, i32p, i32p, i32p]
            lib.rans_decoder_free.restype = None
            lib.rans_decoder_free.argtypes = [ctypes.c_void_p]

            i64p = ctypes.POINTER(ctypes.c_int64)
            u16p = ctypes.POINTER(ctypes.c_uint16)
            lib.lane_rans_encode.restype = ctypes.c_int64
            lib.lane_rans_encode.argtypes = [
                i32p, i32p, ctypes.c_int64, i64p, ctypes.c_int, ctypes.c_int,
                i32p, ctypes.c_int, ctypes.c_int, i32p, i32p, u16p,
                ctypes.c_int64, i32p, i64p, i32p, ctypes.c_int64]
            lib.lane_decoder_new.restype = ctypes.c_void_p
            lib.lane_decoder_new.argtypes = [u16p, i32p, ctypes.c_int,
                                             ctypes.c_int64]
            lib.lane_decoder_decode.restype = None
            lib.lane_decoder_decode.argtypes = [
                ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int,
                ctypes.c_int, i32p, i32p, i32p]
            lib.lane_decoder_free.restype = None
            lib.lane_decoder_free.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


def _i32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """PMF (tail mass as last entry) -> integer CDF of length n+1."""
    lib = _get_lib()
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.zeros(pmf.size + 1, dtype=np.int32)
    rc = lib.pmf_to_quantized_cdf_c(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size,
        precision, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (code {rc})")
    return out


def rans_encode_with_indexes(symbols: np.ndarray, indexes: np.ndarray,
                             cdfs: np.ndarray, cdf_lengths: np.ndarray,
                             offsets: np.ndarray) -> bytes:
    lib = _get_lib()
    symbols = _i32(symbols).reshape(-1)
    indexes = _i32(indexes).reshape(-1)
    cdfs = _i32(cdfs)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    assert symbols.size == indexes.size
    # worst case: every symbol escapes with a ~32-bit bypass (~12 bytes/sym)
    cap = 16 * symbols.size + 64
    out = np.zeros(cap, dtype=np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n = lib.rans_encode_with_indexes(
        symbols.ctypes.data_as(i32p), indexes.ctypes.data_as(i32p),
        symbols.size, cdfs.ctypes.data_as(i32p), cdfs.shape[0], cdfs.shape[1],
        cdf_lengths.ctypes.data_as(i32p), offsets.ctypes.data_as(i32p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError(f"rans encode failed (code {n})")
    return out[:n].tobytes()


def rans_decode_with_indexes(stream: bytes, indexes: np.ndarray,
                             cdfs: np.ndarray, cdf_lengths: np.ndarray,
                             offsets: np.ndarray) -> np.ndarray:
    lib = _get_lib()
    indexes = _i32(indexes).reshape(-1)
    cdfs = _i32(cdfs)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    buf = np.frombuffer(stream, dtype=np.uint8)
    out = np.zeros(indexes.size, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.rans_decode_with_indexes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        indexes.ctypes.data_as(i32p), indexes.size,
        cdfs.ctypes.data_as(i32p), cdfs.shape[0], cdfs.shape[1],
        cdf_lengths.ctypes.data_as(i32p), offsets.ctypes.data_as(i32p),
        out.ctypes.data_as(i32p))
    if rc < 0:
        raise RuntimeError(f"rans decode failed (code {rc})")
    return out


class RansStreamDecoder:
    """Streaming decoder for the Charm autoregressive decode loop: the bitstream
    is attached once, then slices are pulled out incrementally."""

    def __init__(self, stream: bytes):
        self._lib = _get_lib()
        buf = np.frombuffer(stream, dtype=np.uint8)
        self._buf = buf  # keep alive (decoder copies, but be safe)
        self._handle = self._lib.rans_decoder_new(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size)
        if not self._handle:
            raise RuntimeError("invalid rans stream")

    def decode(self, indexes: np.ndarray, cdfs: np.ndarray,
               cdf_lengths: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        indexes = _i32(indexes).reshape(-1)
        cdfs = _i32(cdfs)
        out = np.zeros(indexes.size, dtype=np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.rans_decoder_decode(
            self._handle, indexes.ctypes.data_as(i32p), indexes.size,
            cdfs.ctypes.data_as(i32p), cdfs.shape[0], cdfs.shape[1],
            _i32(cdf_lengths).ctypes.data_as(i32p),
            _i32(offsets).ctypes.data_as(i32p), out.ctypes.data_as(i32p))
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.rans_decoder_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
