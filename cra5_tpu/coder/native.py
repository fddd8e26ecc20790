"""ctypes binding to the native rANS64 coder (csrc/rans64.cpp).

The shared library is built on demand with g++ (no external wheels,
SURVEY.md §2.6 item 4) and cached next to the source. Falls back to the
pure-Python oracle (rans_py) when no compiler is available.

Interface contract matches the reference coder
(/root/reference/cra5/models/compressai/cpp_exts/rans/rans_interface.hpp:49-113)
but exchanges flat numpy int32 buffers instead of per-element Python lists —
removing the dominant host-side marshalling cost of the reference's
``.tolist()`` pipeline (reference entropy_models.py:263-271).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_SRC = os.path.join(_SRC_DIR, "rans64.cpp")
_LIB = os.path.join(_SRC_DIR, "librans64.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        for attempt in range(2):
            path = _build()
            if path is None:
                _build_failed = True
                return None
            lib = ctypes.CDLL(path)
            if hasattr(lib, "zz_varint_encode"):
                break
            # a stale cached .so (e.g. mtimes preserved by an archive/rsync)
            # predates newer symbols: force one rebuild, else fall back
            if attempt == 0:
                try:
                    os.remove(path)
                except OSError:
                    _build_failed = True
                    return None
            else:
                _build_failed = True
                return None
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)

        lib.rans_encode_with_indexes.restype = ctypes.c_longlong
        lib.rans_encode_with_indexes.argtypes = [
            c_i32p, c_i32p, ctypes.c_size_t,
            c_i32p, c_i32p, c_i32p,
            ctypes.c_size_t, ctypes.c_size_t, c_u8p, ctypes.c_size_t,
        ]
        lib.rans_decode_with_indexes.restype = ctypes.c_int
        lib.rans_decode_with_indexes.argtypes = [
            c_u8p, ctypes.c_size_t, c_i32p, ctypes.c_size_t,
            c_i32p, c_i32p, c_i32p,
            ctypes.c_size_t, ctypes.c_size_t, c_i32p,
        ]
        lib.rans_stream_new.restype = ctypes.c_void_p
        lib.rans_stream_new.argtypes = [c_u8p, ctypes.c_size_t]
        lib.rans_stream_decode.restype = ctypes.c_int
        lib.rans_stream_decode.argtypes = [
            ctypes.c_void_p, c_i32p, ctypes.c_size_t,
            c_i32p, c_i32p, c_i32p,
            ctypes.c_size_t, ctypes.c_size_t, c_i32p,
        ]
        lib.rans_stream_free.restype = None
        lib.rans_stream_free.argtypes = [ctypes.c_void_p]
        lib.rans_validate_cdfs.restype = ctypes.c_int
        lib.rans_validate_cdfs.argtypes = [
            c_i32p, c_i32p, ctypes.c_size_t, ctypes.c_size_t,
        ]
        lib.pmf_to_quantized_cdf_c.restype = ctypes.c_int
        lib.pmf_to_quantized_cdf_c.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_int, c_i32p,
        ]
        lib.zz_varint_encode.restype = ctypes.c_longlong
        lib.zz_varint_encode.argtypes = [
            c_i32p, ctypes.c_size_t, c_u8p, ctypes.c_size_t,
        ]
        lib.zz_varint_decode.restype = ctypes.c_longlong
        lib.zz_varint_decode.argtypes = [
            c_u8p, ctypes.c_size_t, ctypes.c_size_t, c_i32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def _prep_cdfs(cdfs, cdf_sizes) -> Tuple[np.ndarray, np.ndarray, int]:
    if isinstance(cdfs, np.ndarray) and cdfs.ndim == 2:
        table = np.ascontiguousarray(cdfs, dtype=np.int32)
    else:
        sizes = [len(row) for row in cdfs]
        stride = max(sizes)
        table = np.zeros((len(cdfs), stride), dtype=np.int32)
        for i, row in enumerate(cdfs):
            table[i, : len(row)] = row
    return table, _as_i32(cdf_sizes), table.shape[1]


def encode_with_indexes(symbols, indexes, cdfs, cdf_sizes, offsets) -> bytes:
    """Encode int32 symbols; returns the v1-compatible byte stream."""
    lib = _load()
    sym = _as_i32(symbols)
    idx = _as_i32(indexes)
    table, sizes, stride = _prep_cdfs(cdfs, cdf_sizes)
    offs = _as_i32(offsets)
    if lib is None:
        from .rans_py import RansEncoder

        return RansEncoder().encode_with_indexes(
            sym.tolist(), idx.tolist(), table.tolist(), sizes.tolist(), offs.tolist()
        )
    n = sym.size
    cap = 4 * (5 * n + 8) + 64
    out = np.empty(cap, dtype=np.uint8)
    nbytes = lib.rans_encode_with_indexes(
        _ptr(sym, ctypes.c_int32), _ptr(idx, ctypes.c_int32), n,
        _ptr(table, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
        _ptr(offs, ctypes.c_int32), table.shape[0], stride,
        _ptr(out, ctypes.c_uint8), cap,
    )
    if nbytes == -2:
        raise ValueError("rans_encode_with_indexes: invalid CDF table")
    if nbytes == -3:
        raise ValueError("rans_encode_with_indexes: cdf index out of range")
    if nbytes < 0:
        raise RuntimeError("rans_encode_with_indexes: output buffer overflow")
    return out[:nbytes].tobytes()


def decode_with_indexes(encoded: bytes, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
    """Decode to an int32 numpy array shaped like ``indexes``."""
    lib = _load()
    idx_arr = np.asarray(indexes)
    idx = _as_i32(indexes)
    table, sizes, stride = _prep_cdfs(cdfs, cdf_sizes)
    offs = _as_i32(offsets)
    if lib is None:
        from .rans_py import RansDecoder

        vals = RansDecoder().decode_with_indexes(
            encoded, idx.tolist(), table.tolist(), sizes.tolist(), offs.tolist()
        )
        return np.asarray(vals, dtype=np.int32).reshape(idx_arr.shape)
    n = idx.size
    out = np.empty(n, dtype=np.int32)
    buf = np.frombuffer(encoded, dtype=np.uint8)
    rc = lib.rans_decode_with_indexes(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(idx, ctypes.c_int32), n,
        _ptr(table, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
        _ptr(offs, ctypes.c_int32), table.shape[0], stride,
        _ptr(out, ctypes.c_int32),
    )
    if rc == -2:
        raise ValueError("rans_decode_with_indexes: invalid CDF table")
    if rc == -3:
        raise ValueError("rans_decode_with_indexes: cdf index out of range")
    if rc != 0:
        raise ValueError("rans_decode_with_indexes: malformed stream")
    return out.reshape(idx_arr.shape)


class StreamingDecoder:
    """Stateful decoder for autoregressive codecs (parity with reference
    RansDecoder.set_stream/decode_stream, rans_interface.cpp:286-359)."""

    def __init__(self, encoded: bytes):
        self._lib = _load()
        self._handle = None
        self._validated = set()
        if self._lib is None:
            from .rans_py import RansDecoder

            self._py = RansDecoder()
            self._py.set_stream(encoded)
        else:
            buf = np.frombuffer(encoded, dtype=np.uint8)
            self._buf = buf  # keep alive
            self._handle = self._lib.rans_stream_new(_ptr(buf, ctypes.c_uint8), buf.size)
            if not self._handle:
                raise ValueError("malformed stream")

    def decode(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        idx_arr = np.asarray(indexes)
        idx = _as_i32(indexes)
        table, sizes, stride = _prep_cdfs(cdfs, cdf_sizes)
        offs = _as_i32(offsets)
        # validate each distinct table once (the AR loop re-passes the
        # same table per pixel; full per-call validation would dominate)
        tkey = (table.ctypes.data, table.shape)
        if self._lib is not None and tkey not in self._validated:
            rc = self._lib.rans_validate_cdfs(
                _ptr(table, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
                table.shape[0], stride,
            )
            if rc != 0:
                raise ValueError("stream decode: invalid CDF table")
            self._validated.add(tkey)
        if self._lib is None:
            vals = self._py.decode_stream(
                idx.tolist(), table.tolist(), sizes.tolist(), offs.tolist()
            )
            return np.asarray(vals, dtype=np.int32).reshape(idx_arr.shape)
        out = np.empty(idx.size, dtype=np.int32)
        rc = self._lib.rans_stream_decode(
            self._handle, _ptr(idx, ctypes.c_int32), idx.size,
            _ptr(table, ctypes.c_int32), _ptr(sizes, ctypes.c_int32),
            _ptr(offs, ctypes.c_int32), table.shape[0], stride,
            _ptr(out, ctypes.c_int32),
        )
        if rc == -3:
            raise ValueError("stream decode: cdf index out of range")
        if rc != 0:
            raise ValueError("stream decode failed")
        return out.reshape(idx_arr.shape)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.rans_stream_free(self._handle)
            self._handle = None


def pmf_to_quantized_cdf_native(pmf: Sequence[float], precision: int = 16) -> np.ndarray:
    """Native CDF build (parity checked against entropy.cdf in tests)."""
    lib = _load()
    pmf32 = np.ascontiguousarray(pmf, dtype=np.float32)
    if lib is None:
        from ..entropy.cdf import pmf_to_quantized_cdf

        return pmf_to_quantized_cdf(pmf32, precision)
    out = np.empty(pmf32.size + 1, dtype=np.int32)
    rc = lib.pmf_to_quantized_cdf_c(
        pmf32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf32.size,
        precision, _ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError("invalid pmf")
    return out


def zigzag_varint_encode(values: np.ndarray) -> Optional[bytes]:
    """GIL-free varint encode of the v2 escape channel; None if the native
    lib is unavailable (caller falls back to the numpy oracle)."""
    lib = _load()
    if lib is None:
        return None
    vals = _as_i32(values)
    cap = 5 * vals.size + 8
    out = np.empty(cap, dtype=np.uint8)
    nbytes = lib.zz_varint_encode(
        _ptr(vals, ctypes.c_int32), vals.size, _ptr(out, ctypes.c_uint8), cap
    )
    if nbytes < 0:
        raise RuntimeError("zz_varint_encode: output buffer overflow")
    return out[:nbytes].tobytes()


def zigzag_varint_decode(data: bytes, count: int) -> Optional[np.ndarray]:
    """GIL-free varint decode; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(count, dtype=np.int32)
    consumed = lib.zz_varint_decode(
        _ptr(buf, ctypes.c_uint8), buf.size, count, _ptr(out, ctypes.c_int32)
    )
    if consumed < 0:
        raise ValueError("truncated escape side channel")
    return out
