"""Standalone-codec export tooling + binary build/run helpers.

SADL-path capability parity (/root/reference/sadl_codec/):
  - ``export_codec``: trained model -> portable artifact directory
    (tables.bin for EB/GC, quantizer metadata JSON, flat params .npz) —
    the extract_codec.py:57-128 equivalent without the ONNX dependency.
  - ``extract_cdf_from_latents``: per-channel CDFs from latent
    statistics (extract_quantizers.py / extract_cdf.cpp equivalent).
  - ``build_codec_binary``/``run_codec``: compile and drive the pure-C++
    encoder/decoder/RDOQ (csrc/cra5_codec.cpp), which runs bitstreams
    with no Python/torch/JAX at decode time.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

from ..entropy.cdf import CdfTable, build_cdf_table

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_SRC = os.path.join(_SRC_DIR, "cra5_codec.cpp")
_BIN = os.path.join(_SRC_DIR, "cra5_codec")


def build_codec_binary() -> Optional[str]:
    """Compile the standalone codec with g++ (cached)."""
    if os.path.exists(_BIN) and os.path.getmtime(_BIN) >= os.path.getmtime(_SRC):
        return _BIN
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-pthread", _SRC, "-o", _BIN]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _BIN
    except Exception:
        return None


def write_tables_file(path: str, table: CdfTable) -> None:
    with open(path, "wb") as f:
        f.write(b"CRT1")
        f.write(struct.pack("<ii", table.num_indexes, table.max_length))
        f.write(np.ascontiguousarray(table.quantized_cdf, np.int32).tobytes())
        f.write(np.ascontiguousarray(table.cdf_length, np.int32).tobytes())
        f.write(np.ascontiguousarray(table.offset, np.int32).tobytes())


def load_tables_file(path: str) -> CdfTable:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"CRT1":
            raise ValueError("bad tables file")
        n, stride = struct.unpack("<ii", f.read(8))
        cdf = np.frombuffer(f.read(4 * n * stride), np.int32).reshape(n, stride)
        length = np.frombuffer(f.read(4 * n), np.int32)
        offset = np.frombuffer(f.read(4 * n), np.int32)
    return CdfTable(quantized_cdf=cdf.copy(), cdf_length=length.copy(), offset=offset.copy())


def write_tensor_file(path: str, arr: np.ndarray) -> None:
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.float32:
        magic = b"CRXf"
    elif arr.dtype == np.int32:
        magic = b"CRX1"
    else:
        raise ValueError("tensor must be int32 or float32")
    with open(path, "wb") as f:
        f.write(magic)
        f.write(struct.pack("<i", arr.ndim))
        f.write(np.asarray(arr.shape, np.int32).tobytes())
        f.write(arr.tobytes())


def read_tensor_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic not in (b"CRX1", b"CRXf"):
            raise ValueError("bad tensor file")
        (ndim,) = struct.unpack("<i", f.read(4))
        dims = np.frombuffer(f.read(4 * ndim), np.int32)
        dtype = np.float32 if magic == b"CRXf" else np.int32
        data = np.frombuffer(f.read(), dtype)
    return data.reshape(dims).copy()


def run_codec(*args: str) -> subprocess.CompletedProcess:
    binary = build_codec_binary()
    if binary is None:
        raise RuntimeError("g++ unavailable: cannot build standalone codec")
    return subprocess.run([binary, *args], check=True, capture_output=True, text=True)


def extract_cdf_from_latents(
    latents: np.ndarray, tail_mass: float = 1e-6, precision: int = 16
) -> CdfTable:
    """Per-channel quantized CDFs from latent statistics (histogram over
    rounded values; reference dataset2latent.py + extract_cdf.cpp path).
    latents: (N, C, H, W) or (C, ...) float array."""
    if latents.ndim == 4:
        per_chan = latents.transpose(1, 0, 2, 3).reshape(latents.shape[1], -1)
    else:
        per_chan = latents.reshape(latents.shape[0], -1)
    C = per_chan.shape[0]
    sym = np.round(per_chan).astype(np.int64)
    mins = sym.min(axis=1)
    maxs = sym.max(axis=1)
    lengths = (maxs - mins + 1).astype(np.int64)
    max_len = int(lengths.max())
    pmfs = np.zeros((C, max_len), np.float64)
    for c in range(C):
        counts = np.bincount(sym[c] - mins[c], minlength=lengths[c]).astype(np.float64)
        p = counts / counts.sum()
        # reserve tail mass so unseen symbols stay codable via the escape
        pmfs[c, : lengths[c]] = p * (1.0 - tail_mass)
    table = build_cdf_table(pmfs, np.full(C, tail_mass), lengths, precision)
    table.offset = mins.astype(np.int32)
    return table


_SYNTH_TYPES = {
    "channel_bias": 0, "deconv": 1, "igdn": 2, "relu": 3,
    "conv": 4, "gdn": 5, "lrelu": 6,
}


def _gdn_effective(raw: np.ndarray, minimum: float) -> np.ndarray:
    """NonNegativeParam sqrt-reparameterization resolved to effective
    weights (nn/gdn.py::NonNegativeParam) so the C++ GDN is plain."""
    eps = 2.0 ** -18
    pedestal = eps ** 2
    bound = (minimum + pedestal) ** 0.5
    r = np.maximum(np.asarray(raw, np.float64), bound)
    return (r * r - pedestal).astype(np.float32)


def _channel_bias_blob(bias: np.ndarray) -> bytes:
    b = np.asarray(bias, np.float32).reshape(-1)
    return b"".join([
        struct.pack("<ii", _SYNTH_TYPES["channel_bias"], b.size),
        b.tobytes(),
    ])


def _write_crs(path: str, layers, magic: bytes = b"CRS1") -> str:
    with open(path, "wb") as f:
        f.write(magic)
        f.write(struct.pack("<i", len(layers)))
        for blob in layers:
            f.write(blob)
    return path


def _network_blobs(specs: Sequence, params: Dict, dtype: str = "f32") -> list:
    """Serialize a _ConvStack spec tuple + flax params to CRS layer
    blobs (shared by the synthesis and analysis exporters).

    ``dtype="int16"`` emits the quantized-weights variant (magic CRSq):
    conv/deconv kernels stored int16 with one f32 dequantize scale per
    layer — half the artifact size, and the C++ engine then runs the
    conv/deconv FLOPs in int16×int16→int64 integer arithmetic (the
    reference ships float AND int16 SADL builds, sadl_codec
    CMakeLists.txt:18-43). GDN/bias stay f32 (the same f32-island stance
    the TPU compute path takes for its normalization numerics)."""
    if dtype not in ("f32", "int16"):
        raise ValueError(f"unsupported export dtype {dtype!r}")
    layers = []
    for i, spec in enumerate(specs):
        kind = spec[0]
        if kind in ("deconv", "conv"):
            p = params[f"l{i}"]["conv"]
            kern = np.asarray(p["kernel"], np.float32)  # (kh, kw, cin, cout)
            bias = np.asarray(p["bias"], np.float32)
            if kind == "deconv":
                # pre-flip to scatter-accumulate orientation (flax
                # ConvTranspose applies the kernel spatially flipped)
                kern = kern[::-1, ::-1]
            kh, kw, cin, cout = kern.shape
            assert kh == kw, "square kernels only"
            if dtype == "int16":
                wscale = float(np.abs(kern).max()) / 32767.0 or 1.0
                kq = np.clip(
                    np.rint(kern / wscale), -32767, 32767
                ).astype(np.int16)
                payload = struct.pack("<f", wscale) + np.ascontiguousarray(
                    kq
                ).tobytes()
            else:
                payload = np.ascontiguousarray(kern).tobytes()
            layers.append(b"".join([
                struct.pack("<i", _SYNTH_TYPES[kind]),
                struct.pack("<iiii", cin, cout, kh, spec[3]),
                payload,
                bias.tobytes(),
            ]))
        elif kind in ("gdn", "igdn"):
            p = params[f"l{i}"]
            beta = _gdn_effective(p["beta"], 1e-6)
            gamma = _gdn_effective(p["gamma"], 0.0)  # (out, in) row-major
            layers.append(b"".join([
                struct.pack("<ii", _SYNTH_TYPES[kind], beta.size),
                beta.tobytes(),
                np.ascontiguousarray(gamma, np.float32).tobytes(),
            ]))
        elif kind == "relu":
            layers.append(struct.pack("<i", _SYNTH_TYPES["relu"]))
        elif kind == "lrelu":
            layers.append(struct.pack("<i", _SYNTH_TYPES["lrelu"]))
        else:
            raise ValueError(f"layer kind {kind!r} has no standalone equivalent")
    return layers


def export_synthesis(
    path: str,
    specs: Sequence,
    gs_params: Dict,
    medians: Optional[np.ndarray] = None,
    dtype: str = "f32",
) -> str:
    """Write the g_s synthesis network as a portable CRS weights file the
    standalone C++ decoder runs with no Python (reference SADL decoder
    parity, decoder_generic.h:121-213; float & int16 builds
    CMakeLists.txt:18-43 — ``dtype="int16"`` is the int16 engine's
    artifact). ``specs`` is the model's _ConvStack spec tuple;
    ``gs_params`` its flax params; ``medians`` (C,) the EB dequantize
    offsets (prepended as a channel-bias layer)."""
    layers = []
    if medians is not None:
        layers.append(_channel_bias_blob(medians))
    layers.extend(_network_blobs(specs, gs_params, dtype))
    return _write_crs(path, layers, b"CRSq" if dtype == "int16" else b"CRS1")


def export_analysis(
    path: str,
    specs: Sequence,
    ga_params: Dict,
    medians: Optional[np.ndarray] = None,
    dtype: str = "f32",
) -> str:
    """Write the g_a analysis network as a portable CRS weights file for
    the standalone C++ encoder (reference SADL encoder parity,
    encoder_generic.h:141-349): conv/GDN layers followed by a channel-bias
    layer of -medians, so the C++ side's round-to-nearest-even on the
    network output yields the EB symbols directly. ``dtype="int16"``
    emits the quantized artifact for the int16 engine."""
    layers = _network_blobs(specs, ga_params, dtype)
    if medians is not None:
        layers.append(_channel_bias_blob(-np.asarray(medians, np.float32)))
    return _write_crs(path, layers, b"CRSq" if dtype == "int16" else b"CRS1")


def export_codec(
    codec,
    out_dir: str,
    params: Optional[Dict] = None,
    meta: Optional[Dict] = None,
) -> Dict[str, str]:
    """Write the portable artifact directory for a trained codec:
    eb_tables.bin (+ gc_tables.bin), quantizers.json, params.npz."""
    os.makedirs(out_dir, exist_ok=True)
    codec._require_tables()
    paths: Dict[str, str] = {}

    eb_path = os.path.join(out_dir, "eb_tables.bin")
    write_tables_file(eb_path, codec._eb_table)
    paths["eb_tables"] = eb_path
    if getattr(codec, "_gc_table", None) is not None:
        gc_path = os.path.join(out_dir, "gc_tables.bin")
        write_tables_file(gc_path, codec._gc_table)
        paths["gc_tables"] = gc_path

    quant = {
        "precision": 16,
        "bypass_precision": 4,
        "scale_table": (
            np.asarray(codec.scale_table).tolist()
            if getattr(codec, "_gc_table", None) is not None
            else None
        ),
        **(meta or {}),
    }
    qpath = os.path.join(out_dir, "quantizers.json")
    with open(qpath, "w") as f:
        json.dump(quant, f, indent=2)
    paths["quantizers"] = qpath

    if params is not None:
        flat = {}

        def _walk(tree, prefix=""):
            for k, v in tree.items():
                name = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    _walk(v, name)
                else:
                    flat[name] = np.asarray(v)

        _walk(params)
        ppath = os.path.join(out_dir, "params.npz")
        np.savez(ppath, **flat)
        paths["params"] = ppath
    return paths
