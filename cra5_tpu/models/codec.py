"""Host-side compress/decompress orchestration for the zoo models.

The flax models in ``google.py``/``waseda.py`` are pure device functions;
this module owns the derived entropy-coding state (integer CDF tables +
rANS coders) and moves only int32 symbol tensors across the host/device
boundary. Parity surface: ``model.compress``/``model.decompress`` of the
reference (e.g. MeanScaleHyperprior.compress, models/google.py:482-506);
strings use the same [[y_str...], [z_str...]] nesting.

Coders: ``coder="v2"`` is the TPU interleaved-lane rANS (container v2);
``coder="v1"`` is bit-compatible with the reference's C++ rans64 streams.
The autoregressive codec is host-serial by construction (the reference's
own worst-case pattern, google.py:665-670) and always uses v1 streaming.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coder import native
from ..coder.rans_py import BufferedRansEncoder, RansDecoder
from ..entropy import build_indexes, eb_update, gc_update, get_scale_table
from ..entropy.cdf import CdfTable
from ..entropy.entropy_bottleneck import eb_params_from_variables


def _unwrap(s):
    if isinstance(s, (list, tuple)):
        return s[0]
    return s


class _CodecBase:
    """CDF-table management + stream helpers shared by all codecs."""

    def __init__(self, model, variables, coder: str = "v2", scale_table=None):
        self.model = model
        self.variables = variables
        self.coder = coder
        self.scale_table = (
            np.asarray(scale_table, np.float32)
            if scale_table is not None
            else get_scale_table()
        )
        self._eb_table: Optional[CdfTable] = None
        self._gc_table: Optional[CdfTable] = None
        self._eb_coder = None
        self._gc_coder = None

    def update(self, force: bool = False) -> bool:
        """(Re)build integer CDF tables from the trained EB params + scale
        table (parity with CompressionModel.update, reference models/base.py:91)."""
        if self._eb_table is not None and not force:
            return False
        eb_params = eb_params_from_variables(self.variables, "entropy_bottleneck")
        self._eb_table = eb_update(eb_params)
        if self._uses_gc():
            self._gc_table = gc_update(self.scale_table)
        if self.coder == "v2":
            from ..coder.rans_tpu import LaneCoder

            self._eb_coder = LaneCoder(self._eb_table)
            if self._gc_table is not None:
                self._gc_coder = LaneCoder(self._gc_table)
        return True

    def _uses_gc(self) -> bool:
        return getattr(self.model, "CODEC_KIND", "hyper") != "factorized"

    def _require_tables(self):
        if self._eb_table is None:
            self.update()

    def _encode_stream(self, table: CdfTable, coder, sym: np.ndarray, idx: np.ndarray) -> bytes:
        if self.coder == "v2":
            return coder.encode(sym, idx)
        return native.encode_with_indexes(
            sym, idx, table.quantized_cdf, table.cdf_length, table.offset
        )

    def _decode_stream(self, table: CdfTable, coder, data: bytes, idx: np.ndarray) -> np.ndarray:
        if self.coder == "v2":
            return coder.decode(data, idx)
        return native.decode_with_indexes(
            data, idx, table.quantized_cdf, table.cdf_length, table.offset
        )

    @staticmethod
    def _channel_indexes(shape: Tuple[int, ...]) -> np.ndarray:
        """Per-channel CDF rows for an EB-coded tensor (reference
        entropy_models.py:512 ``_build_indexes``)."""
        C = shape[1]
        return np.broadcast_to(
            np.arange(C, dtype=np.int32)[None, :, None, None], shape
        ).copy()


class ImageCodec(_CodecBase):
    """Generic codec for factorized and hyperprior zoo models.

    Dispatches on the model's ``CODEC_KIND`` ("factorized" | "hyper") and
    ``GC_HAS_MEANS``; works for FactorizedPrior(+ReLU), ScaleHyperprior,
    MeanScaleHyperprior, Cheng-style models without the context loop, and
    any custom model exposing the same device methods.
    """

    def __init__(self, model, variables, coder: str = "v2", scale_table=None):
        super().__init__(model, variables, coder, scale_table)
        cls = type(model)
        self._encode_symbols = jax.jit(
            lambda v, x: model.apply(v, x, method=cls.encode_symbols)
        )
        self._reconstruct = jax.jit(
            lambda v, y_sym, means: model.apply(v, y_sym, means, method=cls.reconstruct)
        )
        self._forward = jax.jit(lambda v, x: model.apply(v, x))
        if self._uses_gc():
            self._hyper_from_z = jax.jit(
                lambda v, z: model.apply(v, z, method=cls.hyper_params_from_z)
            )
        # single-dispatch helpers (eager ops pay a round trip each on
        # tunneled TPU backends)
        self._scale_table_dev = jnp.asarray(self.scale_table)
        self._gc_index = jax.jit(
            lambda scales: build_indexes(
                scales.astype(jnp.float32), self._scale_table_dev
            )
        )
        self._chan_idx_cache = {}

    @property
    def kind(self) -> str:
        return getattr(self.model, "CODEC_KIND", "hyper")

    def forward(self, x):
        return self._forward(self.variables, jnp.asarray(x))

    def _channel_indexes_dev(self, shape) -> jnp.ndarray:
        shape = tuple(int(s) for s in shape)
        if shape not in self._chan_idx_cache:
            C = shape[1]
            self._chan_idx_cache[shape] = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32)[None, :, None, None], shape
            )
        return self._chan_idx_cache[shape]

    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        out = self._encode_symbols(self.variables, jnp.asarray(x))
        if self.kind == "factorized":
            if self.coder == "v2":
                idx = self._channel_indexes_dev(out["y_sym"].shape)
                y_strings = self._eb_coder.encode_finalize_many(
                    self._eb_coder.encode_dispatch_batch(out["y_sym"], idx)
                )
            else:
                y_sym = np.asarray(out["y_sym"])
                idx = self._channel_indexes(y_sym.shape)
                y_strings = [
                    self._encode_stream(self._eb_table, self._eb_coder, y_sym[i], idx[i])
                    for i in range(y_sym.shape[0])
                ]
            return {
                "strings": [y_strings],
                "shape": tuple(int(s) for s in out["y_sym"].shape[-2:]),
            }

        if self.coder == "v2":
            # dispatch every stream before any host transfer, then finalize
            # with two batched roundtrips (see LaneCoder.encode_dispatch)
            gc_idx = self._gc_index(out["scales"])
            z_idx = self._channel_indexes_dev(out["z_sym"].shape)
            B = out["z_sym"].shape[0]
            handles = self._eb_coder.encode_dispatch_batch(
                out["z_sym"], z_idx
            ) + self._gc_coder.encode_dispatch_batch(out["y_sym"], gc_idx)
            streams = self._eb_coder.encode_finalize_many(handles)
            return {
                "strings": [streams[B:], streams[:B]],
                "shape": tuple(int(s) for s in out["z_sym"].shape[-2:]),
            }

        y_sym = np.asarray(out["y_sym"])
        z_sym = np.asarray(out["z_sym"])
        scales = np.asarray(out["scales"], np.float32)
        z_idx = self._channel_indexes(z_sym.shape)
        gc_idx = np.asarray(
            build_indexes(jnp.asarray(scales), jnp.asarray(self.scale_table))
        )
        z_strings = [
            self._encode_stream(self._eb_table, self._eb_coder, z_sym[i], z_idx[i])
            for i in range(z_sym.shape[0])
        ]
        y_strings = [
            self._encode_stream(self._gc_table, self._gc_coder, y_sym[i], gc_idx[i])
            for i in range(y_sym.shape[0])
        ]
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(int(s) for s in out["z_sym"].shape[-2:]),
        }

    def decompress(self, strings: Sequence, shape: Tuple[int, int]) -> Dict[str, Any]:
        self._require_tables()
        if self.kind == "factorized":
            y_strings = strings[0]
            B = len(y_strings)
            C = self.model.M
            full = (B, C, int(shape[0]), int(shape[1]))
            if self.coder == "v2":
                idx = self._channel_indexes_dev(full)
                y_sym = self._eb_coder.decode_batch_to_device(
                    list(y_strings), idx, row_plan=full[2] * full[3]
                )
            else:
                idx = self._channel_indexes(full)
                y_sym = jnp.asarray(
                    np.stack(
                        [
                            self._decode_stream(
                                self._eb_table, self._eb_coder, _unwrap(y_strings[i]), idx[i]
                            )
                            for i in range(B)
                        ]
                    )
                )
            x_hat = self._reconstruct(self.variables, y_sym, None)
            return {"x_hat": x_hat}

        y_strings, z_strings = strings[0], strings[1]
        B = len(z_strings)
        C = self.model.N
        full_z = (B, C, int(shape[0]), int(shape[1]))
        if self.coder == "v2":
            # issue the y-stream H2D before the z-scan/hyper compute (its
            # indexes don't exist yet, but its bytes do — see upload_batch)
            y_up = self._gc_coder.upload_batch(list(y_strings))
            z_idx = self._channel_indexes_dev(full_z)
            z_sym = self._eb_coder.decode_batch_to_device(
                list(z_strings), z_idx, row_plan=full_z[2] * full_z[3]
            )
            scales, means = self._hyper_from_z(self.variables, z_sym)
            gc_idx = self._gc_index(scales)
            y_sym = self._gc_coder.decode_uploaded_batch(y_up, gc_idx)
        else:
            z_idx = self._channel_indexes(full_z)
            z_sym = jnp.asarray(
                np.stack(
                    [
                        self._decode_stream(
                            self._eb_table, self._eb_coder, _unwrap(z_strings[i]), z_idx[i]
                        )
                        for i in range(B)
                    ]
                )
            )
            scales, means = self._hyper_from_z(self.variables, z_sym)
            gc_idx = np.asarray(
                build_indexes(jnp.asarray(scales, jnp.float32), jnp.asarray(self.scale_table))
            )
            y_sym = jnp.asarray(
                np.stack(
                    [
                        self._decode_stream(
                            self._gc_table, self._gc_coder, _unwrap(y_strings[i]), gc_idx[i]
                        )
                        for i in range(B)
                    ]
                )
            )
        x_hat = self._reconstruct(self.variables, y_sym, means)
        return {"x_hat": x_hat}


class AutoregressiveCodec(_CodecBase):
    """Serial raster-scan codec for JointAutoregressiveHierarchicalPriors
    and Cheng2020 (reference _compress_ar/_decompress_ar, google.py:717-845).

    The per-pixel loop runs on host in numpy using weights pulled from the
    flax variables; y/z analysis and the final synthesis run jitted on
    device. Always uses the v1 streaming rANS (the AR loop requires
    symbol-at-a-time decode)."""

    def __init__(self, model, variables, scale_table=None):
        super().__init__(model, variables, coder="v1", scale_table=scale_table)
        cls = type(model)
        self._analysis = jax.jit(lambda v, x: model.apply(v, x, method=cls.analysis))
        self._hyper_synthesis = jax.jit(
            lambda v, z: model.apply(v, z, method=cls.hyper_synthesis)
        )
        self._synthesis = jax.jit(lambda v, y: model.apply(v, y, method=cls.synthesis))
        self._forward = jax.jit(lambda v, x: model.apply(v, x))
        self._load_host_params()

    def _load_host_params(self):
        p = self.variables["params"]
        cp = p["context_prediction"]
        from ..nn.conv import _mask_A_B

        k = np.asarray(cp["kernel"], np.float32)  # (kh, kw, M, 2M)
        mask = _mask_A_B(k.shape[:2], "A", k.shape[2], k.shape[3])
        self._ctx_kernel = k * mask
        self._ctx_bias = np.asarray(cp["bias"], np.float32)
        ep = p["entropy_parameters"]
        self._ep_layers = []
        for name in sorted(ep.keys(), key=lambda s: int(s[1:])):
            conv = ep[name]["conv"]
            w = np.asarray(conv["kernel"], np.float32)[0, 0]  # (cin, cout)
            b = np.asarray(conv["bias"], np.float32)
            self._ep_layers.append((w, b))

    def forward(self, x):
        return self._forward(self.variables, jnp.asarray(x))

    def _entropy_parameters_vec(self, x: np.ndarray) -> np.ndarray:
        """x: (..., cin) -> (..., 2M) through the 1x1-conv MLP."""
        for i, (w, b) in enumerate(self._ep_layers):
            x = x @ w + b
            if i < len(self._ep_layers) - 1:
                x = np.where(x >= 0, x, 0.01 * x)
        return x

    def _ctx_at(self, y_hat_pad: np.ndarray, h: int, w: int) -> np.ndarray:
        """Masked 5x5 context at (h, w); y_hat_pad: (M, H+2p, W+2p)."""
        k = self._ctx_kernel.shape[0]
        patch = y_hat_pad[:, h : h + k, w : w + k]  # (M, k, k)
        return np.einsum("hwio,ihw->o", self._ctx_kernel, patch) + self._ctx_bias

    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        out = self._analysis(self.variables, jnp.asarray(x))
        y = np.asarray(out["y"], np.float32)
        z_sym = np.asarray(out["z_sym"])
        z_shape = tuple(int(s) for s in out["z_sym"].shape[-2:])

        z_idx = self._channel_indexes(z_sym.shape)
        z_strings = [
            self._encode_stream(self._eb_table, None, z_sym[i], z_idx[i])
            for i in range(z_sym.shape[0])
        ]
        params = np.asarray(
            self._hyper_synthesis(self.variables, jnp.asarray(z_sym)), np.float32
        )

        y_strings = [
            self._compress_ar(y[i], params[i]) for i in range(y.shape[0])
        ]
        return {"strings": [y_strings, z_strings], "shape": z_shape}

    def _compress_ar(self, y: np.ndarray, params: np.ndarray) -> bytes:
        M, H, W = y.shape
        k = self._ctx_kernel.shape[0]
        pad = (k - 1) // 2
        y_hat = np.zeros((M, H + 2 * pad, W + 2 * pad), np.float32)
        table = self._gc_table
        st = self.scale_table.astype(np.float64)

        enc = BufferedRansEncoder()
        syms_all, idx_all = [], []
        for h in range(H):
            for w in range(W):
                ctx = self._ctx_at(y_hat, h, w)
                ep_in = np.concatenate([params[:, h, w], ctx])
                gp = self._entropy_parameters_vec(ep_in)
                scales, means = gp[:M], gp[M:]
                idx = np.searchsorted(
                    st[:-1], np.maximum(scales, st[0]), side="left"
                ).astype(np.int32)
                sym = np.round(y[:, h, w] - means).astype(np.int32)
                y_hat[:, h + pad, w + pad] = sym + means
                syms_all.append(sym)
                idx_all.append(idx)
        enc.encode_with_indexes(
            np.concatenate(syms_all),
            np.concatenate(idx_all),
            table.quantized_cdf,
            table.cdf_length,
            table.offset,
        )
        return enc.flush()

    def decompress(self, strings: Sequence, shape: Tuple[int, int]) -> Dict[str, Any]:
        self._require_tables()
        y_strings, z_strings = strings[0], strings[1]
        B = len(z_strings)
        C = self.model.N
        full_z = (B, C, int(shape[0]), int(shape[1]))
        z_idx = self._channel_indexes(full_z)
        z_sym = np.stack(
            [
                self._decode_stream(
                    self._eb_table, None, _unwrap(z_strings[i]), z_idx[i]
                )
                for i in range(B)
            ]
        )
        params = np.asarray(
            self._hyper_synthesis(self.variables, jnp.asarray(z_sym)), np.float32
        )
        s = 4  # z -> y upsampling factor (reference google.py:790)
        H, W = int(shape[0]) * s, int(shape[1]) * s
        y_hat = np.stack(
            [
                self._decompress_ar(_unwrap(y_strings[i]), params[i], H, W)
                for i in range(B)
            ]
        )
        x_hat = self._synthesis(self.variables, jnp.asarray(y_hat))
        return {"x_hat": x_hat}

    def _decompress_ar(self, data: bytes, params: np.ndarray, H: int, W: int) -> np.ndarray:
        M = self.model.M
        k = self._ctx_kernel.shape[0]
        pad = (k - 1) // 2
        y_hat = np.zeros((M, H + 2 * pad, W + 2 * pad), np.float32)
        table = self._gc_table
        st = self.scale_table.astype(np.float64)

        dec = RansDecoder()
        dec.set_stream(data)
        for h in range(H):
            for w in range(W):
                ctx = self._ctx_at(y_hat, h, w)
                ep_in = np.concatenate([params[:, h, w], ctx])
                gp = self._entropy_parameters_vec(ep_in)
                scales, means = gp[:M], gp[M:]
                idx = np.searchsorted(
                    st[:-1], np.maximum(scales, st[0]), side="left"
                ).astype(np.int32)
                sym = dec.decode_stream(
                    idx, table.quantized_cdf, table.cdf_length, table.offset
                )
                y_hat[:, h + pad, w + pad] = np.asarray(sym, np.float32) + means
        return y_hat[:, pad : pad + H, pad : pad + W]


def make_codec(model, variables, coder: str = "v2", scale_table=None):
    """Pick the right codec for a zoo model."""
    kind = getattr(model, "CODEC_KIND", "hyper")
    if kind == "vaeformer":
        from .vaeformer import VAEformerCodec

        return VAEformerCodec(model, variables, coder=coder, scale_table=scale_table)
    if kind == "autoregressive":
        return AutoregressiveCodec(model, variables, scale_table=scale_table)
    if kind == "elic":
        from .elic2022 import ElicCodec

        return ElicCodec(model, variables, scale_table=scale_table)
    if kind == "charm":
        from .stf2022 import CharmCodec

        return CharmCodec(model, variables, scale_table=scale_table)
    return ImageCodec(model, variables, coder=coder, scale_table=scale_table)
