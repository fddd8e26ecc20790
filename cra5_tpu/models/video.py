"""ScaleSpaceFlow (Agustsson et al., CVPR 2020): end-to-end video codec.

Capability parity with the reference ssf2020
(/root/reference/cra5/models/compressai/models/video/google.py:50-437):
I-frame codec + motion codec + residual codec, each a mean/scale
hyperprior with separate mean and QReLU'd scale hyper-decoders; scale-
space warping via a Gaussian volume and trilinear sampling.

TPU-first notes: the Gaussian volume is a stack of depthwise blurs /
avg-pools that XLA fuses; 3D warping is an explicit gather-based
trilinear sampler with border clamping (no torch grid_sample); the
per-frame training forward over a fixed clip length is one jittable
function. Entropy coding is host-side in ``ScaleSpaceFlowCodec``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy.ops import quantize_ste
from ..nn.conv import conv2d, deconv2d, qrelu
from .google import _ConvStack


def _enc_spec(mid: int, out: int) -> Tuple[Tuple, ...]:
    return (
        ("conv", mid, 5, 2), ("relu",),
        ("conv", mid, 5, 2), ("relu",),
        ("conv", mid, 5, 2), ("relu",),
        ("conv", out, 5, 2),
    )


def _dec_spec(mid: int, out: int) -> Tuple[Tuple, ...]:
    return (
        ("deconv", mid, 5, 2), ("relu",),
        ("deconv", mid, 5, 2), ("relu",),
        ("deconv", mid, 5, 2), ("relu",),
        ("deconv", out, 5, 2),
    )


class _HyperDecoderQReLU(nn.Module):
    """Scale hyper-decoder with QReLU activations (reference
    video/google.py:122-143)."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = qrelu(deconv2d(self.mid, 5, 2, name="d1")(x))
        x = qrelu(deconv2d(self.mid, 5, 2, name="d2")(x))
        return qrelu(deconv2d(self.out, 5, 2, name="d3")(x))


class Hyperprior(nn.Module):
    """Per-latent mean/scale hyperprior (reference video/google.py:145-191)."""

    planes: int = 192
    mid_planes: int = 192

    def setup(self):
        p, m = self.planes, self.mid_planes
        self.hyper_encoder = _ConvStack(
            (
                ("conv", m, 5, 2), ("relu",),
                ("conv", m, 5, 2), ("relu",),
                ("conv", p, 5, 2),
            ),
            name="hyper_encoder",
        )
        self.hyper_decoder_mean = _ConvStack(
            (
                ("deconv", m, 5, 2), ("relu",),
                ("deconv", m, 5, 2), ("relu",),
                ("deconv", p, 5, 2),
            ),
            name="hyper_decoder_mean",
        )
        self.hyper_decoder_scale = _HyperDecoderQReLU(m, p, name="hyper_decoder_scale")
        self.entropy_bottleneck = EntropyBottleneck(channels=m)
        self.gaussian_conditional = GaussianConditional()

    def params_from_zhat(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.hyper_decoder_scale(z_hat), self.hyper_decoder_mean(z_hat)

    def __call__(
        self, y: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ):
        rngs = dict(zip(("eb", "gc"), jax.random.split(rng, 2))) if rng is not None else {}
        z = self.hyper_encoder(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, rng=rngs.get("eb"))
        scales, means = self.params_from_zhat(z_hat)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rngs.get("gc")
        )
        y_hat = quantize_ste(y - means) + means
        return y_hat, {"y": y_likelihoods, "z": z_likelihoods}

    # device halves for host coding
    def symbols(self, y: jax.Array) -> Dict[str, Any]:
        z = self.hyper_encoder(y)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_sym.astype(z.dtype) + medians
        scales, means = self.params_from_zhat(z_hat)
        y_sym = jnp.round(y - means).astype(jnp.int32)
        y_hat = y_sym.astype(y.dtype) + means
        return {"y_sym": y_sym, "z_sym": z_sym, "scales": scales, "means": means,
                "y_hat": y_hat, "z_shape": z.shape[-2:]}

    def params_from_z_symbols(self, z_sym: jax.Array):
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(jnp.float32) + medians
        return self.params_from_zhat(z_hat)


def gaussian_blur(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian blur, reflect-free 'same' padding."""
    C = x.shape[1]
    k = kernel1d.shape[0]
    pad = k // 2
    kh = jnp.tile(kernel1d.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(kernel1d.reshape(1, k, 1, 1), (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), ((pad, pad), (0, 0)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), ((0, 0), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )


def gaussian_volume(x: jax.Array, sigma: float, num_levels: int) -> jax.Array:
    """(N, C, H, W) -> (N, C, L, H, W) blur pyramid, L = num_levels + 1
    (reference video/google.py:328-352)."""
    ksize = 2 * int(math.ceil(3 * sigma)) + 1
    g = np.exp(-0.5 * ((np.arange(ksize) - ksize // 2) / sigma) ** 2)
    kernel = jnp.asarray((g / g.sum()).astype(np.float32))

    volume = [x[:, :, None]]
    x = gaussian_blur(x, kernel)
    volume.append(x[:, :, None])
    H, W = x.shape[-2:]
    for i in range(1, num_levels):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        x = gaussian_blur(x, kernel)
        interp = jax.image.resize(
            x, x.shape[:-2] + (H, W), method="bilinear"
        )
        volume.append(interp[:, :, None])
    return jnp.concatenate(volume, axis=2)


def warp_volume_3d(
    volume: jax.Array, flow: jax.Array, scale_field: jax.Array
) -> jax.Array:
    """Trilinear sample of (N, C, L, H, W) at normalized coords
    (grid + flow, scale_field), align_corners=False, border padding
    (reference video/google.py:354-371 warp_volume)."""
    N, C, L, H, W = volume.shape

    ys = jnp.linspace(-1.0 + 1.0 / H, 1.0 - 1.0 / H, H)
    xs = jnp.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)
    base_y, base_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    gx = base_x[None] + flow[:, 0]  # (N, H, W) normalized
    gy = base_y[None] + flow[:, 1]
    gz = scale_field[:, 0]

    # unnormalize (align_corners=False): p = ((g + 1) * S - 1) / 2
    px = ((gx + 1.0) * W - 1.0) * 0.5
    py = ((gy + 1.0) * H - 1.0) * 0.5
    pz = ((gz + 1.0) * L - 1.0) * 0.5

    def _axis(p, size):
        p0 = jnp.floor(p)
        w1 = p - p0
        i0 = jnp.clip(p0.astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(p0.astype(jnp.int32) + 1, 0, size - 1)
        return i0, i1, w1

    x0, x1, wx = _axis(px, W)
    y0, y1, wy = _axis(py, H)
    z0, z1, wz = _axis(pz, L)

    def gather(zi, yi, xi):
        # volume: (N, C, L, H, W); indices (N, H, W) -> out (N, C, H, W)
        flat = volume.reshape(N, C, L * H * W)
        lin = (zi * H + yi) * W + xi  # (N, H, W)
        lin = lin.reshape(N, 1, H * W)
        out = jnp.take_along_axis(flat, jnp.broadcast_to(lin, (N, C, H * W)), axis=2)
        return out.reshape(N, C, H, W)

    def lerp(a, b, w):
        return a + (b - a) * w[:, None]

    c00 = lerp(gather(z0, y0, x0), gather(z0, y0, x1), wx)
    c01 = lerp(gather(z0, y1, x0), gather(z0, y1, x1), wx)
    c10 = lerp(gather(z1, y0, x0), gather(z1, y0, x1), wx)
    c11 = lerp(gather(z1, y1, x0), gather(z1, y1, x1), wx)
    c0 = lerp(c00, c01, wy)
    c1 = lerp(c10, c11, wy)
    return lerp(c0, c1, wz)


class ScaleSpaceFlow(nn.Module):
    num_levels: int = 5
    sigma0: float = 1.5
    scale_field_shift: float = 1.0
    mid_planes: int = 128
    planes: int = 192
    in_channel: int = 3

    def setup(self):
        m, p, c = self.mid_planes, self.planes, self.in_channel
        self.img_encoder = _ConvStack(_enc_spec(m, p), name="img_encoder")
        self.img_decoder = _ConvStack(_dec_spec(m, c), name="img_decoder")
        self.img_hyperprior = Hyperprior(p, p, name="img_hyperprior")

        self.res_encoder = _ConvStack(_enc_spec(m, p), name="res_encoder")
        self.res_decoder = _ConvStack(_dec_spec(m, c), name="res_decoder")
        self.res_hyperprior = Hyperprior(p, p, name="res_hyperprior")

        self.motion_encoder = _ConvStack(_enc_spec(m, p), name="motion_encoder")
        self.motion_decoder = _ConvStack(_dec_spec(m, 3), name="motion_decoder")
        self.motion_hyperprior = Hyperprior(p, p, name="motion_hyperprior")

    def forward_prediction(self, x_ref: jax.Array, motion_info: jax.Array) -> jax.Array:
        flow, scale_field = motion_info[:, :2], motion_info[:, 2:]
        volume = gaussian_volume(x_ref, self.sigma0, self.num_levels)
        return warp_volume_3d(volume, flow, scale_field + self.scale_field_shift - 1.0)

    def forward_keyframe(self, x, training=False, rng=None):
        y = self.img_encoder(x)
        y_hat, likelihoods = self.img_hyperprior(y, training=training, rng=rng)
        x_hat = self.img_decoder(y_hat)
        return x_hat, {"keyframe": likelihoods}

    def forward_inter(self, x_cur, x_ref, training=False, rng=None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=1))
        y_motion_hat, motion_lk = self.motion_hyperprior(y_motion, training=training, rng=rngs[0])
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lk = self.res_hyperprior(y_res, training=training, rng=rngs[1])
        y_combine = jnp.concatenate([y_res_hat, y_motion_hat], axis=1)
        x_res_hat = self.res_decoder(y_combine)
        x_rec = x_pred + x_res_hat
        return x_rec, {"motion": motion_lk, "residual": res_lk}

    def __call__(
        self,
        frames: jax.Array,  # (T, B, C, H, W)
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        T = frames.shape[0]
        rngs = jax.random.split(rng, T) if rng is not None else [None] * T
        recs, lks = [], []
        x_hat, lk = self.forward_keyframe(frames[0], training, rngs[0])
        recs.append(x_hat)
        lks.append(lk)
        x_ref = jax.lax.stop_gradient(x_hat)
        for i in range(1, T):
            x_ref, lk = self.forward_inter(frames[i], x_ref, training, rngs[i])
            recs.append(x_ref)
            lks.append(lk)
        return {"x_hat": jnp.stack(recs), "likelihoods": lks}

    def aux_loss(self) -> jax.Array:
        return (
            self.img_hyperprior.entropy_bottleneck.loss()
            + self.res_hyperprior.entropy_bottleneck.loss()
            + self.motion_hyperprior.entropy_bottleneck.loss()
        )

    # ---- device halves for the host codec ----
    def analyze(self, x: jax.Array, which: str) -> jax.Array:
        if which == "keyframe":
            return self.img_encoder(x)
        if which == "residual":
            return self.res_encoder(x)
        return self.motion_encoder(x)

    def hp(self, which: str) -> Hyperprior:
        return {
            "keyframe": self.img_hyperprior,
            "residual": self.res_hyperprior,
            "motion": self.motion_hyperprior,
        }[which]

    def hp_symbols(self, y: jax.Array, which: str):
        return self.hp(which).symbols(y)

    def hp_params(self, z_sym: jax.Array, which: str):
        return self.hp(which).params_from_z_symbols(z_sym)

    def synthesize_keyframe(self, y_hat: jax.Array) -> jax.Array:
        return self.img_decoder(y_hat)

    def motion_to_pred(self, x_ref: jax.Array, y_motion_hat: jax.Array) -> jax.Array:
        return self.forward_prediction(x_ref, self.motion_decoder(y_motion_hat))

    def synthesize_res(self, y_res_hat: jax.Array, y_motion_hat: jax.Array) -> jax.Array:
        return self.res_decoder(jnp.concatenate([y_res_hat, y_motion_hat], axis=1))


class ScaleSpaceFlowCodec:
    """Host-side frame-serial compress/decompress (reference
    video/google.py:390-431): keyframe then inter frames, three entropy-
    coded streams per inter frame (motion y/z implicit via Hyperprior)."""

    def __init__(self, model: ScaleSpaceFlow, variables: Dict[str, Any]):
        from ..coder.rans_tpu import LaneCoder
        from ..entropy import eb_update, gc_update, get_scale_table
        from ..entropy.entropy_bottleneck import eb_params_from_variables

        self.model = model
        self.variables = variables
        self.scale_table = get_scale_table()
        self._scale_table_dev = jnp.asarray(self.scale_table)
        self._tables = {}
        self._coders = {}
        gc_table = gc_update(self.scale_table)
        gc_coder = LaneCoder(gc_table)
        for which, name in (
            ("keyframe", "img_hyperprior"),
            ("residual", "res_hyperprior"),
            ("motion", "motion_hyperprior"),
        ):
            eb_params = eb_params_from_variables(
                self.variables, f"{name}/entropy_bottleneck"
            )
            eb_table = eb_update(eb_params)
            self._tables[which] = {"eb": eb_table, "gc": gc_table}
            self._coders[which] = {"eb": LaneCoder(eb_table), "gc": gc_coder}
        self._gc_index = jax.jit(
            lambda scales, table: build_indexes(scales.astype(jnp.float32), table)
        )

        m = model
        self._analyze = jax.jit(
            lambda v, x, w: m.apply(v, x, w, method=type(m).analyze),
            static_argnums=(2,),
        )
        self._hp_symbols = jax.jit(
            lambda v, y, w: m.apply(v, y, w, method=type(m).hp_symbols),
            static_argnums=(2,),
        )
        self._hp_params = jax.jit(
            lambda v, z, w: m.apply(v, z, w, method=type(m).hp_params),
            static_argnums=(2,),
        )
        self._syn_kf = jax.jit(lambda v, y: m.apply(v, y, method=type(m).synthesize_keyframe))
        self._motion_pred = jax.jit(
            lambda v, xr, ym: m.apply(v, xr, ym, method=type(m).motion_to_pred)
        )
        self._syn_res = jax.jit(
            lambda v, yr, ym: m.apply(v, yr, ym, method=type(m).synthesize_res)
        )

    def _code_hp(self, y, which):
        """Encode one latent through hyperprior ``which`` -> (y_hat, strings,
        z_shape); symbols stay device-resident (format v2 streams)."""
        out = self._hp_symbols(self.variables, y, which)
        coders = self._coders[which]
        z_sym = out["z_sym"]
        y_sym = out["y_sym"]
        B, C = z_sym.shape[:2]
        z_idx = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape
        )
        gc_idx = self._gc_index(out["scales"], self._scale_table_dev)
        z_strings = [
            coders["eb"].encode_from_device(z_sym[i], z_idx[i]) for i in range(B)
        ]
        y_strings = [
            coders["gc"].encode_from_device(y_sym[i], gc_idx[i]) for i in range(B)
        ]
        return out["y_hat"], [y_strings, z_strings], tuple(int(s) for s in out["z_sym"].shape[-2:])

    def _decode_hp(self, strings, z_shape, which, batch):
        coders = self._coders[which]
        C = self.model.planes
        full_z = (batch, C, z_shape[0], z_shape[1])
        z_idx = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :, None, None], full_z
        )
        z_sym = jnp.stack(
            [
                coders["eb"].decode_to_device(strings[1][i], z_idx[i])
                for i in range(batch)
            ]
        )
        scales, means = self._hp_params(self.variables, z_sym, which)
        gc_idx = self._gc_index(scales, self._scale_table_dev)
        y_sym = jnp.stack(
            [
                coders["gc"].decode_to_device(strings[0][i], gc_idx[i])
                for i in range(batch)
            ]
        )
        return y_sym.astype(jnp.float32) + means

    def compress(self, frames: Sequence) -> Tuple[List, List]:
        frame_strings, shape_infos = [], []
        x = jnp.asarray(frames[0])
        y = self._analyze(self.variables, x, "keyframe")
        y_hat, strings, z_shape = self._code_hp(y, "keyframe")
        x_ref = self._syn_kf(self.variables, y_hat)
        frame_strings.append(strings)
        shape_infos.append(z_shape)

        for i in range(1, len(frames)):
            x_cur = jnp.asarray(frames[i])
            y_motion = self._analyze(
                self.variables, jnp.concatenate([x_cur, x_ref], axis=1), "motion"
            )
            y_motion_hat, motion_strings, motion_shape = self._code_hp(y_motion, "motion")
            x_pred = self._motion_pred(self.variables, x_ref, y_motion_hat)
            y_res = self._analyze(self.variables, x_cur - x_pred, "residual")
            y_res_hat, res_strings, res_shape = self._code_hp(y_res, "residual")
            x_ref = x_pred + self._syn_res(self.variables, y_res_hat, y_motion_hat)
            frame_strings.append({"motion": motion_strings, "residual": res_strings})
            shape_infos.append({"motion": motion_shape, "residual": res_shape})
        return frame_strings, shape_infos

    def decompress(self, strings: Sequence, shapes: Sequence) -> List[jax.Array]:
        B = len(strings[0][1])
        y_hat = self._decode_hp(strings[0], shapes[0], "keyframe", B)
        x_ref = self._syn_kf(self.variables, y_hat)
        frames = [x_ref]
        for i in range(1, len(strings)):
            y_motion_hat = self._decode_hp(
                strings[i]["motion"], shapes[i]["motion"], "motion", B
            )
            x_pred = self._motion_pred(self.variables, x_ref, y_motion_hat)
            y_res_hat = self._decode_hp(
                strings[i]["residual"], shapes[i]["residual"], "residual", B
            )
            x_ref = x_pred + self._syn_res(self.variables, y_res_hat, y_motion_hat)
            frames.append(x_ref)
        return frames
