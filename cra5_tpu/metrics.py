"""Evaluation metrics: PSNR, MS-SSIM, and weather-native scores.

Capability parity with the reference's evaluation surface: PSNR/MS-SSIM
(/root/reference/cra5/models/compressai/utils/eval_model/__main__.py:81-117,
pytorch_msssim), bpp-from-likelihoods (losses/rate_distortion.py:71-74),
and the latitude-weighted RMSE the reference defers to the external
``nwp`` package (config/vaeformer_era5_268v_1h.py:141-149) — implemented
natively here with the standard WeatherBench definition
w(phi) = cos(phi) / mean(cos(phi)).

All metrics are pure jittable JAX; MS-SSIM uses fixed 11x11 Gaussian
windows via depthwise convs that XLA fuses, five scales, the canonical
Wang et al. weights.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse(a, b))


def bpp_from_likelihoods(likelihoods: Dict[str, jax.Array], num_pixels: int) -> jax.Array:
    """Theoretic rate: sum(-log2 p) / pixels (reference
    rate_distortion.py:71-74 and eval_model --entropy-estimation)."""
    return sum(
        jnp.sum(jnp.log(l)) / (-math.log(2) * num_pixels) for l in likelihoods.values()
    )


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_filter(x: jax.Array, kernel2d: jax.Array) -> jax.Array:
    """x: (B, C, H, W) valid-padded depthwise filter."""
    C = x.shape[1]
    k = kernel2d[:, :, None, None]  # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))  # HWIO with feature_group_count=C
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=C,
    )


def ssim(
    a: jax.Array, b: jax.Array, max_val: float = 1.0, return_cs: bool = False
):
    """Single-scale SSIM over (B, C, H, W); mean over all dims."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    kernel = jnp.asarray(_gaussian_kernel())

    mu_a = _depthwise_filter(a, kernel)
    mu_b = _depthwise_filter(b, kernel)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _depthwise_filter(a * a, kernel) - mu_aa
    sigma_bb = _depthwise_filter(b * b, kernel) - mu_bb
    sigma_ab = _depthwise_filter(a * b, kernel) - mu_ab

    cs = (2 * sigma_ab + C2) / (sigma_aa + sigma_bb + C2)
    ssim_map = ((2 * mu_ab + C1) / (mu_aa + mu_bb + C1)) * cs
    if return_cs:
        return jnp.mean(ssim_map), jnp.mean(cs)
    return jnp.mean(ssim_map)


def ms_ssim(
    a: jax.Array,
    b: jax.Array,
    max_val: float = 1.0,
    weights: Sequence[float] = _MSSSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM (Wang et al. 2003), 5 scales by default. Inputs
    (B, C, H, W) with H, W >= 11 * 2**(scales-1) = 176 for 5 scales; pass
    fewer weights for smaller images."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    levels = len(weights)
    w = jnp.asarray(weights, jnp.float32)
    vals = []
    for i in range(levels):
        if i == levels - 1:
            s, _ = ssim(a, b, max_val, return_cs=True)
            vals.append(jnp.maximum(s, 0.0))
        else:
            _, cs = ssim(a, b, max_val, return_cs=True)
            vals.append(jnp.maximum(cs, 0.0))
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            ) / 4.0
    return jnp.prod(jnp.stack(vals) ** w)


def lat_weights(num_lat: int, endpoint: bool = True) -> np.ndarray:
    """WeatherBench latitude weights on a [90, -90] grid: w = cos(phi)
    normalized to mean 1. ERA5 0.25-degree grids include both poles
    (721 points, endpoint=True)."""
    lat = np.linspace(90.0, -90.0, num_lat, endpoint=endpoint)
    w = np.cos(np.deg2rad(lat))
    w = np.maximum(w, 0.0)
    return (w / w.mean()).astype(np.float32)


def wrmse(
    pred: jax.Array,
    target: jax.Array,
    weights: Optional[jax.Array] = None,
    per_channel: bool = False,
) -> jax.Array:
    """Latitude-weighted RMSE over (B, C, H_lat, W_lon). Returns scalar or
    per-channel (C,) RMSE (the reference's Era5_RMSE WRMSE mode)."""
    if weights is None:
        weights = jnp.asarray(lat_weights(pred.shape[-2]))
    w = weights.reshape(1, 1, -1, 1)
    se = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)) * w
    axes = (0, 2, 3) if per_channel else None
    return jnp.sqrt(jnp.mean(se, axis=axes))


def mean_abs_error(
    pred: jax.Array, target: jax.Array, per_channel: bool = True
) -> jax.Array:
    """Per-variable mean absolute error (the Readme.md:304-380 table)."""
    ae = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(ae, axis=(0, 2, 3)) if per_channel else jnp.mean(ae)


def acc(
    pred: jax.Array,
    target: jax.Array,
    climatology: jax.Array,
    weights: Optional[jax.Array] = None,
    per_channel: bool = True,
) -> jax.Array:
    """Latitude-weighted anomaly correlation coefficient (WeatherBench):
    corr of (pred - clim) and (target - clim) over (B, H, W) per channel.
    Completes the reference's NWP-parity metric set (Readme.md:158-161
    RMSE/ACC plots; the reference computes these in the external nwp pkg).
    """
    if weights is None:
        weights = jnp.asarray(lat_weights(pred.shape[-2]))
    w = weights.reshape(1, 1, -1, 1)
    pa = (pred - climatology).astype(jnp.float32)
    ta = (target - climatology).astype(jnp.float32)
    axes = (0, 2, 3) if per_channel else None
    num = jnp.sum(w * pa * ta, axis=axes)
    den = jnp.sqrt(jnp.sum(w * pa * pa, axis=axes) * jnp.sum(w * ta * ta, axis=axes))
    return num / jnp.maximum(den, 1e-12)
