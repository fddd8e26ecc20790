"""Color transforms: RGB<->YCbCr (ITU-R BT.601) and YUV 444<->420.

Capability parity with the reference transforms
(/root/reference/cra5/models/compressai/transforms/transforms.py:11-118 and
functional.py): array-in/array-out, jittable jnp ops, same BT.601
coefficients and the 0.5 chroma offset.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

_YCBCR_WEIGHTS = (0.299, 0.587, 0.114)


def rgb2ycbcr(rgb: jax.Array) -> jax.Array:
    """(..., 3, H, W) float in [0,1] -> YCbCr, chroma centered at 0.5."""
    r, g, b = jnp.split(rgb, 3, axis=-3)
    kr, kg, kb = _YCBCR_WEIGHTS
    y = kr * r + kg * g + kb * b
    cb = 0.5 * (b - y) / (1.0 - kb) + 0.5
    cr = 0.5 * (r - y) / (1.0 - kr) + 0.5
    return jnp.concatenate([y, cb, cr], axis=-3)


def ycbcr2rgb(ycbcr: jax.Array) -> jax.Array:
    y, cb, cr = jnp.split(ycbcr, 3, axis=-3)
    kr, kg, kb = _YCBCR_WEIGHTS
    r = y + (2.0 - 2.0 * kr) * (cr - 0.5)
    b = y + (2.0 - 2.0 * kb) * (cb - 0.5)
    g = (y - kr * r - kb * b) / kg
    return jnp.concatenate([r, g, b], axis=-3)


def yuv_444_to_420(
    yuv: Union[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]],
    mode: str = "avg_pool",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """4:4:4 (..., 3, H, W) -> (y, u, v) with chroma subsampled 2x."""
    if mode != "avg_pool":
        raise ValueError(f'Invalid downsampling mode "{mode}"')
    if isinstance(yuv, tuple):
        y, u, v = yuv
    else:
        y, u, v = jnp.split(yuv, 3, axis=-3)

    def _down(c):
        return jax.lax.reduce_window(
            c, 0.0, jax.lax.add,
            (1,) * (c.ndim - 2) + (2, 2),
            (1,) * (c.ndim - 2) + (2, 2),
            "VALID",
        ) / 4.0

    return y, _down(u), _down(v)


def yuv_420_to_444(
    yuv: Tuple[jax.Array, jax.Array, jax.Array],
    mode: str = "bilinear",
    return_tuple: bool = False,
):
    """(y, u, v) with 2x-subsampled chroma -> 4:4:4."""
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f'Invalid upsampling mode "{mode}"')
    y, u, v = yuv

    def _up(c):
        shape = c.shape[:-2] + (c.shape[-2] * 2, c.shape[-1] * 2)
        return jax.image.resize(c, shape, method=mode)

    u, v = _up(u), _up(v)
    if return_tuple:
        return y, u, v
    return jnp.concatenate([y, u, v], axis=-3)
