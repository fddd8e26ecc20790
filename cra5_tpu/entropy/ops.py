"""Differentiable quantization / bound primitives (JAX).

Capability parity with the reference STE ops
(/root/reference/cra5/models/compressai/ops/bound_ops.py:36-80 LowerBound,
/root/reference/cra5/models/compressai/ops/ops.py:66 quantize_ste,
:35 compute_padding) re-designed as jax.custom_vjp functions.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """max(x, bound) with a straight-through-ish gradient: the gradient
    passes when x >= bound, or when it would push x upward (grad < 0)."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def quantize_ste(x: jax.Array) -> jax.Array:
    """round(x) with identity (straight-through) gradient."""
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


quantize_ste.defvjp(_ste_fwd, _ste_bwd)


def quantize(
    inputs: jax.Array,
    mode: str,
    means: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantize a tensor (parity with reference
    entropy_models.py:155-184 ``EntropyModel.quantize``).

    modes:
      "noise":      additive uniform(-0.5, 0.5) noise (training), needs rng.
      "dequantize": round(x - means) + means (inference reconstruction).
      "symbols":    int32 symbols round(x - means).
      "ste":        round-with-identity-grad (means-aware).
    """
    if mode == "noise":
        if rng is None:
            raise ValueError("mode='noise' requires an rng key")
        noise = jax.random.uniform(rng, inputs.shape, inputs.dtype, -0.5, 0.5)
        return inputs + noise

    outputs = inputs
    if means is not None:
        outputs = outputs - means

    if mode == "ste":
        outputs = quantize_ste(outputs)
        if means is not None:
            outputs = outputs + means
        return outputs

    outputs = jnp.round(outputs)

    if mode == "dequantize":
        if means is not None:
            outputs = outputs + means
        return outputs

    if mode == "symbols":
        return outputs.astype(jnp.int32)

    raise ValueError(f"Invalid quantization mode: {mode!r}")


def dequantize(
    inputs: jax.Array, means: Optional[jax.Array] = None, dtype=jnp.float32
) -> jax.Array:
    if means is not None:
        return inputs.astype(means.dtype) + means
    return inputs.astype(dtype)


def compute_padding(
    in_h: int, in_w: int, *, out_h: Optional[int] = None, out_w: Optional[int] = None, min_div: int = 1
) -> Tuple[Tuple[int, int, int, int], Tuple[int, int, int, int]]:
    """Returns (pad, unpad) tuples (left, right, top, bottom) so that the
    padded size is divisible by ``min_div`` (parity with reference
    ops.py:35 ``compute_padding``)."""
    if out_h is None:
        out_h = (in_h + min_div - 1) // min_div * min_div
    if out_w is None:
        out_w = (in_w + min_div - 1) // min_div * min_div
    if out_h % min_div != 0 or out_w % min_div != 0:
        raise ValueError(f"Padded size not divisible by {min_div}")
    left = (out_w - in_w) // 2
    right = out_w - in_w - left
    top = (out_h - in_h) // 2
    bottom = out_h - in_h - top
    pad = (left, right, top, bottom)
    unpad = (-left, -right, -top, -bottom)
    return pad, unpad
