"""Generalized Divisive Normalization (Ballé et al.) in flax.

Capability parity with the reference GDN/GDN1 and the sqrt-reparameterized
non-negative weights (/root/reference/cra5/models/compressai/layers/
gdn.py:41,95; ops/parametrizers.py:38).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.ops import lower_bound


class NonNegativeParam:
    """sqrt-reparameterization keeping effective weights >= minimum."""

    def __init__(self, minimum: float = 0.0, eps: float = 2 ** -18):
        self.pedestal = eps ** 2
        self.bound = (minimum + self.pedestal) ** 0.5

    def init(self, x: np.ndarray) -> np.ndarray:
        return np.sqrt(np.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, r: jax.Array) -> jax.Array:
        r = lower_bound(r, self.bound)
        return r * r - self.pedestal


class GDN(nn.Module):
    """y[c] = x[c] / sqrt(beta[c] + sum_k gamma[c,k] * x[k]^2)
    (inverse=True multiplies instead, for the synthesis transform)."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = self.channels
        beta_rp = NonNegativeParam(minimum=self.beta_min)
        gamma_rp = NonNegativeParam()
        beta = self.param(
            "beta", lambda rng, shape: jnp.asarray(beta_rp.init(np.ones(C, np.float32))), (C,)
        )
        gamma = self.param(
            "gamma",
            lambda rng, shape: jnp.asarray(
                gamma_rp.init(self.gamma_init * np.eye(C, dtype=np.float32))
            ),
            (C, C),
        )
        beta_v = beta_rp(beta)
        gamma_v = gamma_rp(gamma)
        # x: (B, C, H, W); norm = conv1x1(x^2, gamma) + beta
        norm = jnp.einsum("bchw,kc->bkhw", x * x, gamma_v) + beta_v[None, :, None, None]
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm


class GDN1(nn.Module):
    """Simplified GDN: absolute value instead of square, no sqrt."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = self.channels
        beta_rp = NonNegativeParam(minimum=self.beta_min)
        gamma_rp = NonNegativeParam()
        beta = self.param(
            "beta", lambda rng, shape: jnp.asarray(beta_rp.init(np.ones(C, np.float32))), (C,)
        )
        gamma = self.param(
            "gamma",
            lambda rng, shape: jnp.asarray(
                gamma_rp.init(self.gamma_init * np.eye(C, dtype=np.float32))
            ),
            (C, C),
        )
        norm = jnp.einsum("bchw,kc->bkhw", jnp.abs(x), gamma_rp(gamma))
        norm = norm + beta_rp(beta)[None, :, None, None]
        return x * norm if self.inverse else x / norm
