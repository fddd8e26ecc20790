"""Training losses: rate-distortion + optional learned-logvar weighting,
and the KL-weighted VAE loss.

Capability parity with the reference RateDistortionLoss
(/root/reference/cra5/models/compressai/losses/rate_distortion.py:40-92):
bpp from likelihoods (-log2 sum / num_pixels), lambda*MSE or
lambda*(1 - MS-SSIM) distortion, or per-channel learned log-variance
weighting; the external ``nwp`` KL loss
(vaeformer.py:248-250) is implemented natively as ``kl_weighted_loss``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RateDistortionLoss:
    lmbda: float = 0.01
    bpp_weight: float = 0.01
    metric: str = "mse"
    learn_log_variance: bool = False
    # MS-SSIM scale weights; fewer than the 5 defaults for images smaller
    # than 176 px (metrics.ms_ssim docstring)
    ms_ssim_weights: Optional[Sequence[float]] = None

    def __call__(
        self,
        output: Dict[str, Any],
        target: jax.Array,
        logvar: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        N, _, H, W = target.shape
        num_pixels = N * H * W
        out: Dict[str, jax.Array] = {}

        bpp = sum(
            jnp.sum(jnp.log(l)) / (-math.log(2) * num_pixels)
            for l in output["likelihoods"].values()
        )
        out["bpp_loss"] = self.bpp_weight * bpp

        if self.metric == "mse":
            if self.learn_log_variance and logvar is not None:
                rec = jnp.square(target - output["x_hat"])
                rec = rec / jnp.exp(logvar) + logvar
                out["mse_loss"] = rec.mean()
            else:
                out["mse_loss"] = self.lmbda * jnp.mean(
                    jnp.square(target - output["x_hat"])
                )
        elif self.metric in ("ms-ssim", "ms_ssim"):
            from ..metrics import _MSSSIM_WEIGHTS, ms_ssim

            out["ms_ssim_loss"] = self.lmbda * (
                1.0 - ms_ssim(
                    output["x_hat"], target,
                    weights=self.ms_ssim_weights or _MSSSIM_WEIGHTS,
                )
            )
        else:
            raise NotImplementedError(f"metric {self.metric!r}")

        dist_key = "mse_loss" if self.metric == "mse" else "ms_ssim_loss"
        out["loss"] = out["bpp_loss"] + out[dist_key]
        return out


def rate_distortion_loss(output, target, lmbda=0.01, bpp_weight=0.01):
    return RateDistortionLoss(lmbda=lmbda, bpp_weight=bpp_weight)(output, target)


def kl_weighted_loss(
    output: Dict[str, Any],
    target: jax.Array,
    kl_weight: float = 1e-6,
    logvar: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """VAE loss: NLL (per-channel logvar-weighted L1/L2) + KL regularizer —
    native replacement for the external ``nwp`` kl_loss."""
    rec = jnp.abs(target - output["x_hat"])
    if logvar is not None:
        nll = rec / jnp.exp(logvar) + logvar
    else:
        nll = rec
    nll_loss = nll.mean()
    kl_loss = jnp.mean(output["kl"])
    return {
        "nll_loss": nll_loss,
        "kl_loss": kl_loss,
        "vae_loss": nll_loss + kl_weight * kl_loss,
    }


def bpp_from_likelihoods(likelihoods: Dict[str, jax.Array], num_pixels: int) -> jax.Array:
    """Theoretic bits-per-pixel oracle (reference eval_model __main__.py:136)."""
    return sum(
        jnp.sum(jnp.log(l)) / (-math.log(2) * num_pixels) for l in likelihoods.values()
    )
