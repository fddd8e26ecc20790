"""Learned factorized prior ("entropy bottleneck", Ballé et al. 2018) in JAX.

Capability parity with the reference EntropyBottleneck
(/root/reference/cra5/models/compressai/entropy_models/entropy_models.py:333-543):
a per-channel monotone MLP models the latent CDF; training uses additive
uniform noise; ``loss()`` fits the quantiles used to bound the coded range;
``eb_update`` builds the integer CDF tables consumed by the rANS coders.

TPU-first notes: the per-channel MLP is a stack of tiny batched matmuls
(C, f_out, f_in) x (C, f_in, N) — expressed as einsum so XLA maps it onto
the MXU in one fused pass; the table build runs on host in float64 (CDF
integerization must be deterministic across backends, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .cdf import CdfTable, build_cdf_table
from .ops import lower_bound, quantize


def _logits_cumulative(params: dict, inputs: jax.Array, nfilters: int) -> jax.Array:
    """Evaluate the monotone per-channel MLP. inputs: (C, 1, N) -> (C, 1, N)."""
    logits = inputs
    for i in range(nfilters + 1):
        matrix = params[f"matrix{i}"]  # (C, f_out, f_in)
        bias = params[f"bias{i}"]  # (C, f_out, 1)
        logits = jnp.einsum(
            "coi,cin->con", jax.nn.softplus(matrix), logits,
            preferred_element_type=logits.dtype,
        )
        logits = logits + bias
        if i < nfilters:
            factor = params[f"factor{i}"]  # (C, f_out, 1)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        K = len(self.filters)
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (K + 1))
        C = self.channels

        for i in range(K + 1):
            init_val = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            setattr(
                self,
                f"matrix{i}",
                self.param(
                    f"matrix{i}",
                    lambda rng, shape, v=init_val: jnp.full(shape, v, jnp.float32),
                    (C, dims[i + 1], dims[i]),
                ),
            )
            setattr(
                self,
                f"bias{i}",
                self.param(
                    f"bias{i}",
                    lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -0.5, 0.5),
                    (C, dims[i + 1], 1),
                ),
            )
            if i < K:
                setattr(
                    self,
                    f"factor{i}",
                    self.param(
                        f"factor{i}",
                        lambda rng, shape: jnp.zeros(shape, jnp.float32),
                        (C, dims[i + 1], 1),
                    ),
                )

        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (C, 1, 1),
            ),
            (C, 1, 3),
        )

    def _params_dict(self) -> dict:
        d = {}
        for i in range(len(self.filters) + 1):
            d[f"matrix{i}"] = getattr(self, f"matrix{i}")
            d[f"bias{i}"] = getattr(self, f"bias{i}")
            if i < len(self.filters):
                d[f"factor{i}"] = getattr(self, f"factor{i}")
        return d

    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    def likelihood(self, values: jax.Array) -> jax.Array:
        """values: (C, 1, N); returns P(round-bin around value)."""
        p = self._params_dict()
        K = len(self.filters)
        lower = _logits_cumulative(p, values - 0.5, K)
        upper = _logits_cumulative(p, values + 0.5, K)
        return jax.nn.sigmoid(upper) - jax.nn.sigmoid(lower)

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """x: (B, C, *spatial). Returns (x_hat, likelihoods), both shaped
        like x (parity with reference entropy_models.py:465-510)."""
        ndim = x.ndim
        perm = (1, 0) + tuple(range(2, ndim))
        xt = jnp.transpose(x, perm)  # (C, B, ...)
        shape = xt.shape
        values = xt.reshape(shape[0], 1, -1)

        medians = self.medians().reshape(-1, 1, 1)
        mode = "noise" if training else "dequantize"
        outputs = quantize(values, mode, means=medians, rng=rng)

        likelihood = self.likelihood(outputs)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)

        inv_perm = tuple(int(i) for i in np.argsort(perm))
        outputs = jnp.transpose(outputs.reshape(shape), inv_perm)
        likelihood = jnp.transpose(likelihood.reshape(shape), inv_perm)
        return outputs, likelihood

    def loss(self) -> jax.Array:
        """Quantile-fitting auxiliary loss (reference entropy_models.py:429)."""
        p = jax.lax.stop_gradient(self._params_dict())
        K = len(self.filters)
        logits = _logits_cumulative(p, self.quantiles, K)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.abs(logits - target).sum()


def eb_params_from_variables(variables: dict, prefix: str = "") -> dict:
    """Extract this module's param dict {matrix0, bias0, factor0, ..., quantiles}
    from a flax variables tree (numpy conversion for host-side table build)."""
    params = variables
    for k in ("params",):
        if k in params:
            params = params[k]
    if prefix:
        for part in prefix.split("/"):
            params = params[part]
    # one bulk transfer: per-leaf np.asarray would pay the device->host
    # round-trip latency once per leaf (severe on tunneled TPU backends)
    host = jax.device_get(dict(params))
    return {k: np.asarray(v) for k, v in host.items()}


def eb_update(params: dict, filters: Tuple[int, ...] = (3, 3, 3, 3), precision: int = 16) -> CdfTable:
    """Build the integer CDF tables from trained EB params (host, float64).

    Parity with reference entropy_models.py:394-427 ``EntropyBottleneck.update``.
    """
    quantiles = np.asarray(params["quantiles"], dtype=np.float64)  # (C,1,3)
    medians = quantiles[:, 0, 1]

    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0, None)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0, None)

    offset = -minima
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float64)[None, None, :] + pmf_start[:, None, None]

    def logits(v):
        x = v
        K = len(filters)
        for i in range(K + 1):
            m = np.asarray(params[f"matrix{i}"], dtype=np.float64)
            b = np.asarray(params[f"bias{i}"], dtype=np.float64)
            x = np.einsum("coi,cin->con", np.logaddexp(0.0, m), x) + b
            if i < K:
                f = np.asarray(params[f"factor{i}"], dtype=np.float64)
                x = x + np.tanh(f) * np.tanh(x)
        return x

    # overflow-free sigmoid (naive 1/(1+exp(-x)) raises RuntimeWarnings
    # on the large logits the tail regions produce)
    from scipy.special import expit as sigmoid

    low = logits(samples - 0.5)
    up = logits(samples + 0.5)
    pmf = (sigmoid(up) - sigmoid(low))[:, 0, :]
    tail_mass = sigmoid(low[:, 0, :1]) + sigmoid(-up[:, 0, -1:])

    table = build_cdf_table(pmf, tail_mass, pmf_length, precision)
    table.offset = offset.astype(np.int32)
    return table
