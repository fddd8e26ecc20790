"""Entropy-side calibration: fit h_a/h_s/EntropyBottleneck to the latent
statistics of a FROZEN tower.

Why this exists: the coded-stream size of a VAEformer checkpoint is set
by how well the hyper path models the tower's actual latent
distribution. With an untrained (or converted-but-mismatched) entropy
side, predicted scales sit at the table floor, most symbols escape, and
streams blow up ~40x — which distorts any throughput measurement whose
transfer cost scales with stream bytes (and wrecks rate on real
deployments of partially-converted checkpoints). The reference gets this
fit from end-to-end training (vaeformer.py:302-333 joint rate loss +
net/aux optimizers, optimizers/net_aux.py:39-74); this module recovers
it standalone by training ONLY the entropy-side parameters — towers
frozen — on latents produced by the model itself, which is cheap (the
hyper ViT is ~1% of the model) and leaves reconstruction bit-identical
(g_a/g_s untouched).

Used by bench.py (BENCH_CALIBRATE=1) to measure the production operating
point, and usable on its own to repair the entropy side of any
checkpoint whose towers moved after the hyper path was fit.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .optim import make_net_aux_optimizers

TRAINABLE = ("h_a", "h_s", "entropy_bottleneck")


def _split_params(params: Dict[str, Any]):
    sub = {k: params[k] for k in TRAINABLE if k in params}
    rest = {k: v for k, v in params.items() if k not in sub}
    return sub, rest


def calibrate_entropy(
    model,
    variables: Dict[str, Any],
    latents: List[jax.Array],
    steps: int = 600,
    learning_rate: float = 1e-3,
    aux_learning_rate: float = 1e-3,
    rng: Optional[jax.Array] = None,
    log_every: int = 0,
) -> Dict[str, Any]:
    """Return ``variables`` with h_a/h_s/EB params re-fit to ``latents``
    (a list of (B, C, h, w) y tensors from ``model.encode_latent``).

    The loss is the noise-quantized bits-per-latent-element of (y, z)
    plus the EB quantile aux loss; the net/aux optimizer split matches
    the reference (quantiles train on their own adam)."""
    if rng is None:
        rng = jax.random.PRNGKey(17)
    yb = jnp.concatenate([jnp.asarray(y) for y in latents], axis=0)
    params = dict(variables["params"])
    sub, rest = _split_params(params)
    if not sub:
        raise ValueError("no entropy-side params (h_a/h_s/entropy_bottleneck)")
    tx = make_net_aux_optimizers(learning_rate, aux_learning_rate)
    opt_state = tx.init(sub)
    n_el = float(np.prod(yb.shape))

    def loss_fn(sub_p, step_rng):
        out = model.apply(
            {"params": {**rest, **sub_p}}, yb, step_rng,
            method=type(model).entropy_rate,
        )
        lik = out["likelihoods"]
        bits = sum(
            -jnp.sum(jnp.log2(l.astype(jnp.float32))) for l in lik.values()
        )
        bpe = bits / n_el  # bits per latent element
        return bpe + out["aux"], bpe

    @jax.jit
    def step(sub_p, opt_st, step_rng):
        (_, bpe), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            sub_p, step_rng
        )
        updates, opt_st = tx.update(grads, opt_st, sub_p)
        return jax.tree_util.tree_map(
            lambda p, u: p + u, sub_p, updates
        ), opt_st, bpe

    bpe = None
    for i in range(steps):
        rng, k = jax.random.split(rng)
        sub, opt_state, bpe = step(sub, opt_state, k)
        if log_every and (i + 1) % log_every == 0:
            print(f"[calibrate] step {i + 1}: {float(bpe):.3f} bits/el")
    if bpe is not None:
        jax.device_get(bpe.reshape(-1)[:1])  # surface NaNs/divergence here
    out_vars = dict(variables)
    out_vars["params"] = {**rest, **sub}
    return out_vars


def _cache_key(model, steps: int, n_latents: int) -> str:
    cfg = getattr(model, "cfg", None)
    desc = f"{type(model).__name__}|{cfg!r}|{steps}|{n_latents}|v1"
    return hashlib.sha1(desc.encode()).hexdigest()[:16]


def calibrate_entropy_cached(
    model, variables, latents, cache_dir: Optional[str], **kw
) -> Dict[str, Any]:
    """calibrate_entropy with an on-disk cache of the fitted entropy-side
    params (keyed on model config + fit settings — NOT on the tower
    weights, so only reuse a cache dir across runs that build the model
    with the same init seed, like bench.py does)."""
    import os
    import pickle

    path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(
            cache_dir,
            f"calib_{_cache_key(model, kw.get('steps', 600), len(latents))}.pkl",
        )
        if os.path.exists(path):
            with open(path, "rb") as f:
                sub_host = pickle.load(f)
            out_vars = dict(variables)
            params = dict(variables["params"])
            for k, v in sub_host.items():
                params[k] = jax.tree_util.tree_map(jnp.asarray, v)
            out_vars["params"] = params
            return out_vars
    out_vars = calibrate_entropy(model, variables, latents, **kw)
    if path:
        sub, _ = _split_params(out_vars["params"])
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(sub), f)
    return out_vars
