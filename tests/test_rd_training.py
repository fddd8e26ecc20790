"""End-to-end rate-distortion training validation: a tiny VAEformer
trained on structured synthetic fields must (a) reduce the RD loss and
(b) produce SMALLER real bitstreams through the actual coder after
update() than at initialization — the full train -> update -> compress
pipeline the reference exercises across repos (SURVEY.md §3.4 + the
update_model flow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models import VAEformer, VAEformerCodec
from cra5_tpu.models.vaeformer import vaeformer_tiny
from cra5_tpu.train import Trainer, TrainerConfig


def _fields(rng_key, batch, cfg):
    """Smooth low-rank fields (compressible, unlike white noise)."""
    H, W = cfg.img_size
    ys = jnp.linspace(0, 2 * np.pi, H)[None, None, :, None]
    xs = jnp.linspace(0, 2 * np.pi, W)[None, None, None, :]
    phase = jax.random.uniform(rng_key, (batch, cfg.in_chans, 1, 1)) * 2 * np.pi
    freq = 1 + jax.random.randint(jax.random.fold_in(rng_key, 1), (batch, cfg.in_chans, 1, 1), 0, 3)
    return jnp.sin(freq * ys + phase) * jnp.cos(freq * xs + phase) * 0.5


@pytest.mark.slow
def test_training_reduces_real_bitrate(tmp_path):
    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    trainer = Trainer(
        model,
        TrainerConfig(
            learning_rate=3e-4, lmbda=5.0, bpp_weight=1.0, use_ema=False,
            log_every=10**9, ckpt_every=10**9,
        ),
    )

    key = jax.random.PRNGKey(0)
    x_eval = _fields(jax.random.PRNGKey(99), 1, cfg)

    state = trainer.init_state(_fields(key, 2, cfg))

    def real_bytes(params):
        codec = VAEformerCodec(model, {"params": params}, coder="v1")
        codec.update(force=True)
        out = codec.compress(x_eval)
        return sum(len(s) for g in out["strings"] for s in g), codec

    bytes0, codec0 = real_bytes(state.params)

    losses = []
    for step in range(60):
        batch = _fields(jax.random.fold_in(key, step), 2, cfg)
        state, metrics = trainer._step_fn(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))

    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (losses[:10], losses[-10:])

    bytes1, codec1 = real_bytes(state.params)
    assert bytes1 < bytes0, f"real bitstream grew: {bytes0} -> {bytes1}"

    # and the trained model still roundtrips exactly through the coder
    out = codec1.compress(x_eval)
    dec = codec1.decompress(out["strings"], out["z_shape"])
    assert dec["x_hat"].shape == x_eval.shape
