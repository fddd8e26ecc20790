"""Pallas flash attention: numeric parity with the einsum reference
(interpret mode on CPU), padding/mask path, and trainability (VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.ops.attention import _reference_attention, flash_attention


def _qkv(B=1, H=2, N=256, D=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, N, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_flash_matches_reference_divisible():
    q, k, v = _qkv(N=256, D=32)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = _reference_attention(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_padded():
    """N=200 not divisible by the 128 block: exercises the key mask."""
    q, k, v = _qkv(N=200, D=32, seed=1)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = _reference_attention(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_inputs_match_f32_reference():
    """bf16 q/k/v: the dots run in bf16 with f32 accumulation (the
    tower configuration); result must track the f32 reference within
    bf16 operand rounding."""
    q, k, v = _qkv(N=200, D=32, seed=4)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = flash_attention(qb, kb, vb, None, 128, 128)
    ref = _reference_attention(q, k, v, q.shape[-1] ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)), np.asarray(ref), atol=2e-2
    )


def test_flash_custom_scale():
    q, k, v = _qkv(N=128, D=32, seed=2)
    out = flash_attention(q, k, v, 0.25, 128, 128)
    ref = _reference_attention(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_matches_reference():
    q, k, v = _qkv(N=128, D=16, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, q.shape[-1] ** -0.5) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_set_flash_mode_validation():
    from cra5_tpu.nn.blocks import set_flash_attention

    with pytest.raises(ValueError):
        set_flash_attention("sometimes")
    set_flash_attention("auto")


def test_vit_encoder_flash_on_matches_off():
    """End-to-end: tiny ViT encoder output identical with flash on/off
    (flash 'on' runs the Pallas kernel in interpret mode on CPU)."""
    from cra5_tpu.models import VAEformer, vaeformer_tiny
    from cra5_tpu.nn.blocks import set_flash_attention

    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size))
    variables = model.init(jax.random.PRNGKey(1), x)

    set_flash_attention("off")
    ref = model.apply(variables, x)["x_hat"]
    try:
        set_flash_attention("on")
        out = model.apply(variables, x)["x_hat"]
    finally:
        set_flash_attention("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.slow  # quick-suite re-budget (VERDICT r4 next #8): heavy tail
def test_train_step_through_flash(tmp_path):
    """Gradients flow through the Pallas forward+backward inside a full
    training step (the exact 268v-on-TPU configuration, tiny geometry)."""
    import dataclasses

    from cra5_tpu.models import VAEformer
    from cra5_tpu.models.vaeformer import vaeformer_tiny
    from cra5_tpu.nn.blocks import set_flash_attention
    from cra5_tpu.train import Trainer, TrainerConfig

    cfg = dataclasses.replace(vaeformer_tiny(), remat=True)
    model = VAEformer(cfg)
    trainer = Trainer(model, TrainerConfig(use_ema=False, log_every=10**9, ckpt_every=10**9))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size)) * 0.3
    set_flash_attention("on")
    try:
        state = trainer.init_state(x)
        state, metrics = trainer._step_fn(state, x, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
    finally:
        set_flash_attention("auto")
