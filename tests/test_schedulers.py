"""LR schedules (train/schedulers.py): SCHEDULERS registry population,
schedule shapes, and the net/aux optimizer honoring a schedule (the aux
quantile optimizer stays constant-LR). VERDICT r3 #9 / missing #5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_schedulers_registered():
    from cra5_tpu.registry import SCHEDULERS

    for name in ("ConstantLR", "WarmupCosineLR", "MultiStepLR", "LinearWarmupLR"):
        assert name in SCHEDULERS, name


def test_warmup_cosine_shape():
    from cra5_tpu.train import build_schedule

    s = build_schedule(
        dict(type="WarmupCosineLR", warmup_steps=10, min_lr_ratio=0.1),
        base_lr=1e-3,
        total_steps=100,
    )
    assert float(s(0)) == 0.0
    assert np.isclose(float(s(10)), 1e-3)
    assert float(s(5)) == pytest.approx(5e-4, rel=1e-5)  # linear warmup
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-3)  # min_lr_ratio
    # monotone decay after the peak
    assert float(s(30)) > float(s(60)) > float(s(90))


def test_multistep_with_warmup():
    from cra5_tpu.train import build_schedule

    s = build_schedule(
        dict(type="MultiStepLR", milestones=(20, 40), gamma=0.1, warmup_steps=4),
        base_lr=1e-2,
    )
    assert float(s(0)) == 0.0
    assert np.isclose(float(s(4)), 1e-2)
    assert np.isclose(float(s(25)), 1e-3, rtol=1e-4)
    assert np.isclose(float(s(45)), 1e-4, rtol=1e-4)
    # milestones are ABSOLUTE steps (torch MultiStepLR semantics), not
    # shifted late by the warmup prefix: decay fires exactly at 20/40
    assert np.isclose(float(s(19)), 1e-2, rtol=1e-4)
    assert np.isclose(float(s(20)), 1e-3, rtol=1e-4)
    assert np.isclose(float(s(39)), 1e-3, rtol=1e-4)
    assert np.isclose(float(s(40)), 1e-4, rtol=1e-4)


def test_build_schedule_rejects_unknown_options():
    from cra5_tpu.train import build_schedule

    with pytest.raises(ValueError, match="unknown option"):
        build_schedule(
            dict(type="WarmupCosineLR", warmup=500),  # typo: warmup_steps
            base_lr=1e-3,
            total_steps=100,
        )


def test_build_schedule_none_is_constant():
    from cra5_tpu.train import build_schedule

    assert build_schedule(None, 3e-4) == 3e-4


def test_net_aux_optimizer_honors_schedule():
    """During warmup step 0 the net LR is 0 -> net params unchanged, but
    the aux (quantiles) param still moves at its constant LR."""
    from cra5_tpu.train import make_net_aux_optimizers

    params = {
        "g_a": {"kernel": jnp.ones((3,))},
        "entropy_bottleneck": {"quantiles": jnp.ones((2,))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    tx = make_net_aux_optimizers(
        learning_rate=1e-2,
        aux_learning_rate=1e-3,
        scheduler=dict(type="WarmupCosineLR", warmup_steps=5),
        total_steps=50,
    )
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["g_a"]["kernel"]).max()) == 0.0  # LR=0 at step 0
    assert float(jnp.abs(updates["entropy_bottleneck"]["quantiles"]).max()) > 1e-4
    # after warmup the net moves too
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["g_a"]["kernel"]).max()) > 1e-4


def test_trainer_config_scheduler_field():
    from cra5_tpu.train import Trainer, TrainerConfig
    from cra5_tpu.models import VAEformer, vaeformer_tiny

    cfg = TrainerConfig(
        scheduler=dict(type="WarmupCosineLR", warmup_steps=2), total_steps=10
    )
    Trainer(VAEformer(vaeformer_tiny()), cfg)  # builds the scheduled tx
