"""TRAINING cross-parity with the torch reference (VERDICT r3 #8): from
identical converted initial weights, drive the reference model (its real
modules via ref_torch, reference RateDistortionLoss formula
losses/rate_distortion.py:40-92, net/aux Adam split
optimizers/net_aux.py:39-74) and our flax Trainer step for 10 steps with
IDENTICAL quantization noise, and assert per-step loss trajectories and
a sample of first-step gradients agree. Locks optimizer + loss + backward
semantics, not just the forward graph (test_e2e_parity.py).

Noise injection: both frameworks draw additive quantization noise from a
shape-keyed numpy generator (uniform(-0.5, 0.5)), so the stochastic
train path is bit-comparable across frameworks.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/cra5"), reason="reference not present"
)

sys.path.insert(0, "tests")

LR, AUX_LR, LMBDA, BPP_W = 1e-3, 1e-3, 0.01, 0.01
STEPS = 10


def _shape_noise(shape):
    # int-tuple hash is PYTHONHASHSEED-independent; same noise per shape
    # on both frameworks, every step
    seed = abs(hash(tuple(int(s) for s in shape))) % (2**31)
    return np.random.default_rng(seed).uniform(-0.5, 0.5, size=shape).astype(np.float32)


@pytest.fixture()
def both_models(monkeypatch):
    import jax.numpy as jnp

    from ref_torch import build_tiny_ref_vaeformer, load_reference
    from cra5_tpu.models import VAEformer
    from cra5_tpu.models.vaeformer import VAEformerConfig
    from cra5_tpu.tools.convert_torch import convert_vaeformer_state_dict

    load_reference()
    from cra5.models.compressai.entropy_models.entropy_models import EntropyModel

    orig_q = EntropyModel.quantize

    def patched_torch_quantize(self, inputs, mode, means=None):
        if mode == "noise":
            return inputs + torch.from_numpy(_shape_noise(inputs.shape))
        return orig_q(self, inputs, mode, means)

    monkeypatch.setattr(EntropyModel, "quantize", patched_torch_quantize)

    import cra5_tpu.entropy.entropy_bottleneck as ebm
    import cra5_tpu.entropy.gaussian_conditional as gcm
    from cra5_tpu.entropy import ops as eops

    def patched_jax_quantize(inputs, mode, means=None, rng=None):
        if mode == "noise":
            return inputs + jnp.asarray(_shape_noise(inputs.shape))
        return eops.quantize(inputs, mode, means=means, rng=rng)

    monkeypatch.setattr(ebm, "quantize", patched_jax_quantize)
    monkeypatch.setattr(gcm, "quantize", patched_jax_quantize)

    ref = build_tiny_ref_vaeformer(seed=11)
    # deep-copy: state_dict tensors are LIVE views and the torch Adam
    # steps mutate them in place — without the copy the converted tree
    # would silently follow the torch training
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables, _ = convert_vaeformer_state_dict(sd, depth=4)

    cfg = VAEformerConfig(
        in_chans=8, img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        embed_dim=8, y_channels=16, z_channels=8, depth=4, num_heads=2,
        window_sizes=((2, 2), (1, 4), (4, 1)), interval=2,
        hyper_embed_dim=12, hyper_depth=2, hyper_num_heads=2, hyper_patch=(2, 2),
        use_conv_transpose=False, name="train_parity_tiny",
    )
    model = VAEformer(cfg)
    x = np.random.default_rng(3).normal(size=(2, 8, 40, 40)).astype(np.float32)
    return ref, model, variables, x


def _torch_losses(out, target):
    """Reference RateDistortionLoss forward (rate_distortion.py:66-84)."""
    import math

    N, _, H, W = target.shape
    num_pixels = N * H * W
    bpp = BPP_W * sum(
        (torch.log(l).sum() / (-math.log(2) * num_pixels))
        for l in out["likelihoods"].values()
    )
    mse = LMBDA * torch.nn.functional.mse_loss(out["x_hat"], target)
    return bpp, mse


@pytest.mark.slow  # quick-suite re-budget (VERDICT r4 next #8): heavy tail
def test_ten_step_training_trajectory_parity(both_models):
    import jax
    import jax.numpy as jnp

    from cra5_tpu.train import TrainerConfig, make_net_aux_optimizers
    from cra5_tpu.train.loop import TrainState, make_train_step

    ref, model, variables, x = both_models

    # ---- torch side: reference net/aux Adam split ----
    ref.train()
    net_params = [p for n, p in ref.named_parameters() if not n.endswith("quantiles")]
    aux_params = [p for n, p in ref.named_parameters() if n.endswith("quantiles")]
    net_opt = torch.optim.Adam(net_params, lr=LR)
    aux_opt = torch.optim.Adam(aux_params, lr=AUX_LR)
    xt = torch.from_numpy(x)
    torch_traj = []
    torch_grads0 = {}
    for step in range(STEPS):
        out = ref(xt)
        bpp, mse = _torch_losses(out, xt)
        loss = bpp + mse
        aux = ref.aux_loss()
        net_opt.zero_grad()
        aux_opt.zero_grad()
        (loss + aux).backward()
        if step == 0:
            torch_grads0 = {
                "quant_conv.weight": ref.quant_conv.weight.grad.detach().numpy().copy(),
                "quantiles": ref.entropy_bottleneck.quantiles.grad.detach().numpy().copy(),
            }
        net_opt.step()
        aux_opt.step()
        torch_traj.append(
            (float(bpp.detach()), float(mse.detach()), float(aux.detach()))
        )

    # ---- jax side: our Trainer step (same Adam config, no clipping) ----
    tcfg = TrainerConfig(
        learning_rate=LR, aux_learning_rate=AUX_LR, lmbda=LMBDA, bpp_weight=BPP_W,
        use_ema=False, max_grad_norm=1e9,
    )
    tx = make_net_aux_optimizers(LR, AUX_LR, max_grad_norm=1e9)
    step_fn = jax.jit(make_train_step(model, tx, tcfg))
    state = TrainState(
        step=jnp.int32(0), params=variables["params"],
        opt_state=tx.init(variables["params"]), ema=None,
    )

    # first-step gradient sample (same leaves as the torch grabs)
    from cra5_tpu.train.loss import RateDistortionLoss

    rd = RateDistortionLoss(lmbda=LMBDA, bpp_weight=BPP_W)

    def loss_fn(params):
        out = model.apply({"params": params}, jnp.asarray(x), training=True,
                          rng=jax.random.PRNGKey(0))
        losses = rd(out, jnp.asarray(x))
        aux = model.apply({"params": params}, method=type(model).aux_loss)
        return losses["loss"] + aux

    g = jax.grad(loss_fn)(variables["params"])
    # conv kernel layout: torch (out, in, 1, 1) <-> flax (1, 1, in, out)
    g_qc = np.asarray(g["quant_conv"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(
        g_qc, torch_grads0["quant_conv.weight"], rtol=2e-3, atol=2e-7
    )
    g_quant = np.asarray(g["entropy_bottleneck"]["quantiles"])
    np.testing.assert_allclose(
        g_quant, torch_grads0["quantiles"], rtol=2e-3, atol=2e-6
    )

    jax_traj = []
    rng = np.asarray(jax.random.PRNGKey(0))
    for step in range(STEPS):
        state, metrics = step_fn(state, jnp.asarray(x), rng)
        jax_traj.append(
            (float(metrics["bpp_loss"]), float(metrics["mse_loss"]),
             float(metrics["aux_loss"]))
        )

    for step, ((bt, mt, at), (bj, mj, aj)) in enumerate(zip(torch_traj, jax_traj)):
        assert np.isclose(bj, bt, rtol=3e-3, atol=1e-6), (step, bj, bt)
        assert np.isclose(mj, mt, rtol=3e-3, atol=1e-7), (step, mj, mt)
        assert np.isclose(aj, at, rtol=3e-3, atol=1e-4), (step, aj, at)
    # training actually moved: the net loss decreased on both sides
    assert torch_traj[-1][1] < torch_traj[0][1] or torch_traj[-1][0] < torch_traj[0][0]
    assert jax_traj[-1][1] < jax_traj[0][1] or jax_traj[-1][0] < jax_traj[0][0]
