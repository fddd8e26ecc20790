import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.entropy import (
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
    eb_update,
    gc_update,
    get_scale_table,
    lower_bound,
    quantize,
    quantize_ste,
)
from cra5_tpu.entropy.entropy_bottleneck import eb_params_from_variables


def test_lower_bound_forward_and_grad():
    x = jnp.array([-1.0, 0.5, 2.0])
    b = jnp.float32(1.0)
    y = lower_bound(x, b)
    assert np.allclose(y, [1.0, 1.0, 2.0])

    # gradient: passes when x >= bound or g < 0
    g = jax.grad(lambda x: lower_bound(x, b).sum())(x)
    assert np.allclose(g, [0.0, 0.0, 1.0])
    g2 = jax.grad(lambda x: (-lower_bound(x, b)).sum())(x)
    assert np.allclose(g2, [-1.0, -1.0, -1.0])


def test_quantize_ste_grad_identity():
    x = jnp.array([0.3, 1.7, -2.4])
    assert np.allclose(quantize_ste(x), [0.0, 2.0, -2.0])
    g = jax.grad(lambda x: quantize_ste(x).sum())(x)
    assert np.allclose(g, 1.0)


def test_quantize_modes():
    x = jnp.array([[1.2, -0.7, 3.5]])
    means = jnp.array([[1.0, -1.0, 3.0]])
    sym = quantize(x, "symbols", means)
    assert sym.dtype == jnp.int32
    # round-half-to-even in both jnp and torch: round(0.5) == 0
    assert np.allclose(sym, [[0, 0, 0]])
    deq = quantize(x, "dequantize", means)
    assert np.allclose(deq, np.round(np.array([[0.2, 0.3, 0.5]])) + np.array([[1.0, -1.0, 3.0]]))
    noisy = quantize(x, "noise", rng=jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(noisy - x)) <= 0.5)


def test_entropy_bottleneck_forward_and_likelihood():
    C = 8
    eb = EntropyBottleneck(channels=C)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, C, 4, 6)) * 3.0
    variables = eb.init(jax.random.PRNGKey(0), x)
    xq, lik = eb.apply(variables, x)
    assert xq.shape == x.shape and lik.shape == x.shape
    assert np.all(np.asarray(lik) > 0) and np.all(np.asarray(lik) <= 1.0)
    # inference mode quantizes to integer offsets around the medians
    medians = np.asarray(variables["params"]["quantiles"])[:, 0, 1]
    resid = np.asarray(xq) - medians[None, :, None, None]
    assert np.allclose(resid, np.round(resid), atol=1e-5)

    # training mode adds bounded noise
    xn, likn = eb.apply(variables, x, training=True, rng=jax.random.PRNGKey(2))
    assert np.all(np.abs(np.asarray(xn - x)) <= 0.5 + 1e-6)

    # aux loss is finite and positive at init
    loss = eb.apply(variables, method=lambda m: m.loss())
    assert np.isfinite(loss) and loss > 0


def test_eb_update_builds_valid_tables():
    C = 4
    eb = EntropyBottleneck(channels=C)
    x = jnp.zeros((1, C, 2, 2))
    variables = eb.init(jax.random.PRNGKey(0), x)
    params = eb_params_from_variables(variables)
    table = eb_update(params)
    table.validate()
    assert table.num_indexes == C
    assert table.offset.shape == (C,)


def test_gc_likelihood_matches_gaussian_mass():
    gc = GaussianConditional()
    inputs = jnp.array([[0.0, 1.0, -2.0]])
    scales = jnp.array([[1.0, 1.0, 2.0]])
    out, lik = gc.apply({}, inputs, scales)
    # mass of unit gaussian in [-.5, .5] ~ 0.3829
    assert abs(float(lik[0, 0]) - 0.38292) < 1e-4
    assert np.allclose(out, np.round(np.asarray(inputs)))


def test_gc_update_and_build_indexes():
    table_scales = get_scale_table()
    table = gc_update(table_scales)
    table.validate()
    assert table.num_indexes == 64

    scales = jnp.array([0.01, 0.11, 0.5, 10.0, 300.0])
    idx = build_indexes(scales, jnp.asarray(table_scales))
    idx = np.asarray(idx)
    assert idx[0] == 0  # below bound -> first bucket
    assert idx[-1] == 63  # above max -> last bucket
    assert np.all((idx >= 0) & (idx < 64))
    # chosen bucket's scale >= actual scale (conservative bucketing)
    assert table_scales[idx[2]] >= 0.5
    assert table_scales[idx[2] - 1] < 0.5


def test_gc_training_noise():
    gc = GaussianConditional()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    s = jnp.ones_like(x)
    out, lik = gc.apply({}, x, s, training=True, rng=jax.random.PRNGKey(1))
    assert np.all(np.abs(np.asarray(out - x)) <= 0.5 + 1e-6)
    assert np.all(np.asarray(lik) > 0)
