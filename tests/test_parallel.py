"""Multi-device sharding on the 8-device virtual CPU mesh: mesh creation,
tp param specs, dp+tp train step, and the graft entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cra5_tpu.models import VAEformer, vaeformer_tiny
from cra5_tpu.parallel import make_mesh, shard_variables, vaeformer_param_specs


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    m = make_mesh({"dp": 4, "tp": 2})
    assert m.shape == {"dp": 4, "tp": 2}
    m2 = make_mesh({"dp": -1})
    assert m2.shape == {"dp": 8}
    # Subset meshes are allowed (first prod(axes) devices) so dryrun can
    # build an n<visible mesh; only oversubscription raises.
    m3 = make_mesh({"dp": 3})
    assert m3.shape == {"dp": 3}
    with pytest.raises(ValueError):
        make_mesh({"dp": 16})


def test_param_specs_megatron_split():
    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x = jnp.zeros((1, cfg.in_chans, *cfg.img_size))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    specs = vaeformer_param_specs(params)
    flat = {"/".join(getattr(p, "key", str(p)) for p in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
    assert flat["g_a/blocks_0/mlp/fc1/kernel"] == P(None, "tp")
    assert flat["g_a/blocks_0/mlp/fc2/kernel"] == P("tp", None)
    assert flat["g_a/blocks_0/attn/qkv/kernel"] == P(None, "tp")
    assert flat["g_a/blocks_0/attn/proj/kernel"] == P("tp", None)
    assert flat["g_a/patch_embed/proj/kernel"] == P()


def test_sharded_forward_matches_single_device():
    """dp=2, tp=2 sharded forward must equal single-device forward."""
    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.in_chans, *cfg.img_size))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)["x_hat"]

    mesh = make_mesh({"dp": 2, "tp": 2}, devices=jax.devices()[:4])
    with mesh:
        sharded_vars = shard_variables(mesh, variables)
        xb = jax.device_put(x, jax.sharding.NamedSharding(mesh, P("dp")))
        out = jax.jit(lambda v, x: model.apply(v, x)["x_hat"])(sharded_vars, xb)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_graft_entry_single():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in jax.tree_util.tree_leaves(out))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
