"""Sharding rules: batch (dp), Megatron-style tensor parallelism for the
ViT MLPs/attention projections (tp), and helpers to place a variables
tree on a mesh.

With these NamedShardings on params and batch, ``jax.jit`` (GSPMD) derives
the collectives: an all-reduce after each row-sharded matmul (mlp/fc2,
attn/proj) over the tp axis riding ICI, and gradient all-reduces over dp.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over the dp axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path_keys, leaf, tp_axis: str) -> P:
    """Megatron split for transformer params:
       fc1/qkv kernels column-sharded, fc2/proj kernels row-sharded."""
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    name = "/".join(keys)
    is_kernel = keys[-1] == "kernel"
    is_bias = keys[-1] == "bias"
    if ("mlp" in name or "quan_mlp" in name or "post_quan_mlp" in name):
        if "fc1" in name:
            if is_kernel:
                return P(None, tp_axis)
            if is_bias:
                return P(tp_axis)
        if "fc2" in name and is_kernel:
            return P(tp_axis, None)
    if "attn" in name:
        if "qkv" in name:
            if is_kernel:
                return P(None, tp_axis)
            if is_bias:
                return P(tp_axis)
        if "proj" in name and is_kernel:
            return P(tp_axis, None)
    return P()


def vaeformer_param_specs(params: Dict[str, Any], tp_axis: str = "tp") -> Dict[str, Any]:
    """PartitionSpec tree for a VAEformer variables['params'] subtree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_param(path, leaf, tp_axis), params
    )


def mesh_param_specs(mesh: Mesh, params: Dict[str, Any], tp_axis: str = "tp") -> Dict[str, Any]:
    """Per-leaf PartitionSpecs for this mesh: Megatron tp splits where the
    mesh has a tp axis AND the dim divides evenly, replicated otherwise."""
    has_tp = tp_axis in mesh.axis_names and mesh.shape[tp_axis] > 1

    def spec_of(path, leaf):
        spec = _spec_for_param(path, leaf, tp_axis) if has_tp else P()
        if any(s is not None for s in spec):
            for dim, axis in enumerate(spec):
                if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                    return P()
        return spec

    return jax.tree_util.tree_map_with_path(spec_of, params)


def shard_variables(mesh: Mesh, variables: Dict[str, Any], tp_axis: str = "tp") -> Dict[str, Any]:
    """Place a variables tree on the mesh: tp-sharded transformer weights
    (when the mesh has a tp axis), everything else replicated."""
    specs = mesh_param_specs(mesh, variables, tp_axis)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        variables,
        specs,
    )
