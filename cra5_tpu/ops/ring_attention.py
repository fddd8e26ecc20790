"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference handles its 10 368-token sequence algorithmically (window
partitioning + periodic global layers); this is the distributed growth
path SURVEY.md §2.5 calls for when the sequence outgrows one chip: shard
the token axis over a mesh axis, keep Q local, and rotate K/V blocks
around the ring with ``jax.lax.ppermute`` while accumulating an online
softmax — exact attention, N/devices memory per chip, and the collective
rides ICI neighbor links (blockwise/flash-style; Liu et al. 2023).

Use through ``shard_map`` (see ``ring_attention_sharded``) or call the
per-shard kernel inside any SPMD region.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def ring_attention_shard(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str, scale: Optional[float] = None
) -> jax.Array:
    """Per-shard body: q/k/v are the LOCAL (B, H, N_local, D) blocks of a
    sequence sharded over ``axis_name``. Returns the local output block.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = jax.lax.psum(1, axis_name)
    B, H, Nl, D = q.shape
    qf = q.astype(jnp.float32) * scale

    def attend_block(k_blk, v_blk, acc, m_prev, l_prev):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(_, carry):
        acc, m, l, k_blk, v_blk = carry
        acc, m, l = attend_block(k_blk, v_blk, acc, m, l)
        # rotate K/V to the next device while (in a fused schedule) the
        # next block's compute would overlap the permute
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return acc, m, l, k_blk, v_blk

    # derive the initial accumulators from qf so shard_map marks them as
    # varying over the ring axis (constants would be device-invariant)
    acc0 = jnp.zeros_like(qf)
    m0 = jnp.full((B, H, Nl, 1), _NEG_INF, jnp.float32) + 0.0 * qf[..., :1]
    l0 = jnp.zeros((B, H, Nl, 1), jnp.float32) + 0.0 * qf[..., :1]
    acc, m, l, _, _ = jax.lax.fori_loop(0, n_dev, body, (acc0, m0, l0, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Full entry: q/k/v (B, H, N, D) with N divisible by the axis size;
    shards the token axis, runs the ring, returns the gathered output
    with the same sharding as the input tokens."""
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_shard, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
