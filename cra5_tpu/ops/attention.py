"""Pallas fused (flash) attention for TPU.

The reference optionally uses the flash-attn CUDA kernel for its global
attention blocks over 10 368 tokens (/root/reference/cra5/models/
vaeformer/vit_nlc.py:25-29, :105-110); this is the TPU-native
equivalent: an online-softmax blockwise kernel that never materializes
the (N x N) logits in HBM, with f32 accumulation islands (the softmax
feeds the entropy-model path, SURVEY.md §7 hard part 3).

Forward is a Pallas kernel; backward is a rematerialized einsum pass
(custom_vjp), so the op is trainable while the inference/serving path —
where the VAEformer encode/decode hot loop lives — gets the fused
kernel. Non-divisible sequence lengths are zero-padded and masked via
block-position iota, keeping every shape static for XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_len: int, scale: float):
    """One (q-block x full-K) program: online-softmax accumulation.

    q_ref: (1, BLOCK_Q, D); k_ref/v_ref: (1, N_pad, D); o_ref: (1, BLOCK_Q, D).
    """
    _, block_q, d = q_ref.shape
    n_pad = k_ref.shape[1]
    num_k = n_pad // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_K)
        # mask out zero-padded keys past seq_len
        kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(kpos < seq_len, logits, _NEG_INF)

        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int, block_k: int,
) -> jax.Array:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    B, H, N, D = q.shape
    n_pad_q = _round_up(N, block_q)
    n_pad_k = _round_up(N, block_k)

    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)
    if n_pad_q != N:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad_q - N), (0, 0)))
    if n_pad_k != N:
        kf = jnp.pad(kf, ((0, 0), (0, n_pad_k - N), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, n_pad_k - N), (0, 0)))

    grid = (B * H, n_pad_q // block_q)
    interpret = jax.default_backend() == "cpu"  # Mosaic needs real TPU
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, seq_len=N, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad_q, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N, :].reshape(B, H, N, D)


def _reference_attention(q, k, v, scale):
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Fused attention over (B, H, N, D). Falls back to the einsum path on
    backends without Mosaic (CPU tests run the same math via the VJP's
    rematerialized reference)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, scale, block_q, block_k)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _fa_bwd(scale, block_q, block_k, residuals, g):
    # Rematerialized standard backward: correctness-first, same memory
    # profile as the XLA einsum path (the serving hot loop is forward-only).
    q, k, v = residuals
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
