"""Pallas fused (flash) attention for TPU — forward and backward.

The reference optionally uses the flash-attn CUDA kernel for its global
attention blocks over 10 368 tokens (/root/reference/cra5/models/
vaeformer/vit_nlc.py:25-29, :105-110); this is the TPU-native
equivalent: online-softmax blockwise kernels that never materialize the
(N x N) logits in HBM in either direction — the einsum backward's
f32[H, N, N] buffers alone exceed a 16 GB chip for the 268v training
step. f32 accumulation throughout (the softmax feeds the entropy-model
path, SURVEY.md §7 hard part 3).

Forward emits the log-sum-exp rows; backward recomputes probabilities
blockwise (FlashAttention-2 construction): one kernel accumulates dQ
over key blocks, a second accumulates dK/dV over query blocks.
Non-divisible sequence lengths are zero-padded; key padding is masked
via block-position iota, and zero-padded dO rows make padded queries
contribute exactly zero to dK/dV.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"  # Mosaic needs real TPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------- forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                seq_len: int, scale: float):
    """q_ref: (1, BLOCK_Q, D); k_ref/v_ref: (1, N_pad, D);
    o_ref: (1, BLOCK_Q, D); lse_ref: (1, BLOCK_Q, 1) — the trailing
    singleton keeps the block Mosaic-tileable."""
    _, block_q, d = q_ref.shape
    n_pad = k_ref.shape[1]
    num_k = n_pad // block_k

    # Dots run in the INPUT dtype with f32 accumulation: upcasting the
    # operands to f32 quartered the MXU rate (measured 36 TF/s vs the
    # chip's ~93-120 on fat bf16 matmuls) while buying nothing — the
    # einsum reference path also feeds bf16 operands into an f32-accum
    # dot. Softmax statistics (max/exp/sum, m/l carries) stay f32.
    # Pre-scaling q folds the softmax scale into one (block_q, D) pass
    # instead of a (block_q, block_k) multiply every iteration.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)

    def step(kb, carry, masked):
        # The key-padding mask only concerns the one partial tail block
        # (``masked``); full blocks skip the iota/compare/select VPU
        # passes — the kernel is softmax/VPU-bound, not matmul-bound.
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(kpos < seq_len, logits, _NEG_INF)

        m_cur = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    num_full = min(seq_len // block_k, num_k)
    carry = jax.lax.fori_loop(
        0, num_full, lambda kb, c: step(kb, c, masked=False), (acc0, m0, l0)
    )
    for kb in range(num_full, num_k):  # static tail: at most one block
        carry = step(kb, carry, masked=True)
    acc, m, l = carry
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _flash_forward(q, k, v, scale, block_q, block_k):
    """(B, H, N, D) -> (out, lse) with lse (B*H, N_pad_q) f32."""
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
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, seq_len=N, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad_q, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad_q, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out[:, :N, :].reshape(B, H, N, D), lse


# ---------------------------------------------------------------- backward
def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, block_k: int, seq_len: int, scale: float):
    """Accumulate dQ for one q block over all key blocks."""
    _, block_q, d = q_ref.shape
    n_pad = k_ref.shape[1]
    num_k = n_pad // block_k

    # Input-dtype dots, f32 accumulation/statistics (see _fwd_kernel —
    # f32 operands quarter the MXU rate; the residuals arrive bf16).
    # q is pre-scaled for the logits dot (one (block_q, D) pass instead
    # of a (block_q, block_k) multiply per iteration); it has no other
    # use in this kernel — the trailing dq * scale is the chain-rule
    # factor, not a use of q.
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    do = do_ref[0]
    lse = lse_ref[0]      # (block_q, 1)
    delta = delta_ref[0]  # (block_q, 1)

    def step(kb, dq, masked):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:  # only the one partial tail block needs the key mask
            kpos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1
            )
            logits = jnp.where(kpos < seq_len, logits, _NEG_INF)
        p = jnp.exp(logits - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    num_full = min(seq_len // block_k, num_k)
    dq = jax.lax.fori_loop(
        0, num_full, lambda kb, c: step(kb, c, masked=False),
        jnp.zeros((block_q, d), jnp.float32),
    )
    for kb in range(num_full, num_k):  # static tail: at most one block
        dq = step(kb, dq, masked=True)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, seq_len: int, scale: float):
    """One (key block, query block) program on a (BH, k_blocks, q_blocks)
    grid with q innermost: dk/dv output blocks are revisited across the q
    dimension and accumulated in place (zeroed at q == 0). Padded query
    rows have zero dO and zero delta, so they contribute nothing."""
    _, block_k, d = k_ref.shape

    k = k_ref[0]
    v = v_ref[0]
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    kmask = kpos < seq_len  # (1, block_k)

    # Input-dtype dots, f32 accumulation/statistics (see _fwd_kernel).
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]      # (block_q, 1)
    delta = delta_ref[0]  # (block_q, 1)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(kmask, logits, _NEG_INF)
    p = jnp.exp(logits - lse)  # (block_q, block_k)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qb == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k):
    B, H, N, D = q.shape
    n_pad_q = lse.shape[1]
    n_pad_k = _round_up(N, block_k)

    def pad_to(x, n):
        xf = x.reshape(B * H, N, D)
        return jnp.pad(xf, ((0, 0), (0, n - N), (0, 0))) if n != N else xf

    qf = pad_to(q, n_pad_q)
    dof = pad_to(g, n_pad_q)
    kf = pad_to(k, n_pad_k)
    vf = pad_to(v, n_pad_k)
    of = pad_to(out, n_pad_q)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True)

    spec_q = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kfull = pl.BlockSpec((1, n_pad_k, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_row_q = pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, seq_len=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad_q, D), q.dtype),
        grid=(B * H, n_pad_q // block_q),
        in_specs=[spec_q, spec_kfull, spec_kfull, spec_q, spec_row_q, spec_row_q],
        out_specs=spec_q,
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, delta)

    # (BH, k_blocks, q_blocks) grid, q innermost: the dk/dv output blocks'
    # index map ignores the q dimension, so Mosaic keeps them resident in
    # VMEM across q steps and the kernel accumulates in place (f32).
    spec_k3 = pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    spec_q3 = pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_row3 = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_acc = pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, seq_len=N, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad_k, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, n_pad_k, D), jnp.float32),
        ),
        grid=(B * H, n_pad_k // block_k, n_pad_q // block_q),
        in_specs=[spec_q3, spec_k3, spec_k3, spec_q3, spec_row3, spec_row3],
        out_specs=(spec_acc, spec_acc),
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, delta)

    unpad = lambda x, n: x[:, :N, :].reshape(B, H, N, D)
    return (
        unpad(dq, n_pad_q),
        unpad(dk, n_pad_k).astype(k.dtype),
        unpad(dv, n_pad_k).astype(v.dtype),
    )


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
    block_k: int = 1024,
) -> jax.Array:
    """Fused attention over (B, H, N, D); trainable (flash backward).

    Default blocks: the forward sweep at the 268v global shape (B=1,
    H=16, N=10368, D=64) measured block_k=1024 fastest (38.2 TF/s vs
    33.8 at 512; block_q >= 1024 exhausts VMEM). The BACKWARD always
    runs its key loop/grid at <= 512 (its per-program live set — logits,
    p, dp, ds plus dk/dv accumulators — is ~2x the forward's)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k)
    return out


def _fa_fwd(q, k, v, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, block_q, block_k, residuals, g):
    q, k, v, out, lse = residuals
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_backward(
        q, k, v, out, lse, g, scale, block_q, min(block_k, 512)
    )


flash_attention.defvjp(_fa_fwd, _fa_bwd)
