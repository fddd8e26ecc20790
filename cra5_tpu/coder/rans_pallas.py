"""Pallas TPU kernels for the interleaved-lane rANS scans (format v2).

The lax.scan state machines in ``coder/rans_tpu.py`` pay ~0.13 ms/step of
fixed XLA loop overhead on v5e (measured, PERF.md "scan anatomy") — for
the 268v y-stream (M=324..648 steps) that's ~80-120 ms per scan, an
order of magnitude more than the arithmetic itself. These kernels run
the whole sequential loop *inside one Pallas kernel*: the grid iterates
over scan steps (TPU grids are sequential, so the lane state lives in a
VMEM scratch that persists across steps), Mosaic double-buffers the
per-step operand rows, and each step is pure VPU arithmetic.

Layout: the K lanes are viewed as (R, K//R) with R chosen so the minor
dim is a multiple of 128 (full VPU tiles). The flattening order of
(R, K//R) is row-major, identical to the flat lane order, so emitted
words compact to the same byte stream as the lax.scan path — container
format v2 is unchanged and the two implementations interoperate.

Encode semantics mirror ``rans_tpu._encode_scan`` exactly (32-bit lane
states, 16-bit renorm words, LIFO step order via reversed grid index
map); division is an in-kernel f32 reciprocal with exact integer
correction instead of the lax.scan path's magic constants. The decode
counterparts mirror ``rans_tpu._decode_scan``: a generic binary-search
kernel (gated off until Mosaic supports vector gather) and a gather-free
row-plan kernel for channel-broadcast index grids.

No reference counterpart: the reference's coder is a serial host loop
(/root/reference/cra5/models/compressai/cpp_exts/rans/rans_interface.cpp).
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel routing policy, mirroring nn.blocks's flash switch: "auto" uses
# the Pallas scans on TPU backends for lane counts the VPU view supports,
# "on"/"off" force the choice (tests A/B both paths).
_PALLAS_MODE = os.environ.get("CRA5_TPU_PALLAS_RANS", "auto")


def set_pallas_rans(mode: str) -> None:
    """mode: "auto" | "on" | "off"."""
    global _PALLAS_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"invalid pallas rans mode {mode!r}")
    _PALLAS_MODE = mode


def use_pallas_scan(K: int) -> bool:
    """Route this (M, K) ENCODE scan through the Pallas kernel?"""
    if _PALLAS_MODE == "off" or K % 128:
        return False
    if _PALLAS_MODE == "on":
        return True
    return jax.default_backend() in ("tpu", "axon")


def use_pallas_decode(K: int) -> bool:
    """Route a decode through the generic Pallas kernel? That kernel
    needs per-lane vector gathers (binary-search probes + stream refill),
    which the current Mosaic lowering rejects ("Only 2D gather is
    supported", with no take/take_along_axis form accepted — probed
    2026-08-16 on v5e). The kernel is correctness-locked in interpret
    mode; auto never selects it on hardware. Flip this when Mosaic gains
    vector gather."""
    if _PALLAS_MODE != "on" or K % 128:
        return False
    return True


_SORTED_MODE = os.environ.get("CRA5_TPU_SORTED_LANES", "auto")


def set_sorted_lanes(mode: str) -> None:
    """mode: "auto" | "on" | "off" — index-sorted lane assignment (the
    gather-free sorted decode kernel). Separate from the pallas-rans knob
    so the unsorted v2 golden streams stay reproducible on CPU."""
    global _SORTED_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"invalid sorted lanes mode {mode!r}")
    _SORTED_MODE = mode


_SORTED_UNROLL = int(os.environ.get("CRA5_TPU_SORTED_UNROLL", "8"))


def set_sorted_unroll(u: int) -> None:
    """Scan steps per grid iteration of the sorted decode kernel (A/B
    knob; the default is the measured v5e optimum)."""
    global _SORTED_UNROLL
    if u < 1:
        raise ValueError(f"invalid sorted unroll {u}")
    _SORTED_UNROLL = u


def sorted_unroll() -> int:
    return _SORTED_UNROLL


def use_sorted_lanes(K: int) -> bool:
    """Encode new streams with the index-sorted lane assignment (and route
    their decode through decode_sorted_pallas)? Sorting costs one
    2-operand sort each way (~7ms at 2.65M symbols on v5e), paid back
    several times over by the gather-free decode — but only for big
    multi-row streams on a real TPU."""
    if _SORTED_MODE == "off" or K % 128:
        return False
    if _SORTED_MODE == "on":
        return True
    return K >= 2048 and jax.default_backend() in ("tpu", "axon")


def use_pallas_rowplan(K: int) -> bool:
    """Route a channel-broadcast decode through the gather-free row-plan
    kernel? Unlike the generic decode it lowers on current Mosaic; cost
    scales with K**2 (tri/one-hot matmuls), so cap the lane count. The
    caller still checks its table-size and K<=symbols-per-channel
    constraints (LaneCoder._rowplan_ok)."""
    if _PALLAS_MODE == "off" or K > 512:
        return False
    return _PALLAS_MODE == "on" or jax.default_backend() in ("tpu", "axon")

PRECISION = 16
_LANE_L = 1 << 16  # lower bound of the 32-bit lane state (plain int:
# jnp constants at module scope become captured tracers in pallas kernels)


def _lane_view(K: int) -> tuple[int, int]:
    """(R, Kd) factorization of K lanes with Kd a multiple of 128 where
    possible, R <= 8 sublanes."""
    R = 1
    while R < 8 and (K // (R * 2)) % 128 == 0 and K // (R * 2) >= 128:
        R *= 2
    if K % R:
        raise ValueError(f"lane count {K} not factorable for the VPU view")
    return R, K // R


def _make_encode_kernel(U: int):
    def _encode_step_kernel(starts_ref, freqs_ref, states_ref, emit_ref,
                            words_ref, x_ref):
        """U scan steps per grid iteration (reverse order): renormalize,
        then push the symbol into each lane state.

        The quotient q = x // freq is computed with an f32 reciprocal and
        a ±1 integer correction instead of the lax.scan path's
        pre-gathered Granlund-Montgomery constants: after renorm
        x < freq << 16, so q < 2**16 is exactly representable in f32 and
        the combined rounding error of (x -> f32) * (1/freq) is < 0.05 —
        one correction step each way restores the exact integer quotient.
        This drops two of the four per-symbol table gathers from the
        encode prep (XLA DCE removes them once the kernel stops consuming
        the magic operands).

        The emit test rides (x >> 16) >= freq — equivalent to the spec's
        x >= freq << 16 for freq <= 2^16 but shift-overflow-safe at
        freq = 2^16, the wrapper's no-op padding frequency (start=0,
        freq=2^16 makes the step an exact identity for any lane state:
        emit false, q = x >> 16, r = x & 0xFFFF, x' = (q<<16) + r = x)."""
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            x_ref[...] = jnp.full(x_ref.shape, _LANE_L, jnp.uint32)

        x = x_ref[...]
        for j in range(U - 1, -1, -1):  # LIFO within the block too
            freq = freqs_ref[j].astype(jnp.uint32)
            emit = (x >> PRECISION) >= freq
            words_ref[j] = (x & 0xFFFF).astype(jnp.uint16)
            emit_ref[j] = emit.astype(jnp.uint8)
            x = jnp.where(emit, x >> PRECISION, x)
            f_f = freqs_ref[j].astype(jnp.float32)
            inv = 1.0 / f_f
            # one Newton-Raphson step: even if the hardware lowers / to a
            # fast approximate reciprocal (rel err up to ~2^-12), this
            # refines it to ~2^-24 so the +-1 correction below provably
            # restores exactness
            inv = inv * (2.0 - f_f * inv)
            # uint32 -> f32 via 16-bit halves through int32 (both halves
            # fit in int32, and Mosaic has no direct uint32 -> f32 cast)
            x_f = (x >> 16).astype(jnp.int32).astype(jnp.float32) * 65536.0 + (
                x & 0xFFFF
            ).astype(jnp.int32).astype(jnp.float32)
            q = (x_f * inv).astype(jnp.int32).astype(jnp.uint32)
            r = x - q * freq  # wraps past 2**31 iff q was one too big
            too_big = (r > jnp.uint32(0x80000000)).astype(jnp.uint32)
            q = q - too_big
            r = r + freq * too_big
            too_small = (r >= freq).astype(jnp.uint32)
            q = q + too_small
            r = r - freq * too_small
            x = (q << PRECISION) + r + starts_ref[j].astype(jnp.uint32)
        x_ref[...] = x

        @pl.when(t == pl.num_programs(0) - 1)
        def _fin():
            states_ref[...] = x

    return _encode_step_kernel


@functools.partial(
    jax.jit, static_argnames=("num_steps", "interpret", "unroll")
)
def encode_scan_pallas(bins, starts, freqs, magic_m, magic_s, num_steps,
                       interpret=None, unroll=None):
    """Drop-in replacement for ``rans_tpu._encode_scan``: inputs (M, K)
    step-major int32; returns (final_states (K,) uint32, emit (M, K)
    bool, words (M, K) uint16). ``bins``/``magic_m``/``magic_s`` are
    unused (tables pre-gathered; division via in-kernel f32 reciprocal)
    and kept for signature parity — XLA DCEs their producers.

    ``unroll`` steps run per grid iteration; M is padded with identity
    no-op steps (start=0, freq=2^16 — processed BEFORE every real step
    in the LIFO order, and exact identities regardless, so the emitted
    stream and final states are bit-identical for every unroll)."""
    del bins, magic_m, magic_s
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs real TPU
    M, K = starts.shape
    R, Kd = _lane_view(K)
    assert M == num_steps
    U = max(1, min(8 if unroll is None else unroll, M))
    Mp = -(-M // U) * U
    if Mp != M:
        p = Mp - M
        starts = jnp.concatenate(
            [starts, jnp.zeros((p, K), starts.dtype)], axis=0
        )
        freqs = jnp.concatenate(
            [freqs, jnp.full((p, K), 1 << PRECISION, freqs.dtype)], axis=0
        )
    shape3 = (Mp, R, Kd)
    Ng = Mp // U
    # encode walks steps in reverse (LIFO): grid step t handles the U-row
    # block Ng-1-t, and the kernel iterates rows within it in reverse
    rev = lambda t: (Ng - 1 - t, 0, 0)
    row_spec = lambda: pl.BlockSpec((U, R, Kd), rev, memory_space=pltpu.VMEM)
    states, emit, words = pl.pallas_call(
        _make_encode_kernel(U),
        grid=(Ng,),
        in_specs=[row_spec() for _ in range(2)],
        out_specs=(
            pl.BlockSpec((R, Kd), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, R, Kd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, R, Kd), rev, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, Kd), jnp.uint32),
            jax.ShapeDtypeStruct(shape3, jnp.uint8),
            jax.ShapeDtypeStruct(shape3, jnp.uint16),
        ),
        scratch_shapes=[pltpu.VMEM((R, Kd), jnp.uint32)],
        interpret=interpret,
    )(
        starts.reshape(shape3),
        freqs.reshape(shape3),
    )
    emit = emit.reshape(Mp, K)[:M].astype(bool)
    words = words.reshape(Mp, K)[:M]
    return states.reshape(K), emit, words


def _make_rowplan_decode_kernel(L: int, NR: int, K: int, U: int):
    def kernel(states_ref, stream_ref, tri_ref,
               rows_ref, sel_ref, mv_ref, off_ref,
               values_ref, sentinel_ref,
               x_ref, ptr_ref):
        """U decode steps per grid iteration with NO vector gathers —
        usable on Mosaic versions without dynamic-gather support (unlike
        the binary-search kernel above). Requires a caller-provided row
        plan: each step's lanes draw from at most NR distinct cdf rows
        (true for channel-broadcast index grids, i.e. every
        EntropyBottleneck z-stream with K <= H*W). Symbol lookup is a
        vectorized compare against the (K, L) selected-row block; refill
        ranks come from a triangular MXU matmul; refill words from a
        scalar-offset dynamic slice of the stream expanded through a
        one-hot matmul. Lanes ride as (K, 1) columns."""
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            x_ref[...] = states_ref[...]
            ptr_ref[0] = 0

        x = x_ref[...]  # (K, 1) uint32
        ptr = ptr_ref[0]
        for j in range(U):
            cum = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            sel = sel_ref[j]  # (K, 1) int32 in [0, NR)
            rows = rows_ref[j]  # (NR, L) int32, padded with 2**16
            r = rows[NR - 1 : NR]
            for i in range(NR - 2, -1, -1):  # select each lane's row
                r = jnp.where(sel == i, rows[i : i + 1], r)  # (K, L)
            le = r <= cum  # (K, L); cum < 2**16 so padding never selects
            s = jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True) - 1
            start = jnp.max(r * le.astype(jnp.int32), axis=1, keepdims=True)
            nxt = jnp.min(
                jnp.where(le, jnp.int32(1 << 17), r), axis=1, keepdims=True
            )
            freq = (nxt - start).astype(jnp.uint32)

            x = freq * (x >> PRECISION) + cum.astype(
                jnp.uint32
            ) - start.astype(jnp.uint32)

            refill = x < _LANE_L  # (K, 1)
            rf = refill.astype(jnp.float32)
            # HIGHEST precision on the matmuls: the TPU default pass
            # truncates f32 operands to bf16 — prefix counts up to K would
            # round above 256, and stream words up to 65535 would round to
            # the nearest multiple of 256, silently corrupting lane states
            inclusive = jax.lax.dot_general(
                tri_ref[...], rf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (K, 1) inclusive prefix counts (exact: counts <= K < 2**24)
            ranks = (inclusive - rf).astype(jnp.int32)
            # refill words live in a (Wr, 128) row grid (a (W, 1) column
            # would tile-pad to 128 lanes and flood VMEM 128x). Lane i
            # needs word pos_i = ptr + rank_i; slice the <= NROWS rows the
            # step can touch, select each lane's row with a one-hot
            # matmul, then its column with a mask-reduce (single nonzero
            # term — exact in f32).
            pos = ptr + ranks  # (K, 1); junk lanes stay in-bounds
            r0 = ptr >> 7
            nrows = K // 128 + 2
            rows128 = stream_ref[pl.ds(r0, nrows), :].astype(jnp.float32)
            oh_row = (
                (pos >> 7) - r0
                == jax.lax.broadcasted_iota(jnp.int32, (K, nrows), 1)
            ).astype(jnp.float32)
            lane_rows = jax.lax.dot_general(
                oh_row, rows128, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (K, 128)
            col_mask = (
                (pos & 127)
                == jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
            ).astype(jnp.float32)
            w = (
                jnp.sum(lane_rows * col_mask, axis=1, keepdims=True)
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )
            x = jnp.where(refill, (x << PRECISION) | w, x)
            ptr = ptr + jnp.sum(refill.astype(jnp.int32))

            values_ref[j] = s + off_ref[j]
            sentinel_ref[j] = (s == mv_ref[j]).astype(jnp.uint8)
        x_ref[...] = x
        ptr_ref[0] = ptr

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_steps", "interpret", "unroll")
)
def decode_rowplan_pallas(rows, sel, states, stream, mv, off,
                          num_steps, interpret=None, unroll=None):
    """Gather-free Pallas decode for row-planned streams. ``rows`` is
    (M, NR, L) int32 (the <=NR padded cdf rows each step needs), ``sel``
    (M, K) int32 selects each lane's row, ``mv``/``off`` (M, K) int32 are
    the pre-gathered max_values/offsets, ``states`` (K,) uint32,
    ``stream`` (W,) int32 padded so W >= n_words + K. Returns
    (values (M, K) int32, sentinel (M, K) bool).

    ``unroll`` steps run per grid iteration; M is padded with exact no-op
    steps (row [0, 2^16, ...] -> start 0, freq 2^16: state reproduced
    bit-exactly, no refill under the x >= 2^16 lane invariant)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs real TPU
    M, NR, L = rows.shape
    K = sel.shape[1]
    assert M == num_steps
    U = max(1, min(8 if unroll is None else unroll, M))
    Mp = -(-M // U) * U
    if Mp != M:
        p = Mp - M
        top = 1 << PRECISION
        rpad = jnp.full((p, NR, L), top, jnp.int32).at[:, :, 0].set(0)
        rows = jnp.concatenate([rows, rpad], axis=0)
        zs = jnp.zeros((p, K), sel.dtype)
        sel = jnp.concatenate([sel, zs], axis=0)
        mv = jnp.concatenate([mv, zs - 1], axis=0)  # s=0 != -1: no sentinel
        off = jnp.concatenate([off, zs], axis=0)
    col = lambda a: a.reshape(Mp, K, 1)
    fwd = lambda t: (t, 0, 0)
    tri = jnp.asarray(
        np.tril(np.ones((K, K), np.float32))
    )
    # stream as a (Wr, 128) row grid — a (W, 1) column layout tile-pads
    # to 128 lanes in VMEM (measured: a 45k-word stream OOM'd the 16MB
    # scoped vmem). Guard rows cover the kernel's dynamic row slice.
    nrows = K // 128 + 2
    W = stream.shape[0]
    Wr = -(-W // 128) + nrows
    stream_grid = jnp.pad(stream, (0, Wr * 128 - W)).reshape(Wr, 128)
    values, sentinel = pl.pallas_call(
        _make_rowplan_decode_kernel(L, NR, K, U),
        grid=(Mp // U,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # states (K, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stream (Wr, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri (K, K)
            pl.BlockSpec((U, NR, L), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, K, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, K, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, K, 1), fwd, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((U, K, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, K, 1), fwd, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, K, 1), jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, 1), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(
        states.reshape(K, 1),
        stream_grid,
        tri,
        rows,
        col(sel),
        col(mv),
        col(off),
    )
    values = values.reshape(Mp, K)[:M]
    sentinel = sentinel.reshape(Mp, K)[:M]
    return values, sentinel.astype(bool)


def _make_sorted_decode_kernel(G: int, Lc: int, K: int, nrows: int, U: int):
    """Decode kernel for INDEX-SORTED streams: each step's lanes span at
    most two cdf rows with a known split lane, so the symbol lookup is a
    two-level (coarse/chunk) search against per-step broadcast tables —
    lanes ride the MINOR axis ((X, K) layouts) so row/chunk selection is
    a small one-hot MXU matmul and no vector gather is ever needed. The
    stream refill reads a contiguous window at the step's word pointer
    and distributes it to refilling lanes with a second one-hot matmul.

    ``U`` scan steps run per grid iteration (statically unrolled, lane
    state and word pointer carried in registers) to amortize the fixed
    per-grid-step cost — the grid loop plus per-step operand DMAs — over
    U steps; the wrapper pads the step count with exact no-op steps.

    This removes the two per-step XLA gathers (packed LUT + refill) that
    kept the generic y-stream decode on lax.scan (PERF.md), the cost the
    reference pays as a serial linear CDF scan per symbol
    (rans_interface.cpp:246-250)."""
    G1 = G + 1
    TwoLc = 2 * Lc

    def kernel(split_ref, mv0_ref, mv1_ref, off0_ref, off1_ref,  # SMEM (Mp,)
               states_ref, stream_ref,                            # VMEM full
               coarseT_ref, chunkT_ref,                           # U-step blk
               values_ref, sentinel_ref,                          # outputs
               x_ref, ptr_ref):                                   # scratch
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            x_ref[...] = states_ref[...]
            ptr_ref[0] = 0

        x = x_ref[...]                                        # (1, K) uint32
        ptr = ptr_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        base = t * U
        for j in range(U):
            step = base + j
            cum = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)  # (1, K)
            sel = (col >= split_ref[step]).astype(jnp.int32)  # (1, K)

            # coarse: count cdf[r, c*G] <= cum over both candidate rows
            ct = coarseT_ref[j]                               # (Lc, 2) int32
            le0 = (ct[:, 0:1] <= cum).astype(jnp.int32)       # (Lc, K)
            le1 = (ct[:, 1:2] <= cum).astype(jnp.int32)
            c0 = jnp.sum(le0, axis=0, keepdims=True) - 1      # (1, K)
            c1 = jnp.sum(le1, axis=0, keepdims=True) - 1
            coarse = jnp.where(sel == 1, c1, c0)              # (1, K), >= 0

            # chunk select: one-hot over the 2*Lc (row, chunk) pairs —
            # exact one-hot operand, f32 table (< 2**16 values are
            # f32-exact), HIGHEST precision vs the bf16 default truncation
            flat = sel * Lc + coarse
            oh = (
                flat == jax.lax.broadcasted_iota(jnp.int32, (TwoLc, K), 0)
            ).astype(jnp.float32)
            chunk = jax.lax.dot_general(
                chunkT_ref[j], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                 # (G1, K) f32
            cum_f = cum.astype(jnp.float32)
            lef = (chunk <= cum_f).astype(jnp.float32)        # (G1, K)
            fine = jnp.sum(lef, axis=0, keepdims=True).astype(jnp.int32) - 1
            start = jnp.max(chunk * lef, axis=0, keepdims=True)  # cdf[bin]
            nxt = jnp.min(
                jnp.where(lef == 1.0, jnp.float32(1 << 17), chunk),
                axis=0, keepdims=True,
            )                                                 # cdf[bin+1]
            freq = (nxt - start).astype(jnp.int32).astype(jnp.uint32)
            start_u = start.astype(jnp.int32).astype(jnp.uint32)

            s_bin = coarse * G + fine                         # (1, K)
            mv = jnp.where(sel == 1, mv1_ref[step], mv0_ref[step])
            off = jnp.where(sel == 1, off1_ref[step], off0_ref[step])
            values_ref[j] = s_bin + off
            sentinel_ref[j] = (s_bin == mv).astype(jnp.int32)

            x = freq * (x >> PRECISION) + cum.astype(jnp.uint32) - start_u

            # refill: ranks from a Kogge-Stone prefix (minor-axis rolls),
            # then a one-hot select of the word window at ptr
            refill = x < _LANE_L                              # (1, K)
            ri = refill.astype(jnp.int32)
            v = ri
            s = 1
            while s < K:
                sh = pltpu.roll(v, s, 1)
                v = v + jnp.where(col >= s, sh, 0)
                s *= 2
            rank = v - ri                                     # exclusive
            total = jnp.sum(ri)
            pos = ptr + rank                                  # (1, K)
            r0w = ptr // 128
            rows = stream_ref[pl.ds(r0w, nrows), :].astype(jnp.float32)
            ohr = (
                (pos // 128) - r0w
                == jax.lax.broadcasted_iota(jnp.int32, (nrows, K), 0)
            ).astype(jnp.float32)                             # (nrows, K)
            lane_rows = jax.lax.dot_general(
                rows, ohr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                 # (128, K)
            cmask = (
                (pos & 127)
                == jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
            ).astype(jnp.float32)
            w = jnp.sum(lane_rows * cmask, axis=0, keepdims=True)
            w = w.astype(jnp.int32).astype(jnp.uint32)        # (1, K)
            x = jnp.where(refill, (x << PRECISION) | w, x)
            ptr = ptr + total
        x_ref[...] = x
        ptr_ref[0] = ptr

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_steps", "G", "Lc", "interpret", "unroll")
)
def decode_sorted_pallas(coarseT, chunkT, split, mv0, mv1, off0, off1,
                         states, stream, num_steps, G, Lc, interpret=None,
                         unroll=None):
    """Gather-free Pallas decode for index-sorted streams. ``coarseT`` is
    (M, Lc, 2) int32 (both candidate rows' coarse tables per step),
    ``chunkT`` (M, G+1, 2*Lc) f32 (chunked cdf windows, row 0 in columns
    [0, Lc), row 1 in [Lc, 2Lc)), ``split``/``mv0``/``mv1``/``off0``/
    ``off1`` (M,) int32 per-step scalars, ``states`` (K,) uint32,
    ``stream`` (W,) int32 padded so W >= n_words + K + 256. Returns
    (values (M, K) int32, sentinel (M, K) bool).

    ``unroll`` scan steps run per grid iteration (default 8, A/B'd on
    v5e — see PERF.md "sorted-decode unroll"); M is padded to a multiple
    with exact NO-OP steps: a coarse row [0, 2^16, ...] selects chunk 0
    whose column [0, 2^16, ...] yields start=0, freq=2^16, so the state
    update (x>>16)*2^16 + cum reproduces x bit-exactly and no refill
    fires (the lane invariant keeps x >= 2^16)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs real TPU
    M = coarseT.shape[0]
    K = int(states.shape[0])
    assert M == num_steps
    U = max(1, min(8 if unroll is None else unroll, M))
    Mp = -(-M // U) * U
    if Mp != M:
        p = Mp - M
        top = 1 << PRECISION
        cpad = jnp.full((p, Lc, 2), top, jnp.int32).at[:, 0, :].set(0)
        kpad = jnp.full(
            (p, G + 1, 2 * Lc), float(top), jnp.float32
        ).at[:, 0, :].set(0.0)
        zs = jnp.zeros((p,), split.dtype)
        coarseT = jnp.concatenate([coarseT, cpad], axis=0)
        chunkT = jnp.concatenate([chunkT, kpad], axis=0)
        split = jnp.concatenate([split, zs])
        mv0 = jnp.concatenate([mv0, zs - 1])  # s_bin=0 != -1: no sentinel
        mv1 = jnp.concatenate([mv1, zs - 1])
        off0 = jnp.concatenate([off0, zs])
        off1 = jnp.concatenate([off1, zs])
    nrows = K // 128 + 2
    W = stream.shape[0]
    Wr = -(-W // 128) + nrows
    stream_grid = jnp.pad(stream, (0, Wr * 128 - W)).reshape(Wr, 128)
    fwd = lambda t: (t, 0, 0)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    values, sentinel = pl.pallas_call(
        _make_sorted_decode_kernel(G, Lc, K, nrows, U),
        grid=(Mp // U,),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # states (1, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stream (Wr, 128)
            pl.BlockSpec((U, Lc, 2), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, G + 1, 2 * Lc), fwd, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((U, 1, K), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 1, K), fwd, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1, K), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, K), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(
        split, mv0, mv1, off0, off1,
        states.reshape(1, K),
        stream_grid,
        coarseT,
        chunkT,
    )
    values = values.reshape(Mp, K)[:M]
    sentinel = sentinel.reshape(Mp, K)[:M]
    return values, sentinel != 0


def _make_decode_kernel(n_probes: int, max_len: int):
    def _decode_step_kernel(states_ref, cdf_ref, stream_ref,
                            row0_ref, mv_ref, off_ref,
                            values_ref, sentinel_ref,
                            x_ref, ptr_ref):
        """One decode step: symbol lookup by in-VMEM binary search, state
        update, stream refill via an in-kernel flat prefix sum."""
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            x_ref[...] = states_ref[...]
            ptr_ref[0] = 0

        x = x_ref[...]
        cum = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        row0 = row0_ref[0]
        tab = cdf_ref[...]

        # binary search: tab rows are padded with 2**16 past cdf_length,
        # and cum < 2**16, so probes never land in padding
        lo = jnp.zeros_like(cum)
        hi = jnp.full_like(cum, max_len - 1)
        for _ in range(n_probes):
            mid = (lo + hi + 1) >> 1
            c = jnp.take(tab, row0 + mid, axis=0)
            le = c <= cum
            lo = jnp.where(le, mid, lo)
            hi = jnp.where(le, hi, mid - 1)
        s = lo
        start = jnp.take(tab, row0 + s, axis=0)
        freq = (jnp.take(tab, row0 + s + 1, axis=0) - start).astype(jnp.uint32)

        x = freq * (x >> PRECISION) + cum.astype(jnp.uint32) - start.astype(jnp.uint32)

        refill = (x < _LANE_L).astype(jnp.int32)
        inc = jnp.cumsum(refill, axis=1)
        row_tot = inc[:, -1:]
        shift = jnp.cumsum(row_tot, axis=0) - row_tot
        ranks = inc + shift - refill
        # non-refilling lanes carry junk ranks; clamp so the gather stays
        # in bounds (their result is discarded by the where below)
        pos = jnp.minimum(ptr_ref[0] + ranks, stream_ref.shape[0] - 1)
        w = jnp.take(stream_ref[...], pos, axis=0).astype(jnp.uint32)
        x_ref[...] = jnp.where(refill == 1, (x << PRECISION) | w, x)
        ptr_ref[0] = ptr_ref[0] + jnp.sum(refill)

        sentinel_ref[0] = (s == mv_ref[0]).astype(jnp.uint8)
        values_ref[0] = s + off_ref[0]

    return _decode_step_kernel


@functools.partial(
    jax.jit, static_argnames=("max_len", "num_steps", "interpret")
)
def decode_scan_pallas(row0, states, stream, cdf_flat, mv, off,
                       max_len, num_steps, interpret=None):
    """Pallas counterpart of ``rans_tpu._decode_scan``. The caller
    pre-gathers everything the static index grid determines: ``row0`` =
    indexes*max_len, ``mv`` = max_values[indexes], ``off`` =
    offsets[indexes], all (M, K) int32. ``stream`` is int32 (widened
    uint16 renorm words), ``cdf_flat`` the padded search table as a
    (ncdfs*max_len,) int32 vector. Returns (values (M, K) int32,
    sentinel (M, K) bool)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs real TPU
    M, K = row0.shape
    R, Kd = _lane_view(K)
    assert M == num_steps
    shape3 = (M, R, Kd)
    n_probes = max(1, (max_len - 1).bit_length())
    fwd = lambda t: (t, 0, 0)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    row_spec = lambda: pl.BlockSpec((1, R, Kd), fwd, memory_space=pltpu.VMEM)
    values, sentinel = pl.pallas_call(
        _make_decode_kernel(n_probes, max_len),
        grid=(M,),
        in_specs=[full(), full(), full(), row_spec(), row_spec(), row_spec()],
        out_specs=(
            pl.BlockSpec((1, R, Kd), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Kd), fwd, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape3, jnp.int32),
            jax.ShapeDtypeStruct(shape3, jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, Kd), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(
        states.reshape(R, Kd),
        cdf_flat,
        stream,
        row0.reshape(shape3),
        mv.reshape(shape3),
        off.reshape(shape3),
    )
    return values.reshape(M, K), sentinel.reshape(M, K).astype(bool)
