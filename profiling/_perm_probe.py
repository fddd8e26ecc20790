"""Probe the primitive costs the index-sorted y-decode design depends on:
sort / take / scatter at 2.65M elements, and whether pltpu.roll with a
dynamic shift + the log-shift expansion pattern lower on this Mosaic.

Run on the real chip: python profiling/_perm_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2_654_208
NCDFS = 64


def timeit(fn, *args, iters=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, NCDFS, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    vals = jnp.asarray(rng.integers(0, 1 << 15, N).astype(np.int32))

    # 1. packed-key sort (idx<<22 | iota) -> sorted idx + permutation
    @jax.jit
    def packed_sort(idx):
        iota = jnp.arange(idx.shape[0], dtype=jnp.int32)
        key = (idx << 22) | iota
        skey = jnp.sort(key)
        return skey >> 22, skey & ((1 << 22) - 1)

    sidx, perm = timeit(packed_sort, idx, name="packed-key sort 2.65M")

    # 2. argsort for comparison
    timeit(jax.jit(lambda a: jnp.argsort(a, stable=True)), idx,
           name="argsort(stable) 2.65M")

    # 3. gather by permutation (fill mode)
    timeit(jax.jit(lambda v, p: jnp.take(v, p, mode="fill", fill_value=0)),
           vals, perm, name="take 2.65M (fill)")

    # 4. scatter (inverse permutation application)
    timeit(jax.jit(lambda v, p: jnp.zeros_like(v).at[p].set(v, mode="drop")),
           vals, perm, name="scatter 2.65M (drop)")

    # 5. sort+unsort roundtrip fused in one jit (what decode actually pays)
    @jax.jit
    def sort_roundtrip(idx, vals):
        iota = jnp.arange(idx.shape[0], dtype=jnp.int32)
        key = (idx << 22) | iota
        skey = jnp.sort(key)
        perm = skey & ((1 << 22) - 1)
        svals = jnp.take(vals, perm, mode="fill", fill_value=0)
        # inverse: scatter back
        out = jnp.zeros_like(svals).at[perm].set(svals, mode="drop")
        return out

    out = timeit(sort_roundtrip, idx, vals, name="sort+take+scatter fused")
    assert np.array_equal(np.asarray(out), np.asarray(vals)), "roundtrip!"

    # 6. Pallas: dynamic roll + expansion pattern lowering probe
    R, Kd = 8, 1024
    K = R * Kd

    def expand_kernel(mask_ref, words_ref, out_ref):
        """Distribute words[0..c) to the lanes where mask is set (in lane
        order) using log-shift passes with nondecreasing displacements."""
        mask = mask_ref[...] != 0  # (R, Kd)
        # Kogge-Stone inclusive prefix sum over flat (R, Kd) order
        x = mask.astype(jnp.int32)
        # prefix along minor axis
        s = 1
        while s < Kd:
            sh = pltpu.roll(x, s, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, Kd), 1)
            x = x + jnp.where(col >= s, sh, 0)
            s *= 2
        # cascade row totals
        row_tot = x[:, Kd - 1 : Kd]  # (R, 1)
        rt = row_tot
        sr = 1
        while sr < R:
            shr = pltpu.roll(rt, sr, 0)
            row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            rt = rt + jnp.where(row >= sr, shr, 0)
            sr *= 2
        shift = rt - row_tot  # exclusive row prefix
        inc = x + shift
        rank = inc - mask.astype(jnp.int32)  # exclusive prefix = rank
        # displacement: lane position - rank (flat lane position)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, Kd), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, Kd), 0)
        lanepos = row * Kd + col
        disp = jnp.where(mask, lanepos - rank, 0)

        # move words: word j must travel to the lane with rank j.
        # Start with words at flat positions 0..c); iteratively shift by
        # powers of two where the pending displacement has that bit.
        buf = words_ref[...].astype(jnp.int32)  # (R, Kd) first c used
        # target displacement for the element currently at rank j is
        # disp at its destination; we need dest-indexed disp gathered to
        # current position — instead propagate: carry (value, remaining)
        # where remaining = disp of its destination. Build remaining by
        # the same expansion applied to disp? For the probe we just
        # exercise the shift pattern's lowering with a synthetic
        # remaining = rank-like vector.
        rem = jnp.where(mask, disp, 0)
        # for the probe, pretend buf's element at rank r has remaining
        # displacement rem_at_dest; do the 13 passes structurally
        b = 1
        while b < K:
            mv = (rem & b) != 0
            # flat roll of buf by b: minor roll + row fix
            if b < Kd:
                rolled = pltpu.roll(buf, b, 1)
                prev = pltpu.roll(rolled, 1, 0)
                rolled = jnp.where(col < b, prev, rolled)
            else:
                rolled = pltpu.roll(buf, b // Kd, 0)
            buf = jnp.where(mv, rolled, buf)
            rem = jnp.where(mv, rem - b, rem)
            b *= 2
        out_ref[...] = buf

    @jax.jit
    def expand(mask, words):
        return pl.pallas_call(
            expand_kernel,
            out_shape=jax.ShapeDtypeStruct((R, Kd), jnp.int32),
        )(mask, words)

    mask = jnp.asarray((rng.random((R, Kd)) < 0.6).astype(np.int32))
    words = jnp.asarray(rng.integers(0, 1 << 16, (R, Kd)).astype(np.int32))
    try:
        timeit(expand, mask, words, iters=10, name="pallas expansion probe")
        print("expansion pattern LOWERS")
    except Exception as e:
        print("expansion pattern FAILED:", repr(e)[:500])

    # 7. dynamic-shift roll probe
    def dynroll_kernel(x_ref, s_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)

    @jax.jit
    def dynroll(x, s):
        return pl.pallas_call(
            dynroll_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((R, Kd), jnp.int32),
        )(x, s)

    try:
        out = dynroll(words, jnp.array([3], jnp.int32))
        jax.block_until_ready(out)
        ok = np.array_equal(np.asarray(out), np.roll(np.asarray(words), -3, 1)) or \
            np.array_equal(np.asarray(out), np.roll(np.asarray(words), 3, 1))
        print("dynamic roll LOWERS, semantics-roll-matches:", ok)
    except Exception as e:
        print("dynamic roll FAILED:", repr(e)[:300])


if __name__ == "__main__":
    main()
