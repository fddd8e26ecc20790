"""Perm-design primitive costs, measured correctly for this runtime:
block_until_ready does NOT synchronize under the tunneled TPU backend
(only device_get does), so every measurement chains N dependent
iterations inside one jit and pays ONE device_get of a scalar; the
1-iteration version is subtracted to remove dispatch+RTT."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2_654_208
NCDFS = 64


def measure(make_fn, arg, n_hi=8, name=""):
    f1 = jax.jit(make_fn(1))
    fN = jax.jit(make_fn(n_hi))
    jax.device_get(f1(arg)); jax.device_get(fN(arg))  # compile
    def t(f):
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            jax.device_get(f(arg))
        return (time.time() - t0) / reps
    t1, tN = t(f1), t(fN)
    per = (tN - t1) / (n_hi - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms/op   (1x={t1*1e3:.1f} {n_hi}x={tN*1e3:.1f})")
    return per


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NCDFS, N).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 15, N).astype(np.int32))

    def mk_sort(n):
        def f(idx):
            acc = idx
            s = jnp.int32(0)
            for i in range(n):
                key = ((acc ^ i) << 22) | jnp.arange(N, dtype=jnp.int32)
                sk = jnp.sort(key)
                s = s + sk[0] + sk[-1]
                acc = idx  # keep values bounded; dependency via s is enough?
            return s
        return f
    measure(mk_sort, idx, name="packed sort 2.65M")

    def mk_take(n):
        def f(v):
            s = jnp.int32(0)
            perm = jnp.arange(N - 1, -1, -1, dtype=jnp.int32)
            acc = v
            for i in range(n):
                acc = jnp.take(acc, perm ^ i, mode="fill", fill_value=0)
                s = s + acc[0]
            return s
        return f
    measure(mk_take, vals, name="take 2.65M (fill)")

    def mk_scatter(n):
        def f(v):
            s = jnp.int32(0)
            perm = jnp.arange(N - 1, -1, -1, dtype=jnp.int32)
            acc = v
            for i in range(n):
                acc = jnp.zeros_like(acc).at[perm ^ i].set(acc, mode="drop")
                s = s + acc[0]
            return s
        return f
    measure(mk_scatter, vals, name="scatter 2.65M (drop)")

    # the full decode-side permutation overhead in ONE jit:
    # sort -> derive perm -> take(mv/off by sorted idx is cheap) -> after a
    # fake 'scan result', scatter back
    def mk_roundtrip(n):
        def f(v):
            s = jnp.int32(0)
            for i in range(n):
                key = ((idx ^ (i & 1)) << 22) | jnp.arange(N, dtype=jnp.int32)
                sk = jnp.sort(key)
                perm = sk & ((1 << 22) - 1)
                sv = jnp.take(v, perm, mode="fill", fill_value=0)
                out = jnp.zeros_like(sv).at[perm].set(sv, mode="drop")
                s = s + out[0] + out[-1]
            return s
        return f
    measure(mk_roundtrip, vals, n_hi=4, name="sort+perm+take+scatter")


if __name__ == "__main__":
    main()
