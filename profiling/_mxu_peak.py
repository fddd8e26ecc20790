"""What bf16 matmul rate can this chip actually sustain, and does the
tower shape (T=10368) leave MXU throughput on the table? Chains
dependent matmuls with NO per-iter slicing/casting (the int8 probe's
chain folded a 170MB slice+cast into each "matmul" time). Also checks
f32-accum vs bf16-accum and a fused-QKV-like wide output.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp

rng = np.random.default_rng(0)


def bench(tag, m, k, n, acc, reps=30):
    a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(jnp.bfloat16)
    # square-ish weight so the chain output feeds the next matmul directly
    b = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)).astype(jnp.bfloat16)
    bT = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain(a, b, bT):
        x = a
        for _ in range(reps):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
            ).astype(jnp.bfloat16)
            x = jax.lax.dot_general(
                y, bT, (((1,), (0,)), ((), ())), preferred_element_type=acc
            ).astype(jnp.bfloat16)
        return x

    out = chain(a, b, bT)
    jax.device_get(out[:1, :1])
    t0 = time.time()
    out = chain(a, b, bT)
    jax.device_get(out[:1, :1])
    dt = (time.time() - t0) / (2 * reps)
    flops = 2 * m * k * n
    print(f"{tag}: {1e3*dt:.3f} ms/matmul = {flops/dt/1e12:.1f} TF/s", flush=True)


for m in (8192, 10368, 16384):
    bench(f"bf16 f32acc ({m},1024)@(1024,4096)", m, 1024, 4096, jnp.float32)
bench("bf16 bf16acc (10368,1024)@(1024,4096)", 10368, 1024, 4096, jnp.bfloat16)
bench("bf16 f32acc (4096,4096)@(4096,4096)", 4096, 4096, 4096, jnp.float32)
bench("bf16 f32acc (10368,1024)@(1024,1024)", 10368, 1024, 1024, jnp.float32)
