"""Does XLA lower s8xs8->s32 dot_general to the v5e int8 MXU path (2x
bf16 rate), and at what shapes? Times the tower-shaped matmuls:
(T,d)@(d,4d) MLP and (T,d)@(d,3d) QKV at T=10368, d=1024.
Chained deps + one device_get (block_until_ready lies here)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp

T, D = 10368, 1024
rng = np.random.default_rng(0)


def bench(tag, a, b, prefer, reps=30):
    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(reps):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=prefer
            )
            # fold back to a's shape/dtype so the chain is dependent
            x = (y[:, : a.shape[1]]).astype(a.dtype)
        return x

    out = chain(a, b)
    jax.device_get(out[:1, :1])
    t0 = time.time()
    out = chain(a, b)
    jax.device_get(out[:1, :1])
    dt = (time.time() - t0) / reps
    flops = 2 * a.shape[0] * a.shape[1] * b.shape[1]
    print(f"{tag}: {1e3*dt:.3f} ms/matmul = {flops/dt/1e12:.1f} TF/s", flush=True)


for N in (4096, 3072):
    a8 = jnp.asarray(rng.integers(-127, 128, (T, D)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (D, N)).astype(np.int8))
    abf = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32)).astype(jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(D, N)).astype(np.float32)).astype(jnp.bfloat16)
    bench(f"bf16 ({T},{D})@({D},{N})", abf, bbf, jnp.float32)
    bench(f"int8 ({T},{D})@({D},{N})", a8, b8, jnp.int32)
