"""How fast is the Pallas flash-attention FORWARD at the 268v global-
block shape (B=1, H=16, N=10368, D=64)? Ideal attention FLOPs are
4*N^2*H*D ~ 0.44 TF per block; at the chip's ~93-120 TF/s fat-matmul
rate that is ~4-5 ms. If the kernel is much slower, the 6 global blocks
per tower are a real headline cost. A/Bs block sizes and the einsum
path (which pays ~7 GB of f32 logit traffic instead)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp

from cra5_tpu.ops import attention as A

B, H, N, D = 1, 16, 10368, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)).astype(jnp.bfloat16)
scale = 1.0 / np.sqrt(D)
flops = 4 * N * N * H * D


def bench(tag, f, reps=8):
    g = jax.jit(lambda q, k, v: f(q, k, v))
    out = g(q, k, v)
    jax.device_get(out.reshape(-1)[:1])
    t0 = time.time()
    for _ in range(reps):
        out = g(q, k, v)
    jax.device_get(out.reshape(-1)[:1])
    dt = (time.time() - t0) / reps
    print(f"{tag}: {1e3*dt:.2f} ms = {flops/dt/1e12:.1f} TF/s", flush=True)


bench("flash fwd (current)", lambda q, k, v: A.flash_attention(q, k, v, scale))


def einsum_attn(q, k, v):
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


try:
    bench("einsum f32-logits", einsum_attn)
except Exception as e:  # OOM is informative too
    print(f"einsum path failed: {type(e).__name__}", flush=True)
