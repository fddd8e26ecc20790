"""Flash fwd block-size sweep at the 268v global shape (the f32->bf16
operand change measured flat — the kernel is softmax/VPU-bound, so the
levers are loop/mask overhead, not matmul dtype)."""
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

ref = None
for bq, bk in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
               (512, 2048), (2048, 512), (256, 1024)]:
    g = jax.jit(lambda q, k, v: A.flash_attention(q, k, v, scale, bq, bk))
    try:
        out = g(q, k, v)
        jax.device_get(out.reshape(-1)[:1])
    except Exception as e:
        print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}", flush=True)
        continue
    t0 = time.time()
    for _ in range(8):
        out = g(q, k, v)
    jax.device_get(out.reshape(-1)[:1])
    dt = (time.time() - t0) / 8
    if ref is None:
        ref = np.asarray(out[0, 0, :64].astype(jnp.float32))
    err = float(np.max(np.abs(np.asarray(out[0, 0, :64].astype(jnp.float32)) - ref)))
    print(f"bq={bq} bk={bk}: {1e3*dt:.2f} ms = {flops/dt/1e12:.1f} TF/s (maxdiff {err:.2e})", flush=True)
