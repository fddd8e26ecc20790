"""Measure achievable bf16 matmul TF/s at tower shapes on this chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N_TOK = 10368
D = 1024
H = 4096
REPS = 24

@jax.jit
def mlp_chain(x, w1, w2):
    for _ in range(REPS):
        x = jnp.tanh((x @ w1) @ w2)
    return x

x = jax.random.normal(jax.random.PRNGKey(0), (N_TOK, D), jnp.bfloat16)
w1 = jax.random.normal(jax.random.PRNGKey(1), (D, H), jnp.bfloat16) * 0.02
w2 = jax.random.normal(jax.random.PRNGKey(2), (H, D), jnp.bfloat16) * 0.02

def run1():
    return float(jax.device_get(jnp.sum(mlp_chain(x, w1, w2).astype(jnp.float32))))
run1()
ts = []
for _ in range(5):
    t0 = time.time(); run1(); ts.append(time.time() - t0)
t = float(np.median(ts))
flops = REPS * 2 * 2 * N_TOK * D * H
print(f"MLP chain: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TF/s bf16")

# attention-shaped: scores + apply at window size 576
W = 576
NW = 18 * 16  # windows x heads

@jax.jit
def attn_chain(q, k, v):
    for _ in range(REPS):
        s = jnp.einsum("wnd,wmd->wnm", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        q = jnp.einsum("wnm,wmd->wnd", p, v)
    return q

q = jax.random.normal(jax.random.PRNGKey(3), (NW, W, 64), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(4), (NW, W, 64), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(5), (NW, W, 64), jnp.bfloat16)
def run2():
    return float(jax.device_get(jnp.sum(attn_chain(q, k, v).astype(jnp.float32))))
run2()
ts = []
for _ in range(5):
    t0 = time.time(); run2(); ts.append(time.time() - t0)
t = float(np.median(ts))
flops = REPS * 2 * 2 * NW * W * W * 64
print(f"window attn chain: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TF/s (64-dim heads)")
