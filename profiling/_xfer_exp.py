"""Measure tunnel transfer + dispatch overheads with device-computed data."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.device_get(jnp.zeros(8))  # first-D2H warmup

SZ = 4_500_000

def timeit(f, n=5):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return float(np.median(ts))

# device-COMPUTED arrays (no cached host copy)
mk_one = jax.jit(lambda s: jnp.full(SZ, s, jnp.uint8))
mk_part = jax.jit(lambda s: jnp.full(SZ // 6, s, jnp.uint8))
mk_small = jax.jit(lambda s: jnp.full(2, s, jnp.int32))

i = [0]
def fresh(mk):
    i[0] += 1
    a = mk(np.uint8(i[0] % 250))
    a.block_until_ready()
    return a

def d2h_one():
    a = fresh(mk_one)
    t0 = time.time(); jax.device_get(a); return time.time() - t0

def med(f, n=5):
    f()
    return float(np.median([f() for _ in range(n)]))

print("D2H 1x4.5MB (computed): %.3fs" % med(d2h_one))

def d2h_parts():
    parts = tuple(fresh(mk_part) for _ in range(6))
    t0 = time.time(); jax.device_get(parts); return time.time() - t0
print("D2H 6x0.75MB (computed): %.3fs" % med(d2h_parts))

def d2h_small():
    a = fresh(mk_small)
    t0 = time.time(); jax.device_get(a); return time.time() - t0
print("D2H 8B (computed): %.3fs" % med(d2h_small))

# dispatch + sync RTT of a trivial jit
tiny = jax.jit(lambda a: a + 1)
base = jnp.zeros(2, jnp.int32)
tiny(base).block_until_ready()
def rtt():
    t0 = time.time(); tiny(base).block_until_ready(); return time.time() - t0
print("tiny jit dispatch+sync: %.3fs" % med(rtt, 10))

# chained dispatches then one sync (are dispatches pipelined?)
def chain10():
    t0 = time.time()
    a = base
    for _ in range(10):
        a = tiny(a)
    a.block_until_ready()
    return time.time() - t0
print("10 chained tiny jits + 1 sync: %.3fs" % med(chain10, 5))

# H2D of fresh host buffers (defeat any caching by changing contents)
def h2d_one():
    h = np.full(SZ, i[0] % 250, np.uint8); i[0] += 1
    t0 = time.time(); jax.block_until_ready(jnp.asarray(h)); return time.time() - t0
print("H2D 1x4.5MB fresh: %.3fs" % med(h2d_one))

def h2d_parts():
    hs = [np.full(SZ // 6, (i[0] + k) % 250, np.uint8) for k in range(6)]; i[0] += 1
    t0 = time.time(); jax.block_until_ready([jnp.asarray(h) for h in hs]); return time.time() - t0
print("H2D 6x0.75MB fresh: %.3fs" % med(h2d_parts))
