"""jax.profiler trace of fwd/hyper/reconstruct; aggregate op durations."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x)
jax.block_until_ready(variables)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()
xd = jnp.asarray(x)

out = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
jax.block_until_ready(out)
hz = codec._scales_from_z(codec.variables, out["z_sym"], codec._scale_table_dev)
jax.block_until_ready(hz)
xh = codec._reconstruct(codec.variables, out["y_sym"], hz["means"])
jax.block_until_ready(xh)
print("warm", flush=True)

td = "/tmp/jax_trace"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    for _ in range(2):
        o = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
        jax.block_until_ready(o)
        h = codec._scales_from_z(codec.variables, o["z_sym"], codec._scale_table_dev)
        jax.block_until_ready(h)
        r = codec._reconstruct(codec.variables, o["y_sym"], h["means"])
        jax.block_until_ready(r)
print("traced", flush=True)

files = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)
print(files, flush=True)
agg = defaultdict(float)
cnt = defaultdict(int)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pid_name = ev.get("pid")
            name = ev.get("name", "?")
            agg[name] += ev["dur"] / 1e6
            cnt[name] += 1
top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
for name, t in top:
    print(f"{t:8.4f}s x{cnt[name]:4d}  {name[:140]}")
