"""Cost bisect of the gramv3 kernel: time the headline config with kernel
pieces stubbed out (QTPU_GRAMV3_SKIP) to attribute device time.

Each skip config runs in a subprocess (the skip set is frozen at import).
Results are WRONG with skips active — timing attribution only.

Usage: python experiments/gramv3_bisect.py [B] [g_dtype] [block_b] [il]
"""
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

B = sys.argv[1] if len(sys.argv) > 1 else "8192"
G_DTYPE = sys.argv[2] if len(sys.argv) > 2 else "int8"
BLOCK_B = sys.argv[3] if len(sys.argv) > 3 else "256"
IL = sys.argv[4] if len(sys.argv) > 4 else "2"

CHILD = r"""
import sys, time, json, os
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/quantization_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from quantization_tpu import core
from quantization_tpu.ops import gramv3

B, g_dtype, block_b, il = %(b)s, %(gd)r, %(bb)s, %(il)s
cfg = core.QuantizerConfig(dim=512, codebook_size=256, num_codebooks=8)
params = core.init_quantizer_params(jax.random.PRNGKey(0), cfg)
mk = lambda i: jax.random.normal(jax.random.PRNGKey(100 + i), (B, 512))

f = jax.jit(lambda x: gramv3.gramv3_encode_indexes(
    params, cfg, x, M=8, R=4, passes=3, g_dtype=g_dtype,
    block_b=block_b, interleave=il))
np.asarray(f(mk(99)))  # compile
batches = [mk(i) for i in range(8)]
jax.block_until_ready(batches)
t0 = time.perf_counter()
outs = [f(b) for b in batches]
np.asarray(outs[-1])
dt = (time.perf_counter() - t0) / 8
print(json.dumps({"ms": dt * 1e3, "vec_s": B / dt}))
""" % {"root": str(ROOT), "b": B, "gd": G_DTYPE, "bb": BLOCK_B, "il": IL}

PIECES = ["", "onehot", "matmul", "assembly", "sel", "reorder",
          "onehot,matmul", "assembly,sel,reorder"]

results = {}
full_ms = None
for skip in PIECES:
    env = dict(os.environ, QTPU_GRAMV3_SKIP=skip)
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, timeout=580)
        line = out.stdout.strip().splitlines()[-1]
        r = json.loads(line)
    except Exception as e:
        print(f"skip={skip or 'none':24s} FAILED: {e}", flush=True)
        if out.stderr:
            print(out.stderr[-1500:], flush=True)
        continue
    name = skip or "none"
    if full_ms is None and not skip:
        full_ms = r["ms"]
    delta = (full_ms - r["ms"]) if (full_ms is not None and skip) else 0.0
    results[name] = dict(ms=round(r["ms"], 2), vec_s=round(r["vec_s"]),
                         saved_ms=round(delta, 2))
    print(f"skip={name:24s} {r['ms']:8.2f} ms  {r['vec_s']/1e3:9.1f} K vec/s"
          f"  saved {delta:6.2f} ms", flush=True)

print(json.dumps(results))
