"""Seqbeam kernel micro-benchmark: per-batch latency and vec/s for a set of
(M, R, passes, block_b) knobs, plus the XLA cd path, on the real chip.

Usage: python experiments/kbench.py [B] [dim] [nc]
"""
import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import os
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/quantization_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from quantization_tpu import core
from quantization_tpu.core import search
from quantization_tpu.ops import seqbeam

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
nc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
cfg = core.QuantizerConfig(dim=dim, codebook_size=256, num_codebooks=nc)
params = core.init_quantizer_params(jax.random.PRNGKey(0), cfg)
mk = lambda i: jax.random.normal(jax.random.PRNGKey(100 + i), (B, dim))


def fetch_time(fn, nbatch=8):
    np.asarray(jax.tree_util.tree_leaves(fn(mk(99)))[0])  # compile
    batches = [mk(i) for i in range(nbatch)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    outs = [fn(b) for b in batches]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / nbatch


results = {}


def report(name, dt):
    results[name] = dict(ms=round(dt * 1e3, 2), vec_s=round(B / dt, 1))
    print(f"{name:28s} {dt*1e3:8.2f} ms   {B/dt/1e3:9.1f} K vec/s", flush=True)


knobs = []
for tok in sys.argv[4:]:
    M, R, p, bb = map(int, tok.split(","))
    knobs.append((M, R, p, bb))
if not knobs:
    knobs = [(16, 8, 3, 128), (16, 4, 2, 128), (8, 4, 2, 128), (8, 2, 2, 128)]

for (M, R, p, bb) in knobs:
    f = jax.jit(lambda x, M=M, R=R, p=p, bb=bb: seqbeam.seqbeam_encode_indexes(
        params, cfg, x, M=M, R=R, passes=p, block_b=bb))
    try:
        report(f"seqbeam M{M} R{R} p{p} bb{bb}", fetch_time(f))
    except Exception as e:
        print(f"seqbeam M{M} R{R} p{p} bb{bb}: FAILED {type(e).__name__}: {e}",
              flush=True)

for sweeps in (1, 2):
    f = jax.jit(lambda x, s=sweeps: search.compute_indexes(
        params, cfg, x, refine_indexes_iters=s, search="cd"))
    report(f"xla cd{sweeps}", fetch_time(f))

print(json.dumps(results))
