"""Beam search vs. coordinate descent encode quality on a trained quantizer.

Trains with the standard two-phase trainer (which uses beam refinement, as
the reference does), then measures encode->decode relative reconstruction
error for each search algorithm and iteration count on held-out data.
"""
import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.train.trainer import QuantizerTrainer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
p1 = int(sys.argv[3]) if len(sys.argv) > 3 else 500
p2 = int(sys.argv[4]) if len(sys.argv) > 4 else 500

sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
trainer = QuantizerTrainer(dim=dim, bytes_per_frame=bpf,
                           phase_one_iters=p1, phase_two_iters=p2,
                           lr=0.005, seed=0, diagnostics=False)
key = jax.random.PRNGKey(1)
t0 = time.time()
while not trainer.done():
    key, sub = jax.random.split(key)
    trainer.step(sampler(sub, 600))
print(f"trained in {time.time()-t0:.0f}s")

params, config = trainer.params, trainer.config
x = sampler(jax.random.PRNGKey(7), 8192)
centers = core.scaled_centers(params, config.scale_speed)
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


results = {}
for method in ("beam", "cd"):
    for iters in (0, 1, 2, 3, 5, 8):
        if iters == 0 and method == "cd":
            continue
        idx = jax.jit(lambda x, m=method, i=iters: search.compute_indexes(
            params, config, x, refine_indexes_iters=i, search=m))(x)
        results[f"{method}{iters}"] = rel_err(idx)

# hybrids: cd sweeps then one beam pass, and beam then cd
logits = jax.jit(lambda x: search.compute_logits(params, config, x))(x)
init = jnp.argmax(logits, -1).astype(jnp.int32)
cd3 = jax.jit(lambda x, i: search.refine_indexes_cd(centers, x, i, sweeps=3))(x, init)
results["cd3+beam1"] = rel_err(jax.jit(lambda x, i: search.refine_indexes(centers, x, i))(x, cd3))
beam1 = jax.jit(lambda x, i: search.refine_indexes(centers, x, i))(x, init)
results["beam1+cd3"] = rel_err(jax.jit(lambda x, i: search.refine_indexes_cd(centers, x, i, sweeps=3))(x, beam1))

for k, v in sorted(results.items(), key=lambda kv: kv[1]):
    print(f"{k:12s} rel_err={v:.5f}")
print(json.dumps(dict(dim=dim, bpf=bpf, p1=p1, p2=p2, **results)))
