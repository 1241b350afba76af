"""Parity experiment: train the reference config (dim=256, 4 B/frame) on the
real TPU with the reference schedule and record rel reconstruction error.

Anchors (BASELINE.md): prototype rel_err ~0.407-0.424 at 4 B/frame, dim=256,
MLP-synthetic data, 10k iters.  Reference trainer schedule:
10k+10k iters, lr 0.005, batch 600 (`quantization/quantization.py:578-599`).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, sys, time
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.train.trainer import QuantizerTrainer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
p1 = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
p2 = int(sys.argv[4]) if len(sys.argv) > 4 else 10000
batch = 600

sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
trainer = QuantizerTrainer(dim=dim, bytes_per_frame=bpf,
                           phase_one_iters=p1, phase_two_iters=p2,
                           lr=0.005, seed=0, diagnostics=False)
key = jax.random.PRNGKey(1)
x_eval = sampler(jax.random.PRNGKey(2), 4096)
t0 = time.time()
while not trainer.done():
    key, sub = jax.random.split(key)
    trainer.step(sampler(sub, batch))
    if trainer.cur_iter % 500 == 0:
        e = float(core.compute_loss(trainer.params, trainer.config, x_eval, 5).rel_reconstruction_loss)
        print(f"iter={trainer.cur_iter} cs={trainer.config.codebook_size} rel_err@5={e:.4f} elapsed={time.time()-t0:.0f}s", flush=True)
q = trainer.get_quantizer()
codes = q.encode(x_eval)  # default 5 refine iters
recon = q.decode(codes)
rel = float(jnp.sum((recon-x_eval)**2)/jnp.sum((x_eval-q.get_data_mean())**2))
result = dict(dim=dim, bytes_per_frame=bpf, p1=p1, p2=p2, batch=batch,
              final_rel_err=rel, wall_s=time.time()-t0)
print(json.dumps(result), flush=True)
with open(f"/root/repo/experiments/parity_dim{dim}_b{bpf}_{p1}+{p2}.json", "w") as f:
    json.dump(result, f)
