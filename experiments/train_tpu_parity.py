"""Parity experiment: train reference configs on the real TPU with the
reference schedule and record rel reconstruction error.

Anchors (BASELINE.md): prototype rel_err ~0.407-0.424 at 4 B/frame, dim=256,
MLP-synthetic data, 10k iters.  Reference trainer schedule:
10k+10k iters, lr 0.005, batch 600 (`quantization/quantization.py:578-599`).

Uses the multi-step scan driver (trainer.step_many) with device-side
minibatch sampling, so the tunnel round-trip is paid once per 100 steps.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.train.trainer import QuantizerTrainer
from quantization_tpu.utils.serialization import save_quantizer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
p1 = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
p2 = int(sys.argv[4]) if len(sys.argv) > 4 else 10000
batch = 600
CHUNK = 100

sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
batch_sampler = jax.jit(
    lambda keys: jax.vmap(lambda k: sampler(k, batch))(keys)
)
trainer = QuantizerTrainer(dim=dim, bytes_per_frame=bpf,
                           phase_one_iters=p1, phase_two_iters=p2,
                           lr=0.005, seed=0, diagnostics=False)
key = jax.random.PRNGKey(1)
x_eval = sampler(jax.random.PRNGKey(2), 4096)
t0 = time.time()
while not trainer.done():
    keys = jax.random.split(key, CHUNK + 1)
    key = keys[0]
    xs = batch_sampler(keys[1:])
    n = min(CHUNK, p1 + p2 + 1 - trainer.cur_iter)
    trainer.step_many(xs[:n])
    if trainer.cur_iter % 1000 < CHUNK:
        e = float(core.compute_loss(trainer.params, trainer.config, x_eval, 5).rel_reconstruction_loss)
        print(f"iter={trainer.cur_iter} cs={trainer.config.codebook_size} "
              f"rel_err@5={e:.4f} elapsed={time.time()-t0:.0f}s", flush=True)
q = trainer.get_quantizer()
save_quantizer(pathlib.Path(__file__).parent / f"q{dim}_{bpf}_full.npz", q)
codes = q.encode(x_eval)  # default 5 refine iters
recon = q.decode(codes)
rel = float(jnp.sum((recon-x_eval)**2)/jnp.sum((x_eval-q.get_data_mean())**2))
result = dict(dim=dim, bytes_per_frame=bpf, p1=p1, p2=p2, batch=batch,
              final_rel_err=rel, wall_s=time.time()-t0)
print(json.dumps(result), flush=True)
out = pathlib.Path(__file__).parent / f"parity_dim{dim}_b{bpf}_{p1}+{p2}.json"
out.write_text(json.dumps(result))
