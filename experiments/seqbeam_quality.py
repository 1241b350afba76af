"""Quality of a sequential beam over codebooks (the all-MXU TPU-kernel
candidate) vs. the reference pair-tree beam and coordinate descent.

Sequential beam: maintain M candidate solutions as explicit error vectors;
sweep codebooks in order, rescoring all cs extensions of every candidate
with one (B*M, dim) x (dim, cs) matmul, then keep the best M.  One "pass"
= one sweep over all codebooks.  Usage:
    python experiments/seqbeam_quality.py [dim] [bpf] [p1] [p2]
Caches the trained quantizer in experiments/q{dim}_{bpf}.npz.
"""
import sys, pathlib, time, json, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.train.trainer import QuantizerTrainer
from quantization_tpu.utils.serialization import save_quantizer, load_quantizer
from quantization_tpu.models.quantizer import Quantizer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
p1 = int(sys.argv[3]) if len(sys.argv) > 3 else 500
p2 = int(sys.argv[4]) if len(sys.argv) > 4 else 500
cache = pathlib.Path(__file__).parent / f"q{dim}_{bpf}.npz"

sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
if cache.exists():
    q = load_quantizer(cache)
    params, config = q.params, q.config
    print(f"loaded {cache}")
else:
    trainer = QuantizerTrainer(dim=dim, bytes_per_frame=bpf,
                               phase_one_iters=p1, phase_two_iters=p2,
                               lr=0.005, seed=0, diagnostics=False)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    while not trainer.done():
        key, sub = jax.random.split(key)
        trainer.step(sampler(sub, 600))
    print(f"trained in {time.time()-t0:.0f}s")
    q = trainer.get_quantizer()
    save_quantizer(cache, q)
    params, config = q.params, q.config

x = sampler(jax.random.PRNGKey(7), 8192)
centers = core.scaled_centers(params, config.scale_speed)
nc, cs, D = centers.shape
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))
cs_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def seqbeam_pass(x, indexes, M, resort):
    """One sweep over codebooks with an M-wide beam."""
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = (recon - x)[:, None, :]  # (B, 1, D) grows to (B, M, D)
    chosen = indexes[:, None, :]  # (B, m, nc)
    for t in range(nc):
        m = E.shape[1]
        c_cur = jnp.einsum("bk,kd->bd", onehot[:, t], centers[t])
        E_t = E - c_cur[:, None, :]
        cross = jnp.einsum("bmd,kd->bmk", E_t, centers[t])
        E_t_ss = jnp.sum(E_t * E_t, axis=-1)
        S = E_t_ss[:, :, None] + cs_sumsq[t][None, None, :] + 2.0 * cross  # (B,m,cs)
        if resort or m == 1:
            flat = S.reshape(B, m * cs)
            vals, sel = jax.lax.approx_min_k(flat, min(M, m * cs), recall_target=1.0)
            parent, j = sel // cs, sel % cs  # (B, M)
        else:
            # best extension per parent, no re-sort
            j = jnp.argmin(S, axis=-1)  # (B, m)
            parent = jnp.broadcast_to(jnp.arange(m)[None], (B, m))
        E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
        c_new = centers[t][j]  # (B, M', D) gather
        E = E_par + c_new
        ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = ch_par.at[:, :, t].set(j)
    scores = jnp.sum(E * E, axis=-1)
    best = jnp.argmin(scores, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def seqbeam(x, M, iters, resort=True):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(iters):
        idx = seqbeam_pass(x, idx, M, resort)
    return idx


results = {}
for method, iters in (("beam", 5), ("beam", 3), ("cd", 5)):
    f = jax.jit(lambda x, m=method, i=iters: search.compute_indexes(
        params, config, x, refine_indexes_iters=i, search=m))
    results[f"{method}{iters}"] = rel_err(f(x))
for M in (4, 8, 16, 32):
    for iters in (1, 2, 3, 5):
        results[f"sb{M}x{iters}"] = rel_err(jax.jit(lambda x, M=M, i=iters: seqbeam(x, M, i))(x))
for M in (8, 16):
    results[f"sb{M}x3-nores"] = rel_err(jax.jit(lambda x, M=M: seqbeam(x, M, 3, resort=False))(x))

for k, v in sorted(results.items(), key=lambda kv: kv[1]):
    print(f"{k:14s} rel_err={v:.5f}")
print(json.dumps(dict(dim=dim, bpf=bpf, **results)))
