"""Chunked top-M selection quality for the sequential beam.

The Pallas kernel can't afford exact top-M over (M, cs) scores per step;
instead: argmin within each C-lane chunk (VPU-parallel), then exact
iterative top-M over the M*cs/C chunk winners.  At most one candidate
survives per chunk (ApproxTopK-style recall limit).  This script measures
the quality cost of that approximation vs exact top-M, on the cached
trained quantizer from seqbeam_quality.py.
"""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.utils.serialization import load_quantizer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
q = load_quantizer(pathlib.Path(__file__).parent / f"q{dim}_{bpf}.npz")
params, config = q.params, q.config

sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
x = sampler(jax.random.PRNGKey(7), 8192)
centers = core.scaled_centers(params, config.scale_speed)
nc, cs, D = centers.shape
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))
cs_sumsq = jnp.sum(centers * centers, axis=-1)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def topm_exact(S, M):
    B, m, _ = S.shape
    vals, sel = jax.lax.approx_min_k(S.reshape(B, m * cs), min(M, m * cs), recall_target=1.0)
    return vals, sel // cs, sel % cs


def topm_chunked(S, M, chunk):
    """argmin per chunk lanes, then exact top-M over chunk winners."""
    B, m, _ = S.shape
    n_chunks = m * cs // chunk
    Sc = S.reshape(B, n_chunks, chunk)
    cmin = jnp.min(Sc, axis=-1)  # (B, n_chunks)
    cargo = jnp.argmin(Sc, axis=-1)  # (B, n_chunks)
    take = min(M, n_chunks)
    vals, csel = jax.lax.approx_min_k(cmin, take, recall_target=1.0)  # (B, take)
    within = jnp.take_along_axis(cargo, csel, axis=1)
    flat = csel * chunk + within
    return vals, flat // cs, flat % cs


def seqbeam(x, M, iters, select):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    B = x.shape[0]
    for _ in range(iters):
        onehot = jax.nn.one_hot(idx, cs, dtype=jnp.float32)
        recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
        E = (recon - x)[:, None, :]
        chosen = idx[:, None, :]
        for t in range(nc):
            m = E.shape[1]
            c_cur = jnp.einsum("bk,kd->bd", onehot[:, t], centers[t])
            E_t = E - c_cur[:, None, :]
            cross = jnp.einsum("bmd,kd->bmk", E_t, centers[t])
            S = jnp.sum(E_t * E_t, axis=-1)[:, :, None] + cs_sumsq[t][None, None, :] + 2.0 * cross
            vals, parent, j = select(S, M)
            E = jnp.take_along_axis(E_t, parent[:, :, None], axis=1) + centers[t][j]
            chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1).at[:, :, t].set(j)
        scores = jnp.sum(E * E, axis=-1)
        best = jnp.argmin(scores, axis=-1)
        idx = jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]
    return idx


results = {}
for M, iters in ((16, 3), (32, 2), (32, 3)):
    results[f"sb{M}x{iters}-exact"] = rel_err(
        jax.jit(lambda x, M=M, i=iters: seqbeam(x, M, i, topm_exact))(x))
    for chunk in (64, 128):
        results[f"sb{M}x{iters}-c{chunk}"] = rel_err(
            jax.jit(lambda x, M=M, i=iters, c=chunk: seqbeam(
                x, M, i, lambda S, MM: topm_chunked(S, MM, c)))(x))

for k, v in sorted(results.items(), key=lambda kv: kv[1]):
    print(f"{k:18s} rel_err={v:.5f}")
print(json.dumps(dict(dim=dim, bpf=bpf, **results)))
