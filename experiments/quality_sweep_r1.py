"""R=1 variant quality: per-parent best child only, no cross-parent
competition (parent = identity), fan-out from the best each pass.
Also larger M (cheap at R=1: no reorder, no pool)."""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.utils.serialization import load_quantizer

dim, bpf = 512, 8
HERE = pathlib.Path(__file__).parent
q = load_quantizer(HERE / f"q{dim}_{bpf}_full.npz")
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


def pass_r1(x, indexes, M):
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = (recon - x)[:, None, :]
    chosen = indexes[:, None, :]
    for t in range(nc):
        m = E.shape[1]
        c_cur = jnp.einsum("bk,kd->bd", onehot[:, t], centers[t])
        E_t = E - c_cur[:, None, :]
        cross = jnp.einsum("bmd,kd->bmk", E_t, centers[t])
        E_t_ss = jnp.sum(E_t * E_t, axis=-1)
        S = E_t_ss[:, :, None] + cs_sumsq[t][None, None, :] + 2.0 * cross
        if m == 1:
            flat = S.reshape(B, m * cs)
            _, sel = jax.lax.approx_min_k(flat, M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
            E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
            ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        else:
            j = jnp.argmin(S, axis=-1)  # (B, m): best child per parent
            E_par, ch_par = E_t, chosen
        E = E_par + centers[t][j]
        chosen = ch_par.at[:, :, t].set(j)
    scores = jnp.sum(E * E, axis=-1)
    best = jnp.argmin(scores, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def enc(x, M, passes):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(passes):
        idx = pass_r1(x, idx, M)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 {ref:.5f}")
results = {"beam5": ref}
for M in (8, 16, 32, 64):
    for passes in (2, 3, 4, 5):
        k = f"M{M}x{passes}R1"
        results[k] = rel_err(jax.jit(lambda x, m=M, p=passes: enc(x, m, p))(x))
        print(f"{k:12s} {results[k]:.5f} (+{100*(results[k]/ref-1):.2f}%)", flush=True)
(HERE / "quality_sweep_r1.json").write_text(json.dumps(results))
