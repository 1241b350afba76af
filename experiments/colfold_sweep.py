"""Quality of COLUMN-FOLD pool selection for the seqbeam kernel.

Column-fold: instead of top-R per parent then top-M of the M*R pool, take
the elementwise MIN over the M parent rows per codeword (so each codeword
j competes with its single best parent only), then top-M over the cs
codewords.  In-kernel this replaces R+M packed-min rounds over (M*B_s,
128) with ~7 elementwise mins + M rounds over (B_s, 128) — ~5x less
selection work.  The semantic loss: the beam cannot take the same j from
two different parents in one step.

Usage: python experiments/colfold_sweep.py [dim] [bpf]
"""
import os, sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
if os.environ.get("QTPU_FORCE_CPU"):  # sitecustomize pins JAX_PLATFORMS=axon
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.utils.serialization import load_quantizer

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
bpf = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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


def seqbeam_pass(x, indexes, M, R, step_kinds):
    """step_kinds[t] in {"pool", "colfold", "r1"}."""
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
        kind = step_kinds[t]
        if m == 1:
            flat = S.reshape(B, m * cs)
            vals, sel = jax.lax.approx_min_k(flat, M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
        elif kind == "pool":
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)
            pool_v = vR.reshape(B, m * R)
            _, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        elif kind == "colfold":
            best_parent = jnp.argmin(S, axis=1)  # (B, cs)
            best_score = jnp.min(S, axis=1)  # (B, cs)
            _, j = jax.lax.approx_min_k(best_score, M, recall_target=1.0)
            parent = jnp.take_along_axis(best_parent, j, axis=1)
        elif kind == "colfold2":
            # top-2 parents per codeword, then top-M over the 2*cs pool:
            # allows the same codeword via two different parents (the
            # diversity top-1 colfold loses).
            p1 = jnp.argmin(S, axis=1)  # (B, cs)
            v1 = jnp.min(S, axis=1)
            S2 = S.at[
                jnp.arange(B)[:, None], p1, jnp.arange(cs)[None, :]
            ].set(jnp.inf)
            p2 = jnp.argmin(S2, axis=1)
            v2 = jnp.min(S2, axis=1)
            pool_v = jnp.concatenate([v1, v2], axis=1)  # (B, 2*cs)
            pool_p = jnp.concatenate([p1, p2], axis=1)
            _, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            j = sel % cs
            parent = jnp.take_along_axis(pool_p, sel, axis=1)
        else:  # r1
            j = jnp.argmin(S, axis=-1)
            parent = jnp.broadcast_to(jnp.arange(m)[None, :], j.shape)
        E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
        E = E_par + centers[t][j]
        ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = ch_par.at[:, :, t].set(j)
    scores = jnp.sum(E * E, axis=-1)
    best = jnp.argmin(scores, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for step_kinds in schedule:
        idx = seqbeam_pass(x, idx, M, R, step_kinds)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}



CF_ALL = ("colfold",) * nc
R1_ALL = ("r1",) * nc
CF_EVEN = tuple("colfold" if t % 2 == 0 else "r1" for t in range(nc))
CF_ODD = tuple("colfold" if t % 2 == 1 else "r1" for t in range(nc))
P_EVEN = tuple("pool" if t % 2 == 0 else "r1" for t in range(nc))
P_ODD = tuple("pool" if t % 2 == 1 else "r1" for t in range(nc))

CF2_ALL = ("colfold2",) * nc
CF2_EVEN = tuple("colfold2" if t % 2 == 0 else "r1" for t in range(nc))
CF2_ODD = tuple("colfold2" if t % 2 == 1 else "r1" for t in range(nc))

cases = {
    "p3 colfold-all": (CF_ALL, CF_ALL, CF_ALL),
    "p3 colfold-altparity": (CF_EVEN, CF_ODD, CF_EVEN),
    "p3 pool-altparity": (P_EVEN, P_ODD, P_EVEN),  # current best, reference
    "p2 colfold-all": (CF_ALL, CF_ALL),
    "p4 colfold-altparity": (CF_EVEN, CF_ODD, CF_EVEN, CF_ODD),
    "p3 colfold2-all": (CF2_ALL, CF2_ALL, CF2_ALL),
    "p3 colfold2-altparity": (CF2_EVEN, CF2_ODD, CF2_EVEN),
    "p4 colfold2-altparity": (CF2_EVEN, CF2_ODD, CF2_EVEN, CF2_ODD),
}
for name, schedule in cases.items():
    e = rel_err(jax.jit(
        lambda x, s=schedule: encode_cfg(x, 8, 4, s))(x))
    results[name] = e
    print(f"{name:24s} {e:.5f}  ({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"colfold_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, **results)))
