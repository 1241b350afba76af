"""Round 2 of the pool-schedule quality sweep: finer probes near the 1%
bar (rotating thirds, R=2 on pool steps, asymmetric pass densities).
See pool_schedule_sweep.py for the semantics.

Usage: python experiments/pool_schedule_sweep2.py [dim] [bpf]
"""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
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


def seqbeam_pass(x, indexes, M, R, pool_steps):
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
            vals, sel = jax.lax.approx_min_k(flat, M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
        elif pool_steps[t]:
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)
            pool_v = vR.reshape(B, m * R)
            _, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        else:
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
    for pool_steps in schedule:
        idx = seqbeam_pass(x, idx, M, R, pool_steps)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}

ALL = (True,) * nc
NONE = (False,) * nc
EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
TH = [tuple(t % 3 == k for t in range(nc)) for k in range(3)]
# 3-of-8 rotating patterns
Q3 = [tuple((t * 3 + k) % 8 < 3 for t in range(nc)) for k in range(3)]

cases = {
    # (M, R, schedule)
    "altparity R4": (8, 4, (EVEN, ODD, EVEN)),
    "altparity R2": (8, 2, (EVEN, ODD, EVEN)),
    "altparity-oeo R4": (8, 4, (ODD, EVEN, ODD)),
    "rotthird R4": (8, 4, (TH[0], TH[1], TH[2])),
    "rotthird R2": (8, 2, (TH[0], TH[1], TH[2])),
    "rot3of8 R4": (8, 4, (Q3[0], Q3[1], Q3[2])),
    "evenodd+all R4": (8, 4, (EVEN, ODD, ALL)),
    "none+evenodd R4": (8, 4, (NONE, EVEN, ODD)),
    "all+none+all R4": (8, 4, (ALL, NONE, ALL)),
    "altparity p4 R4": (8, 4, (EVEN, ODD, EVEN, ODD)),
    "rotthird p4 R4": (8, 4, (TH[0], TH[1], TH[2], TH[0])),
    "M16 rotthird p2 R4": (16, 4, (TH[0], TH[1])),
    "M16 altparity p2 R4": (16, 4, (EVEN, ODD)),
}
for name, (M, R, schedule) in cases.items():
    e = rel_err(jax.jit(
        lambda x, m=M, r=R, s=schedule: encode_cfg(x, m, r, s))(x))
    results[name] = e
    print(f"{name:22s} {e:.5f}  ({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"pool_schedule2_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, **results)))
