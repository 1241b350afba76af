"""Quality screen for bound-propagated int8 E scales (round-4 VPU idea).

The int8 seqbeam path requantizes E after every extension with an EXACT
per-row scale (max|row|/127) — the row-max reduce over D is pure VPU cost
every step.  Candidate: propagate an UPPER BOUND instead,
    s_new = s_parent + cmax_t / 127,
where cmax_t = max_{i,j} |c_t(j) - c_t(i)|_inf is a per-codebook compile
time scalar (|E_new|_inf <= |E_par|_inf + |c_delta|_inf <= 127 s_new, so
round() never clips).  The scale inflates by the worst-case step delta
instead of tracking the actual row, costing int8 resolution; this screen
measures whether the flagship quality survives.

Kernel-faithful otherwise (same arithmetic as experiments/int8ec_quality.py
"block" centers).  Usage:
  QTPU_FORCE_CPU=1 python experiments/boundscale_quality.py [dim] [bpf]
Writes experiments/boundscale_quality_d{dim}_b{bpf}.json
"""
import os, sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

if os.environ.get("QTPU_FORCE_CPU"):  # sitecustomize pins JAX_PLATFORMS=axon
    jax.config.update("jax_platforms", "cpu")
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
bf16 = jnp.bfloat16

s_blk = jnp.maximum(
    jnp.max(jnp.abs(centers), axis=(1, 2), keepdims=True) / 127.0, 1e-20)
centers_q = jnp.round(centers / s_blk).clip(-127, 127) * s_blk
# per-codebook worst-case |c(j) - c(i)|_inf over the QUANTIZED table
cmax = jnp.asarray([
    float(jnp.max(jnp.abs(centers_q[t][None, :, :] - centers_q[t][:, None, :])))
    for t in range(nc)
])
print("cmax per codebook:", [round(float(c), 3) for c in cmax], flush=True)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def seqbeam_pass(x, indexes, M, R, pool_steps, scale_mode):
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E0 = (recon - x)[:, None, :]
    s = jnp.maximum(jnp.max(jnp.abs(E0), axis=-1, keepdims=True) / 127.0, 1e-20)
    E = jnp.round(E0 / s).clip(-127, 127) * s
    ss = jnp.sum(E ** 2, axis=-1)
    chosen = indexes[:, None, :]
    for t in range(nc):
        m = E.shape[1]
        i_cur = chosen[:, :, t]
        cross = jnp.einsum("bmd,jd->bmj", E, centers_q[t])
        gmod = (cs_sumsq[t][None, :] - 2.0 * jnp.einsum(
            "id,jd->ij", centers[t], centers[t])).astype(bf16)
        shared = gmod[i_cur].astype(jnp.float32)
        Ec = jnp.take_along_axis(cross, i_cur[:, :, None], axis=2)
        ccn = -jnp.take_along_axis(
            jnp.broadcast_to(cs_sumsq[t][None, None, :], (B, m, cs)),
            i_cur[:, :, None], axis=2)
        S = (ss[:, :, None] - 2.0 * Ec - ccn) + shared + 2.0 * cross
        if m == 1:
            flat = S.reshape(B, m * cs)
            vals, sel = jax.lax.approx_min_k(flat, M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
        elif pool_steps[t]:
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)
            pool_v = vR.reshape(B, m * R)
            vals, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        else:
            j = jnp.argmin(S, axis=-1)
            vals = jnp.take_along_axis(S, j[..., None], axis=-1)[..., 0]
            parent = jnp.broadcast_to(jnp.arange(m)[None, :], j.shape)
        oh_new = jax.nn.one_hot(j, cs, dtype=jnp.float32)
        oh_old = jax.nn.one_hot(
            jnp.take_along_axis(i_cur, parent, axis=1), cs, dtype=jnp.float32)
        c_delta = jnp.einsum("bmk,kd->bmd", oh_new - oh_old, centers_q[t])
        E_par = jnp.take_along_axis(E, parent[:, :, None], axis=1)
        Ef = E_par + c_delta
        if scale_mode == "exact":
            s = jnp.maximum(
                jnp.max(jnp.abs(Ef), axis=-1, keepdims=True) / 127.0, 1e-20)
        else:  # bound: parent scale + worst-case step delta (no row reduce)
            s_par = jnp.take_along_axis(
                jnp.broadcast_to(s, (B, max(m, s.shape[1]), 1))[:, :m],
                parent[:, :, None], axis=1)
            s = s_par + cmax[t] / 127.0
        E = jnp.round(Ef / s).clip(-127, 127) * s
        chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = chosen.at[:, :, t].set(j)
        ss = vals
    best = jnp.argmin(ss, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule, scale_mode):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for pool_steps in schedule:
        idx = seqbeam_pass(x, idx, M, R, pool_steps, scale_mode)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}

EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALT = (EVEN, ODD, EVEN)
for label, mode in (("int8 exact-scale altparity", "exact"),
                    ("int8 bound-scale altparity", "bound")):
    e = rel_err(jax.jit(
        lambda x, mo=mode: encode_cfg(x, 8, 4, ALT, mo))(x))
    results[label] = e
    print(f"{label:30s} {e:.5f}  ({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"boundscale_quality_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, **results)))
