"""Quality probe: bf16 storage of the candidate error buffer E.

The v2 kernel stores E in f32 and casts to bf16 at every rescore matmul
(so rescore precision is ALREADY bf16); storing E as bf16 outright would
halve the beam-reorder and extension traffic (with the select-tree
reorder there is no dynamic_gather dtype restriction).  The only new
rounding is the per-step accumulation E <- reorder(E) + c_delta hitting
bf16 once per codebook step (24 steps at the flagship).  This simulates
the kernel's exact arithmetic with E carried in bf16 vs f32 on the
trained flagship.

Usage: python experiments/e_bf16_quality.py [dim] [bpf]
Writes experiments/e_bf16_quality_d{dim}_b{bpf}.json
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
centers_bf = centers.astype(bf16)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def _to_store(E, e_dtype):
    """Simulate storing E in ``e_dtype``.  "int8" = symmetric per-row
    (per-candidate) quantization, scale = max|row|/127, dequantized back to
    f32 — the exact round-trip an int8-resident E would see (the kernel
    would keep the scale as a (B, m) vector and fold it into the rescore
    output row-scaling)."""
    if e_dtype == "int8":
        s = jnp.max(jnp.abs(E), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-20)
        return jnp.round(E / s).clip(-127, 127) * s
    return E.astype(e_dtype)


def seqbeam_pass(x, indexes, M, R, pool_steps, e_dtype):
    """Kernel-faithful sweep with E carried in ``e_dtype``; mirrors the
    v2 arithmetic: rescore = bf16 matmul of E, extension adds the bf16
    one-hot-difference matmul result, carried scores are the selection
    values (no per-step ||E||^2 reduction)."""
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = _to_store((recon - x)[:, None, :], e_dtype)  # (B, 1, D): recon - x
    ss = jnp.sum(
        E.astype(jnp.float32) ** 2, axis=-1
    )  # (B, m) carried ||E||^2
    chosen = indexes[:, None, :]
    for t in range(nc):
        m = E.shape[1]
        i_cur = chosen[:, :, t]  # (B, m) current index at codebook t
        # cross[b, m, j] = E . c_t(j), bf16 operands, f32 accum (kernel)
        cross = jnp.einsum(
            "bmd,jd->bmj",
            E.astype(bf16),
            centers_bf[t],
            preferred_element_type=jnp.float32,
        )
        # shared row csq[j] - 2 c(i).c(j) via the Gmod one-hot matmul
        gmod = (cs_sumsq[t][None, :] - 2.0 * jnp.einsum(
            "id,jd->ij", centers[t], centers[t])).astype(bf16)
        shared = gmod[i_cur].astype(jnp.float32)  # (B, m, cs)
        Ec = jnp.take_along_axis(cross, i_cur[:, :, None], axis=2)
        ccn = -jnp.take_along_axis(
            jnp.broadcast_to(cs_sumsq[t][None, None, :], (B, m, cs)),
            i_cur[:, :, None],
            axis=2,
        )
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
        # extension: E += c(j_new) - c(i_old), bf16 one-hot-diff matmul
        oh_new = jax.nn.one_hot(j, cs, dtype=bf16)
        oh_old = jax.nn.one_hot(
            jnp.take_along_axis(i_cur, parent, axis=1), cs, dtype=bf16
        )
        c_delta = jnp.einsum(
            "bmk,kd->bmd", oh_new - oh_old, centers_bf[t],
            preferred_element_type=jnp.float32,
        )
        E_par = jnp.take_along_axis(E, parent[:, :, None], axis=1)
        E = _to_store(E_par.astype(jnp.float32) + c_delta, e_dtype)
        chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = chosen.at[:, :, t].set(j)
        ss = vals
    best = jnp.argmin(ss, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule, e_dtype):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for pool_steps in schedule:
        idx = seqbeam_pass(x, idx, M, R, pool_steps, e_dtype)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}

EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALT = (EVEN, ODD, EVEN)
ALL = ((True,) * nc,) * 3
M, R = 8, 4
for ename, edt in (("f32", jnp.float32), ("bf16", bf16), ("int8", "int8")):
    for sname, sched in (("altparity", ALT), ("allpool", ALL)):
        e = rel_err(jax.jit(lambda x, s=sched, d=edt: encode_cfg(
            x, M, R, s, d))(x))
        results[f"E-{ename} {sname}"] = e
        print(f"E-{ename:5s} {sname:10s} {e:.5f}  "
              f"({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"e_bf16_quality_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, M=M, R=R, **results)))
