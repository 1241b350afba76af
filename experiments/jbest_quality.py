"""Quality screen for cheaper pool-selection variants (round-4 VPU work).

The kernel's pool step does top-R per parent (R packed-min rounds over the
full (M*B, cs) score matrix) then top-M of the M*R pool — the measured #1
VPU cost (selection 5.18 ms of ~14 ms at B=8192, bisect_r3_selebf.log +
BASELINE.md).  Candidate replacements, screened kernel-faithfully (int8
E/C round-trips exactly as experiments/int8ec_quality.py):

  * "jbest": fold S over parents FIRST (per-j best parent = M-1 elementwise
    mins with parent ids packed in mantissa bits — cheap), then top-M over
    the folded (B, cs) row.  ~3x less selection work; semantics differ from
    pool: the new beam has M DISTINCT j's (same-j different-parent
    candidates collapse to the best parent).
  * "R2": the shipped pool selection at R=2 (half the per-row rounds).

Usage: QTPU_FORCE_CPU=1 python experiments/jbest_quality.py [dim] [bpf]
Writes experiments/jbest_quality_d{dim}_b{bpf}.json
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


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def quant_rows(E):
    s = jnp.maximum(jnp.max(jnp.abs(E), axis=-1, keepdims=True) / 127.0, 1e-20)
    return jnp.round(E / s).clip(-127, 127) * s


def quant_centers_block():
    s = jnp.maximum(
        jnp.max(jnp.abs(centers), axis=(1, 2), keepdims=True) / 127.0, 1e-20)
    return jnp.round(centers / s).clip(-127, 127) * s


def seqbeam_pass(x, indexes, M, R, pool_steps, centers_q, mode):
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = quant_rows((recon - x)[:, None, :])  # (B, 1, D)
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
            if mode == "jbest":
                # per-j best parent, then top-M over j: M distinct j's
                vbest = jnp.min(S, axis=1)  # (B, cs)
                bestp = jnp.argmin(S, axis=1)  # (B, cs)
                vals, j = jax.lax.approx_min_k(vbest, M, recall_target=1.0)
                parent = jnp.take_along_axis(bestp, j, axis=1)
            else:  # shipped pool semantics at the given R
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
        E = quant_rows(E_par + c_delta)
        chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = chosen.at[:, :, t].set(j)
        ss = vals
    best = jnp.argmin(ss, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule, centers_q, mode):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for pool_steps in schedule:
        idx = seqbeam_pass(x, idx, M, R, pool_steps, centers_q, mode)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}

EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALT = (EVEN, ODD, EVEN)
ALL = ((True,) * nc,) * 3
cq = quant_centers_block()
for label, M, R, sched, mode in (
    ("int8 M8R4 altparity (shipped)", 8, 4, ALT, "pool"),
    ("int8 M8 jbest altparity", 8, 4, ALT, "jbest"),
    ("int8 M8 jbest allpool", 8, 4, ALL, "jbest"),
    ("int8 M8R2 altparity", 8, 2, ALT, "pool"),
    ("int8 M16 jbest altparity", 16, 4, ALT, "jbest"),
):
    e = rel_err(jax.jit(
        lambda x, M=M, R=R, s=sched, mo=mode: encode_cfg(x, M, R, s, cq, mo)
    )(x))
    results[label] = e
    print(f"{label:34s} {e:.5f}  ({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"jbest_quality_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, **results)))
