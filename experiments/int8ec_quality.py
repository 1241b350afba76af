"""Quality screen for the FULL int8 rescore scheme (round-4 plan).

Round 3 screened int8 storage of the candidate error buffer E
(`e_bf16_quality.py`, "E-int8": quality-free).  The int8 MXU path needs
BOTH matmul operands int8, so the centers table is quantized too:

  * E: symmetric per-row int8, scale = max|row|/127 (requantized at pass
    init and after every extension) — as screened before;
  * C: symmetric int8 with either ONE scalar scale per codebook block
    ("block": cross scaling folds into the per-row E scale, extension is a
    single int8 matmul) or per-codeword scales ("row": finer, but the
    extension c_delta = c(j) - c(i) then needs two matmuls);
  * rescore cross = E_i8 . C_i8^T -> int32, rescaled to f32 (simulated
    here as the f32 matmul of the dequantized operands — identical values
    up to f32 accumulation order; the kernel's int32 accumulation is
    exact);
  * extension c_delta goes through the quantized C as well;
  * the shared row (Gmod one-hot matmul) and ccn stay full-precision, as
    the kernel keeps the f32/bf16 Gmod table.

Mirrors the kernel arithmetic of ops/seqbeam.py v2 otherwise (carried
scores, pool/R1 schedules).  Usage:
  QTPU_FORCE_CPU=1 python experiments/int8ec_quality.py [dim] [bpf]
Writes experiments/int8ec_quality_d{dim}_b{bpf}.json
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
    """Symmetric per-row int8 round-trip (scale = max|row|/127)."""
    s = jnp.maximum(jnp.max(jnp.abs(E), axis=-1, keepdims=True) / 127.0, 1e-20)
    return jnp.round(E / s).clip(-127, 127) * s


def quant_centers(cscale):
    """int8 round-trip of the centers table: one scalar scale per codebook
    ("block") or per-codeword scales ("row")."""
    if cscale == "block":
        s = jnp.max(jnp.abs(centers), axis=(1, 2), keepdims=True) / 127.0
    else:
        s = jnp.max(jnp.abs(centers), axis=2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-20)
    return jnp.round(centers / s).clip(-127, 127) * s


def seqbeam_pass(x, indexes, M, R, pool_steps, centers_q, fixed_scale=False):
    """``fixed_scale``: per-row scales frozen at pass init — extensions
    become integer adds q += round(c_delta/s) with clip to [-127, 127]
    (no per-step max-abs requantize; absolute quantization error instead
    of row-max-relative)."""
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)  # pass init: exact C
    E0 = (recon - x)[:, None, :]  # (B, 1, D)
    if fixed_scale:
        s = jnp.maximum(
            jnp.max(jnp.abs(E0), axis=-1, keepdims=True) / 127.0, 1e-20)
        q = jnp.round(E0 / s).clip(-127, 127)  # integer values in f32
        E = q * s
    else:
        E = quant_rows(E0)
    ss = jnp.sum(E ** 2, axis=-1)  # carried ||E||^2 of the STORED E
    chosen = indexes[:, None, :]
    for t in range(nc):
        m = E.shape[1]
        i_cur = chosen[:, :, t]
        # int8 x int8 -> int32 rescore, simulated on dequantized operands
        cross = jnp.einsum("bmd,jd->bmj", E, centers_q[t])
        # shared row + ccn from the EXACT centers (kernel keeps f32 Gmod)
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
        # extension through the QUANTIZED C (int8 one-hot-diff matmul)
        oh_new = jax.nn.one_hot(j, cs, dtype=jnp.float32)
        oh_old = jax.nn.one_hot(
            jnp.take_along_axis(i_cur, parent, axis=1), cs, dtype=jnp.float32)
        c_delta = jnp.einsum("bmk,kd->bmd", oh_new - oh_old, centers_q[t])
        if fixed_scale:
            q_par = jnp.take_along_axis(q, parent[:, :, None], axis=1)
            q = (q_par + jnp.round(c_delta / s)).clip(-127, 127)
            E = q * s
        else:
            E_par = jnp.take_along_axis(E, parent[:, :, None], axis=1)
            E = quant_rows(E_par + c_delta)
        chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = chosen.at[:, :, t].set(j)
        ss = vals
    best = jnp.argmin(ss, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule, centers_q, fixed_scale=False):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for pool_steps in schedule:
        idx = seqbeam_pass(x, idx, M, R, pool_steps, centers_q, fixed_scale)
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
for cscale in ("block", "row"):
    cq = quant_centers(cscale)
    cerr = float(jnp.max(jnp.abs(cq - centers)) / jnp.max(jnp.abs(centers)))
    print(f"C-int8 {cscale}: max |dequant err| / max |C| = {cerr:.2e}")
    for sname, sched in (("altparity", ALT), ("allpool", ALL)):
        e = rel_err(jax.jit(
            lambda x, s=sched, c=cq: encode_cfg(x, M, R, s, c))(x))
        results[f"int8EC-{cscale} {sname}"] = e
        print(f"int8EC-{cscale:5s} {sname:10s} {e:.5f}  "
              f"({100*(e/ref-1):+.2f}%)", flush=True)

# fixed-per-pass scales (integer-add extensions with clip)
cq = quant_centers("block")
for sname, sched in (("altparity", ALT), ("allpool", ALL)):
    e = rel_err(jax.jit(
        lambda x, s=sched, c=cq: encode_cfg(x, M, R, s, c, True))(x))
    results[f"int8EC-fixedscale {sname}"] = e
    print(f"int8EC-fixed {sname:10s} {e:.5f}  "
          f"({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"int8ec_quality_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, M=M, R=R, **results)))
