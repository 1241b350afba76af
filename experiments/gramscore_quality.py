"""Quality A/B of Gram-table scoring vs E-buffer scoring (seqbeam v3 probe).

The planned v3 kernel eliminates the per-candidate error buffer E by
scoring against precomputed codeword Gram tables:

    E_m . w_t(j) = x . w_t(j) - sum_s G[s,t][ch_m_s, j],
    G[s,t][i,j] = w_s(i) . w_t(j)

This changes the floating-point path: each G entry is rounded to bf16
ONCE (vs v2 re-rounding the accumulated E to bf16 at every rescore), and
the per-step sum runs over nc bf16 products accumulated in f32.  This
script simulates BOTH arithmetics with kernel-faithful selection
semantics on the trained flagship and reports rel err for f32 and bf16
Gram tables, plus int8 per-row-quantized tables (the 2x-MXU candidate).

Usage: python experiments/gramscore_quality.py [dim] [bpf]
Writes experiments/gramscore_quality_d{dim}_b{bpf}.json
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
x = sampler(jax.random.PRNGKey(7), int(os.environ.get("QTPU_SIM_B", 8192)))
centers = core.scaled_centers(params, config.scale_speed)
nc, cs, D = centers.shape
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))
cs_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs)
bf16 = jnp.bfloat16


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def make_gram(gdtype):
    """G[s,t,i,j] = w_s(i).w_t(j); bf16 inputs like the kernel's matmuls."""
    g = jnp.einsum(
        "sid,tjd->stij",
        centers.astype(bf16),
        centers.astype(bf16),
        preferred_element_type=jnp.float32,
    )
    if gdtype == "int8":
        # per-(s,t,i)-row symmetric quantization, dequantized on read
        # (the kernel would keep int8 and fold the scale into assembly)
        amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(g / scale).astype(jnp.int8).astype(jnp.float32) * scale
    if gdtype == "int8st":
        # per-(s,t)-table scale: a real int8 MXU path descales AFTER each
        # per-source-codebook matmul (nc matmuls per step, f32 accumulate)
        amax = jnp.max(jnp.abs(g), axis=(-2, -1), keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(g / scale).astype(jnp.int8).astype(jnp.float32) * scale
    if gdtype == "int8gg":
        # ONE global scale for the whole Gram matrix: the kernel can then
        # run entirely in scale-divided units (XC and ss0 pre-divided on
        # the XLA side) with no in-kernel scale plumbing at all
        amax = jnp.max(jnp.abs(g))
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(g / scale).astype(jnp.int8).astype(jnp.float32) * scale
    if gdtype == "int8t":
        # single scale per target codebook t: ONE fused (M*B, nc*cs)@(nc*cs,
        # cs) int8 matmul per step with one descale of the int32 result
        amax = jnp.max(jnp.abs(g), axis=(0, -2, -1), keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(g / scale).astype(jnp.int8).astype(jnp.float32) * scale
    return g.astype(gdtype).astype(jnp.float32)


def seqbeam_pass_gram(x, indexes, M, R, pool_steps, G, XC):
    """Kernel-faithful sweep with Gram-table scores: at step t,
    S(m, j) = ||E_t_m||^2 carried - 2 (XC_t[j] - SG_t(m, j) + Gtt[i, j]) +
    csq_t[j] computed WITHOUT any E buffer.  ch tracks each candidate's
    full index row (what the kernel keeps as chcol)."""
    B = x.shape[0]
    ch = indexes[:, None, :]  # (B, m, nc)
    # carried ||E||^2 of the root (pass entry): exact recompute here; the
    # kernel carries the previous pass's winning score value
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    ss = jnp.sum((recon - x) ** 2, axis=-1)[:, None]  # (B, 1) -> (B, m)
    for t in range(nc):
        m = ch.shape[1]
        # SG(b, m, j) = sum_s G[s, t][ch[b,m,s], j]
        SG = jnp.sum(
            jnp.take_along_axis(
                G[:, t][None, None],  # (1, 1, s, i, j)
                ch[:, :, :, None, None],  # (B, m, s, 1, 1)
                axis=3,
            )[:, :, :, 0, :],
            axis=2,
        )  # (B, m, cs)
        i_cur = ch[:, :, t]  # (B, m)
        # With F = sum_s w_s(ch_s) - x (carried ss = ||F||^2):
        #   S(j) = ||F - w_t(i) + w_t(j)||^2
        #        = ss + [-2 F.w_t(i) + csq[i]]          (per-candidate const)
        #          + 2 F.w_t(j) - 2 w_t(i).w_t(j) + csq[j]
        # and F.w_t(j) = SG(j) - XC(j).  The bracketed constant cancels
        # within one parent's j-ranking but NOT across parents — dropping
        # it corrupts every cross-parent pool comparison and the carried
        # scores (measured +7.7% rel err at f32!); the kernel's E-buffer
        # path computes it as (-2 Ec - ccn) via _gather_lane256 and the
        # v3 kernel would do the same lane gathers on the assembled rows.
        gtt_i = jnp.take_along_axis(
            G[t, t][None, None], i_cur[:, :, None, None], axis=2
        )[:, :, 0, :]  # (B, m, cs) rows Gtt[i, :]
        xc_t = jnp.broadcast_to(XC[:, None, t, :], SG.shape)  # (B, m, cs)
        sg_i = jnp.take_along_axis(SG, i_cur[:, :, None], axis=-1)
        xc_i = jnp.take_along_axis(xc_t, i_cur[:, :, None], axis=-1)
        csq_i = cs_sumsq[t][i_cur][:, :, None]
        corr = -2.0 * (sg_i - xc_i) + csq_i  # (B, m, 1)
        S = (
            ss[:, :, None]
            + corr
            + 2.0 * (SG - xc_t)
            - 2.0 * gtt_i
            + cs_sumsq[t][None, None, :]
        )
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
        else:  # R1
            j = jnp.argmin(S, axis=-1)
            vals = jnp.take_along_axis(S, j[..., None], axis=-1)[..., 0]
            parent = jnp.broadcast_to(jnp.arange(m)[None, :], j.shape)
        ch = jnp.take_along_axis(ch, parent[:, :, None], axis=1)
        ch = ch.at[:, :, t].set(j)
        ss = vals  # carried scores ARE the new ||E||^2 (kernel mechanism)
    best = jnp.argmin(ss, axis=-1)
    return jnp.take_along_axis(ch, best[:, None, None], axis=1)[:, 0, :]


def encode_gram(x, M, R, schedule, G, XC):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for pool_steps in schedule:
        idx = seqbeam_pass_gram(x, idx, M, R, pool_steps, G, XC)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5 rel_err {ref:.5f}", flush=True)
results = {"beam5": ref}

EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALL = (True,) * nc
# flagship pass counts: 3 at dim=512/8B, 2 at dim=256/4B
npass = 3 if nc >= 8 else 2
ALT = tuple((EVEN, ODD)[i % 2] for i in range(npass))
XC = jnp.einsum(
    "bd,ntd->bnt",
    x.astype(bf16),
    centers.astype(bf16),
    preferred_element_type=jnp.float32,
)  # (B, nc, cs), bf16 inputs like the kernel's XLA-side precompute

M, R = 8, 4
names = sys.argv[3].split(",") if len(sys.argv) > 3 else (
    "float32", "bfloat16", "int8")
for gname in names:
    G = make_gram(jnp.float32 if gname == "float32" else
                  bf16 if gname == "bfloat16" else gname)
    for sname, sched in (("altparity", ALT), ("allpool", (ALL,) * npass)):
        e = rel_err(jax.jit(lambda x, s=sched, G=G: encode_gram(
            x, M, R, s, G, XC))(x))
        results[f"gram-{gname} {sname}"] = e
        print(f"gram-{gname:9s} {sname:10s} {e:.5f}  "
              f"({100*(e/ref-1):+.2f}%)", flush=True)

out = HERE / f"gramscore_quality_d{dim}_b{bpf}.json"
prev = json.loads(out.read_text()) if out.exists() else {}
prev.update(dict(dim=dim, bpf=bpf, M=M, R=R, **results))
out.write_text(json.dumps(prev))
