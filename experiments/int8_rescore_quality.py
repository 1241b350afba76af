"""Quality probe: would int8 rescoring inside the seqbeam kernel hold the
1% bar?  Simulates the kernel's selection semantics with the cross matrix
E.c computed from per-row-quantized int8 E and per-codebook-quantized int8
C (symmetric, round-to-nearest), everything else exact.

The kernel motivation: int8 MXU is 2x bf16 peak and int8 E would shrink
reorder traffic 4x — but only if selection survives the quantization.
"""
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


def q8(v, axis):
    s = jnp.max(jnp.abs(v), axis=axis, keepdims=True) / 127.0 + 1e-30
    return jnp.clip(jnp.round(v / s), -127, 127), s


def pass_capped(x, indexes, M, R, int8):
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = (recon - x)[:, None, :]
    chosen = indexes[:, None, :]
    for t in range(nc):
        m = E.shape[1]
        c_cur = jnp.einsum("bk,kd->bd", onehot[:, t], centers[t])
        E_t = E - c_cur[:, None, :]
        if int8:
            Eq, se = q8(E_t, axis=-1)              # per (frame, candidate) row
            Cq, sc = q8(centers[t], axis=-1)       # per codeword row
            cross = jnp.einsum("bmd,kd->bmk", Eq, Cq) * se * sc[None, None, :, 0]
        else:
            cross = jnp.einsum("bmd,kd->bmk", E_t, centers[t])
        E_t_ss = jnp.sum(E_t * E_t, axis=-1)
        S = E_t_ss[:, :, None] + cs_sumsq[t][None, None, :] + 2.0 * cross
        if m == 1:
            _, sel = jax.lax.approx_min_k(S.reshape(B, m * cs), M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
        else:
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)
            _, sel = jax.lax.approx_min_k(vR.reshape(B, m * R), M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        E = jnp.take_along_axis(E_t, parent[:, :, None], axis=1) + centers[t][j]
        chosen = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = chosen.at[:, :, t].set(j)
    best = jnp.argmin(jnp.sum(E * E, axis=-1), axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def enc(x, M, R, passes, int8):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(passes):
        idx = pass_capped(x, idx, M, R, int8)
    return idx


ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5         {ref:.5f}", flush=True)
out = {"beam5": ref}
for int8 in (False, True):
    for (M, R, p) in ((8, 4, 3), (16, 4, 2)):
        k = f"{'int8' if int8 else 'f32 '} M{M}R{R}p{p}"
        e = rel_err(jax.jit(lambda x, m=M, r=R, pp=p, i8=int8: enc(x, m, r, pp, i8))(x))
        out[k] = e
        print(f"{k:16s} {e:.5f} (+{100*(e/ref-1):.2f}%)", flush=True)
(HERE / "int8_rescore_quality.json").write_text(json.dumps(out))
