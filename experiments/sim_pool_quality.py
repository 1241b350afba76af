"""CPU simulation of the seqbeam kernel's R-limited pool selection.

The kernel (ops/seqbeam.py) does NOT re-sort the full (M, cs) extension
matrix: per codebook step it keeps the top-R children per parent, pools the
M*R survivors per frame, and keeps the exact top-M of that pool (R1 steps:
best child per parent, no cross-parent pool).  experiments/seqbeam_quality.py
simulates only the two extremes (full resort / R1); this script simulates the
exact pool semantics including pool_mask schedules, so speculative (M, R,
passes, mask) configs can be quality-screened without chip time.

Usage: python experiments/sim_pool_quality.py [dim] [bpf] [cfg ...]
  cfg syntax mirrors maskbench: sched:mN:rN:pN  (e.g. allpool:m16:r2:p2)
Validated against real-kernel measurements in kernel_quality_d512_b8.json.
"""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

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
import os

x = sampler(jax.random.PRNGKey(7), int(os.environ.get("QTPU_SIM_B", 2048)))
centers = core.scaled_centers(params, config.scale_speed)
nc, cs, D = centers.shape
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))
cs_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def quantize_e(E, e_dtype):
    """Emulate storing the error buffer in a reduced dtype between steps.

    bf16: round-to-nearest bf16.  int8: per-(frame,candidate) symmetric
    scale from the running max-abs (the kernel would carry the scale in a
    side column).  Screens the cumulative requantization error the kernel
    would see if E lived in int8 VMEM (possible once the select-tree
    reorder replaced dynamic_gather, which only moves f32/int32)."""
    if e_dtype == "f32":
        return E
    if e_dtype == "bf16":
        return E.astype(jnp.bfloat16).astype(jnp.float32)
    assert e_dtype == "int8"
    s = jnp.max(jnp.abs(E), axis=-1, keepdims=True) / 127.0
    return jnp.round(E / jnp.maximum(s, 1e-30)) * s


def pool_pass(x, indexes, M, R, mask, e_dtype="f32"):
    """One sweep; mask[t] False => R1 step (no cross-parent pool).

    Matches the kernel's pass structure: every pass re-seeds the beam from
    the previous pass's single winner (ops/seqbeam.py one_pass_with: pass
    end writes the winner to sol_ref; step 0 of the next pass fans out all
    M candidates from it)."""
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = (recon - x)[:, None, :]  # (B, 1, D)
    chosen = indexes[:, None, :]  # (B, 1, nc)
    for t in range(nc):
        m = E.shape[1]
        # subtract each candidate's CURRENT codebook-t codeword
        oh_t = jax.nn.one_hot(chosen[:, :, t], cs, dtype=jnp.float32)
        c_cur = jnp.einsum("bmk,kd->bmd", oh_t, centers[t])
        E_t = E - c_cur
        cross = jnp.einsum("bmd,kd->bmk", E_t, centers[t])
        E_t_ss = jnp.sum(E_t * E_t, axis=-1)
        S = E_t_ss[:, :, None] + cs_sumsq[t][None, None, :] + 2.0 * cross
        if m == 1:
            flat = S.reshape(B, m * cs)
            _, sel = jax.lax.approx_min_k(flat, M, recall_target=1.0)
            parent, j = sel // cs, sel % cs
        elif mask[t]:
            # kernel pool: top-R per parent, then exact top-M of M*R pool
            negv, jR = jax.lax.top_k(-S, R)  # (B, m, R)
            poolv = (-negv).reshape(B, m * R)
            _, sel = jax.lax.approx_min_k(poolv, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        else:
            j = jnp.argmin(S, axis=-1)  # (B, m)
            parent = jnp.broadcast_to(jnp.arange(m)[None], (B, m))
        E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
        E = quantize_e(E_par + centers[t][j], e_dtype)
        ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = ch_par.at[:, :, t].set(j)
    return E, chosen


def run_cfg(x, M, R, passes, masks, e_dtype="f32"):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    for p in range(passes):
        E, chosen = pool_pass(x, idx, M, R, masks[p], e_dtype)
        best = jnp.argmin(jnp.sum(E * E, axis=-1), axis=-1)
        idx = jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]
    return idx


EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALL = (True,) * nc
SCHED = {"allpool": lambda p: (ALL,) * p,
         "altparity": lambda p: tuple((EVEN, ODD)[i % 2] for i in range(p)),
         # full pool on the first pass, masked refinement passes after
         "allfirst": lambda p: (ALL,) + tuple(
             (EVEN, ODD)[i % 2] for i in range(p - 1)),
         # masked first pass, full-pool polish last
         "alllast": lambda p: tuple(
             (EVEN, ODD)[i % 2] for i in range(p - 1)) + (ALL,),
         # pool every 3rd codebook, rotating by pass (1/3 the pool steps
         # of allpool; 2/3 of altparity) — round-5 cheap-selection screen
         "p3rot": lambda p: tuple(
             tuple(t % 3 == i % 3 for t in range(nc)) for i in range(p))}

results = {"beam5": rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))}
print(f"beam5           {results['beam5']:.5f}", flush=True)

names = sys.argv[3:] or [
    "altparity:m8:r4:p3", "allpool:m16:r4:p2", "allpool:m16:r2:p2",
    "allpool:m16:r1:p2", "altparity:m8:r2:p3",
]
for name in names:
    parts = name.split(":")
    M = R = p = None
    ed = "f32"
    for fl in parts[1:]:
        if fl == "ebf":
            ed = "bf16"
        elif fl == "ei8":
            ed = "int8"
        elif fl and fl[0] in "mrp" and fl[1:].isdigit():
            M = int(fl[1:]) if fl[0] == "m" else M
            R = int(fl[1:]) if fl[0] == "r" else R
            p = int(fl[1:]) if fl[0] == "p" else p
    M, R, p = M or 8, R or 4, p or 3
    masks = SCHED[parts[0]](p)
    r = rel_err(jax.jit(lambda x, M=M, R=R, p=p, ms=masks, ed=ed: run_cfg(
        x, M, R, p, ms, ed))(x))
    results[name] = r
    print(f"{name:15s} {r:.5f}  (+{100 * (r / results['beam5'] - 1):.2f}%)",
          flush=True)
print(json.dumps(dict(dim=dim, bpf=bpf, **results)))
