"""Quality sweep of mixed R1/pool per-step schedules for the seqbeam kernel.

Kernel cost structure (NOTES_ROUND3.md): a "pool" step (top-R per parent,
then top-M of the M*R pool) pays beam reorder + chosen-gather + R+M
selection rounds; an "R1" step (each parent keeps its best child, no
cross-parent competition) needs NO reorder, NO chosen gather and a single
selection round.  R=1 everywhere saturates at +1.26% vs the reference
beam-5 (outside the 1% bar) while full pool is +0.90% at M8R4p3 — this
sweep simulates the kernel's exact selection semantics in XLA to find how
FEW pool steps keep quality inside the bar.

Usage: python experiments/pool_schedule_sweep.py [dim] [bpf]
Writes experiments/pool_schedule_d{dim}_b{bpf}.json
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
cs_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs)


def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


def seqbeam_pass(x, indexes, M, R, pool_steps):
    """One kernel-faithful sweep; ``pool_steps`` is a per-codebook bool
    tuple — True = pool step (top-R/parent then top-M of pool), False =
    R1 step (argmin per parent, children stay in their parent's slot)."""
    B = x.shape[0]
    onehot = jax.nn.one_hot(indexes, cs, dtype=jnp.float32)
    recon = jnp.einsum("bnk,nkd->bd", onehot, centers)
    E = (recon - x)[:, None, :]  # (B, 1, D) grows to (B, M, D)
    chosen = indexes[:, None, :]  # (B, m, nc)
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
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)  # (B,m,R)
            pool_v = vR.reshape(B, m * R)
            _, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        else:  # R1: best child per parent, no movement
            j = jnp.argmin(S, axis=-1)
            parent = jnp.broadcast_to(jnp.arange(m)[None, :], j.shape)
        E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
        c_new = centers[t][j]
        E = E_par + c_new
        ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = ch_par.at[:, :, t].set(j)
    scores = jnp.sum(E * E, axis=-1)
    best = jnp.argmin(scores, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, M, R, schedule):
    """schedule: tuple of per-pass tuples of per-codebook pool flags."""
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
EVEN = tuple(t % 2 == 0 for t in range(nc))   # pool on even codebooks
ODD = tuple(t % 2 == 1 for t in range(nc))    # pool on odd codebooks
THIRD = tuple(t % 3 == 2 for t in range(nc))
FIRSTHALF = tuple(t < nc // 2 for t in range(nc))
LASTHALF = tuple(t >= nc // 2 for t in range(nc))

M, R = 8, 4
cases = {
    # baselines
    "p3 all-pool": (ALL, ALL, ALL),
    "p3 no-pool": (NONE, NONE, NONE),
    # halve pool steps, three placements
    "p3 even": (EVEN, EVEN, EVEN),
    "p3 odd": (ODD, ODD, ODD),
    "p3 alt-parity": (EVEN, ODD, EVEN),
    # pool only some passes
    "p3 pool-pass0 only": (ALL, NONE, NONE),
    "p3 pool-pass2 only": (NONE, NONE, ALL),
    "p3 pool-pass02": (ALL, NONE, ALL),
    "p3 pool-pass12": (NONE, ALL, ALL),
    # third-density
    "p3 third": (THIRD, THIRD, THIRD),
    # halves
    "p3 firsthalf": (FIRSTHALF,) * 3,
    "p3 lasthalf": (LASTHALF,) * 3,
    # 4 passes of cheap steps vs 3 mixed
    "p4 odd": (ODD, ODD, ODD, ODD),
    "p4 no-pool": (NONE,) * 4,
    "p4 third": (THIRD,) * 4,
}
for name, schedule in cases.items():
    e = rel_err(jax.jit(
        lambda x, s=schedule: encode_cfg(x, M, R, s))(x))
    results[name] = e
    print(f"{name:22s} {e:.5f}  ({100*(e/ref-1):+.2f}%)", flush=True)

(HERE / f"pool_schedule_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, M=M, R=R, **results)))
