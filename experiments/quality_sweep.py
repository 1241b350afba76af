"""Speed/quality Pareto sweep for the flagship encode (dim=512, 8B).

Simulates the fused kernel's exact selection semantics in XLA (per-parent
top-R cap, then top-M of the M*R pool; per-pass fan-out from the single
best solution) over (cd warm-start sweeps) x (M) x (passes) x (R), against
the reference pair-tree beam at 5 iterations — the quality bar is +1%
relative reconstruction error (BASELINE.md).

Usage: python experiments/quality_sweep.py [dim] [bpf]
Requires the trained quantizer experiments/q{dim}_{bpf}_full.npz.
Writes experiments/quality_sweep_d{dim}_b{bpf}.json
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


def seqbeam_pass_capped(x, indexes, M, R):
    """One kernel-faithful sweep: fan out from the single current solution,
    then per codebook: per-parent top-R, pool top-M."""
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
        else:
            # kernel semantics: top-R per parent, then exact top-M of pool
            vR, jR = jax.lax.approx_min_k(S, R, recall_target=1.0)  # (B,m,R)
            pool_v = vR.reshape(B, m * R)
            _, sel = jax.lax.approx_min_k(pool_v, M, recall_target=1.0)
            parent = sel // R
            j = jnp.take_along_axis(jR.reshape(B, m * R), sel, axis=1)
        E_par = jnp.take_along_axis(E_t, parent[:, :, None], axis=1)
        c_new = centers[t][j]
        E = E_par + c_new
        ch_par = jnp.take_along_axis(chosen, parent[:, :, None], axis=1)
        chosen = ch_par.at[:, :, t].set(j)
    scores = jnp.sum(E * E, axis=-1)
    best = jnp.argmin(scores, axis=-1)
    return jnp.take_along_axis(chosen, best[:, None, None], axis=1)[:, 0, :]


def encode_cfg(x, cd, M, passes, R):
    logits = search.compute_logits(params, config, x)
    idx = jnp.argmax(logits, -1).astype(jnp.int32)
    if cd:
        idx = search.refine_indexes_cd(centers, x, idx, sweeps=cd)
    for _ in range(passes):
        idx = seqbeam_pass_capped(x, idx, M, R)
    return idx


results = {}
ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
results["beam5"] = ref
for ci in (3, 5, 8):
    f = jax.jit(lambda x, i=ci: search.compute_indexes(
        params, config, x, refine_indexes_iters=i, search="cd"))
    results[f"cd{ci}"] = rel_err(f(x))

# kernel-cost model (relative): MXU cost ~ passes*M; fixed per-pass overhead.
for cd in (0, 1, 2, 3):
    for M in (4, 8, 16, 32):
        for passes in (1, 2, 3):
            for R in (2, 4):
                if M * R > 256 or (R > M):
                    continue
                key = f"cd{cd}+M{M}x{passes}R{R}"
                results[key] = rel_err(jax.jit(
                    lambda x, c=cd, m=M, p=passes, r=R: encode_cfg(x, c, m, p, r)
                )(x))
                print(f"{key:18s} {results[key]:.5f}  "
                      f"(+{100*(results[key]/ref-1):.2f}%)", flush=True)

bar = 1.01 * ref
ok = {k: v for k, v in results.items() if v <= bar}
print("\n--- within 1% of beam5 ---")
for k, v in sorted(ok.items(), key=lambda kv: kv[1]):
    print(f"{k:18s} rel_err={v:.5f} (+{100*(v/ref-1):.2f}%)")
(HERE / f"quality_sweep_d{dim}_b{bpf}.json").write_text(
    json.dumps(dict(dim=dim, bpf=bpf, **results)))
