"""Real-kernel quality vs reference beam-5 on the trained flagship."""
import sys, pathlib, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.utils.serialization import load_quantizer
from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

dim, bpf = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (512, 8)
HERE = pathlib.Path(__file__).parent
q = load_quantizer(HERE / f"q{dim}_{bpf}_full.npz")
params, config = q.params, q.config
sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
x = sampler(jax.random.PRNGKey(7), 8192)
centers = core.scaled_centers(params, config.scale_speed)
data_mean = jnp.mean(centers, axis=1).sum(axis=0)
denom = float(jnp.sum((x - data_mean) ** 2))

def rel_err(indexes):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom

ref = rel_err(jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))(x))
print(f"beam5        {ref:.5f}", flush=True)
results = {"beam5": ref}
nc = config.num_codebooks
EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALL = (True,) * nc
MASKS = {
    "": None,
    "+altparity": (EVEN, ODD, EVEN),
    "+eoall": (EVEN, ODD, ALL),
}
for (M, R, p, mk) in (
    (8, 4, 3, ""),
    (8, 4, 3, "+altparity"),
    (8, 4, 3, "+eoall"),
    (8, 2, 3, ""),
    (16, 4, 2, ""),
    (8, 4, 2, ""),
):
    mask = MASKS[mk]
    if mask is not None and len(mask) != p:
        continue
    k = f"kernel M{M}R{R}p{p}{mk}"
    e = rel_err(seqbeam_encode_indexes(params, config, x, M=M, R=R, passes=p,
                                       pool_mask=mask))
    results[k] = e
    print(f"{k:26s} {e:.5f} (+{100*(e/ref-1):.2f}%)", flush=True)
# on-chip quality of the halved-traffic variant (select reorder + bf16 E);
# the CPU sim puts it at +0.01%/0.00% of the f32 kernel
# (experiments/e_bf16_quality_d*.json)
for (M, R, p, mk) in ((8, 4, 3, "+altparity"), (16, 4, 2, "")):
    mask = MASKS[mk]
    if mask is not None and len(mask) != p:
        continue
    k = f"kernel M{M}R{R}p{p}{mk}+sel+ebf16"
    e = rel_err(seqbeam_encode_indexes(params, config, x, M=M, R=R, passes=p,
                                       pool_mask=mask, reorder="select",
                                       e_dtype="bf16"))
    results[k] = e
    print(f"{k:26s} {e:.5f} (+{100*(e/ref-1):.2f}%)", flush=True)
# the shipped dim=256 two-pass auto config + its select/bf16-E variant
# (pool_mask="altparity" resolves per-pass inside the kernel)
if config.num_codebooks == 4:
    for flags, kw in (
        ("", {}),
        ("+sel+ebf16", dict(reorder="select", e_dtype="bf16")),
    ):
        k = f"kernel M8R4p2+altparity{flags}"
        e = rel_err(seqbeam_encode_indexes(
            params, config, x, M=8, R=4, passes=2, pool_mask="altparity",
            block_b=256, **kw))
        results[k] = e
        print(f"{k:26s} {e:.5f} (+{100*(e/ref-1):.2f}%)", flush=True)
# REAL gramv3 kernel quality on chip (VERDICT r2: the int8 Gram-table path
# was previously screened only by the experiments/gramscore_quality.py
# arithmetic simulation; this runs the actual Pallas kernel)
from quantization_tpu.ops.gramv3 import GRAMV3_SUPPORTED, gramv3_encode_indexes
if GRAMV3_SUPPORTED(config):
    for g_dtype in ("bf16", "int8"):
        for (M, R, p) in ((8, 4, 3),):
            k = f"gramv3-{g_dtype} M{M}R{R}p{p}"
            e = rel_err(gramv3_encode_indexes(
                params, config, x, M=M, R=R, passes=p, g_dtype=g_dtype,
                block_b=256))
            results[k] = e
            print(f"{k:26s} {e:.5f} (+{100*(e/ref-1):.2f}%)", flush=True)
(HERE / f"kernel_quality_d{dim}_b{bpf}.json").write_text(json.dumps(results))
