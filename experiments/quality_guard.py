"""Generate ops/quality.json: multi-seed on-chip quality deltas for the
``auto`` search's candidate configs (the margin guard, VERDICT r3 item 4).

For each guarded config (same names as the smoke gate) this measures the
relative reconstruction error vs the exact beam-5 search on the trained
flagship checkpoint at SEVERAL eval seeds, and records the max delta.
``core.codec.encode(search_method="auto")`` demotes any candidate whose
max measured delta exceeds the 1% parity bar (ops/verify.quality_delta_pct).

Run on the real chip:  python experiments/quality_guard.py [dim] [bpf] [name ...]
(names filter CONFIGS — each config costs a kernel compile, so measure
only what changed; no names = all).
Merges into quantization_tpu/ops/quality.json (per-entry timestamps).
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp

if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/quantization_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantization_tpu import core
from quantization_tpu.core import search, codec
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.utils.serialization import load_quantizer
from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

dim, bpf = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (512, 8)
KEYS = (7, 8, 9)
B = 8192
HERE = pathlib.Path(__file__).parent
OUT = HERE.parents[0] / "quantization_tpu" / "ops" / "quality.json"

# smoke-gate name -> (passes, kwargs); MUST mirror core/codec.py
# auto_candidates (plus any config being considered for promotion)
if dim == 512:
    CONFIGS = {
        "seqbeam_hl_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
            reorder="select", e_dtype="bf16")),
        "seqbeam_m16_d512": (2, dict(
            M=16, R=4, block_b=256, interleave=2,
            reorder="select", e_dtype="bf16")),
        "seqbeam_int8e_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
            reorder="select", e_dtype="int8", zip_skew=1)),
        # promotion candidate (round 4): single-pass bf16 init logits —
        # the argmax init the beam refines; measured here before any
        # auto promotion because the headline margin is +0.98% of 1%
        "seqbeam_int8e_fi_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
            reorder="select", e_dtype="int8", init_precision="default")),
        # promotion candidate (round 4): bound-propagated requant scales
        # (no per-step row-max reduce), sim-screened +0.98%
        # (experiments/boundscale_quality_d512_b8.json)
        "seqbeam_int8e_bound_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
            reorder="select", e_dtype="int8", requant="bound")),
        "seqbeam_int8e_bound_fi_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
            reorder="select", e_dtype="int8", requant="bound",
            init_precision="default")),
        # promotion candidate (round 5): lazy_r1 — R1 steps defer their
        # delta into the next pool step (bf16 Gram score correction +
        # merged extension); NOT bit-identical to eager, so it needs its
        # own measured rows before any auto promotion
        "seqbeam_int8e_lazy_d512": (3, dict(
            M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
            reorder="select", e_dtype="int8", zip_skew=1, lazy_r1=True)),
    }
else:
    CONFIGS = {
        "seqbeam_hl_d256": (2, dict(
            M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
            reorder="select", e_dtype="bf16")),
        "seqbeam_int8e_d256": (2, dict(
            M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
            reorder="select", e_dtype="int8")),
    }

only = set(sys.argv[3:])
if only:
    unknown = only - set(CONFIGS)
    assert not unknown, (unknown, sorted(CONFIGS))
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in only}

q = load_quantizer(HERE / f"q{dim}_{bpf}_full.npz")
params, config = q.params, q.config
sampler = make_mlp_sampler(dim, jax.random.PRNGKey(42))
centers = core.scaled_centers(params, config.scale_speed)
data_mean = jnp.mean(centers, axis=1).sum(axis=0)

beam = jax.jit(lambda x: search.compute_indexes(
    params, config, x, refine_indexes_iters=5, search="beam"))


def rel_err(indexes, x, denom):
    recon = codec.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2)) / denom


xs, denoms, beam5 = {}, {}, {}
for k in KEYS:
    xs[k] = sampler(jax.random.PRNGKey(k), B)
    denoms[k] = float(jnp.sum((xs[k] - data_mean) ** 2))
    beam5[k] = rel_err(beam(xs[k]), xs[k], denoms[k])
    print(f"beam5 key={k}: {beam5[k]:.5f}", flush=True)

results = {}
if OUT.exists():
    try:
        results = json.loads(OUT.read_text())["results"]
    except Exception:
        pass

for name, (passes, kw) in CONFIGS.items():
    deltas = {}
    try:
        for k in KEYS:
            e = rel_err(
                seqbeam_encode_indexes(
                    params, config, xs[k], passes=passes, **kw),
                xs[k], denoms[k])
            deltas[str(k)] = round(100.0 * (e / beam5[k] - 1.0), 4)
    except Exception as ex:
        print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)
        continue
    results[name] = {
        "dim": dim, "bpf": bpf, "frames_per_key": B,
        "beam5_by_key": {str(k): round(beam5[k], 6) for k in KEYS},
        "delta_pct_by_key": deltas,
        "max_delta_pct": max(deltas.values()),
        "generated_unix": round(time.time(), 1),
    }
    print(f"{name:22s} deltas {deltas}  max {max(deltas.values()):+.3f}%",
          flush=True)
    # write after EVERY config: a compile through the remote helper can
    # take 16+ min, and an external timeout mid-sweep must not lose the
    # entries that already completed
    OUT.write_text(json.dumps(
        {"generated_unix": time.time(), "results": results}, indent=1) + "\n")

print("wrote", OUT)
