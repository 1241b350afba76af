"""Headline benchmark: bulk-encode throughput on the flagship config.

Measures `encode` (dim=512, 8 bytes/frame: 8 codebooks x 256 entries,
5 refinement iterations — the defaults at `quantization/quantization.py:245`
in the reference) in vectors/sec on the available accelerator.

The reference publishes no throughput numbers (SURVEY.md §6); `vs_baseline`
is therefore measured against the BASELINE.json north-star target of
100M dim-512 vectors/s per v5p *host* (8 chips), pro-rated to the number of
local chips actually used, i.e. per-chip target = 12.5M vec/s.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "vec/s", "vs_baseline": N}

Methodology notes:
* The benchmark chip may sit behind a high-latency tunnel (~25ms dispatch
  RTT), so we queue many async dispatches and synchronize once; wall time
  is measured around the whole pipelined stream.
* First call compiles; compile time is excluded.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

# Persistent compilation cache: the fused kernels compile in 1-7 min
# (erratically) through the remote Mosaic helper; cache executables across
# runs so the timed section never includes a cold compile twice.
if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "QUANTIZATION_TPU_CACHE_DIR",
            os.path.expanduser("~/.cache/quantization_tpu_jax"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from quantization_tpu import core

DIM = 512
NUM_CODEBOOKS = 8
CODEBOOK_SIZE = 256
# Headline search config: fused seqbeam kernel, beam width M=8, per-parent
# top-R=4, 3 passes, "altparity" pool/R1 step schedule (pool selection on
# even codebooks in even passes / odd in odd — half the steps run in R1
# mode with no beam reorder), phase-zipped 2-way sub-tile interleave —
# measured +0.96% relative reconstruction error vs the reference beam-5 on
# the trained flagship (inside the 1% parity bar;
# experiments/kernel_quality_d512_b8.json), no warm start needed
# (experiments/quality_sweep_d512.log: cd0 == cd1 == cd2 at equal beam work).
SEQBEAM_M = 8
SEQBEAM_R = 4
SEQBEAM_PASSES = 3
SEQBEAM_KW = dict(pool_mask="altparity", block_b=256, interleave=2)
BATCH = 1 << 15
NBATCH = 8
NORTH_STAR_PER_CHIP = 100e6 / 8.0  # v5p host target, pro-rated per chip
# bf16 MXU peak of the benchmark chip (TPU v5e: 197 TFLOP/s); override with
# QTPU_PEAK_TFLOPS for other chip generations.
PEAK_TFLOPS = float(os.environ.get("QTPU_PEAK_TFLOPS", "197"))


def model_flops_per_vector(
    dim: int, nc: int, cs: int, cd_sweeps: int, M: int, passes: int
) -> float:
    """Model FLOPs (2 per MAC) per encoded vector for the active search
    config: logits init + ``cd_sweeps`` coordinate-descent sweeps + the
    sequential-beam kernel (v2 structure: root-only rescore at the first
    codebook, no extension at the last).  Counts MXU matmul work only —
    selection/bookkeeping are VPU ops with negligible FLOPs — so
    flops/elapsed is an *achieved-math* rate, comparable against the bf16
    peak to give an honest MFU."""
    logits = 2.0 * dim * nc * cs
    # cd sweep (core/search.py::refine_indexes_cd): one-hot decode + per
    # codebook (remove-old + rescore + add-new) matmuls
    cd = cd_sweeps * (2.0 * nc * cs * dim + nc * 6.0 * cs * dim)
    # seqbeam v2 pass: root decode, per-step shared c_cur/q matmuls,
    # rescore (1 candidate at step 0, M after), extension (all but last step)
    per_pass = (
        2.0 * nc * cs * dim
        + nc * 4.0 * cs * dim
        + (1 + (nc - 1) * M) * 2.0 * dim * cs
        + (nc - 1) * M * 2.0 * cs * dim
    )
    return logits + cd + passes * per_pass


def main() -> None:
    config = core.QuantizerConfig(
        dim=DIM, codebook_size=CODEBOOK_SIZE, num_codebooks=NUM_CODEBOOKS
    )
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)

    def make_enc(search_method, iters, **kw):
        return jax.jit(
            lambda p, x: core.encode(
                p,
                config,
                x,
                refine_indexes_iters=iters,
                as_bytes=True,
                search_method=search_method,
                **kw,
            )
        )

    # Candidate kernels, tried in order; the best measured one is reported.
    # v3 (ops/gramv3.py) eliminates the error buffer and targets the int8
    # MXU peak; quality screened in-bar for both (+0.96% v2 / +0.95% v3i8
    # vs beam-5, experiments/{kernel_quality,gramscore_quality}_d512_b8.json).
    candidates = [
        (
            f"seqbeam M{SEQBEAM_M} R{SEQBEAM_R} x{SEQBEAM_PASSES} "
            f"{SEQBEAM_KW['pool_mask']} il{SEQBEAM_KW['interleave']}",
            make_enc("seqbeam", SEQBEAM_PASSES, M=SEQBEAM_M, R=SEQBEAM_R,
                     **SEQBEAM_KW),
        ),
        (
            "gramv3 int8 M8 R4 x3 allpool il2",
            make_enc("gramv3", SEQBEAM_PASSES, M=SEQBEAM_M, R=SEQBEAM_R,
                     g_dtype="int8", block_b=256, interleave=2),
        ),
    ]

    xs = [
        jax.device_put(
            jax.random.normal(jax.random.PRNGKey(i + 1), (BATCH, DIM), jnp.float32)
        )
        for i in range(NBATCH)
    ]
    jax.block_until_ready(xs)

    # Warm-up / compile, forced to completion with a host fetch (on the
    # tunneled platform, block_until_ready alone has proven unreliable as a
    # fence, and re-dispatch on identical buffers can be served from a
    # result cache — so: single timed pass, fresh inputs, full fetch of the
    # (small, uint8) outputs).
    import numpy as np

    def warmup(fn, attempts=3):
        # The tunneled chip occasionally throws a transient
        # FAILED_PRECONDITION right after another process released it;
        # retry before concluding the kernel is unavailable.
        for i in range(attempts):
            try:
                np.asarray(fn(params, xs[0]))
                return True
            except Exception as e:
                print(f"warmup attempt {i + 1}/{attempts} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                time.sleep(30)
        return False

    def measure(fn):
        t0 = time.perf_counter()
        outs = [fn(params, x) for x in xs[1:]]  # queue all dispatches
        # Fetch the last output: all dispatches share one device stream, so
        # its completion fences the rest with a single tunnel round-trip; a
        # fetch per batch would add ~30ms RTT each.
        np.asarray(outs[-1])
        return (NBATCH - 1) * BATCH / (time.perf_counter() - t0)

    active, vec_per_sec = None, 0.0
    for name, fn in candidates:
        # Each candidate warms up independently: a Mosaic rejection of one
        # kernel (e.g. no int8 MXU on this toolchain) must not lose the
        # others.
        if not warmup(fn, attempts=2):
            print(f"candidate unavailable: {name}", file=sys.stderr)
            continue
        v = measure(fn)
        print(f"candidate {name}: {v:.0f} vec/s", file=sys.stderr)
        if v > vec_per_sec:
            active, vec_per_sec = name, v
    if active is None:
        # No Mosaic kernel compiles on this toolchain: fall back to the
        # pure-XLA reference-parity beam so a number is always produced.
        print("no kernel available; falling back to XLA beam",
              file=sys.stderr)
        enc = make_enc("beam", 5)
        active = "beam x5 (kernel-unavailable fallback)"
        if not warmup(enc):
            raise RuntimeError("device unavailable for benchmarking")
        vec_per_sec = measure(enc)

    # Roofline accounting: model matmul FLOPs of the active search config
    # per vector, achieved FLOP/s, and fraction of the chip's bf16 peak.
    # Only reported for the kernel config (the FLOP model is seqbeam's);
    # a beam fallback reports the throughput alone, honestly labeled.
    record = {
        "metric": "encode_vectors_per_sec_dim512_8B",
        "value": round(vec_per_sec, 1),
        "unit": "vec/s",
        "vs_baseline": round(vec_per_sec / NORTH_STAR_PER_CHIP, 6),
        "config": f"{active}, batch {BATCH}",
    }
    if active.startswith("seqbeam"):
        fpv = model_flops_per_vector(
            DIM, NUM_CODEBOOKS, CODEBOOK_SIZE, 0, SEQBEAM_M, SEQBEAM_PASSES
        )
        tflops = vec_per_sec * fpv / 1e12
        record.update(
            model_flops_per_vector=round(fpv),
            achieved_tflops=round(tflops, 2),
            mfu=round(tflops / PEAK_TFLOPS, 4),
        )
    elif active.startswith("gramv3"):
        # v3 model FLOPs: logits + XC precompute + per-pass Gram matmuls
        # (step 0 is a single-candidate rescore); int8 ops counted against
        # the chip's int8 peak (2x bf16 on v5e)
        K = NUM_CODEBOOKS * CODEBOOK_SIZE
        fpv = (
            2.0 * DIM * K  # logits (nc*cs output lanes)
            + 2.0 * DIM * K  # XC precompute
            + SEQBEAM_PASSES
            * (1 + (NUM_CODEBOOKS - 1) * SEQBEAM_M)
            * 2.0 * K * CODEBOOK_SIZE
        )
        tflops = vec_per_sec * fpv / 1e12
        peak = PEAK_TFLOPS * (2.0 if "int8" in active else 1.0)
        record.update(
            model_flops_per_vector=round(fpv),
            achieved_tflops=round(tflops, 2),
            mfu=round(tflops / peak, 4),
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
