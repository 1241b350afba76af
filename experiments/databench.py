"""Data-path throughput: native shard loader GB/s + encode-from-disk vec/s.

VERDICT r3 weak-item 5: the north-star (100M vec/s/host at dim=512) implies
~100 GB/s of f16 ingest per host; nothing measured the data path, so nobody
knew whether encode-from-disk is compute- or IO-bound.  This harness:

  1. generates (once) a raw-f16 shard corpus under --dir (default
     /tmp/qtpu_databench, --frames x dim, ~2 GB at the defaults);
  2. measures the native C++ loader (ShardStream, threaded shuffle pool)
     and the NumPy fallback in frames/s and GB/s of f16 ingest;
  3. with --encode, measures end-to-end `stream -> device -> encode(auto)`
     vectors/s on the real chip with the dispatch pipelined ahead of the
     stream (the CLI encode path's dispatch pattern).

Note the bench host has ONE vCPU and a large page cache, so (2) measures
the loader's software overhead ceiling, not disk bandwidth; the corpus is
fully cache-resident after generation.  Usage:
    python experiments/databench.py [--frames N] [--batch B] [--encode]
Writes experiments/databench.json
"""
import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np

HERE = pathlib.Path(__file__).parent

ap = argparse.ArgumentParser()
ap.add_argument("--dir", default="/tmp/qtpu_databench")
ap.add_argument("--frames", type=int, default=1 << 21)  # 2M frames = 2 GB
ap.add_argument("--dim", type=int, default=512)
ap.add_argument("--batch", type=int, default=1 << 15)
ap.add_argument("--measure-batches", type=int, default=64)
ap.add_argument("--encode", action="store_true")
args = ap.parse_args()

from quantization_tpu.data import shards

corpus = pathlib.Path(args.dir)
if not (corpus / "manifest.json").exists():
    print(f"generating corpus: {args.frames} x {args.dim} f16 "
          f"({args.frames * args.dim * 2 / 1e9:.1f} GB)", flush=True)
    rng = np.random.default_rng(0)

    def gen():
        left = args.frames
        while left > 0:
            n = min(1 << 19, left)
            yield rng.standard_normal((n, args.dim), dtype=np.float32)
            left -= n

    shards.write_shards(corpus, gen(), frames_per_shard=1 << 19)

results = {"frames": args.frames, "dim": args.dim, "batch": args.batch}
f16_bytes = args.dim * 2

for mode, force_py in (("native", False), ("python", True)):
    stream = shards.ShardStream(
        corpus, args.batch, force_python=force_py, num_threads=4,
        pool_frames=max(args.batch, 1 << 18),
    )
    if mode == "native" and not stream.native:
        print("native loader unavailable (no toolchain?)", flush=True)
        continue
    it = iter(stream)
    for _ in range(4):  # warm up pool fill
        next(it)
    nb = args.measure_batches if mode == "native" else max(
        args.measure_batches // 8, 4)
    t0 = time.perf_counter()
    for _ in range(nb):
        next(it)
    dt = time.perf_counter() - t0
    fps = nb * args.batch / dt
    results[mode] = dict(
        frames_per_sec=round(fps, 1),
        ingest_gb_s=round(fps * f16_bytes / 1e9, 3),
        out_gb_s=round(fps * args.dim * 4 / 1e9, 3),
    )
    print(f"{mode:7s} {fps/1e6:8.2f} M frames/s  "
          f"{fps * f16_bytes / 1e9:6.2f} GB/s f16 in  "
          f"{fps * args.dim * 4 / 1e9:6.2f} GB/s f32 out", flush=True)
    stream.close()

if args.encode:
    import jax
    if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/quantization_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from quantization_tpu import core

    config = core.QuantizerConfig(
        dim=args.dim, codebook_size=256, num_codebooks=8)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    enc = jax.jit(lambda p, x: core.encode(
        p, config, x, refine_indexes_iters=5, as_bytes=True,
        search_method="auto"))
    stream = shards.ShardStream(
        corpus, args.batch, pool_frames=max(args.batch, 1 << 18))
    it = iter(stream)
    np.asarray(enc(params, jax.device_put(next(it))))  # compile
    # pipelined: keep a window of in-flight dispatches so host streaming
    # overlaps device compute (the ~25 ms dispatch RTT tunnel pattern)
    nb = min(args.measure_batches, 32)
    t0 = time.perf_counter()
    outs = []
    for _ in range(nb):
        outs.append(enc(params, jax.device_put(next(it))))
    np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    vps = nb * args.batch / dt
    results["encode_from_disk"] = dict(
        vec_per_sec=round(vps, 1),
        ingest_gb_s=round(vps * f16_bytes / 1e9, 3),
    )
    print(f"encode-from-disk {vps/1e3:.0f} K vec/s "
          f"({vps * f16_bytes / 1e9:.2f} GB/s f16 ingest)", flush=True)

(HERE / "databench.json").write_text(json.dumps(results, indent=1))
print("wrote", HERE / "databench.json")
