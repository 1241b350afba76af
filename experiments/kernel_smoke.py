"""Real-TPU kernel smoke gate.

Runs every shipped kernel config once on a tiny batch ON THE REAL CHIP —
each config in its own subprocess, so one Mosaic fault cannot poison the
sweep — and records a pass/fault table to
``quantization_tpu/ops/verified.json`` (the package ships this file;
``core.codec.encode(search_method="auto")`` only routes onto kernel
configs whose entry passed) and a human-readable table on stdout.

Pass criteria per config (beyond "did not fault"):
  * output finite / valid index range;
  * refinement improved on the argmax init's reconstruction error;
  * exact index match with a second run (determinism across dispatches).

Usage:
  python experiments/kernel_smoke.py            # full sweep + write table
  python experiments/kernel_smoke.py --one NAME # one config, this process
  python experiments/kernel_smoke.py --only A,B # rerun subset, merge table
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "quantization_tpu" / "ops" / "verified.json"

# name -> (dim, nc, method, iters, kwargs); every config family encode()
# can route to.  B is chosen = block_b so each runs a single grid step.
CONFIGS = {
    # the shipped auto default (dim=512 flagship + dim=256 two-pass variant)
    "seqbeam_hl_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
             reorder="select", e_dtype="bf16")),
    "seqbeam_hl_d256": (256, 4, "seqbeam", 2,
        dict(M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
             reorder="select", e_dtype="bf16")),
    # pool/interleave ablations of the v2 kernel
    "seqbeam_allpool_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, block_b=256)),
    "seqbeam_il1_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, pool_mask="altparity", block_b=256, interleave=1)),
    # reorder variants
    "seqbeam_select_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, block_b=256, reorder="select")),
    "seqbeam_wideselect_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, block_b=256, reorder="wideselect")),
    "seqbeam_bf16e_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, block_b=256, reorder="select", e_dtype="bf16")),
    # int8-resident E (round 4): int8 E + f32 row scales, int8 centers,
    # int8 x int8 -> int32 rescore/extension
    # block_b=512 (a REGRESSION for bf16 E, ab_r3c) wins for int8: the
    # halved E bytes fit the bigger tile and amortize per-op overhead —
    # 789.6K vs 682.8K (block 256) vs 639.2K (bf16) vec/s at B=32K
    "seqbeam_int8e_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
             reorder="select", e_dtype="int8", zip_skew=1)),
    "seqbeam_int8e_d256": (256, 4, "seqbeam", 2,
        dict(M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
             reorder="select", e_dtype="int8")),
    # the auto margin-fallback config (quality +0.746%, quality_guard)
    "seqbeam_m16_d512": (512, 8, "seqbeam", 2,
        dict(M=16, R=4, block_b=256, interleave=2,
             reorder="select", e_dtype="bf16")),
    # v1 implementation
    "seqbeam_v1_d512": (512, 8, "seqbeam", 3,
        dict(M=8, R=4, block_b=128, impl="v1")),
    # fused decode kernel ("decode" method handled specially below)
    "decode_kernel_d512": (512, 8, "decode", 0, {}),
    # COMPILED Mosaic kernel x shard_map composition on a real-hardware
    # 1-device mesh (VERDICT r4 item 5: the dryrun's 8-device leg runs
    # interpret=True off-TPU; this row certifies the compiled composition
    # on the chip — multi-chip hardware is not reachable here).  Config =
    # the shipped auto default ("shardmap" method handled specially below).
    "seqbeam_shardmap_d512": (512, 8, "shardmap", 3,
        dict(M=8, R=4, pool_mask="altparity", block_b=512, interleave=2,
             reorder="select", e_dtype="int8", zip_skew=1)),
}
# gramv3 is FROZEN as of round 5 (lost every default-path throughput race;
# see the README retirement note) — its smoke rows run only on request so
# the default rotation spends chip time on shipped configs.
if os.environ.get("QTPU_SMOKE_EXTRA"):
    CONFIGS["gramv3_bf16_d512"] = (512, 8, "gramv3", 3,
        dict(M=8, R=4, block_b=256, g_dtype="bf16"))
    CONFIGS["gramv3_int8_d512"] = (512, 8, "gramv3", 3,
        dict(M=8, R=4, block_b=256, g_dtype="int8", interleave=2))


def run_one(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/quantization_tpu_jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quantization_tpu import core

    dim, nc, method, iters, kw = CONFIGS[name]
    config = core.QuantizerConfig(dim=dim, codebook_size=256, num_codebooks=nc)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    B = max(256, kw.get("block_b", 256))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, dim), jnp.float32)

    if method == "decode":
        idx = jax.random.randint(jax.random.PRNGKey(2), (B, nc), 0, 256)
        packed = core.pack_indexes(idx, 256)
        dec = jax.jit(lambda p, c: core.decode(p, config, c, use_kernel=True))
        ref = jax.jit(lambda p, c: core.decode(p, config, c, use_kernel=False))
        y = np.asarray(dec(params, packed))
        yr = np.asarray(ref(params, packed))
        assert np.all(np.isfinite(y)), "non-finite decode output"
        rel = float(np.abs(y - yr).max() / (np.abs(yr).max() + 1e-9))
        assert rel < 5e-3, f"decode kernel mismatch {rel}"
        return {"ok": True, "detail": f"max rel dev {rel:.2e} vs gather"}

    if method == "shardmap":
        # compiled kernel under shard_map on a 1-device mesh: the result
        # must be bit-identical to the direct kernel call on the same data
        from quantization_tpu.parallel import bulk as pbulk
        from quantization_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(num_data=1, devices=jax.devices()[:1])
        sm = np.asarray(pbulk.encode_sharded(
            params, config, x, mesh, refine_indexes_iters=iters,
            search_method="seqbeam", **kw))
        direct = np.asarray(jax.jit(lambda p, x: core.encode(
            p, config, x, refine_indexes_iters=iters, as_bytes=True,
            search_method="seqbeam", **kw))(params, x))
        assert np.array_equal(sm, direct), "shard_map vs direct mismatch"
        return {"ok": True,
                "detail": f"bit-identical to direct kernel on {sm.shape}"}

    enc = jax.jit(lambda p, x: core.encode(
        p, config, x, refine_indexes_iters=iters, as_bytes=False,
        search_method=method, **kw))
    idx = np.asarray(enc(params, x))
    assert idx.shape == (B, nc), idx.shape
    assert idx.min() >= 0 and idx.max() < 256, (idx.min(), idx.max())
    idx2 = np.asarray(enc(params, x))
    assert np.array_equal(idx, idx2), "non-deterministic indexes"
    # refinement must improve on the argmax init
    logits = core.search.compute_logits(params, config, x)
    init = jnp.argmax(logits, -1).astype(jnp.int32)
    centers = core.scaled_centers(params, config.scale_speed)
    err0 = float(jnp.sum((core.decode_indexes(centers, init) - x) ** 2))
    err1 = float(jnp.sum(
        (core.decode_indexes(centers, jnp.asarray(idx)) - x) ** 2))
    assert err1 < err0, f"no improvement: {err1} !< {err0}"
    return {"ok": True, "detail": f"err {err0:.1f} -> {err1:.1f}"}


def main(only: list[str] | None = None) -> None:
    # --only a,b reruns a subset and merges into the existing table (the
    # untouched entries keep their recorded pass/fail + timestamp context).
    results = {}
    if only:
        try:
            results = json.loads(OUT.read_text())["results"]
        except Exception:
            pass
        unknown = set(only) - set(CONFIGS)
        assert not unknown, f"unknown configs: {sorted(unknown)}"
    for name in only or CONFIGS:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True,
                timeout=float(os.environ.get("QTPU_SMOKE_TIMEOUT", "1500")),
            )
            ok = p.returncode == 0
            detail = (p.stdout.strip().splitlines() or [""])[-1] if ok else \
                " | ".join(t.strip()[:160]
                           for t in (p.stderr or "?").strip().splitlines()[-4:])
        except subprocess.TimeoutExpired as te:
            ok, detail = False, f"timeout after {te.timeout:.0f}s"
        # per-entry timestamp: with --only, untouched entries keep their own
        # generated_unix, so freshness is recorded per result (ADVICE r3)
        results[name] = {
            "ok": ok, "detail": detail, "elapsed_s": round(time.time() - t0, 1),
            "generated_unix": round(time.time(), 1),
        }
        print(f"{'PASS' if ok else 'FAIL':4} {name:28} "
              f"{results[name]['elapsed_s']:7.1f}s  {detail[:120]}", flush=True)
    table = {
        "generated_unix": time.time(),
        "device": _device_str(),
        "results": results,
    }
    OUT.write_text(json.dumps(table, indent=1) + "\n")
    print(f"wrote {OUT}")
    npass = sum(r["ok"] for r in results.values())
    print(f"{npass}/{len(results)} configs passed")


def _device_str() -> str:
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].device_kind)"],
            capture_output=True, text=True, timeout=120)
        return p.stdout.strip().splitlines()[-1] if p.returncode == 0 else "?"
    except Exception:
        return "?"


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        r = run_one(sys.argv[2])
        print(json.dumps(r))
    elif len(sys.argv) >= 3 and sys.argv[1] == "--only":
        main(only=sys.argv[2].split(","))
    else:
        main()
