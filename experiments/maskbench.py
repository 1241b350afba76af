"""Seqbeam pool_mask schedule micro-benchmark on the real chip.

Usage: python experiments/maskbench.py [B] [dim] [nc] [schedule ...]
Schedules: allpool, altparity, even, odd, r1, third, rotthird, pass12
"""
import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import os
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/quantization_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from quantization_tpu import core
from quantization_tpu.ops import seqbeam

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
nc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
cfg = core.QuantizerConfig(dim=dim, codebook_size=256, num_codebooks=nc)
params = core.init_quantizer_params(jax.random.PRNGKey(0), cfg)
mk = lambda i: jax.random.normal(jax.random.PRNGKey(100 + i), (B, dim))

EVEN = tuple(t % 2 == 0 for t in range(nc))
ODD = tuple(t % 2 == 1 for t in range(nc))
ALL = (True,) * nc
NONE = (False,) * nc
TH = [tuple(t % 3 == k for t in range(nc)) for k in range(3)]

SCHED = {
    "allpool": None,
    "altparity": (EVEN, ODD, EVEN),
    "even": EVEN,
    "odd": ODD,
    "r1": NONE,
    "third": TH[2],
    "rotthird": (TH[0], TH[1], TH[2]),
    "pass12": (NONE, ALL, ALL),
    # 2-pass mixed schedules (sim_pool_quality.py screening)
    "allfirst": (ALL, EVEN),
    "alllast": (EVEN, ALL),
}


def fetch_time(fn, nbatch=8):
    np.asarray(fn(mk(99)))  # compile
    batches = [mk(i) for i in range(nbatch)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    outs = [fn(b) for b in batches]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / nbatch


names = sys.argv[4:] or ["allpool", "altparity", "even", "r1"]
results = {}
for name in names:
    # name syntax: sched[:block_b[:interleave[:flag...]]]
    # flags: xv = cross_value, sel = reorder="select",
    #        wsel = reorder="wideselect", ebf = e_dtype="bf16",
    #        ei8 = e_dtype="int8" (int8-resident E, implies sel),
    #        ei8f = int8 E with per-pass fixed scales (requant="pass"),
    #        ei8b = int8 E with bound-propagated scales (requant="bound"),
    #        m<N>/r<N>/p<N> = M/R/passes, z<N> = zip_skew,
    #        sf = sel_impl="fold" (single-fold equality-masked selection),
    #        lz = lazy_r1 (defer R1 deltas into the next pool step),
    #        fi = init_precision="default" (single-pass bf16 init logits),
    #        v3 = gramv3 kernel (bf16 tables), v3i8 = gramv3 int8 tables
    parts = name.split(":")
    mask = SCHED[parts[0]]
    bb = int(parts[1]) if len(parts) > 1 else 128
    il = int(parts[2]) if len(parts) > 2 else 1
    flags = parts[3:]
    xv = "xv" in flags
    ed = ("int8" if "ei8" in flags or "ei8f" in flags or "ei8b" in flags
          else "bf16" if "ebf" in flags else "f32")
    rq = ("pass" if "ei8f" in flags
          else "bound" if "ei8b" in flags else "step")
    ro = ("wideselect" if "wsel" in flags
          else "select" if "sel" in flags else "gather")
    si = "fold" if "sf" in flags else "lohi"
    lz = "lz" in flags
    M = R = p = zs = None
    for fl in flags:
        if fl and fl[0] in "mrpz" and fl[1:].isdigit():
            M = int(fl[1:]) if fl[0] == "m" else M
            R = int(fl[1:]) if fl[0] == "r" else R
            p = int(fl[1:]) if fl[0] == "p" else p
            zs = int(fl[1:]) if fl[0] == "z" else zs
    M, R, p, zs = M or 8, R or 4, p or 3, zs or 0
    if isinstance(mask, tuple) and isinstance(mask[0], tuple) and len(mask) != p:
        mask = tuple(mask[i % len(mask)] for i in range(p))
    if "v3" in flags or "v3i8" in flags:
        from quantization_tpu.ops.gramv3 import gramv3_encode_indexes

        gd = "int8" if "v3i8" in flags else "bf16"
        f = jax.jit(lambda x, m=mask, bb=bb, il=il, M=M, R=R, p=p, gd=gd:
                    gramv3_encode_indexes(
            params, cfg, x, M=M, R=R, passes=p, pool_mask=m, block_b=bb,
            interleave=il, g_dtype=gd))
    else:
        ip = "default" if "fi" in flags else "highest"
        f = jax.jit(lambda x, m=mask, bb=bb, il=il, xv=xv, ro=ro, M=M, R=R,
                    p=p, ed=ed, rq=rq, zs=zs, ip=ip, si=si, lz=lz:
                    seqbeam.seqbeam_encode_indexes(
            params, cfg, x, M=M, R=R, passes=p, pool_mask=m, block_b=bb,
            interleave=il, cross_value=xv, reorder=ro, e_dtype=ed,
            requant=rq, zip_skew=zs, init_precision=ip, sel_impl=si,
            lazy_r1=lz))
    try:
        t0 = time.perf_counter()
        dt = fetch_time(f)
        results[name] = dict(ms=round(dt * 1e3, 2), vec_s=round(B / dt, 1))
        print(f"{name:12s} {dt*1e3:8.2f} ms  {B/dt/1e3:9.1f} K vec/s "
              f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
print(json.dumps(results))
