"""Full benchmark sweep on the real chip: encode (beam/seqbeam/cd), decode,
and trainer steps/s, at the two reference configs.  Writes
experiments/bench_suite.json.

Run AFTER the parity trainings so trained quantizers exist
(q{dim}_{bpf}_full.npz); falls back to random params otherwise (throughput
is index-content independent).
"""
import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from quantization_tpu import core
from quantization_tpu.utils.serialization import load_quantizer
from quantization_tpu.ops.seqbeam import SEQBEAM_SUPPORTED

HERE = pathlib.Path(__file__).parent
results = {}


def fetch_time(fn, args, nbatch=5, make_fresh=None):
    outs = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(outs)[0])
    batches = [make_fresh(i) for i in range(nbatch)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    outs = [fn(*(list(args[:-1]) + [b])) for b in batches]
    # fetch only the last output: all dispatches share one device stream, so
    # its completion fences the rest with a single tunnel round-trip
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / nbatch


for dim, bpf in ((256, 4), (512, 8)):
    cfg = core.QuantizerConfig(dim=dim, codebook_size=256, num_codebooks=bpf)
    path = HERE / f"q{dim}_{bpf}_full.npz"
    if path.exists():
        params = load_quantizer(path).params
    else:
        params = core.init_quantizer_params(jax.random.PRNGKey(0), cfg)
    B = 8192
    mk = lambda i: jax.random.normal(jax.random.PRNGKey(100 + i), (B, dim))

    # "seqbeam" here is the SHIPPED auto config (core/codec.py): altparity
    # pool schedule, block_b=256, interleave=2, select-tree reorder, bf16 E,
    # 2 passes at dim=256 / 3 at dim=512 — the same config bench.py
    # measures, so the suite and the headline artifact agree up to
    # B / dispatch pattern.
    auto_kw = dict(M=8, R=4, pool_mask="altparity", block_b=256, interleave=2,
                   reorder="select", e_dtype="bf16")
    from quantization_tpu.ops.gramv3 import GRAMV3_SUPPORTED

    for label, method, iters, kw in (
        ("beam", "beam", 5, {}),
        ("seqbeam", "seqbeam", 2 if dim == 256 else 3, auto_kw),
        ("gramv3int8", "gramv3", 3,
         dict(M=8, R=4, g_dtype="int8", block_b=256, interleave=2)),
        ("cd", "cd", 5, {}),
    ):
        if method == "seqbeam" and not SEQBEAM_SUPPORTED(cfg):
            continue
        if method == "gramv3" and not GRAMV3_SUPPORTED(cfg):
            continue
        f = jax.jit(
            lambda p, x, m=method, it=iters, k=kw: core.encode(
                p, cfg, x, refine_indexes_iters=it, search_method=m, **k
            )
        )
        dt = fetch_time(f, (params, mk(99)), make_fresh=mk)
        results[f"encode_{label}_d{dim}_b{bpf}_vec_s"] = round(B / dt, 1)

    # decode (reduce the output on device: fetching (B, dim) f32 through
    # the tunnel would dominate the measurement)
    codes = jax.jit(lambda p, x: core.encode(p, cfg, x, 1))(params, mk(98))
    fdec = jax.jit(lambda p, c: core.decode(p, cfg, c).sum(axis=0)[:8])
    mkc = lambda i: jnp.uint8(
        jax.random.randint(jax.random.PRNGKey(i), codes.shape, 0, 256)
    )
    dt = fetch_time(fdec, (params, codes), make_fresh=mkc)
    results[f"decode_d{dim}_b{bpf}_vec_s"] = round(B / dt, 1)

print(json.dumps(results, indent=1), flush=True)
(HERE / "bench_suite.json").write_text(json.dumps(results))
