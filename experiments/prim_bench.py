"""Mosaic primitive micro-benchmarks for the seqbeam kernel pieces.

Times tiny single-purpose Pallas kernels that repeat ONE primitive K times
on VMEM-resident data, so per-iteration device cost = slope between K and
2K runs (subtracts fixed launch/compile-cache overhead).

Primitives: packed-min round over (rows, 128) [the selection unit],
8-row grouped sublane gather of (8, N) [the reorder unit],
(rows, D) x (D, cs) bf16 matmul [the rescore unit],
elementwise fused score assembly over (rows, cs).

Usage: python experiments/prim_bench.py
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
MASK = 255


def timeit(f, x, n=8):
    np.asarray(f(x))
    xs = [x + i for i in range(n)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [f(v) for v in xs]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / n


def minround_kernel(x_ref, o_ref, *, K, rows):
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    bits = pltpu.bitcast(jnp.maximum(x_ref[:], 0.0), jnp.int32)
    enc = pltpu.bitcast((bits & ~MASK) | lane, jnp.float32)

    def body(i, enc):
        emin = jnp.min(enc, axis=1, keepdims=True)
        pos = pltpu.bitcast(emin, jnp.int32) & MASK
        return jnp.where(lane == pos, _INF, enc)

    enc = jax.lax.fori_loop(0, K, body, enc)
    o_ref[:] = enc


def gather_kernel(x_ref, idx_ref, o_ref, *, K, N):
    def body(i, acc):
        idx = (idx_ref[:] + i) % 8
        return acc + jnp.take_along_axis(x_ref[:], idx, axis=0)

    o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((8, N), jnp.float32))


def matmul_kernel(a_ref, b_ref, o_ref, *, K):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            (a_ref[:] + i).astype(jnp.bfloat16), b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, K, body, jnp.zeros((a_ref.shape[0], b_ref.shape[0]), jnp.float32))


def assembly_kernel(x_ref, o_ref, *, K, rows, cs):
    col = jnp.sum(x_ref[:, 0:1], axis=1, keepdims=True)
    row = x_ref[0:1, :]

    def body(i, acc):
        return (acc - 2.0 * col) + row + 2.0 * (acc - row)

    o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])


def run(name, kernel, args, out_shape, scratch=()):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))
    return f


def slope(make, x, K1=32, K2=96):
    t1 = timeit(make(K1), x)
    t2 = timeit(make(K2), x)
    return (t2 - t1) / (K2 - K1)


rows = 1024
key = jax.random.PRNGKey(0)

# 1. packed-min round (the selection unit) over (1024, 128)
x = jax.random.uniform(key, (rows, 128), jnp.float32) + 1.0
mk = lambda K: run("minround", functools.partial(minround_kernel, K=K, rows=rows),
                   (x,), jax.ShapeDtypeStruct((rows, 128), jnp.float32))
per = slope(mk, x)
print(f"packed-min round (1024,128): {per*1e6:7.2f} us/round", flush=True)

# 2. grouped 8-row gather of (8, 65536) f32 (the M=8 reorder unit)
N = 128 * 512
tbl = jax.random.uniform(key, (8, N), jnp.float32)
idx = jnp.zeros((8, N), jnp.int32)
mk = lambda K: jax.jit(lambda t, ix: pl.pallas_call(
    functools.partial(gather_kernel, K=K, N=N),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(t, ix))
t1 = timeit(lambda t: mk(16)(t, idx), tbl)
t2 = timeit(lambda t: mk(48)(t, idx), tbl)
print(f"8-row gather (8,65536) f32: {(t2-t1)/32*1e6:7.2f} us/gather", flush=True)

# 3. rescore matmul (1024,512)x(512->256)
a = jax.random.uniform(key, (rows, 512), jnp.float32)
b = jax.random.uniform(key, (256, 512), jnp.bfloat16)
mk = lambda K: jax.jit(lambda a_: pl.pallas_call(
    functools.partial(matmul_kernel, K=K),
    out_shape=jax.ShapeDtypeStruct((rows, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a_, b))
t1 = timeit(mk(16), a)
t2 = timeit(mk(48), a)
print(f"matmul (1024,512)x(512,256) bf16: {(t2-t1)/32*1e6:7.2f} us/mm", flush=True)

# 4. fused elementwise assembly over (1024, 256)
xa = jax.random.uniform(key, (rows, 256), jnp.float32)
mk = lambda K: run("assembly", functools.partial(assembly_kernel, K=K, rows=rows, cs=256),
                   (xa,), jax.ShapeDtypeStruct((rows, 256), jnp.float32))
per = slope(mk, xa)
print(f"fused assembly pass (1024,256): {per*1e6:7.2f} us/pass", flush=True)
