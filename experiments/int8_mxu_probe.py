"""Capability + throughput probe: int8 matmul inside a Pallas TPU kernel
at the seqbeam rescore shapes.

De-risks the round-4 int8-resident-E plan (NOTES_ROUND4.md item 3a): the
rescore is `cross = E @ c_t.T` with E (M*B_s, D) and c_t (cs, D) —
(2048, 512) x (512, 256) at the flagship tile.  This probe runs a chain of
STEPS such matmuls (data-dependent, so XLA cannot collapse them) in one
kernel per dtype pair and reports ms/chain:

  * bf16 x bf16 -> f32   (what the kernel does today)
  * int8 x int8 -> int32 (the 2x-peak path), incl. the per-row rescale +
    requantize VPU work an int8-resident E would pay each step

If the int8 chain is not measurably faster than bf16 end-to-end, the
int8-E rewrite is not worth its complexity.
"""
import functools
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/quantization_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MB, D, CS = 2048, 512, 256
STEPS = 24  # nc steps x 3 passes at the flagship


def bf16_kernel(e_ref, c_ref, out_ref):
    e = e_ref[:, :].astype(jnp.bfloat16)
    for _ in range(STEPS):
        cross = jax.lax.dot_general(
            e, c_ref[:, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (MB, CS)
        # fold the result back into e so steps are serially dependent
        upd = jax.lax.dot_general(
            cross.astype(jnp.bfloat16), c_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * 1e-6
        e = (e.astype(jnp.float32) + upd).astype(jnp.bfloat16)
    out_ref[:, :] = e.astype(jnp.float32)


def int8_kernel(e_ref, c_ref, out_ref):
    # int8-resident e with per-row f32 scales, requantized every step —
    # the full VPU cost an int8-resident E buffer would pay
    ef = e_ref[:, :]
    s = jnp.max(jnp.abs(ef), axis=1, keepdims=True) / 127.0
    e_i8 = jnp.round(ef / s).astype(jnp.int8)
    c_i8 = jnp.round(c_ref[:, :] * 127.0).astype(jnp.int8)
    for _ in range(STEPS):
        cross_i = jax.lax.dot_general(
            e_i8, c_i8,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (MB, CS) int32
        cross = cross_i.astype(jnp.float32) * s * (1.0 / 127.0)
        upd = jax.lax.dot_general(
            jnp.round(cross / jnp.max(jnp.abs(cross)) * 127.0
                      ).astype(jnp.int8),
            c_i8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * 1e-9
        ef = e_i8.astype(jnp.float32) * s + upd
        s = jnp.max(jnp.abs(ef), axis=1, keepdims=True) / 127.0
        e_i8 = jnp.round(ef / s).astype(jnp.int8)
    out_ref[:, :] = ef


def run(kernel, tag):
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((MB, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CS, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (MB, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MB, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("QTPU_INTERPRET")),
    )
    f = jax.jit(f)
    e = jax.random.normal(jax.random.PRNGKey(0), (MB, D), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(1), (CS, D), jnp.float32) * 0.05
    try:
        np.asarray(f(e, c))  # compile + smoke
    except Exception as ex:
        print(f"{tag}: FAILED {type(ex).__name__}: {str(ex)[:400]}",
              flush=True)
        return
    N = 50
    es = [jax.device_put(e + i * 1e-3) for i in range(4)]
    jax.block_until_ready(es)
    t0 = time.perf_counter()
    outs = [f(es[i % 4], c) for i in range(N)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / N
    flops = 2.0 * STEPS * 2 * MB * D * CS  # two matmuls per step
    print(f"{tag}: {dt*1e3:.3f} ms/chain  "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    run(bf16_kernel, "bf16xbf16->f32")
    run(int8_kernel, "int8xint8->int32 (+requant VPU)")
