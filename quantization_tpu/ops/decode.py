"""Fused decode kernel: byte-unpack + per-codebook one-hot matmul + sum.

The reference decodes with a torch gather over (nc, cs, dim) centers and a
sum over codebooks (`quantization/quantization.py:117-148`).  XLA's gather
lowering reaches ~5M vec/s on v5e; this kernel keeps the codebooks resident
in VMEM and turns each codebook's row-pick into a (B_t, cs) x (cs, dim)
bf16 MXU matmul accumulated in f32 — decode becomes pure matrix work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import QuantizerConfig, QuantizerParams, scaled_centers
from ..core import codec as _codec


def DECODE_KERNEL_SUPPORTED(config: QuantizerConfig) -> bool:
    return (
        config.dim % 128 == 0
        and config.dim >= 128
        and config.codebook_size in (16, 256)
        and config.num_codebooks <= 32
    )


def _decode_kernel(idx_ref, centers_ref, out_ref, *, B_t, D, nc, cs):
    lane_cs = jax.lax.broadcasted_iota(jnp.int32, (B_t, cs), 1)
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (B_t, nc), 1)
    idx = idx_ref[:]  # (B_t, nc) int32 (already unpacked)
    acc = jnp.zeros((B_t, D), jnp.float32)
    for n in range(nc):
        # column n of idx, extracted with a lane-masked reduce (column
        # slices carry lane-offset layouts Mosaic rejects downstream)
        col = jnp.sum(jnp.where(lane_nc == n, idx, 0), axis=1, keepdims=True)
        onehot = (lane_cs == col).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            onehot,
            centers_ref[n * cs : (n + 1) * cs, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("config", "block_b", "interpret"))
def decode_kernel(
    params: QuantizerParams,
    config: QuantizerConfig,
    indexes: jax.Array,
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Reconstruct (*, dim) float32 from (possibly byte-packed) indexes."""
    assert DECODE_KERNEL_SUPPORTED(config), config
    nc, cs, D = config.num_codebooks, config.codebook_size, config.dim
    lead = indexes.shape[:-1]
    idx = indexes.reshape(-1, indexes.shape[-1])
    idx = _codec.unpack_indexes(idx, cs, nc)  # (B, nc) int32
    B = idx.shape[0]
    B_pad = -(-B // block_b) * block_b
    if B_pad != B:
        idx = jnp.concatenate(
            [idx, jnp.zeros((B_pad - B, nc), jnp.int32)], axis=0
        )
    centers = scaled_centers(params, config.scale_speed).astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, B_t=block_b, D=D, nc=nc, cs=cs),
        grid=(B_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, nc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nc * cs, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, D), jnp.float32),
        interpret=interpret,
    )(idx, centers.reshape(nc * cs, D))
    return out[:B].reshape(*lead, D)
