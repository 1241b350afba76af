"""Pod-wide bulk encode/decode conveniences.

Bulk corpus encoding is embarrassingly parallel over frames (SURVEY.md §2:
the model has no sequence axis); these helpers wrap the sharding plumbing:
codebooks replicated, frames split over the mesh's 'data' axis, output codes
sharded the same way.  On multi-host meshes each host passes its local
shard of frames (e.g. from ``data.ShardStream``) and receives its local
shard of codes — no cross-host data movement at all; GSPMD only inserts
collectives if a sharding actually requires them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core import codec
from ..core.types import QuantizerConfig, QuantizerParams
from .mesh import batch_only_sharding, replicated_sharding


def encode_sharded(
    params: QuantizerParams,
    config: QuantizerConfig,
    x: jax.Array,
    mesh: jax.sharding.Mesh,
    refine_indexes_iters: int = 5,
    search_method: str = "auto",
    **search_kwargs,
) -> jax.Array:
    """Encode (B, dim) frames with B sharded over the mesh's 'data' axis.

    Pure data parallelism (the common case) runs via ``shard_map``: each
    device encodes its local frame block, so the fused Pallas kernel
    searches ("seqbeam", "gramv3", "auto" on TPU) compose with sharding —
    the kernel's internal ``block_b`` padding happens per-shard on the
    device-local batch, and GSPMD never has to partition a custom call it
    cannot see into.  B is padded up to a multiple of the data-axis size
    (the pad frames are encoded and dropped).  Meshes with an active
    'model' axis keep the GSPMD path (params are dim-sharded there), which
    supports the pure-XLA searches only."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        assert search_method in ("auto", "beam", "cd"), (
            f"search_method={search_method!r} requires a Pallas kernel, "
            "which needs replicated codebooks; use a data-only mesh")
        params = jax.device_put(params, replicated_sharding(mesh))
        x = jax.device_put(x, batch_only_sharding(mesh))
        fn = jax.jit(
            lambda p, x: codec.encode(
                p, config, x,
                refine_indexes_iters=refine_indexes_iters,
                search_method=search_method,
                **search_kwargs,
            ),
            out_shardings=batch_only_sharding(mesh),
        )
        return fn(params, x)

    ndata = mesh.shape["data"]
    B = x.shape[0]
    B_pad = -(-B // ndata) * ndata
    if B_pad != B:
        x = jnp.concatenate(
            [x, jnp.zeros((B_pad - B, x.shape[1]), x.dtype)], axis=0
        )
    params = jax.device_put(params, replicated_sharding(mesh))
    x = jax.device_put(x, batch_only_sharding(mesh))

    def local_encode(p, xl):
        return codec.encode(
            p, config, xl,
            refine_indexes_iters=refine_indexes_iters,
            search_method=search_method,
            **search_kwargs,
        )

    fn = jax.jit(
        jax.shard_map(
            local_encode,
            mesh=mesh,
            in_specs=(P(), P("data", None)),
            out_specs=P("data", None),
            check_vma=False,
        )
    )
    return fn(params, x)[:B]


def decode_sharded(
    params: QuantizerParams,
    config: QuantizerConfig,
    codes: jax.Array,
    mesh: jax.sharding.Mesh,
    use_kernel: bool = False,
) -> jax.Array:
    """Decode byte codes with the batch sharded over the 'data' axis."""
    params = jax.device_put(params, replicated_sharding(mesh))
    codes = jax.device_put(codes, batch_only_sharding(mesh))
    fn = jax.jit(
        lambda p, c: codec.decode(p, config, c, use_kernel=use_kernel),
        out_shardings=batch_only_sharding(mesh),
    )
    return fn(params, codes)
