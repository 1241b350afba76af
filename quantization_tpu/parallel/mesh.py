"""Device mesh and sharding layer.

The reference is strictly single-process, single-GPU (SURVEY.md section 2:
zero distributed code).  This module is the TPU-native scaling layer the
reference lacks:

* a 1- or 2-axis ``jax.sharding.Mesh``: ``'data'`` over frames (the i.i.d.
  axis of this model family — there is no sequence axis) and optional
  ``'model'`` over the feature dimension ``dim`` (tensor parallelism for very
  large dims),
* sharding builders: frames ``P('data', 'model')``, codebooks split over
  ``'model'`` on their last (dim) axis, everything else replicated,
* GSPMD then inserts the psum/all-gather collectives over ICI from these
  annotations — the TPU equivalent of the NCCL layer the reference never had.

Multi-host: call :func:`init_distributed` once per process before building
the mesh; each host then feeds its own shard of the corpus (see
``quantization_tpu.data.hdf5``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import QuantizerParams


def init_distributed(**kwargs) -> None:
    """Initialize JAX's multi-host runtime (no-op if already initialized).

    Genuine init failures (bad coordinator address, timeout, ...) propagate;
    only the benign "already initialized" case is swallowed."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        # jax's double-init message is "distributed.initialize should only
        # be called once."; older versions said "already initialized".
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices.

    ``num_data`` defaults to ``len(devices) // num_model``.
    """
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model <= len(devices), (
        num_data,
        num_model,
        len(devices),
    )
    arr = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model
    )
    return Mesh(arr, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, dim) frame batches: batch over 'data', dim over
    'model' (when present)."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return NamedSharding(mesh, P("data", "model"))
    return NamedSharding(mesh, P("data"))


def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) outputs like codes: batch over 'data' only."""
    return NamedSharding(mesh, P("data"))


def quantizer_param_sharding(mesh: Mesh) -> QuantizerParams:
    """Sharding pytree for :class:`QuantizerParams`: codebooks and predictor
    weights split over 'model' on their dim axis, small leaves replicated.
    With num_model == 1 this degenerates to full replication."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        centers = NamedSharding(mesh, P(None, None, "model"))
        w = NamedSharding(mesh, P(None, "model"))
    else:
        centers = NamedSharding(mesh, P())
        w = NamedSharding(mesh, P())
    repl = NamedSharding(mesh, P())
    return QuantizerParams(
        centers=centers,
        to_logits_w=w,
        to_logits_b=repl,
        logits_scale=repl,
        centers_scale=repl,
    )


def shard_params(params: QuantizerParams, mesh: Mesh) -> QuantizerParams:
    return jax.device_put(params, quantizer_param_sharding(mesh))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, data_sharding(mesh))
