"""quantization_tpu: a TPU-native multi-codebook vector-quantization framework.

Re-implements the full capability surface of danpovey/quantization
(trainable direct-sum codebooks: Quantizer encode/decode/loss, two-phase
QuantizerTrainer, HDF5 out-of-core data path, JointCodebookLoss predictor,
gradient checkpointing, multi-kmeans prototype) as an idiomatic
JAX/XLA/Pallas/pjit framework: a functional core of pure jittable functions
over parameter pytrees, statically-unrolled search schedules, optax
optimization, Pallas TPU kernels for the hot encode/decode paths, and
jax.sharding meshes for data/tensor parallelism.

Public API (superset of the reference's `quantization/__init__.py:1-5`):
  Quantizer, QuantizerTrainer, read_hdf5_data, JointCodebookLoss, checkpoint.
"""

from . import core
from .models.quantizer import Quantizer
from .utils.checkpoint import checkpoint, remat
from .utils.serialization import load_quantizer, save_quantizer

__version__ = "0.2.0"

__all__ = [
    "Quantizer",
    "QuantizerTrainer",
    "JointCodebookLoss",
    "read_hdf5_data",
    "checkpoint",
    "remat",
    "core",
    "load_quantizer",
    "save_quantizer",
    "load_torch_quantizer",
    "save_torch_quantizer",
]


def __getattr__(name):
    # Lazy imports keep `import quantization_tpu` light; the trainer, data
    # path and predictor pull in optax / h5py only when used.
    if name == "QuantizerTrainer":
        from .train.trainer import QuantizerTrainer

        return QuantizerTrainer
    if name == "JointCodebookLoss":
        from .models.prediction import JointCodebookLoss

        return JointCodebookLoss
    if name == "read_hdf5_data":
        from .data.hdf5 import read_hdf5_data

        return read_hdf5_data
    if name in ("load_torch_quantizer", "save_torch_quantizer"):
        from .utils import torch_interop

        return getattr(torch_interop, name)
    raise AttributeError(f"module 'quantization_tpu' has no attribute {name!r}")
