"""Functional core of the TPU-native multi-codebook quantizer.

Pure, jittable functions over a :class:`QuantizerParams` pytree and a static
:class:`QuantizerConfig`.  The object-oriented wrapper with the reference's
API lives in :mod:`quantization_tpu.models.quantizer`.
"""

from .codec import (
    decode,
    decode_indexes,
    decode_onehot,
    encode,
    pack_indexes,
    unpack_indexes,
)
from .diagnostics import codebook_correlations
from .growth import product_params
from .init import (
    init_quantizer_params,
    init_quantizer_params_from_centers,
    random_id,
)
from .losses import compute_loss
from .search import (
    compute_indexes,
    compute_logits,
    k_cutoff_schedule,
    refine_indexes,
    search_plan,
)
from .types import (
    QuantizerConfig,
    QuantizerLosses,
    QuantizerParams,
    data_mean,
    scaled_centers,
)

__all__ = [
    "QuantizerConfig",
    "QuantizerLosses",
    "QuantizerParams",
    "codebook_correlations",
    "compute_indexes",
    "compute_logits",
    "compute_loss",
    "data_mean",
    "decode",
    "decode_indexes",
    "decode_onehot",
    "encode",
    "init_quantizer_params",
    "init_quantizer_params_from_centers",
    "k_cutoff_schedule",
    "pack_indexes",
    "product_params",
    "random_id",
    "refine_indexes",
    "scaled_centers",
    "search_plan",
    "unpack_indexes",
]
