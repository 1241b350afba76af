"""Core types for the TPU-native multi-codebook quantizer.

The reference implementation (danpovey/quantization, `quantization/quantization.py:16-79`)
stores state in a torch ``nn.Module``.  Here the design is functional: a static,
hashable :class:`QuantizerConfig` (usable as a ``jax.jit`` static argument) plus a
:class:`QuantizerParams` pytree of arrays.  All compute functions are pure and
jittable; XLA sees static shapes derived from the config.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _is_power_of_two(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Static configuration of a multi-codebook quantizer.

    Mirrors the constructor arguments of the reference Quantizer
    (`quantization/quantization.py:20-36`): ``dim``, ``codebook_size`` and
    ``num_codebooks`` must satisfy the same power-of-two constraints.
    ``scale_speed`` is the learning-rate multiplier applied to the two learned
    log-scales (`quantization/quantization.py:46`).
    """

    dim: int
    codebook_size: int
    num_codebooks: int
    scale_speed: float = 10.0

    def __post_init__(self):
        assert _is_power_of_two(self.codebook_size), self.codebook_size
        assert _is_power_of_two(self.num_codebooks), self.num_codebooks

    @property
    def bytes_per_frame(self) -> int:
        """Number of uint8 bytes produced per frame by packed encode."""
        cs, n = self.codebook_size, self.num_codebooks
        while cs ** 2 <= 256:
            cs = cs ** 2
            n //= 2
        return n

    def product_config(self) -> "QuantizerConfig":
        """Config after one product-growth step (cs -> cs**2, nc -> nc//2);
        see `quantization/quantization.py:87-88`."""
        return QuantizerConfig(
            dim=self.dim,
            codebook_size=self.codebook_size ** 2,
            num_codebooks=self.num_codebooks // 2,
            scale_speed=self.scale_speed,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizerParams:
    """Trainable parameter pytree.

    Matches the reference parameter set (`quantization/quantization.py:38-46`):
      - ``to_logits_w``: (num_codebooks * codebook_size, dim) index-predictor weight
      - ``to_logits_b``: (num_codebooks * codebook_size,) bias
      - ``centers``: (num_codebooks, codebook_size, dim), initialized as a copy of
        the reshaped predictor weight
      - ``logits_scale``, ``centers_scale``: learned scalar log-scales
    """

    centers: jax.Array
    to_logits_w: jax.Array
    to_logits_b: jax.Array
    logits_scale: jax.Array
    centers_scale: jax.Array

    @property
    def num_codebooks(self) -> int:
        return self.centers.shape[0]

    @property
    def codebook_size(self) -> int:
        return self.centers.shape[1]

    @property
    def dim(self) -> int:
        return self.centers.shape[2]


class QuantizerLosses(NamedTuple):
    """The four loss terms returned by ``compute_loss``; mirrors the tuple
    documented at `quantization/quantization.py:193-209`."""

    rel_reconstruction_loss: jax.Array
    logprob_loss: jax.Array
    logits_entropy_loss: jax.Array
    index_entropy_loss: jax.Array


def scaled_centers(params: QuantizerParams, scale_speed: float) -> jax.Array:
    """Effective codebook centers ``exp(centers_scale * scale_speed) * centers``
    (`quantization/quantization.py:77-79`)."""
    return jnp.exp(params.centers_scale * scale_speed) * params.centers


def data_mean(params: QuantizerParams, scale_speed: float) -> jax.Array:
    """Approximate training-data mean: mean of each codebook's centers summed
    over codebooks, detached (`quantization/quantization.py:67-75`)."""
    return jax.lax.stop_gradient(
        scaled_centers(params, scale_speed).mean(axis=1).sum(axis=0)
    )
