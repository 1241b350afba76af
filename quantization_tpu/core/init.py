"""Parameter initialization.

Reproduces the distributional init of the reference
(`quantization/quantization.py:38-46`): ``to_logits`` is a torch ``nn.Linear``
whose default init draws weight and bias from U(-1/sqrt(dim), +1/sqrt(dim));
``centers`` starts as a copy of the reshaped predictor weight so that the
argmax of the logits initially points at (a scaled version of) the centers
themselves; the two log-scales start at zero.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .types import QuantizerConfig, QuantizerParams


def init_quantizer_params(
    key: jax.Array, config: QuantizerConfig, dtype=jnp.float32
) -> QuantizerParams:
    nc, cs, dim = config.num_codebooks, config.codebook_size, config.dim
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim)
    w = jax.random.uniform(wkey, (nc * cs, dim), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (nc * cs,), dtype, -bound, bound)
    return QuantizerParams(
        centers=w.reshape(nc, cs, dim),
        to_logits_w=w,
        to_logits_b=b,
        logits_scale=jnp.zeros((), dtype),
        centers_scale=jnp.zeros((), dtype),
    )


def random_id() -> str:
    """8-hex-char quantizer identity (`quantization/quantization.py:49-55`).

    Host-side (not jittable); used to reduce the probability of mixing up the
    outputs of different quantizers.  Round-trips through serialization.
    """
    import binascii
    import os

    return binascii.b2a_hex(os.urandom(4)).decode("utf-8")


def init_quantizer_params_from_centers(
    key: jax.Array, config: QuantizerConfig, centers: jax.Array, dtype=jnp.float32
) -> QuantizerParams:
    """Initialize from externally-fitted codebooks (e.g. a short
    multi-kmeans run — the "k-means-style codebook init" configuration).

    Mirrors the reference's coupling of the two parameter sets, inverted:
    there ``centers`` starts as a clone of ``to_logits.weight``
    (`quantization/quantization.py:38-42`); here ``to_logits`` rows start as
    clones of the supplied centers, so the logits head begins life as a
    matched linear scorer of the fitted codebooks.
    """
    nc, cs, dim = config.num_codebooks, config.codebook_size, config.dim
    assert centers.shape == (nc, cs, dim), (centers.shape, (nc, cs, dim))
    centers = jnp.asarray(centers, dtype)
    _, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim)
    b = jax.random.uniform(bkey, (nc * cs,), dtype, -bound, bound)
    return QuantizerParams(
        centers=centers,
        to_logits_w=centers.reshape(nc * cs, dim),
        to_logits_b=b,
        logits_scale=jnp.zeros((), dtype),
        centers_scale=jnp.zeros((), dtype),
    )
