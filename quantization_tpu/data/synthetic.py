"""Synthetic data generators used by tests, the parity suite, and the bench.

``make_mlp_sampler`` reproduces the reference's "typical neural-net output"
distribution (`quantization/test_quantization.py:16-32`): a 3-layer random
MLP with ReLUs and a LayerNorm, plus a 0.05 x residual so the output isn't
confined to a subspace.  ``make_double_sampler`` is the concat-of-two-halves
variant of `quantization/test_quantization.py:87-110`; ``gaussian_sampler``
matches the pure-Gaussian rate-distortion suite
(`quantization/test_quantization.py:51-84`).
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp


def _linear_params(key, d_in, d_out):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(wkey, (d_out, d_in), jnp.float32, -bound, bound)
    b = jax.random.uniform(bkey, (d_out,), jnp.float32, -bound, bound)
    return w, b


def make_mlp_sampler(dim: int, key: jax.Array) -> Callable[[jax.Array, int], jax.Array]:
    """Returns sample(key, batch) -> (batch, dim) frames with the reference's
    MLP-synthetic distribution."""
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = _linear_params(k1, dim, dim)
    w2, b2 = _linear_params(k2, dim, dim)
    w3, b3 = _linear_params(k3, dim, dim)

    def layer_norm(h):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5)

    @functools.partial(jax.jit, static_argnums=1)
    def sample(key, batch):
        x = jax.random.normal(key, (batch, dim))
        h = jax.nn.relu(x @ w1.T + b1)
        h = jax.nn.relu(h @ w2.T + b2)
        h = layer_norm(h)
        h = h @ w3.T + b3
        return h + 0.05 * x

    return lambda key, batch: sample(key, batch)


def make_double_sampler(dim: int, key: jax.Array):
    """(batch, dim) frames formed by concatenating two independent dim/2
    draws from two independent MLP samplers
    (`quantization/test_quantization.py:87-110`)."""
    k1, k2 = jax.random.split(key)
    half = dim // 2
    s1 = make_mlp_sampler(half, k1)
    s2 = make_mlp_sampler(half, k2)

    def sample(key, batch):
        ka, kb = jax.random.split(key)
        return jnp.concatenate([s1(ka, batch), s2(kb, batch)], axis=-1)

    return sample


def gaussian_sampler(dim: int):
    def sample(key, batch):
        return jax.random.normal(key, (batch, dim))

    return sample


def shannon_distortion(dim: int, bytes_per_frame: int) -> float:
    """Rate-distortion bound for unit Gaussian data: D = 2**(-2R) with
    R = 8 * bytes_per_frame / dim bits per dimension
    (`quantization/test_quantization.py:56-61`)."""
    rate = 8.0 * bytes_per_frame / dim
    return 2.0 ** (-2.0 * rate)
