"""Diagnostics: codebook subspace-correlation matrix.

Port of `quantization/quantization.py:150-181`: for mean-centered codebooks
with uncentered variances S_i, returns c_ij = tr(S_i S_j) / sqrt(c_ii c_jj),
a symmetric (nc, nc) matrix in [0, 1] measuring how strongly pairs of
codebooks share a subspace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import precision as _precision
from .types import QuantizerConfig, QuantizerParams, scaled_centers


def codebook_correlations(
    params: QuantizerParams, config: QuantizerConfig
) -> jax.Array:
    centers = jax.lax.stop_gradient(scaled_centers(params, config.scale_speed))
    centers = centers - centers.mean(axis=1, keepdims=True)
    # variances: (nc, dim, dim); tr(S_i S_j) = <S_i, S_j>_F for symmetric S.
    variances = jnp.einsum(
        "nkd,nke->nde",
        centers,
        centers,
        precision=_precision.MATMUL_PRECISION,
        preferred_element_type=jnp.float32,
    )
    flat = variances.reshape(config.num_codebooks, -1)
    cross = jnp.dot(flat, flat.T, precision=_precision.MATMUL_PRECISION)
    norm = jax.lax.rsqrt(jnp.diag(cross))
    return cross * norm[None, :] * norm[:, None]
