"""Multi-codebook k-means-style quantizer (Gibbs-refinement prototype).

TPU-native equivalent of the reference's experimental `multi_kmeans.py`
(repo root, unpackaged): no logits predictor — indexes come from iterative
per-codebook refinement.  Training uses *stochastic* refinement
(`multi_kmeans.py:238-326`): sample each codebook's index from a softmax over
negative squared errors with a learned temperature (``frame_entropy_scale``),
yielding a differentiable expected-sum-squared loss plus entropy
diagnostics.  Inference uses exact per-codebook coordinate descent
(`multi_kmeans.py:199-235`).

Repairs over the reference prototype (flagged bit-rotted in SURVEY.md
section 2 #13): ``compute_ref_loss`` calls nonexistent helpers
(`multi_kmeans.py:78,90`) and ``encode_as_bytes`` is an empty stub
(`multi_kmeans.py:169-172`); both are implemented properly here.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import codec
from ..core import precision as _precision


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiKmeansParams:
    centers: jax.Array  # (nc, cs, dim)
    frame_entropy_scale: jax.Array  # scalar; exp(10 * it) scales the softmax


class StochasticRefineOut(NamedTuple):
    indexes: jax.Array  # (B, nc) int32, sampled
    entropy_loss: jax.Array  # log(cs) - class entropy (scalar)
    frame_entropy: jax.Array  # average per-frame sampling entropy (scalar)
    reconstruction_loss: jax.Array  # expected sumsq / sumsq(x) (scalar)


def init_multi_kmeans_params(
    key: jax.Array, dim: int, codebook_size: int, num_codebooks: int
) -> MultiKmeansParams:
    """centers ~ dim**-0.5 * randn (`multi_kmeans.py:32`)."""
    return MultiKmeansParams(
        centers=(dim ** -0.5)
        * jax.random.normal(key, (num_codebooks, codebook_size, dim)),
        frame_entropy_scale=jnp.zeros(()),
    )


def _modified_sumsq(centers: jax.Array, x: jax.Array, indexes: jax.Array):
    """(B, nc, cs) matrix of ||x_err - c_old[n] + c[n,k]||^2: the total squared
    error if codebook n's choice were changed to k, others fixed.  Computed
    without materializing the (B, nc, cs, dim) error tensor (the reference's
    own TODO at `multi_kmeans.py:229,287`): expand to x_rem_sumsq +
    centers_sumsq + 2 <x_rem, c> with the cross term as an MXU matmul."""
    nc = centers.shape[0]
    old = centers[jnp.arange(nc)[None, :], indexes]  # (B, nc, dim)
    x_err = old.sum(axis=1) - x  # (B, dim)
    x_rem = x_err[:, None, :] - old  # (B, nc, dim)
    x_rem_sumsq = jnp.sum(x_rem * x_rem, axis=-1)  # (B, nc)
    c_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs)
    cross = jnp.einsum(
        "bnd,nkd->bnk",
        x_rem,
        centers,
        precision=_precision.MATMUL_PRECISION,
        preferred_element_type=jnp.float32,
    )
    return x_rem_sumsq[:, :, None] + c_sumsq[None] + 2.0 * cross


def refine_indexes(
    params: MultiKmeansParams, x: jax.Array, indexes: jax.Array
) -> jax.Array:
    """Exact coordinate-descent pass: per codebook, pick the argmin
    (`multi_kmeans.py:199-235`)."""
    sumsq = _modified_sumsq(params.centers, x, indexes.astype(jnp.int32))
    return jnp.argmin(sumsq, axis=2).astype(jnp.int32)


def refine_indexes_stochastic(
    params: MultiKmeansParams,
    x: jax.Array,
    indexes: jax.Array,
    key: jax.Array,
) -> StochasticRefineOut:
    """Gibbs-style stochastic refinement with losses
    (`multi_kmeans.py:238-326`).  The temperature gradient flows only through
    ``frame_entropy`` (scale detached elsewhere), and the center gradient only
    through the expected-sumsq term — same stop-gradient routing as the
    reference's .detach() placement."""
    cs = params.centers.shape[1]
    nc = params.centers.shape[0]
    sumsq = _modified_sumsq(params.centers, x, indexes.astype(jnp.int32))

    # Sampling distribution and per-frame entropy: gradient reaches ONLY
    # frame_entropy_scale (`multi_kmeans.py:296-305`).
    scale = jnp.exp(10.0 * params.frame_entropy_scale)
    neg_scaled_det = -jax.lax.stop_gradient(sumsq) * scale
    logprobs_det = jax.nn.log_softmax(neg_scaled_det, axis=-1)
    new_indexes = jax.random.categorical(key, logprobs_det, axis=-1).astype(
        jnp.int32
    )
    probs_det = jnp.exp(logprobs_det)
    frame_entropy = -(logprobs_det * probs_det).sum(axis=-1).mean()

    # Expected sumsq: gradient reaches ONLY the centers (scale detached;
    # `multi_kmeans.py:308-317`).
    neg_scaled = -sumsq * jax.lax.stop_gradient(scale)
    probs = jax.nn.softmax(neg_scaled, axis=-1)
    expected_sumsq = (probs * sumsq).sum() / nc
    reconstruction_loss = expected_sumsq / jnp.sum(x * x)

    avg_probs = probs.mean(axis=0)  # (nc, cs)
    class_entropy = -(avg_probs * jnp.log(avg_probs + 1e-20)).sum(axis=1).mean()
    entropy_loss = math.log(cs) - class_entropy

    return StochasticRefineOut(
        indexes=new_indexes,
        entropy_loss=entropy_loss,
        frame_entropy=frame_entropy,
        reconstruction_loss=reconstruction_loss,
    )


def forward(
    params: MultiKmeansParams,
    x: jax.Array,
    key: jax.Array,
    num_iters: int = 4,
) -> StochasticRefineOut:
    """Training forward: random index init then ``num_iters`` stochastic
    refinements; returns the last iteration's sampled indexes and losses
    (`multi_kmeans.py:108-143`)."""
    x = x.reshape(-1, params.centers.shape[-1])
    B = x.shape[0]
    cs = params.centers.shape[1]
    nc = params.centers.shape[0]
    init_key, key = jax.random.split(key)
    # reference: torch.randint(codebook_size - 1, ...) — excludes the last
    # entry on the *init* draw only (`multi_kmeans.py:133`).
    indexes = jax.random.randint(init_key, (B, nc), 0, max(cs - 1, 1))
    out = None
    for _ in range(num_iters):
        key, sub = jax.random.split(key)
        out = refine_indexes_stochastic(params, x, indexes, sub)
        indexes = out.indexes
    return out


def encode(
    params: MultiKmeansParams,
    x: jax.Array,
    num_iters: int = 4,
    as_bytes: bool = False,
) -> jax.Array:
    """Deterministic encode: zero init + ``num_iters`` coordinate-descent
    passes (`multi_kmeans.py:146-166`); optional byte packing (implementing
    the reference's empty ``encode_as_bytes`` stub)."""
    lead = x.shape[:-1]
    x = x.reshape(-1, params.centers.shape[-1])
    nc, cs = params.centers.shape[0], params.centers.shape[1]
    indexes = jnp.zeros((x.shape[0], nc), dtype=jnp.int32)
    for _ in range(num_iters):
        indexes = refine_indexes(params, x, indexes)
    if as_bytes:
        indexes = codec.pack_indexes(indexes, cs)
    return indexes.reshape(*lead, -1)


def decode(params: MultiKmeansParams, indexes: jax.Array) -> jax.Array:
    """Gather-and-sum reconstruction (`multi_kmeans.py:174-197`); accepts
    byte-packed input from ``encode(..., as_bytes=True)``."""
    lead = indexes.shape[:-1]
    nc, cs, dim = params.centers.shape
    idx = indexes.reshape(-1, indexes.shape[-1])
    idx = codec.unpack_indexes(idx, cs, nc)
    return codec.decode_indexes(params.centers, idx).reshape(*lead, dim)


def compute_ref_loss(params: MultiKmeansParams, x: jax.Array) -> jax.Array:
    """Deterministic relative reconstruction loss sum((x_hat - x)^2)/sum(x^2).

    The reference's version (`multi_kmeans.py:64-106`) calls helpers that do
    not exist on the class; its test driver instead measures
    decode(encode(x)) (`multi_kmeans.py:383`), which is what we implement.
    """
    x2 = x.reshape(-1, params.centers.shape[-1])
    recon = decode(params, encode(params, x2))
    return jnp.sum((recon - x2) ** 2) / (jnp.sum(x2 * x2) + 1e-20)


def product_params(params: MultiKmeansParams) -> MultiKmeansParams:
    """(nc, cs) -> (nc/2, cs^2) growth by pairwise center sums
    (`multi_kmeans.py:40-61`), vectorized as in core.growth."""
    nc, cs, dim = params.centers.shape
    even = params.centers[0::2][:, :, None, :]
    odd = params.centers[1::2][:, None, :, :]
    return MultiKmeansParams(
        centers=(even + odd).reshape(nc // 2, cs * cs, dim),
        frame_entropy_scale=params.frame_entropy_scale,
    )


class MultiKmeansQuantizer:
    """OO wrapper mirroring the reference class surface
    (`multi_kmeans.py:17-326`)."""

    def __init__(
        self,
        dim: int,
        codebook_size: int,
        num_codebooks: int,
        *,
        key: Optional[jax.Array] = None,
        params: Optional[MultiKmeansParams] = None,
    ):
        self.dim = dim
        self.codebook_size = codebook_size
        self.num_codebooks = num_codebooks
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(
                    int.from_bytes(__import__("os").urandom(4), "little")
                )
            params = init_multi_kmeans_params(key, dim, codebook_size, num_codebooks)
        self.params = params

    def __call__(self, x, key, num_iters: int = 4) -> StochasticRefineOut:
        return forward(self.params, x, key, num_iters)

    def encode(self, x, num_iters: int = 4, as_bytes: bool = False):
        return _jit_encode(self.codebook_size, num_iters, as_bytes)(self.params, x)

    def decode(self, indexes):
        return jax.jit(decode)(self.params, indexes)

    def compute_ref_loss(self, x):
        return jax.jit(compute_ref_loss)(self.params, x)

    def get_product_quantizer(self) -> "MultiKmeansQuantizer":
        return MultiKmeansQuantizer(
            self.dim,
            self.codebook_size ** 2,
            self.num_codebooks // 2,
            params=product_params(self.params),
        )


@functools.lru_cache(maxsize=None)
def _jit_encode(cs: int, num_iters: int, as_bytes: bool):
    del cs
    return jax.jit(
        lambda params, x: encode(params, x, num_iters=num_iters, as_bytes=as_bytes)
    )
