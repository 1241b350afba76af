"""Joint codebook-index predictor.

TPU-native port of `quantization/prediction.py`: predict the num_codebooks
codebook indexes of a frame from an external feature vector, *jointly* —
codebook k is regressed on the predictor features plus embeddings of
codebooks 0..k-1.  Mechanism (functional core, `quantization/prediction.py:9-82`):

  1. offset the first nc-1 indexes into a shared (nc-1)*cs embedding table,
  2. scale embeddings by 0.5 * sqrt(hidden/nc), prepend linear1(predictor),
  3. cumulative-sum over the codebook axis (so position k sees all previous
     codebooks), ReLU,
  4. logits = per-codebook linear2(hidden) + per-codebook linear2b(predictor)
     + bias,
  5. cross-entropy against the indexes, with ignore_index padding masked out.

The functional form maps 1:1 onto jnp (embedding gather, cumsum, two batched
einsums); memory saving uses ``jax.checkpoint`` instead of the reference's
hand-rolled autograd.Function (`quantization/checkpoint.py:7-42`).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import precision as _precision


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class JointCodebookParams:
    """Parameter pytree; shapes as documented at
    `quantization/prediction.py:19-33`."""

    linear1_w: jax.Array  # (hidden, predictor_channels)
    linear1_b: jax.Array  # (hidden,)
    embedding: jax.Array  # ((nc - 1) * cs, hidden)
    linear2_w: jax.Array  # (nc, cs, hidden)
    linear2b_w: jax.Array  # (nc, cs, predictor_channels)
    linear2_b: jax.Array  # (nc, cs)


def init_joint_codebook_params(
    key: jax.Array,
    predictor_channels: int,
    num_codebooks: int,
    hidden_channels: int = 512,
    codebook_size: int = 256,
) -> JointCodebookParams:
    """Same init distributions as `quantization/prediction.py:138-153`:
    linear1 is a default torch Linear (U(+-1/sqrt(fan_in))); the embedding and
    the two output weights are randn scaled by fan_in**-0.5; bias zero."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bound = 1.0 / math.sqrt(predictor_channels)
    return JointCodebookParams(
        linear1_w=jax.random.uniform(
            k1, (hidden_channels, predictor_channels), jnp.float32, -bound, bound
        ),
        linear1_b=jax.random.uniform(
            k2, (hidden_channels,), jnp.float32, -bound, bound
        ),
        embedding=jax.random.normal(
            k3, ((num_codebooks - 1) * codebook_size, hidden_channels)
        )
        * (hidden_channels ** -0.5),
        linear2_w=jax.random.normal(
            k4, (num_codebooks, codebook_size, hidden_channels)
        )
        * (hidden_channels ** -0.5),
        linear2b_w=jax.random.normal(
            k5, (num_codebooks, codebook_size, predictor_channels)
        )
        * (predictor_channels ** -0.5),
        linear2_b=jnp.zeros((num_codebooks, codebook_size)),
    )


def joint_codebook_logits(
    params: JointCodebookParams,
    predictor: jax.Array,
    codebook_indexes: jax.Array,
) -> jax.Array:
    """(N, predictor_channels), (N, nc) -> (N, nc, cs) prediction logits."""
    nc, cs, hidden = params.linear2_w.shape
    prec = _precision.MATMUL_PRECISION

    idx = codebook_indexes.astype(jnp.int32)
    # All but the last codebook feeds the prediction of later ones; clamp
    # padding (-100) to 0 — those frames are masked in the loss anyway
    # (`quantization/prediction.py:44-50`).
    first = jnp.clip(idx[:, :-1], 0, None) + jnp.arange(
        0, (nc - 1) * cs, cs, dtype=jnp.int32
    )
    emb_scale = 0.5 * math.sqrt(hidden / nc)
    first_emb = params.embedding[first] * emb_scale  # (N, nc-1, hidden)

    hidden_pred = (
        jnp.dot(predictor, params.linear1_w.T, precision=prec)
        + params.linear1_b
    )
    all_emb = jnp.concatenate([hidden_pred[:, None, :], first_emb], axis=1)
    # After the cumsum every position contains the predictor contribution
    # plus all *previous* codebooks (`quantization/prediction.py:58-65`).
    all_emb = jnp.cumsum(all_emb, axis=1)
    all_emb = jax.nn.relu(all_emb)

    logits = jnp.einsum(
        "bnh,nkh->bnk", all_emb, params.linear2_w, precision=prec
    )
    logits = logits + jnp.einsum(
        "bp,nkp->bnk", predictor, params.linear2b_w, precision=prec
    )
    return logits + params.linear2_b


def joint_codebook_loss(
    params: JointCodebookParams,
    predictor: jax.Array,
    codebook_indexes: jax.Array,
    ignore_index: int = -100,
    reduction: str = "sum",
) -> jax.Array:
    """Cross-entropy of the joint prediction; padding frames (index ==
    ignore_index) contribute zero (`quantization/prediction.py:79-82`)."""
    lead = predictor.shape[:-1]
    assert codebook_indexes.shape[:-1] == lead, (
        predictor.shape,
        codebook_indexes.shape,
    )
    predictor = predictor.reshape(-1, predictor.shape[-1])
    codebook_indexes = codebook_indexes.reshape(
        -1, codebook_indexes.shape[-1]
    ).astype(jnp.int32)

    logits = joint_codebook_logits(params, predictor, codebook_indexes)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.clip(codebook_indexes, 0, None)
    chosen = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    mask = (codebook_indexes != ignore_index).astype(chosen.dtype)
    losses = -chosen * mask
    if reduction == "sum":
        return losses.sum()
    if reduction == "mean":
        return losses.sum() / jnp.maximum(mask.sum(), 1.0)
    if reduction == "none":
        return losses
    raise ValueError(f"unknown reduction {reduction!r}")


class JointCodebookLoss:
    """Module-style wrapper mirroring `quantization/prediction.py:86-189`.

    Holds a :class:`JointCodebookParams` pytree; ``__call__(predictor,
    codebook_indexes)`` returns the summed cross-entropy.  With
    ``checkpoint=True`` the functional core runs under ``jax.checkpoint``
    (forward recomputed in backward, saving activation memory).

    For training, prefer the functional path: ``loss_fn(params, ...)`` with
    ``params = module.params`` so the pytree threads through ``jax.grad``.
    """

    def __init__(
        self,
        predictor_channels: int,
        num_codebooks: int,
        hidden_channels: int = 512,
        codebook_size: int = 256,
        reduction: str = "sum",
        ignore_index: int = -100,
        checkpoint: bool = True,
        *,
        key: Optional[jax.Array] = None,
    ):
        assert num_codebooks > 1
        self.num_codebooks = num_codebooks
        self.codebook_size = codebook_size
        self.hidden_channels = hidden_channels
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.checkpoint = checkpoint
        if key is None:
            key = jax.random.PRNGKey(
                int.from_bytes(__import__("os").urandom(4), "little")
            )
        self.params = init_joint_codebook_params(
            key, predictor_channels, num_codebooks, hidden_channels, codebook_size
        )

    def loss_fn(self, params, predictor, codebook_indexes):
        fn = functools.partial(
            joint_codebook_loss,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
        )
        if self.checkpoint:
            fn = jax.checkpoint(fn)
        return fn(params, predictor, codebook_indexes)

    def __call__(self, predictor, codebook_indexes):
        return self.loss_fn(self.params, predictor, codebook_indexes)
