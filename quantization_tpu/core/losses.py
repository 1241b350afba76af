"""Training losses.

Reproduces the four loss terms of the reference ``compute_loss``
(`quantization/quantization.py:184-242`) with the same gradient routing
(`quantization/quantization.py:684-705`):

* ``rel_reconstruction_loss`` trains ``centers`` (+ ``centers_scale``); the
  integer indexes are wrapped in ``stop_gradient`` so the search itself is
  outside the differentiation path (straight-through-by-construction, as in
  torch where integer tensors carry no grad).
* ``logprob_loss`` trains only ``to_logits`` (+ ``logits_scale``) to predict
  the *post-refinement* indexes.
* ``logits_entropy_loss`` is differentiable, scaled by 0.01 in the trainer.
* ``index_entropy_loss`` is a non-differentiable diagnostic.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import codec, search
from .types import (
    QuantizerConfig,
    QuantizerLosses,
    QuantizerParams,
    data_mean,
    scaled_centers,
)


def compute_loss(
    params: QuantizerParams,
    config: QuantizerConfig,
    x: jax.Array,
    refine_indexes_iters: int = 0,
    search_method: str = "beam",
) -> QuantizerLosses:
    """``search_method`` selects how the training indexes are found
    ("beam" / "seqbeam" / "cd").  The indexes are inside ``stop_gradient``
    either way — the search is outside the differentiation path — so the
    fused Pallas kernel is usable here despite having no VJP."""
    x = x.reshape(-1, config.dim)
    B = x.shape[0]
    nc, cs = config.num_codebooks, config.codebook_size

    if search_method in ("seqbeam", "gramv3", "gramv3-int8"):
        # stop_gradient must be applied to the kernel's INPUTS: the Pallas
        # call has no JVP rule, and an output-side stop_gradient still lets
        # the jvp tracer reach it.
        sg = jax.lax.stop_gradient
        if search_method == "seqbeam":
            from ..ops.seqbeam import seqbeam_encode_indexes

            indexes = seqbeam_encode_indexes(
                sg(params), config, sg(x), passes=max(refine_indexes_iters, 1)
            )
        else:
            from ..ops.gramv3 import gramv3_encode_indexes

            indexes = gramv3_encode_indexes(
                sg(params),
                config,
                sg(x),
                passes=max(refine_indexes_iters, 1),
                g_dtype="int8" if search_method == "gramv3-int8" else "bf16",
            )
    else:
        indexes = jax.lax.stop_gradient(
            search.compute_indexes(
                params, config, x, refine_indexes_iters, search=search_method
            )
        )

    centers = scaled_centers(params, config.scale_speed)
    x_approx = codec.decode_onehot(centers, indexes)
    tot_err = x_approx - x
    mean = data_mean(params, config.scale_speed)
    rel_reconstruction_loss = jnp.sum(tot_err * tot_err) / (
        jnp.sum((x - mean) ** 2) + 1.0e-20
    )

    # Negative average log-probability of the refined indexes under the
    # logits head (`quantization/quantization.py:218-225`).
    logits = search.compute_logits(params, config, x)
    logprobs = jax.nn.log_softmax(logits, axis=2)
    chosen = jnp.take_along_axis(logprobs, indexes[..., None], axis=2)
    logprob_loss = -chosen.mean()

    # Entropy of the empirical index distribution (diagnostic,
    # `quantization/quantization.py:227-233`).
    avg_counts = jax.nn.one_hot(indexes, cs, dtype=x.dtype).mean(axis=0) + 1.0e-20
    index_entropy = -jnp.sum(avg_counts * jnp.log(avg_counts), axis=1).mean()

    # Entropy of the average predicted distribution (differentiable,
    # `quantization/quantization.py:235-236`).
    probs = jnp.exp(logprobs).mean(axis=0) + 1.0e-20
    logits_entropy = -jnp.sum(probs * jnp.log(probs), axis=1).mean()

    ref_entropy = math.log(cs)
    return QuantizerLosses(
        rel_reconstruction_loss=rel_reconstruction_loss,
        logprob_loss=logprob_loss,
        logits_entropy_loss=(ref_entropy - logits_entropy) / ref_entropy,
        index_entropy_loss=jax.lax.stop_gradient(
            (ref_entropy - index_entropy) / ref_entropy
        ),
    )
