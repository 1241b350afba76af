"""Gradient (activation) checkpointing.

The reference ships a custom ``torch.autograd.Function`` that re-runs the
forward inside backward to save memory (`quantization/checkpoint.py:7-42`).
JAX has this built in as rematerialization; this module provides the same
call-shape API (``checkpoint(fn, *args)``) on top of ``jax.checkpoint``.
"""

from __future__ import annotations

import jax


def checkpoint(function, *args):
    """Run ``function(*args)`` under rematerialization: activations inside
    ``function`` are not saved for the backward pass but recomputed."""
    return jax.checkpoint(function)(*args)


# Direct alias for users who want to decorate rather than call.
remat = jax.checkpoint
