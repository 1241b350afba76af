"""Matmul precision policy.

The reference computes everything in CUDA f32.  On TPU, f32 ``dot`` defaults
to bf16-pass MXU arithmetic (and some CPU backends similarly downcast), which
breaks quality parity at the 1e-2 level.  Core ops therefore request
``HIGHEST`` precision explicitly; the throughput-oriented kernels opt into
bf16 deliberately instead of by accident.
"""

from __future__ import annotations

import jax

# Used by every einsum/dot in the core path.  Swap to Precision.DEFAULT for
# maximum MXU throughput at reduced accuracy.
MATMUL_PRECISION: jax.lax.Precision = jax.lax.Precision.HIGHEST


def set_matmul_precision(precision) -> None:
    global MATMUL_PRECISION
    MATMUL_PRECISION = jax.lax.Precision(precision)
