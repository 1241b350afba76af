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

# Used by the search's *internal* contractions: one-hot-matmul gathers of
# deltas and the beam-combine cross products.  These only influence which
# candidate the beam ranks first (never the reconstruction values), so
# single-pass bf16 MXU arithmetic is accurate enough; HIGHEST costs 6
# MXU passes and measured ~1.4x on the whole refine step (v5e).
SEARCH_INNER_PRECISION: jax.lax.Precision = jax.lax.Precision.DEFAULT


def set_matmul_precision(precision) -> None:
    global MATMUL_PRECISION
    MATMUL_PRECISION = jax.lax.Precision(precision)


def set_search_inner_precision(precision) -> None:
    global SEARCH_INNER_PRECISION
    SEARCH_INNER_PRECISION = jax.lax.Precision(precision)
