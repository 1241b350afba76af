"""Object-oriented ``Quantizer`` wrapper with the reference's API surface.

Mirrors `quantization/quantization.py:16-573` method-for-method (``encode``,
``decode``, ``compute_loss``, ``get_product_quantizer``, ``get_centers``,
``get_data_mean``, ``get_id``, ``show_init_invocation``,
``compute_codebook_correlations``) but is a thin stateful shell around the
functional core: every compute method dispatches to a cached ``jax.jit`` of a
pure function, keyed on the static (config, static-arg) tuple.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import core
from ..core.types import QuantizerConfig, QuantizerLosses, QuantizerParams


def _put(x) -> jax.Array:
    """Host arrays onto the device via an EXPLICIT ``jax.device_put``.

    Keeps the host->device transfer visible and contiguous instead of
    burying it in jit argument committal.  NOTE (round-5 measurement,
    experiments/uploadpath_check.py): on the tunneled dev backend the
    transfer itself is the cost — ~35-50 MB/s for FRESH 32 MB buffers
    through EITHER path (~0.9 s per 32K x 512 f16 batch; repeated puts of
    an unchanged buffer are deduplicated and look 30x faster, which is a
    measurement trap, not bandwidth).  Streaming-encode throughput on that
    rig is upload-bound at ~35K vec/s regardless of this wrapper; on real
    PCIe-attached TPU hosts the transfer is >10 GB/s and never binds."""
    if isinstance(x, jax.Array):
        return x
    return jax.device_put(np.ascontiguousarray(x))


@functools.lru_cache(maxsize=None)
def _jit_encode(
    config: QuantizerConfig,
    refine_iters: int,
    as_bytes: bool,
    search_method: str = "beam",
    search_kwargs: tuple = (),
):
    kw = dict(search_kwargs)

    def fn(params, x):
        return core.encode(
            params,
            config,
            x,
            refine_iters,
            as_bytes,
            search_method=search_method,
            **kw,
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_decode(config: QuantizerConfig, packed_width: int, use_kernel: bool = False):
    del packed_width  # part of the cache key via input shape anyway

    def fn(params, indexes):
        return core.decode(params, config, indexes, use_kernel=use_kernel)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_compute_loss(config: QuantizerConfig, refine_iters: int):
    def fn(params, x):
        return core.compute_loss(params, config, x, refine_iters)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_correlations(config: QuantizerConfig):
    def fn(params):
        return core.codebook_correlations(params, config)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_product(config: QuantizerConfig):
    def fn(params):
        return core.product_params(params, config)

    return jax.jit(fn)


class Quantizer:
    """Trainable multi-codebook ("direct-sum") vector quantizer.

    Encodes a (*, dim) vector into num_codebooks integer indexes (optionally
    packed into bytes); reconstruction is the sum of the selected codewords.
    """

    def __init__(
        self,
        dim: int,
        codebook_size: int,
        num_codebooks: int,
        *,
        key: Optional[jax.Array] = None,
        params: Optional[QuantizerParams] = None,
        id_str: Optional[str] = None,
        scale_speed: float = 10.0,
    ):
        self.config = QuantizerConfig(
            dim=dim,
            codebook_size=codebook_size,
            num_codebooks=num_codebooks,
            scale_speed=scale_speed,
        )
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(
                    int.from_bytes(__import__("os").urandom(4), "little")
                )
            params = core.init_quantizer_params(key, self.config)
        self.params = params
        # 8-hex-char identity, round-trips through save/load
        # (`quantization/quantization.py:49-59`).
        self.id_str = id_str if id_str is not None else core.random_id()

    # -- introspection ------------------------------------------------------

    @property
    def dim(self) -> int:
        return self.config.dim

    @property
    def codebook_size(self) -> int:
        return self.config.codebook_size

    @property
    def num_codebooks(self) -> int:
        return self.config.num_codebooks

    def get_id(self) -> str:
        return self.id_str

    def show_init_invocation(self) -> str:
        return (
            f"quantization_tpu.Quantizer(dim={self.dim}, "
            f"codebook_size={self.codebook_size}, num_codebooks={self.num_codebooks})"
        )

    def get_centers(self) -> jax.Array:
        return core.scaled_centers(self.params, self.config.scale_speed)

    def get_data_mean(self) -> jax.Array:
        return core.data_mean(self.params, self.config.scale_speed)

    # -- compute ------------------------------------------------------------

    def encode(
        self,
        x: jax.Array,
        refine_indexes_iters: int = 5,
        as_bytes: bool = True,
        search_method: str = "auto",
        **search_kwargs,
    ) -> jax.Array:
        """Quantize ``x`` to byte codes.  ``search_method``:

        * "auto" (default): the fastest configuration measured within 1%
          relative reconstruction error of the reference beam-5 — on TPU
          with supported shapes this is the fused seqbeam kernel at
          M=8/R=4/3 passes (~2x beam throughput, +0.89% rel err on the
          trained flagship); elsewhere it falls back to "beam".
        * "beam": the reference's pair-tree beam search, bit-matched
          behavior (`quantization/quantization.py:308-548`).
        * "seqbeam": the fused Pallas kernel; ``refine_indexes_iters``
          counts beam sweeps.
        * "cdN+seqbeam": N coordinate-descent warm-start sweeps + kernel.
        * "cd": exact coordinate descent alone.

        Extra ``search_kwargs`` (e.g. ``M=32``, ``R=8``, ``block_b=...``)
        are forwarded to the selected search backend."""
        x = _put(x)
        return _jit_encode(
            self.config,
            refine_indexes_iters,
            as_bytes,
            search_method,
            tuple(sorted(search_kwargs.items())),
        )(self.params, x)

    def decode(self, indexes: jax.Array, use_kernel: bool = False) -> jax.Array:
        indexes = _put(indexes)
        return _jit_decode(self.config, indexes.shape[-1], use_kernel)(
            self.params, indexes
        )

    def compute_loss(
        self, x: jax.Array, refine_indexes_iters: int = 0
    ) -> QuantizerLosses:
        x = _put(x)
        return _jit_compute_loss(self.config, refine_indexes_iters)(self.params, x)

    def compute_codebook_correlations(self) -> jax.Array:
        return _jit_correlations(self.config)(self.params)

    def get_product_quantizer(self) -> "Quantizer":
        """New Quantizer with codebook_size**2 / num_codebooks//2, each output
        codebook formed from sums of pairs of input codebooks
        (`quantization/quantization.py:81-112`).  Gets a fresh identity, like
        the reference (which constructs a brand-new module)."""
        new_config = self.config.product_config()
        new_params = _jit_product(self.config)(self.params)
        return Quantizer(
            new_config.dim,
            new_config.codebook_size,
            new_config.num_codebooks,
            params=new_params,
            scale_speed=new_config.scale_speed,
        )
