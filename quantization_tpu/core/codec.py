"""Encode / decode and uint8 byte packing.

TPU-first redesign of `quantization/quantization.py:117-148, 244-275, 551-573`:

* ``decode`` has two paths: a gather path for inference and a one-hot einsum
  path (``decode_onehot``) used inside the training loss, where the gradient
  w.r.t. the centers then flows through an MXU matmul instead of an XLA
  scatter.
* Byte packing/unpacking is pure integer arithmetic with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import search
from . import precision as _precision
from .types import QuantizerConfig, QuantizerParams, scaled_centers


def pack_indexes(indexes: jax.Array, codebook_size: int) -> jax.Array:
    """Pack (..., nc) indexes into uint8 bytes, combining pairs of codebooks
    while codebook_size**2 <= 256 (`quantization/quantization.py:266-272`).

    For codebook_size 256 / 16 / 4 / 2 this packs 1 / 2 / 4 / 8 codebook
    indexes per byte.  The packed value is sum_j cs**j * idx_j over the group.
    """
    cs = codebook_size
    indexes = indexes.astype(jnp.int32)
    while cs ** 2 <= 256:
        indexes = indexes[..., 0::2] + cs * indexes[..., 1::2]
        cs = cs ** 2
    assert cs <= 256
    return indexes.astype(jnp.uint8)


def unpack_indexes(
    packed: jax.Array, codebook_size: int, num_codebooks: int
) -> jax.Array:
    """Inverse of :func:`pack_indexes`; accepts a last dim of num_codebooks
    (no-op), or num_codebooks / {2,4,8,16} (packed)
    (`quantization/quantization.py:551-573`)."""
    n = packed.shape[-1]
    packed = packed.astype(jnp.int32)
    if n == num_codebooks:
        return packed
    num_repeats = num_codebooks // n
    assert num_repeats in (2, 4, 8, 16) and n * num_repeats == num_codebooks
    powers = codebook_size ** jnp.arange(num_repeats, dtype=jnp.int32)
    expanded = (packed[..., None] // powers) % codebook_size
    return expanded.reshape(*packed.shape[:-1], num_codebooks)


def encode(
    params: QuantizerParams,
    config: QuantizerConfig,
    x: jax.Array,
    refine_indexes_iters: int = 5,
    as_bytes: bool = True,
    search_method: str = "beam",
    **search_kwargs,
) -> jax.Array:
    """Quantize ``x``: (*, dim) -> (*, nc) int32 indexes, or (*, bytes_per_frame)
    uint8 when ``as_bytes`` (`quantization/quantization.py:244-275`).

    ``search_method``:
      * "beam" (default): the reference's pair-tree beam search, bit-matched
        behavior (`quantization/quantization.py:308-548`).
      * "seqbeam": the fused Pallas sequential-beam kernel (TPU-only
        flagship configs, see ops/seqbeam.py) — ~3x faster;
        ``refine_indexes_iters`` counts beam sweeps (3 sweeps measured
        within 0.5% relative reconstruction error of "beam" at 5 iters).
      * "cdN+seqbeam" (e.g. "cd2+seqbeam"): N coordinate-descent sweeps as
        a cheap warm start, then the kernel ("cd2+seqbeam" with 2 sweeps
        measured +0.67% vs "beam" at 5 iters and ~25% faster than plain
        "seqbeam" at equal sweep count).
      * "cd": exact coordinate descent alone (fastest, ~12% worse rel err).
      * "gramv3": the Gram-table kernel (ops/gramv3.py) — no per-candidate
        error buffer, one matmul per codebook step; ``g_dtype="int8"``
        targets the int8 MXU peak (quality screened at +0.95% vs beam-5,
        experiments/gramscore_quality_d512_b8.json).
    """
    import re

    lead = x.shape[:-1]
    x2 = x.reshape(-1, config.dim)
    if x2.dtype != jnp.float32:
        # f16/bf16 corpora upcast ON DEVICE (fuses into the first consumer;
        # exact for f16->f32), so the host stream can ship raw storage
        # bytes — see data/shards.iter_shards_sequential(dtype=float16)
        x2 = x2.astype(jnp.float32)
    if search_method == "auto":
        # Fastest config measured within the 1% quality bar on TPU: the
        # fused seqbeam kernel at M=8, R=4 with the "altparity" pool/R1
        # step schedule and the bit-exact select-tree beam reorder —
        # int8-resident E at dim=512 (int8 x int8 -> int32 rescore +
        # extension on the 2x MXU path; max +0.98% rel err vs beam-5 over
        # 3 eval seeds, ops/quality.json), bf16 E at dim=256.  Every
        # candidate is double-gated on real-hardware tables (smoke entry
        # in ops/verified.json AND a measured in-bar quality margin in
        # ops/quality.json); the shipped default never routes onto an
        # undemonstrated or out-of-bar kernel.  Falls back to the
        # reference-parity beam off-TPU or for unsupported shapes.
        from ..ops.seqbeam import SEQBEAM_SUPPORTED
        from ..ops.verify import combined_margin_pct, kernel_verified

        two_pass_cfg = config.dim == 256 and config.num_codebooks == 4
        # Tuned auto candidates in throughput order, each tied to its
        # real-hardware smoke-gate + quality-guard name.  The margin guard
        # (VERDICT r3): a candidate whose MEASURED on-chip quality delta
        # (ops/quality.json, max over eval seeds) exceeds the 1% parity bar
        # is never auto-selected — auto demotes to the next candidate
        # (M16R4p2: +0.75%, -26% throughput, experiments/ab_r3c.log) and
        # ultimately to the exact beam.  A config with no measurement is
        # not demoted (the smoke gate still applies); explicit
        # search_method= bypasses everything.
        if two_pass_cfg:
            auto_candidates = [
                ("seqbeam_hl_d256", 2,
                 dict(M=8, R=4, pool_mask="altparity", block_b=256,
                      interleave=2, reorder="select", e_dtype="bf16")),
            ]
        else:
            auto_candidates = [
                # int8-resident E at block_b=512: +23% over the bf16
                # headline at B=32K (789.6K vs 639.2K vec/s, round-4 A/B);
                # quality +0.96% vs beam-5 = f32/bf16
                # (experiments/int8ec_quality_d512_b8.json) — selected only
                # once BOTH its real-hardware smoke entry and its measured
                # quality-guard margin exist and pass.  zip_skew=1 is the
                # software-pipelined emission order (+6% same-session A/B,
                # experiments/skewab_r4.log) with BIT-IDENTICAL outputs, so
                # the quality-guard entry carries over unchanged.
                ("seqbeam_int8e_d512!", 3,
                 dict(M=8, R=4, pool_mask="altparity", block_b=512,
                      interleave=2, reorder="select", e_dtype="int8",
                      zip_skew=1)),
                ("seqbeam_hl_d512", 3,
                 dict(M=8, R=4, pool_mask="altparity", block_b=256,
                      interleave=2, reorder="select", e_dtype="bf16")),
                ("seqbeam_m16_d512", 2,
                 dict(M=16, R=4, block_b=256, interleave=2,
                      reorder="select", e_dtype="bf16")),
            ]
        chosen = None
        if (
            SEQBEAM_SUPPORTED(config)
            and jax.default_backend() == "tpu"
            and refine_indexes_iters >= 3
        ):
            for name, iters, tuned in auto_candidates:
                # a trailing "!" marks candidates that additionally REQUIRE
                # a measured quality entry (newly promoted configs must not
                # ride the no-measurement leniency of the long-standing
                # defaults)
                need_quality = name.endswith("!")
                name = name.rstrip("!")
                # the guard gates on the COMBINED margin vs the torch
                # reference: measured train ratio x worst-seed encode
                # delta (VERDICT r4 item 4) — the 1% bar from BASELINE.json
                # is defined against `quantization/quantization.py:184-242`
                # losses end-to-end, not against our own beam
                margin = combined_margin_pct(name)
                if margin is None and need_quality:
                    continue
                if kernel_verified(name) and (margin is None or margin <= 1.0):
                    chosen = (iters, tuned)
                    break
        if chosen is not None:
            search_method = "seqbeam"
            # Measured configs (experiments/kernel_quality_*.json): the
            # dim=256/4B flagship sits at +0.70% with 2 passes + altparity;
            # the d512 headline (select-tree reorder + bf16 E) at +0.96% —
            # quality identical to gather/f32 on the real chip and faster
            # (+10% at d512: 541K vs 493K; +6% at d256,
            # experiments/ab_r3b.log + chipq_r3.log).  Explicit caller
            # kwargs (M/R/block_b/pool_mask/interleave) override.
            refine_indexes_iters, tuned = chosen
            search_kwargs = {**tuned, **search_kwargs}
        else:
            if search_kwargs:
                raise ValueError(
                    "search kwargs "
                    f"{sorted(search_kwargs)} require the seqbeam kernel "
                    "(TPU backend, codebook_size=256, dim a multiple of "
                    "128); pass search_method='seqbeam' explicitly or drop "
                    "the kwargs"
                )
            search_method = "beam"
    if search_method == "gramv3":
        # v3 Gram-table kernel (ops/gramv3.py): no per-candidate error
        # buffer; any dim, codebook_size=256, nc <= 8
        from ..ops.gramv3 import gramv3_encode_indexes

        indexes = gramv3_encode_indexes(
            params, config, x2, passes=refine_indexes_iters, **search_kwargs
        )
        if as_bytes:
            indexes = pack_indexes(indexes, config.codebook_size)
        return indexes.reshape(*lead, -1)
    warm = re.fullmatch(r"cd(\d+)\+seqbeam", search_method)
    if search_method == "seqbeam" or warm:
        from ..ops.seqbeam import seqbeam_encode_indexes

        init = None
        if warm:
            logits = search.compute_logits(params, config, x2)
            init = search.refine_indexes_cd(
                scaled_centers(params, config.scale_speed),
                x2,
                jnp.argmax(logits, -1).astype(jnp.int32),
                sweeps=int(warm.group(1)),
            )
        indexes = seqbeam_encode_indexes(
            params,
            config,
            x2,
            passes=refine_indexes_iters,
            init_indexes=init,
            **search_kwargs,
        )
    else:
        assert not search_kwargs, search_kwargs
        indexes = search.compute_indexes(
            params, config, x2, refine_indexes_iters, search=search_method
        )
    if as_bytes:
        indexes = pack_indexes(indexes, config.codebook_size)
    return indexes.reshape(*lead, -1)


def decode_indexes(centers: jax.Array, indexes: jax.Array) -> jax.Array:
    """Gather-and-sum reconstruction from unpacked (B, nc) indexes
    (`quantization/quantization.py:136-148`)."""
    nc = centers.shape[0]
    chosen = centers[jnp.arange(nc)[None, :], indexes]  # (B, nc, dim)
    return chosen.sum(axis=1)


def decode_onehot(centers: jax.Array, indexes: jax.Array) -> jax.Array:
    """One-hot-matmul reconstruction; numerically identical to
    :func:`decode_indexes` but differentiates into an MXU matmul for the
    gradient w.r.t. ``centers`` (used by the training loss)."""
    nc, cs, _ = centers.shape
    onehot = jax.nn.one_hot(indexes, cs, dtype=centers.dtype)  # (B, nc, cs)
    return jnp.einsum(
        "bnk,nkd->bd",
        onehot,
        centers,
        precision=_precision.MATMUL_PRECISION,
        preferred_element_type=jnp.float32,
    )


def decode(
    params: QuantizerParams,
    config: QuantizerConfig,
    indexes: jax.Array,
    use_kernel: bool = False,
) -> jax.Array:
    """Reconstruct (*, dim) from (possibly byte-packed) indexes
    (`quantization/quantization.py:117-148`).

    ``use_kernel=True`` uses the fused Pallas decode (ops/decode.py):
    ~2x faster on TPU, codebooks applied in bf16 (reconstruction values
    within ~0.2% of the f32 gather path — negligible next to the
    quantization error itself)."""
    if use_kernel:
        from ..ops.decode import decode_kernel

        return decode_kernel(params, config, indexes)
    lead = indexes.shape[:-1]
    idx = indexes.reshape(-1, indexes.shape[-1])
    idx = unpack_indexes(idx, config.codebook_size, config.num_codebooks)
    centers = scaled_centers(params, config.scale_speed)
    return decode_indexes(centers, idx).reshape(*lead, config.dim)
