"""Fused sequential-beam encode kernel.

One Pallas kernel performs the whole refinement search for a batch tile:
an M-wide beam sweeps the codebooks in order; at each codebook every
candidate is rescored against all ``cs`` codewords with one MXU matmul and
the beam is re-selected.  Everything (candidate error vectors, scores,
beam bookkeeping) stays resident in VMEM for all passes.

Quality: measured against the reference pair-tree beam search
(`quantization/quantization.py:308-548`, 5 refinement iterations) on fully
trained quantizers (relative reconstruction error deltas; the parity bar
is 1%).  dim=512/8B flagship, this kernel (v2): M=8/R=4 x3 passes +0.89%,
M=16/R=4 x2 +0.74%, M=8/R=2 x3 +0.94% (experiments/kernel_quality_*.json);
XLA-simulated sweep over (cd warm start x M x passes x R) in
experiments/quality_sweep.py — notable: warm-start sweeps add nothing at
equal beam work, and R=1 (no cross-parent competition) saturates at +1.26%,
so the pool selection is load-bearing.  Cheaper pool-selection variants are
all OUT of the 1% bar (experiments/jbest_quality_d512_b8.json, round 4):
per-j best-parent fold ("jbest", ~4x less selection VPU work) +1.56%
altparity / +1.90% allpool / +1.39% at M16; R=2 pool rounds +1.12% — do
not retry; top-R=4 per parent + pool is the quality floor.  dim=64/4B: M=32 x3 -0.9% (beats the
reference).  See the README quality table.

Round-5 scheduling/VPU A/Bs on the int8E z1 flagship (B=32K, same session,
experiments/ab_r5a.log + ab_r5b.log) — all NEGATIVE or wash; do not retry
without a layout-level redesign: sel_impl="fold" (2 fewer VPU passes per
selection round, bit-identical) +0.5% = noise; interleave=4 (deeper
sub-tile pipelining) -1.3% to -5.7%; lazy_r1 (defer R1 deltas into the
next pool step's merged move, killing the whole R1 (M*B_s, D)
dequant/extend/requant chain) -3.6% — the pool-step Gram correction +
merged-extension overhead exceeds the skipped R1 work.  Together with the
round-4 washes (requant="bound"/"pass", init_precision="default",
experiments/fiab_r4.log), the kernel sits at a measured local optimum
under Mosaic's scheduler; the selection rounds' cross-lane min trees are
the remaining VPU floor and shrink only with a physical layout change
(sub-128-lane arrays still occupy full 8x128 vregs).

TPU mapping notes (v5e, Mosaic), learned the hard way:
* rescoring is one (M*B_t, dim) x (dim, cs) bf16 MXU matmul per codebook,
  taken directly on the candidate error buffer; the "remove codebook t's
  current contribution" term is folded in algebraically
  (||E - c + w||^2 = ||E||^2 - 2E.c + ||c||^2 + 2(E.w - c.w) + ||w||^2),
  so no second (M*B_t, dim) buffer is ever materialized;
* candidate sumsq values are carried across steps: the winning scores of
  one selection ARE the next step's ||E_m||^2 (no per-step reduction over
  dim);
* beam reorder ("candidate m' continues from parent p") is Mosaic's native
  8-row sublane dynamic_gather on the (M, B_t*dim) view of the error
  buffer (2x2 half-gathers for M=16), ping-ponged between two buffers in
  paired codebook steps;
* selection is iterative masked argmin with the *packed* trick: the lane
  index is embedded in the 8 low mantissa bits of the (non-negative)
  score, so each round is ONE cross-lane min instead of two reductions
  plus two broadcasts (cross-lane reductions are the kernel's true
  bottleneck -- ~7 VPU passes each; the MXU is essentially idle here);
* the pass and codebook-pair loops are ``lax.fori_loop``s with
  dynamic-sublane ref slices: a fully unrolled program OOM-killed the
  Mosaic compiler;
* the current solution is carried in a (nc*B_t, 1) column-layout scratch
  because Mosaic rejects non-128-offset lane slices;
* the only XLA-side work is the logits-argmax initialisation and byte
  packing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import QuantizerConfig, QuantizerParams, scaled_centers
from ..core import search as _search

_INF = 1e30  # masking constant for iterative argmin
_LANE_BITS = 8
_LANE_MASK = (1 << _LANE_BITS) - 1

# Cost-bisect instrumentation (QTPU_SEQBEAM_SKIP=piece,piece,...): stubs out
# kernel pieces at trace time to attribute device time.  Results are WRONG
# with any skip active — benchmarking only, never set in production.
import os as _os

_SKIP = frozenset(
    s for s in _os.environ.get("QTPU_SEQBEAM_SKIP", "").split(",") if s
)


def SEQBEAM_SUPPORTED(config: QuantizerConfig) -> bool:
    """Kernel constraints: flagship-family configs only; everything else
    falls back to the XLA pair-tree beam."""
    return (
        config.codebook_size == 256
        and config.dim % 128 == 0
        and config.dim >= 128
        and config.num_codebooks in (2, 4, 8, 16)
    )


def _normalize_pool_mask(pool_mask, nc: int, passes: int):
    """Normalize a pool/R1 step schedule to a per-pass tuple of
    per-codebook bool tuples.  ``None`` passes through (callers decide the
    all-pool default).  Accepts named schedules ("altparity" — pool even
    codebooks on even passes / odd on odd; "allfirst"/"alllast" — one
    all-pool pass first/last, parity-masked otherwise), one per-codebook
    tuple (applied to every pass), or explicit per-pass tuples."""
    if pool_mask is None:
        return None
    if isinstance(pool_mask, str):
        even = tuple(t % 2 == 0 for t in range(nc))
        odd = tuple(t % 2 == 1 for t in range(nc))
        alt = tuple(even if p % 2 == 0 else odd for p in range(passes))
        if pool_mask == "altparity":
            return alt
        if pool_mask == "allfirst":
            return ((True,) * nc,) + alt[: passes - 1]
        if pool_mask == "alllast":
            return alt[: passes - 1] + ((True,) * nc,)
        raise ValueError(f"unknown pool_mask schedule {pool_mask!r}")
    if isinstance(pool_mask[0], (tuple, list)):
        pm = tuple(tuple(bool(b) for b in m) for m in pool_mask)
        assert len(pm) == passes, (pm, passes)
        assert all(len(m) == nc for m in pm), (pm, nc)
        return pm
    pm = tuple(bool(b) for b in pool_mask)
    assert len(pm) == nc, (pm, nc)
    return (pm,) * passes


def _encode_scores(s: jax.Array, lanes: jax.Array) -> jax.Array:
    """Pack the lane index into the 8 low mantissa bits of a non-negative
    f32 score.  Bit order of non-negative IEEE floats is value order, so a
    single min reduction yields both the (quantized) min value and its lane."""
    bits = pltpu.bitcast(jnp.maximum(s, 0.0), jnp.int32)
    return pltpu.bitcast((bits & ~_LANE_MASK) | lanes, jnp.float32)


def _min_packed(enc: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value~, lane, encoded-min) per row of an encoded score array."""
    emin = jnp.min(enc, axis=1, keepdims=True)
    bits = pltpu.bitcast(emin, jnp.int32)
    pos = bits & _LANE_MASK
    val = pltpu.bitcast(bits & ~_LANE_MASK, jnp.float32)
    return val, pos, emin


def _gather8(table: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(table, idx, axis=0)


def _gather_rows_grouped(groups, idx: jax.Array) -> jax.Array:
    """Gather 8 output rows from a table split into 8-row groups (Mosaic's
    sublane dynamic_gather is strictly 8-row); idx values index the full
    table [0, 8*len(groups))."""
    if len(groups) == 1:
        # idx < 8 by construction (callers index an M<=8 beam): skip the
        # clip — a full-width VPU pass over the index array
        return _gather8(groups[0], idx)
    out = None
    for g, table in enumerate(groups):
        got = _gather8(table, jnp.clip(idx - 8 * g, 0, 7))
        out = got if out is None else jnp.where(idx < 8 * g, out, got)
    return out


def _gather_lane256(table: jax.Array, idx_col: jax.Array) -> jax.Array:
    """out[r, :1] = table[r, idx_col[r]] for a 256-lane table: Mosaic's lane
    dynamic_gather is 128-lane-tile local, so gather both halves + select."""
    rows = table.shape[0]
    idx = jnp.broadcast_to(idx_col, (rows, 128))
    lo = jnp.take_along_axis(table[:, 0:128], jnp.clip(idx, 0, 127), axis=1)
    hi = jnp.take_along_axis(table[:, 128:256], jnp.clip(idx - 128, 0, 127), axis=1)
    return jnp.where(idx_col < 128, lo[:, 0:1], hi[:, 0:1])


def _seqbeam_kernel(
    # inputs
    x_ref,  # (B_t, D) f32
    idx0_ref,  # (B_t, nc) int32
    centers_ref,  # (nc*cs, D) bf16
    cs_sumsq_ref,  # (nc, cs) f32
    # outputs
    out_ref,  # (B_t, nc) int32
    # scratch
    EA_ref,  # (M*B_t, D) f32  candidate error vectors (ping)
    EB_ref,  # (M*B_t, D) f32  candidate error vectors (pong)
    cross_ref,  # (M*B_t, cs) f32
    chosen_ref,  # (M*nc, 128) int32  row m*nc + t; first B_t lanes used
    chosen2_ref,  # (M*nc, 128) int32
    sol_ref,  # (nc*B_t, 1) int32  current solution column, layout t*B_t + b
    *,
    B_t: int,
    D: int,
    nc: int,
    cs: int,
    M: int,
    R: int,
    passes: int,
):
    assert M % 8 == 0 and M <= 64, M  # beam reorder works in 8-row groups
    assert B_t <= 128 and cs == 256 and nc % 2 == 0
    # The packed-mantissa selection stores the pool lane index in the low
    # _LANE_BITS mantissa bits; the per-frame pool has M*R lanes, so larger
    # pools would wrap on decode (pos = bits & _LANE_MASK) and silently
    # corrupt beam selection.
    assert M * R <= (1 << _LANE_BITS), (M, R)
    G = M // 8  # gather groups
    CW = 128
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    x = x_ref[:]  # (B_t, D)
    lane_cs = jax.lax.broadcasted_iota(jnp.int32, (B_t, cs), 1)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_t, cs), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (B_t, M), 1)

    def pad_row(row):  # (rows, B_t) -> (rows, CW)
        if B_t == CW:
            return row
        r = row.shape[0]
        return jnp.concatenate([row, jnp.zeros((r, CW - B_t), row.dtype)], axis=1)

    def onehot_bt(idx_col):  # (B_t, 1) int32 -> (B_t, cs) bf16
        return (lane_cs == idx_col).astype(bf16)

    def matmul(a, b):
        return jnp.dot(a.astype(bf16), b, preferred_element_type=f32)

    def matmul_nt(a, b):  # contraction on dim 1 of both operands
        return jax.lax.dot_general(
            a.astype(bf16),
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    def cols_to_colstack(a):  # (B_t, M) -> (M*B_t, 1)
        return jnp.concatenate(
            [
                jnp.sum(jnp.where(lane_m == m, a, 0.0), axis=1, keepdims=True)
                for m in range(M)
            ],
            axis=0,
        )

    # ---- init: solution column from idx0 (lane-masked reduce per codebook:
    # direct idx0 column slices carry lane offsets Mosaic rejects downstream).
    idx0 = idx0_ref[:]  # (B_t, nc)
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (B_t, nc), 1)
    for t in range(nc):
        sol_ref[t * B_t : (t + 1) * B_t, :] = jnp.sum(
            jnp.where(lane_nc == t, idx0, 0), axis=1, keepdims=True
        )

    def codebook_step(t, src_ref, dst_ref, ss):
        """One beam step on codebook t.  src/dst are the E ping-pong
        buffers; ss is (B_t, M) = ||E_m||^2 carried from the previous
        selection.  Returns the new ss."""
        sol_t = sol_ref[pl.ds(t * B_t, B_t), :]  # (B_t, 1)
        ctab = centers_ref[pl.ds(t * cs, cs), :]  # (cs, D) bf16
        oh_cur = onehot_bt(sol_t)

        # ---- rescore: cross[m*B_t+b, j] = E_m . c_t(j)   (the MXU matmul)
        cross_ref[:, :] = matmul_nt(src_ref[:, :], ctab)
        # q[b, j] = c_t(i_t) . c_t(j); cc[b] = ||c_t(i_t)||^2
        c_cur = matmul(oh_cur, ctab)  # (B_t, D) f32
        q = matmul_nt(c_cur, ctab)  # (B_t, cs)
        cc = _gather_lane256(q, sol_t)  # (B_t, 1)
        csq = cs_sumsq_ref[pl.ds(t, 1), :]  # (1, cs)

        sol_stack = jnp.concatenate([sol_t] * M, axis=0)  # (M*B_t, 1)
        Ec = _gather_lane256(cross_ref[:, :], sol_stack)  # (M*B_t, 1)
        ss_stack = cols_to_colstack(ss)  # (M*B_t, 1)
        cc_stack = jnp.concatenate([cc] * M, axis=0)
        q_stack = jnp.concatenate([q] * M, axis=0)  # (M*B_t, cs)
        # S[m*B_t+b, j] = ||E_m - c_t(i_t) + c_t(j)||^2
        S_full = (
            (ss_stack - 2.0 * Ec + cc_stack)
            + csq
            + 2.0 * (cross_ref[:, :] - q_stack)
        )
        enc_full = _encode_scores(S_full, lane_full)

        def fanout(_):
            # All candidates identical at the sweep start: fan out the beam
            # with the top-M options of candidate 0.
            enc0 = enc_full[0:B_t, :]
            v_cols, j_cols = [], []
            for _ in range(M):
                val, pos, emin = _min_packed(enc0)
                v_cols.append(val)
                j_cols.append(pos)
                enc0 = jnp.where(lane_cs == pos, _INF, enc0)
            j = jnp.concatenate(j_cols, axis=1)  # (B_t, M)
            vals = jnp.concatenate(v_cols, axis=1)
            return j, jnp.zeros((B_t, M), jnp.int32), vals

        def cap_r(_):
            # Top-R per parent (R packed-min rounds on the full matrix),
            # then exact top-M of the per-frame M*R pool.
            enc = enc_full
            vR_cols, jR_cols = [], []
            for _ in range(R):
                val, pos, _ = _min_packed(enc)  # (M*B_t, 1)
                vR_cols.append(val)
                jR_cols.append(pos)
                enc = jnp.where(lane_full == pos, _INF, enc)
            vR_stack = jnp.concatenate(vR_cols, axis=1)  # (M*B_t, R)
            jR_stack = jnp.concatenate(jR_cols, axis=1)  # (M*B_t, R)
            # rearrange to per-frame pools (B_t, M*R)
            vR = jnp.concatenate(
                [vR_stack[m * B_t : (m + 1) * B_t, :] for m in range(M)], axis=1
            )
            jR = jnp.concatenate(
                [jR_stack[m * B_t : (m + 1) * B_t, :] for m in range(M)], axis=1
            )
            lanes_pool = jax.lax.broadcasted_iota(jnp.int32, (B_t, M * R), 1)
            enc_pool = _encode_scores(vR, lanes_pool)
            pos_cols, v_cols = [], []
            for _ in range(M):
                val, pos, _ = _min_packed(enc_pool)
                pos_cols.append(pos)
                v_cols.append(val)
                enc_pool = jnp.where(lanes_pool == pos, _INF, enc_pool)
            pos_all = jnp.concatenate(pos_cols, axis=1)  # (B_t, M) in [0, M*R)
            vals = jnp.concatenate(v_cols, axis=1)  # (B_t, M)
            parent = pos_all // R
            if M * R == 128:
                pos_pad = jnp.concatenate(
                    [pos_all, jnp.zeros((B_t, M * R - M), jnp.int32)], axis=1
                )
                j = jnp.take_along_axis(jR, pos_pad, axis=1)[:, :M]
            else:
                j_cols = []
                lanes_jR = jax.lax.broadcasted_iota(jnp.int32, (B_t, M * R), 1)
                for m in range(M):
                    sel = pos_all[:, m : m + 1]
                    j_cols.append(
                        jnp.sum(
                            jnp.where(lanes_jR == sel, jR, 0), axis=1, keepdims=True
                        )
                    )
                j = jnp.concatenate(j_cols, axis=1)
            return j, parent, vals

        j, parent, ss_new = jax.lax.cond(t == 0, fanout, cap_r, 0)

        # ---- beam reorder + extension
        parent_T = parent.T  # (M, B_t)
        j_T = j.T  # (M, B_t)

        # chosen2 = chosen[parent] with codebook t's row overwritten by j
        parent_pad = pad_row(parent_T)  # (M, CW)
        idx_ch = jnp.concatenate([parent_pad] * nc, axis=1)  # (M, nc*CW)
        ch_groups = [
            chosen_ref[g * 8 * nc : (g + 1) * 8 * nc, :].reshape(8, nc * CW)
            for g in range(G)
        ]
        for g in range(G):
            chosen2_ref[g * 8 * nc : (g + 1) * 8 * nc, :] = _gather_rows_grouped(
                ch_groups, idx_ch[8 * g : 8 * (g + 1)]
            ).reshape(8 * nc, CW)
        j_pad = pad_row(j_T)
        for m in range(M):
            chosen2_ref[pl.ds(m * nc + t, 1), :] = j_pad[m : m + 1]
        chosen_ref[:, :] = chosen2_ref[:, :]

        # dst = src[parent] + (c_t(j) - c_t(i_t)): one 16-row gather (two 2x2
        # half-gathers) plus one batched one-hot-difference matmul.
        e_groups = [
            src_ref[g * 8 * B_t : (g + 1) * 8 * B_t, :].reshape(8, B_t * D)
            for g in range(G)
        ]

        def idx_for_half(h):
            # built per output half instead of materializing the full
            # (M, B_t*D) index then slicing it
            ph = jax.lax.slice(parent_T, (8 * h, 0), (8 * (h + 1), B_t))
            return jnp.broadcast_to(ph[:, :, None], (8, B_t, D)).reshape(
                8, B_t * D
            )
        j_col = cols_to_colstack(j.astype(f32)).astype(jnp.int32)  # (M*B_t, 1)
        oh_diff = (lane_full == j_col).astype(bf16) - jnp.concatenate(
            [oh_cur] * M, axis=0
        )
        c_delta = matmul(oh_diff, ctab)  # (M*B_t, D)
        for h in range(G):
            picked = _gather_rows_grouped(e_groups, idx_for_half(h))
            dst_ref[8 * h * B_t : 8 * (h + 1) * B_t, :] = (
                picked.reshape(8 * B_t, D)
                + c_delta[8 * h * B_t : 8 * (h + 1) * B_t, :]
            )
        return ss_new

    def one_pass(p, _):
        # ---- pass init: e = sum_n c_n(i_n) - x, replicated into all M slots
        e = -x

        def add_codebook(t, acc):
            sol_t = sol_ref[pl.ds(t * B_t, B_t), :]
            return acc + matmul(onehot_bt(sol_t), centers_ref[pl.ds(t * cs, cs), :])

        e = jax.lax.fori_loop(0, nc, add_codebook, e)
        for m in range(M):
            EA_ref[m * B_t : (m + 1) * B_t, :] = e

        def seed_chosen(t, _):
            sol_row = pad_row(sol_ref[pl.ds(t * B_t, B_t), :].T)  # (1, CW)
            for m in range(M):
                chosen_ref[pl.ds(m * nc + t, 1), :] = sol_row
            return 0

        jax.lax.fori_loop(0, nc, seed_chosen, 0)

        ss0 = jnp.broadcast_to(
            jnp.sum(e * e, axis=1, keepdims=True), (B_t, M)
        )

        def pair_step(i, ss):
            ss = codebook_step(2 * i, EA_ref, EB_ref, ss)
            ss = codebook_step(2 * i + 1, EB_ref, EA_ref, ss)
            return ss

        ss = jax.lax.fori_loop(0, nc // 2, pair_step, ss0)

        # ---- pass end: keep the best candidate (ss is exact up to the
        # packed-min mantissa truncation, rel err ~2^-15)
        enc_fin = _encode_scores(ss, lane_m)
        _, best, _ = _min_packed(enc_fin)  # (B_t, 1)
        best_pad = pad_row(best.T)  # (1, CW)
        idx_best = jnp.concatenate(
            [jnp.broadcast_to(best_pad, (8, CW))] * nc, axis=1
        )
        ch_groups = [
            chosen_ref[g * 8 * nc : (g + 1) * 8 * nc, :].reshape(8, nc * CW)
            for g in range(G)
        ]
        winner = _gather_rows_grouped(ch_groups, idx_best)  # (8, nc*CW)
        winner_col = winner[0:1, :].T  # (nc*CW, 1)
        for t in range(nc):
            sol_ref[t * B_t : (t + 1) * B_t, :] = winner_col[
                t * CW : t * CW + B_t, :
            ]
        return 0

    jax.lax.fori_loop(0, passes, one_pass, 0)

    out_cols = [sol_ref[t * B_t : (t + 1) * B_t, :] for t in range(nc)]
    out_ref[:, :] = jnp.concatenate(out_cols, axis=1)


def _seqbeam_kernel_v2(
    # inputs
    x_ref,  # (B_t, D) f32
    idx0_ref,  # (B_t, nc) int32
    centers_ref,  # (nc*cs, D) bf16
    cs_sumsq_ref,  # (nc, cs) f32
    gmod_ref,  # (nc*cs, cs) bf16: Gmod_t[i, j] = csq[t, j] - 2 c_t(i).c_t(j)
    # with e_dtype="int8" two more inputs follow:
    #   centers_i8_ref,  # (nc*cs, D) int8, codebook t scaled by csc[t]
    #   csc_ref,  # (nc, 1) f32 per-codebook center scales
    # then the output:
    #   out_ref,  # (B_t, nc) int32
    # then scratch: SUBT sets of (EA, EB, cross, chosenA, chosenB, sol[, SA, SB]),
    # each sized for the B_s = B_t // SUBT sub-tile (SA/SB: per-candidate
    # f32 dequant scales of the int8 E buffers, ping-ponged with EA/EB)
    *rest,
    B_t: int,
    D: int,
    nc: int,
    cs: int,
    M: int,
    R: int,
    passes: int,
    SUBT: int = 1,
    pool_mask: tuple | None = None,
    cross_value: bool = False,
    reorder: str = "gather",
    e_dtype: str = "f32",
    requant: str = "step",
    zip_skew: int = 0,
    sel_impl: str = "lohi",
    lazy_r1: bool = False,
):
    """Restructured sequential-beam kernel (v2).

    Design notes (each measured on v5e):

    * carried per-candidate state (sumsq, selected index) lives in
      (M*B_s, 1) COLUMN values assembled by one sublane concat of the
      selection rounds' outputs — no masked-reduce column-stacking;
    * the t=0 step fans out from the root solution directly: its rescore is
      (B_s, D) x (D, cs) (1/M of a full step), E rows are created by the
      extension matmul itself (no M-fold E pre-fill, no reorder, no
      per-step lax.cond);
    * the final codebook step of each pass skips the E extension/reorder
      entirely;
    * the per-step shared score row csq[j] - 2 c(i).c(j) is ONE one-hot
      matmul against a precomputed modified Gram block (its value at lane
      i is -csq[i], so the cc term falls out of the same gather);
    * selection folds the 256-lane score matrix to 128 lanes up front (ids
      packed first, so results are identical), and the pool rounds carry
      (parent, index) inside the packed mantissa bits — min + one equality
      mask + bit extraction per round;
    * the chosen buffers ping-pong by step parity (no copy back);
    * with SUBT=2 the batch tile is split into two independent sub-tiles
      whose codebook steps are interleaved in one instruction stream: one
      sub-tile's rescore MXU matmul overlaps the other's selection VPU
      chain (Mosaic overlaps independent chains; measured ~60% of a VPU
      chain hidden under a concurrent MXU chain).  Per-frame semantics are
      identical to SUBT=1.

    All bulk arithmetic is matrix-at-a-time: an M-loop of per-candidate
    slice ops measured 2.7x SLOWER than full-matrix stacks (Mosaic pays a
    fixed cost per op).
    """
    assert M % 8 == 0 and M <= 64, M  # beam reorder works in 8-row groups
    assert B_t % SUBT == 0, (B_t, SUBT)
    B_s = B_t // SUBT
    assert B_s in (64, 128, 256, 512) and cs == 256 and nc % 2 == 0
    # pool packing: j (8 bits) + parent (log2 M bits) in the low mantissa
    assert M & (M - 1) == 0 and M * R <= 512, (M, R)
    INT8 = e_dtype == "int8"
    # lazy_r1 (round 5): R1 steps SKIP their extension matmul and the whole
    # in-place E move (dequant + extend + requant over (M*B_s, D) — pure
    # VPU); the not-yet-applied codeword delta is deferred one step into
    # the next pool step, which (a) corrects its rescore via the
    # cross-codebook Gram block Gx[t][i, j] = c_{t-1}(i) . c_t(j) (one
    # extra one-hot matmul on the MXU) and (b) applies both deltas in its
    # reorder+extension move.  Requires a static schedule with no two
    # consecutive deferring R1 steps (altparity qualifies), the select-tree
    # reorder, and step requant.  NOT bit-identical to eager: the Gram
    # correction runs in bf16 while the eager path's delta flows through
    # the exact int8/f32 E update (the skipped R1 requantization round-trip
    # slightly REDUCES cumulative quantization error, the bf16 correction
    # slightly perturbs scores) — quality must be re-measured on chip
    # before promotion (tests assert near-total index agreement).
    if lazy_r1:
        gx_ref, *rest = rest
        assert pool_mask is not None and not cross_value
        assert requant == "step" and reorder == "select"
    else:
        gx_ref = None
    # cmax (the requant="bound" scale-step input) is only passed in bound
    # mode so every pre-existing int8 program stays byte-identical (and the
    # persistent compile cache stays warm for them)
    if INT8 and requant == "bound":
        centers_i8_ref, csc_ref, cmax_ref, out_ref, *scratch = rest
    elif INT8:
        centers_i8_ref, csc_ref, out_ref, *scratch = rest
        cmax_ref = None
    else:
        centers_i8_ref = csc_ref = cmax_ref = None
        out_ref, *scratch = rest
    NCTX = 8 if INT8 else 6
    assert len(scratch) == NCTX * SUBT, len(scratch)
    ctxs = [tuple(scratch[i * NCTX : (i + 1) * NCTX]) for i in range(SUBT)]
    G = M // 8  # gather groups
    CW = max(128, B_s)  # chosen-row lane width (must match scratch shape)
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    lane_cs = jax.lax.broadcasted_iota(jnp.int32, (B_s, cs), 1)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_s, cs), 1)
    lane_pool = jax.lax.broadcasted_iota(jnp.int32, (B_s, M * R), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (B_s, M), 1)
    assert reorder in ("gather", "select", "wideselect"), reorder
    # bf16 E halves reorder/extension traffic; rescore precision is
    # unchanged (the matmul casts E to bf16 either way), only the per-step
    # E += c_delta accumulation rounds at bf16 (quality measured at +0.01%
    # of the f32 variant, experiments/e_bf16_quality_d512_b8.json).  The
    # dynamic_gather reorder is f32/int32-only, hence the gate.
    # int8: E stored int8 with per-candidate f32 scales (requantized after
    # every extension); rescore and extension run int8 x int8 -> int32 on
    # the MXU's 2x-peak path (capability + 1.68x speed incl. the requant
    # VPU work proven on-chip, experiments/int8_mxu_probe.log; search
    # quality screened kernel-faithfully in experiments/int8ec_quality.py).
    ED = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[e_dtype]
    assert e_dtype == "f32" or reorder in ("select", "wideselect"), (
        e_dtype, reorder)
    assert not INT8 or (reorder == "select" and not cross_value), (
        "int8 E supports the select-tree reorder with the cross scratch ref"
    )
    # requant="pass" (int8 only): per-frame scales FROZEN at pass init from
    # the root error (identical across beam slots, so they never reorder);
    # extensions become integer adds q += round(c_delta/s) clipped to
    # [-127, 127] — no per-step max-abs reduce, no scale select-trees.
    # Quality screened at +0.98% vs beam-5 (step-requant: +0.96%),
    # experiments/int8ec_quality_d512_b8.json "int8EC-fixedscale".
    # requant="bound" (int8 only): per-step scales propagated as the UPPER
    # BOUND s_new = s_parent + cmax_t/127 (cmax_t = per-codebook worst-case
    # |c(j) - c(i)|_inf, a precomputed input) instead of the exact row max —
    # round() never clips since |E_par + c_delta|_inf <= 127 s_new, and the
    # per-step row-max VPU reduce disappears.  Quality screened at +0.98%
    # vs beam-5 (exact: +0.96%), experiments/boundscale_quality_d512_b8.json.
    assert requant in ("step", "pass", "bound") and (requant == "step" or INT8)
    FIXS = requant == "pass"
    BOUND = requant == "bound"
    assert sel_impl in ("lohi", "fold"), sel_impl

    def pad_row(row):  # (rows, B_s) -> (rows, CW)
        if B_s == CW:
            return row
        r = row.shape[0]
        return jnp.concatenate([row, jnp.zeros((r, CW - B_s), row.dtype)], axis=1)

    def onehot_bt(idx_col):  # (B_s, 1) int32 -> (B_s, cs) bf16
        return (lane_cs == idx_col).astype(bf16)

    def matmul(a, b):
        return jnp.dot(a.astype(bf16), b, preferred_element_type=f32)

    def matmul_nt(a, b):  # contraction on dim 1 of both operands
        return jax.lax.dot_general(
            a.astype(bf16),
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    # ---- init: per-sub root solution columns from idx0
    idx0 = idx0_ref[:]  # (B_t, nc)
    lane_nc = jax.lax.broadcasted_iota(jnp.int32, (B_s, nc), 1)
    for sub in range(SUBT):
        sol_ref = ctxs[sub][5]
        idx0_s = jax.lax.slice(idx0, (sub * B_s, 0), ((sub + 1) * B_s, nc))
        for t in range(nc):
            sol_ref[t * B_s : (t + 1) * B_s, :] = jnp.sum(
                jnp.where(lane_nc == t, idx0_s, 0), axis=1, keepdims=True
            )

    def folded_rounds(S, rounds):
        """``rounds`` packed-min extractions over raw scores S (rows, 256),
        folded to 128 lanes once up front (ids are packed before folding,
        so results are identical to full-width rounds)."""
        rows = S.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, cs), 1)
        enc = _encode_scores(S, lanes)
        lo = enc[:, 0:128]
        hi = enc[:, 128:256]
        outs = []
        if sel_impl == "fold":
            # Fold ONCE and, per extraction, PROMOTE the consumed lane's
            # pair partner: g holds the pairwise min, gmax the pairwise max.
            # When the global min is extracted, its lane is replaced by the
            # partner (g <- gmax there) and the partner is retired
            # (gmax <- _INF there), so the second-best of a folded pair
            # stays reachable — the exact semantics of the lo/hi variant,
            # which re-minimums both halves every round.  The equality mask
            # hits exactly one lane: packed values are unique (the 8-bit
            # codeword id rides in the low mantissa bits and each id lands
            # in one lane; _INF carries no id and can never be an extracted
            # min while rounds < live lanes).  Bit-identical extraction
            # order at ~2 fewer full-width VPU passes per round (no fresh
            # minimum, one equality instead of two lane-indexed masks).
            g = jnp.minimum(lo, hi)
            gmax = jnp.maximum(lo, hi)
            for _ in range(rounds):
                val, pos, emin = _min_packed(g)
                hit = g == emin
                g = jnp.where(hit, gmax, g)
                gmax = jnp.where(hit, _INF, gmax)
                outs.append((val, pos, emin))
            return outs
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        for _ in range(rounds):
            val, pos, emin = _min_packed(jnp.minimum(lo, hi))
            lo = jnp.where(lane_h == pos, _INF, lo)
            hi = jnp.where(lane_h == pos - 128, _INF, hi)
            outs.append((val, pos, emin))
        return outs

    def codebook_step_phases(t, ctx, src, dst_ref, ss_col, first, last,
                             ch_src, ch_dst, pool=True,
                             s_src=None, s_dst=None,
                             pend_in=False, pend_out=False, cell=None):
        """One beam step on codebook t for one sub-tile, split into four
        phases so the driver can ZIP phases across independent sub-tiles:

          ph0 (MXU)  shared-row + rescore matmuls
          ph1 (VPU)  score assembly, selection, chosen bookkeeping
          ph2 (MXU)  extension one-hot-difference matmul
          ph3 (VPU)  beam reorder + E write

        With two sub-tiles emitted phase-zipped (A0 B3' A1 B0 A2 B1 A3 B2
        ...), every MXU matmul is followed in program order by the OTHER
        sub-tile's independent VPU work, so the in-order issue stream never
        stalls on the matmul's consumer and the MXU runs concurrently with
        the VPU (emitting a step's phases back-to-back leaves the MXU idle
        during all VPU phases — measured as the SUBT=2 "wash" in round 2).

        ``ss_col`` is the carried per-candidate ||E_m||^2 as an (M*B_s, 1)
        column (ignored when ``first``); ph1 returns the updated column.
        ``src`` is the root error VALUE (B_s, D) when ``first``, else the E
        ping buffer ref.

        ``pool=False`` runs the step in R1 mode: every parent keeps its own
        best child (no cross-parent competition), so there is NO beam
        reorder, NO chosen gather, and a single selection round — the
        caller passes ``dst_ref is src`` and ``ch_dst is ch_src`` and the
        step updates both in place.  R1-everywhere saturates at +1.26% vs
        the reference beam-5 (outside the 1% bar); mixed schedules that
        keep a fraction of pool steps recover the quality at a fraction of
        the bookkeeping cost (experiments/pool_schedule_sweep.py).

        ``pend_out`` (lazy_r1): this R1 step DEFERS its E update — ph2/ph3
        are skipped and ph1 stashes (j, j_col, sol_t) in ``cell``.
        ``pend_in``: the previous step deferred — ph0 computes the Gram
        score correction, ph1 adds it to the dequantized cross, and
        ph2/ph3 apply BOTH codebooks' deltas in the merged move (always a
        pool step by the schedule constraint)."""
        cross_ref, sol_ref = ctx[2], ctx[5]
        st = {}  # values handed between phases

        def ph0_rescore():
            sol_t = sol_ref[pl.ds(t * B_s, B_s), :]  # (B_s, 1)
            ctab = centers_ref[pl.ds(t * cs, cs), :]  # (cs, D) bf16
            oh_cur = onehot_bt(sol_t)
            if INT8:
                st["ctab_i8"] = centers_i8_ref[pl.ds(t * cs, cs), :]
                st["csc_t"] = csc_ref[pl.ds(t, 1), :]  # (1, 1) f32
                if BOUND:
                    # worst-case |c_t(j) - c_t(i)|_inf in csc[t] units
                    st["cmax_t"] = cmax_ref[pl.ds(t, 1), :]  # (1, 1) f32
            # shared per-frame score row csq[j] - 2 c_t(i_t).c_t(j)
            if "shared" in _SKIP and not first:
                shared = jnp.zeros((B_s, cs), f32)
            else:
                gmod_t = gmod_ref[pl.ds(t * cs, cs), :]  # (cs, cs) bf16
                shared = matmul(oh_cur, gmod_t)  # (B_s, cs) f32
            if first:
                # root-only rescore (all candidates identical at the sweep
                # start): 1/M of a full rescore
                e = src  # (B_s, D) value
                st["cross0"] = matmul_nt(e, ctab)  # (B_s, cs)
                st["ss0"] = jnp.sum(e * e, axis=1, keepdims=True)
            elif "rescore" not in _SKIP:
                # cross[m*B_s+b, j] = E_m . c_t(j).  With cross_value the
                # matmul result is handed to ph1 as an SSA value instead of
                # round-tripping through the scratch ref: ref reads/writes
                # can make Mosaic's scheduler order the phases of
                # INDEPENDENT sub-tiles (coarse memory disambiguation),
                # defeating the phase-zip's intended MXU/VPU overlap.
                if INT8:
                    # int8 x int8 -> int32 (2x MXU peak); dequant scales
                    # (per-candidate row x per-codebook csc) applied in ph1
                    cross_ref[:, :] = jax.lax.dot_general(
                        src[:, :], st["ctab_i8"],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                elif cross_value:
                    st["cross"] = matmul_nt(src[:, :], ctab)
                else:
                    cross_ref[:, :] = matmul_nt(src[:, :], ctab)
            if pend_in and "lazycorr" not in _SKIP:
                # pending R1 deferral from codebook t-1: the E buffers are
                # stale by delta = c_{t-1}(j) - c_{t-1}(i); correct this
                # step's scores via the cross-codebook Gram block
                # Gx[t][i, j] = c_{t-1}(i) . c_t(j) (one one-hot MXU
                # matmul instead of the skipped (M*B_s, D) E update)
                assert pool and not first
                gxt = gx_ref[pl.ds(t * cs, cs), :]  # (cs, cs) bf16
                solp_stack = jnp.concatenate([cell["sol"]] * M, axis=0)
                ohd_prev = (lane_full == cell["j_col"]).astype(bf16) - (
                    lane_full == solp_stack
                ).astype(bf16)
                st["corr"] = matmul(ohd_prev, gxt)  # (M*B_s, cs) f32
            st.update(sol_t=sol_t, ctab=ctab, oh_cur=oh_cur, shared=shared)

        def ph1_select():
            sol_t, shared = st["sol_t"], st["shared"]
            # NOTE ccn (= -csq[i_t], a per-frame constant) looks droppable
            # since every comparison is within one frame — but dropping it
            # accumulates Sigma csq[i_t] into the carried scores, inflating
            # their magnitude far above the actual error scale on trained
            # codebooks, and the packed-mantissa argmin's RELATIVE 2^-15
            # truncation then swamps the between-candidate differences
            # (measured +17% rel err).  It must stay.
            if "shared" in _SKIP and not first:
                ccn = jnp.zeros((B_s, 1), f32)
            else:
                ccn = _gather_lane256(shared, sol_t)  # (B_s, 1) = -csq[i_t]
            if first:
                # M-way fan-out from the single root candidate
                Ec0 = _gather_lane256(st["cross0"], sol_t)
                S0 = (st["ss0"] - 2.0 * Ec0 - ccn) + shared + 2.0 * st["cross0"]
                picks = folded_rounds(S0, M)
                v_cols = [v for v, _, _ in picks]
                j_cols = [p for _, p, _ in picks]
                parent = None
            else:
                cross = st["cross"] if cross_value else cross_ref[:, :]
                if INT8:
                    # dequant: int32 counts x (E row scale x codebook scale)
                    if "dequant" in _SKIP:
                        cross = cross.astype(f32)
                    else:
                        cross = cross.astype(f32) * (
                            s_src[:, :] * st["csc_t"]
                        )
                if "corr" in st:
                    # deferred-R1 Gram correction (absolute units)
                    cross = cross + st["corr"]
                if "assembly" in _SKIP:
                    S_full = cross
                else:
                    sol_stack = jnp.concatenate([sol_t] * M, axis=0)
                    Ec = _gather_lane256(cross, sol_stack)
                    ccn_stack = jnp.concatenate([ccn] * M, axis=0)
                    shared_stack = jnp.concatenate([shared] * M, axis=0)
                    S_full = (
                        (ss_col - 2.0 * Ec - ccn_stack)
                        + shared_stack
                        + 2.0 * cross
                    )
                if "sel" in _SKIP:
                    v_cols = [jnp.zeros((B_s, 1), f32)] * M
                    j_cols = [sol_t] * M
                    parent = jnp.zeros((B_s, M), jnp.int32)
                elif not pool:
                    # ---- R1: best child per parent, slot order kept.
                    val, pos, _ = folded_rounds(S_full, 1)[0]  # (M*B_s, 1)
                    v_cols = [val]  # already the full (M*B_s, 1) column
                    j_cols = [pos]
                    parent = None
                else:
                    # ---- selection: top-R per parent, then top-M of the
                    # pool.  Pool entries carry (parent m, index j) INSIDE
                    # the packed value: j in the low 8 mantissa bits (from
                    # the per-row rounds), m overlaid on the next log2(M)
                    # bits.  Each round is min + one equality mask + bit
                    # extraction; (m, j) pairs are unique, so the equality
                    # mask hits exactly once.
                    picks = folded_rounds(S_full, R)
                    vRe = jnp.concatenate([e_ for _, _, e_ in picks], axis=1)
                    pool0 = jnp.concatenate(
                        [vRe[m * B_s : (m + 1) * B_s, :] for m in range(M)],
                        axis=1,
                    )  # (B_s, M*R) packed scores, j in low bits
                    mbits = (M - 1) << _LANE_BITS
                    mconst = (lane_pool // R) << _LANE_BITS
                    penc = pltpu.bitcast(
                        (pltpu.bitcast(pool0, jnp.int32) & ~mbits) | mconst,
                        jnp.float32,
                    )
                    v_cols, j_cols, p_cols = [], [], []
                    for _ in range(M):
                        emin = jnp.min(penc, axis=1, keepdims=True)
                        penc = jnp.where(penc == emin, _INF, penc)
                        bits = pltpu.bitcast(emin, jnp.int32)
                        j_cols.append(bits & _LANE_MASK)
                        p_cols.append((bits >> _LANE_BITS) & (M - 1))
                        v_cols.append(
                            pltpu.bitcast(
                                bits & ~(mbits | _LANE_MASK), jnp.float32
                            )
                        )
                    parent = jnp.concatenate(p_cols, axis=1)  # (B_s, M)

            ss_new = jnp.concatenate(v_cols, axis=0)  # (M*B_s, 1)
            j_col = jnp.concatenate(j_cols, axis=0)  # (M*B_s, 1)
            if len(j_cols) == 1:  # R1: de-stack (M*B_s, 1) to (B_s, M)
                j = jnp.concatenate(
                    [
                        jax.lax.slice(j_col, (m * B_s, 0), ((m + 1) * B_s, 1))
                        for m in range(M)
                    ],
                    axis=1,
                )
            else:
                j = jnp.concatenate(j_cols, axis=1)  # (B_s, M)
            if pend_out:
                # deferring R1 step: stash the selection for the next pool
                # step's Gram correction + merged extension
                cell["j"], cell["j_col"], cell["sol"] = j, j_col, st["sol_t"]
            j_pad = pad_row(j.T)  # (M, CW)
            parent_T = (
                None if (first or parent is None) else parent.T
            )  # (M, B_s)

            # ---- chosen bookkeeping (ping-pong by step parity, no copy)
            if "chosen" in _SKIP:
                pass
            elif first:
                # seed all candidates from the root solution with row t
                # overwritten, assembled as ONE (M*nc, CW) value + a single
                # ref write: the original M*nc single-row ref writes paid
                # Mosaic's fixed per-op cost ~72x per pass per tile
                sol_block = jnp.concatenate(
                    [
                        pad_row(sol_ref[pl.ds(s * B_s, B_s), :].T)
                        for s in range(nc)
                    ],
                    axis=0,
                )  # (nc, CW)
                riota = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)
                ch_dst[:, :] = jnp.concatenate(
                    [
                        jnp.where(riota == t, j_pad[m : m + 1], sol_block)
                        for m in range(M)
                    ],
                    axis=0,
                )
            elif not pool:
                # R1: children stay in their parent's slot — overwrite row
                # t only (ch_dst is ch_src).
                for m in range(M):
                    ch_dst[pl.ds(m * nc + t, 1), :] = j_pad[m : m + 1]
            elif reorder in ("select", "wideselect"):
                # chosen reorder as the same bit-keyed select tree (lane
                # conditions: parent_pad row m broadcast over the nc rows);
                # the row-t overwrite is folded into the block write (an
                # M-loop of single-row ref writes pays Mosaic's fixed
                # per-op cost)
                parent_pad = pad_row(parent_T)  # (M, CW)
                riota_nc = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)
                for m in range(M):
                    cond = jax.lax.slice(parent_pad, (m, 0), (m + 1, CW))
                    level = [
                        ch_src[p * nc : (p + 1) * nc, :] for p in range(M)
                    ]
                    bit = 1
                    while len(level) > 1:
                        sel = (cond & bit) != 0
                        level = [
                            jnp.where(sel, level[2 * i + 1], level[2 * i])
                            for i in range(len(level) // 2)
                        ]
                        bit <<= 1
                    ch_dst[m * nc : (m + 1) * nc, :] = jnp.where(
                        riota_nc == t, j_pad[m : m + 1], level[0]
                    )
            else:
                parent_pad = pad_row(parent_T)  # (M, CW)
                idx_ch = jnp.concatenate([parent_pad] * nc, axis=1)
                ch_groups = [
                    ch_src[g * 8 * nc : (g + 1) * 8 * nc, :].reshape(
                        8, nc * CW
                    )
                    for g in range(G)
                ]
                for g in range(G):
                    ch_dst[g * 8 * nc : (g + 1) * 8 * nc, :] = (
                        _gather_rows_grouped(
                            ch_groups, idx_ch[8 * g : 8 * (g + 1)]
                        ).reshape(8 * nc, CW)
                    )
                for m in range(M):
                    ch_dst[pl.ds(m * nc + t, 1), :] = j_pad[m : m + 1]
            st.update(j_col=j_col, parent_T=parent_T,
                      parent=None if (first or parent is None) else parent)
            return ss_new

        def ph2_ext():
            if last:
                return
            if pend_out:
                # deferring R1 step: no extension matmul — the next pool
                # step's merged move applies this codebook's delta
                return
            if "ext" in _SKIP:
                st["c_delta"] = None
                return
            if pend_in and "lazyext" not in _SKIP:
                # gather the deferred j_{t-1} through each destination
                # block's parent (tiny (B_s, M) masked reduces), then form
                # the previous codebook's one-hot delta; its matmul stays
                # SEPARATE in int8 mode (the int8 tables are in
                # per-codebook units) and merges into c_delta otherwise
                jp = cell["j"]  # (B_s, M) by OLD slot
                cols = []
                for m in range(M):
                    pm = jnp.sum(
                        jnp.where(lane_m == m, st["parent"], 0),
                        axis=1, keepdims=True,
                    )
                    cols.append(
                        jnp.sum(
                            jnp.where(lane_m == pm, jp, 0),
                            axis=1, keepdims=True,
                        )
                    )
                jp_dst = jnp.concatenate(cols, axis=0)  # (M*B_s, 1)
                solp_stack = jnp.concatenate([cell["sol"]] * M, axis=0)
                st["ohd_prev"] = (lane_full == jp_dst).astype(f32) - (
                    lane_full == solp_stack
                ).astype(f32)
            if INT8 and not first:
                # one-hot difference is exactly representable in int8, so
                # the extension matmul rides the 2x int8 path too.  Its
                # int32 result is in csc[t] units; ph3 works in those units
                # end-to-end (scalars only ever multiply data-dependent
                # COLUMNS — a (rows, D) x (1, 1) product lowers to a
                # both-sublanes-and-lanes vector broadcast Mosaic rejects).
                # The first step uses the bf16 path below: its source e is
                # a f32 value in absolute units and only 1/M-sized work.
                # difference formed in f32 then converted: Mosaic has no
                # int8 subtraction (arith.subi on i8 fails to legalize)
                oh_diff_i8 = (
                    (lane_full == st["j_col"]).astype(f32)
                    - (lane_full == jnp.concatenate(
                        [st["sol_t"]] * M, axis=0)).astype(f32)
                ).astype(jnp.int8)
                st["c_delta_i32"] = jax.lax.dot_general(
                    oh_diff_i8, st["ctab_i8"],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (M*B_s, D)
                if "ohd_prev" in st:
                    # deferred delta of codebook t-1: int32 counts in
                    # csc[t-1] units (ph3 rescales by csc[t-1]/csc[t])
                    st["c_delta_prev_i32"] = jax.lax.dot_general(
                        st["ohd_prev"].astype(jnp.int8),
                        centers_i8_ref[pl.ds((t - 1) * cs, cs), :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    st["csc_prev"] = csc_ref[pl.ds(t - 1, 1), :]  # (1, 1)
                return
            oh_diff = (lane_full == st["j_col"]).astype(bf16) - jnp.concatenate(
                [st["oh_cur"]] * M, axis=0
            )
            c_delta = matmul(oh_diff, st["ctab"])  # (M*B_s, D)
            if "ohd_prev" in st:
                # absolute units: the deferred delta merges directly
                c_delta = c_delta + matmul(
                    st["ohd_prev"], centers_ref[pl.ds((t - 1) * cs, cs), :]
                )
            st["c_delta"] = c_delta

        def requant_rows(ef):
            """Symmetric per-row int8 requantize of a f32 block: returns
            (int8 values, f32 scales column).  round(ef/s) is <= 127 in
            magnitude by construction of s, so no clip is needed."""
            s = jnp.max(jnp.abs(ef), axis=1, keepdims=True) * (1.0 / 127.0)
            s = jnp.maximum(s, 1e-20)
            return jnp.round(ef * (1.0 / s)).astype(jnp.int8), s

        def ph3_move():
            if last:
                return
            if pend_out:
                # deferring R1 step: the (M*B_s, D) dequant + extend +
                # requant chain — pure VPU — is skipped entirely; the next
                # pool step's merged move applies the delta
                return
            if not pool and "r1move" in _SKIP:
                # bisect-only: drop the R1 in-place dequant+extend+requant
                # entirely (results WRONG) to attribute its device time
                return
            if INT8:
                # All arithmetic below runs in csc[t] UNITS: the int32
                # extension term adds raw, the incoming E scales are
                # divided by csc[t] (a column x (1,1) product — sublane
                # broadcast only), and the new scales are multiplied back.
                # Mathematically identical to absolute units (positive
                # scalar), and no (rows, D) x (1, 1) product ever forms —
                # Mosaic rejects that broadcast shape.
                cdi = st.get("c_delta_i32")
                csc_t = st["csc_t"]  # (1, 1)
                inv_csc = 1.0 / csc_t
                if first:
                    # bf16 extension (absolute units): see ph2.
                    c_delta = st.get("c_delta")
                    if c_delta is not None:
                        e_stack = jnp.concatenate([src] * M, axis=0)
                        if FIXS:
                            # scales from the ROOT error (pre-extension):
                            # identical across beam slots by construction,
                            # so they never need reordering
                            s0 = jnp.maximum(
                                jnp.max(jnp.abs(src), axis=1, keepdims=True)
                                * (1.0 / 127.0),
                                1e-20,
                            )
                            s_stack = jnp.concatenate([s0] * M, axis=0)
                            s_dst[:, :] = s_stack
                            q = jnp.clip(
                                jnp.round(
                                    (e_stack + c_delta) * (1.0 / s_stack)
                                ),
                                -127.0, 127.0,
                            ).astype(jnp.int8)
                            dst_ref[:, :] = q
                        else:
                            q, s = requant_rows(e_stack + c_delta)
                            dst_ref[:, :] = q
                            s_dst[:, :] = s
                elif FIXS:
                    cdi_f = None if cdi is None else cdi.astype(f32)
                    if not pool or "reorder" in _SKIP:
                        col = csc_t * (1.0 / s_src[:, :])  # (M*B_s, 1)
                        qf = src[:, :].astype(f32)
                        if cdi_f is not None:
                            qf = qf + jnp.round(cdi_f * col)
                        dst_ref[:, :] = jnp.clip(qf, -127.0, 127.0).astype(
                            jnp.int8
                        )
                    else:
                        src_blocks = [
                            src[p * B_s : (p + 1) * B_s, :] for p in range(M)
                        ]
                        for m in range(M):
                            cond = jnp.sum(
                                jnp.where(lane_m == m, st["parent"], 0),
                                axis=1,
                                keepdims=True,
                            )
                            level = src_blocks
                            bit = 1
                            while len(level) > 1:
                                sel = (cond & bit) != 0
                                level = [
                                    jnp.where(
                                        sel, level[2 * i + 1], level[2 * i]
                                    )
                                    for i in range(len(level) // 2)
                                ]
                                bit <<= 1
                            qf = level[0].astype(f32)
                            if cdi_f is not None:
                                col = csc_t * (
                                    1.0 / s_src[pl.ds(m * B_s, B_s), :]
                                )
                                qf = qf + jnp.round(
                                    cdi_f[m * B_s : (m + 1) * B_s, :] * col
                                )
                            dst_ref[m * B_s : (m + 1) * B_s, :] = jnp.clip(
                                qf, -127.0, 127.0
                            ).astype(jnp.int8)
                elif not pool or "reorder" in _SKIP:
                    # R1: no reorder — dequant + extend + requant in place
                    # (dst_ref is src, s_dst is s_src).
                    s_adj = s_src[:, :] * inv_csc  # (M*B_s, 1)
                    ef_u = src[:, :].astype(f32) * s_adj
                    if cdi is not None:
                        ef_u = ef_u + cdi.astype(f32)
                    if BOUND:
                        s_u = s_adj + st["cmax_t"] * (1.0 / 127.0)
                        # the inf-norm bound guarantees |ef_u/s_u| <= 127
                        # only in exact arithmetic; clip so f32 rounding at
                        # the bound edge can never wrap the int8 cast
                        q = jnp.clip(
                            jnp.round(ef_u * (1.0 / s_u)), -127.0, 127.0
                        ).astype(jnp.int8)
                    else:
                        q, s_u = requant_rows(ef_u)
                    dst_ref[:, :] = q
                    s_dst[:, :] = s_u * csc_t
                else:
                    # select-tree beam reorder on the int8 rows AND the f32
                    # scale columns (same parent bits), then dequant +
                    # extend + requant per destination block.
                    src_blocks = [
                        src[p * B_s : (p + 1) * B_s, :] for p in range(M)
                    ]
                    s_blocks = [
                        s_src[p * B_s : (p + 1) * B_s, :] * inv_csc
                        for p in range(M)
                    ]
                    for m in range(M):
                        cond = jnp.sum(
                            jnp.where(lane_m == m, st["parent"], 0),
                            axis=1,
                            keepdims=True,
                        )  # (B_s, 1) parent index for dst block m
                        lev_e, lev_s = src_blocks, s_blocks
                        bit = 1
                        while len(lev_e) > 1:
                            sel = (cond & bit) != 0
                            lev_e = [
                                jnp.where(sel, lev_e[2 * i + 1], lev_e[2 * i])
                                for i in range(len(lev_e) // 2)
                            ]
                            lev_s = [
                                jnp.where(sel, lev_s[2 * i + 1], lev_s[2 * i])
                                for i in range(len(lev_s) // 2)
                            ]
                            bit <<= 1
                        if "requant" in _SKIP:
                            # bisect-only: reorder but skip the dequant +
                            # extend + requant tail (results WRONG)
                            dst_ref[m * B_s : (m + 1) * B_s, :] = lev_e[0]
                            s_dst[m * B_s : (m + 1) * B_s, :] = (
                                lev_s[0] * csc_t
                            )
                            continue
                        ef_u = lev_e[0].astype(f32) * lev_s[0]
                        if cdi is not None:
                            ef_u = ef_u + cdi.astype(f32)[
                                m * B_s : (m + 1) * B_s, :
                            ]
                        cdip = st.get("c_delta_prev_i32")
                        if cdip is not None:
                            # deferred delta in csc[t-1] units: rescale by
                            # csc[t-1]/csc[t] via a COLUMN broadcast (a
                            # (rows, D) x (1, 1) product is rejected)
                            rcol = lev_s[0] * 0.0 + st["csc_prev"] * inv_csc
                            ef_u = ef_u + cdip.astype(f32)[
                                m * B_s : (m + 1) * B_s, :
                            ] * rcol
                        if BOUND:
                            s_u = lev_s[0] + st["cmax_t"] * (1.0 / 127.0)
                            # clip: see the R1 bound-mode comment above
                            q = jnp.clip(
                                jnp.round(ef_u * (1.0 / s_u)), -127.0, 127.0
                            ).astype(jnp.int8)
                        else:
                            q, s_u = requant_rows(ef_u)
                        dst_ref[m * B_s : (m + 1) * B_s, :] = q
                        s_dst[m * B_s : (m + 1) * B_s, :] = s_u * csc_t
                return
            c_delta = st["c_delta"]
            if first:
                if c_delta is not None:
                    e_stack = jnp.concatenate([src] * M, axis=0)  # (M*B_s, D)
                    dst_ref[:, :] = (e_stack + c_delta).astype(ED)
            elif not pool:
                # R1: no reorder — in-place extension (dst_ref is src).
                if c_delta is not None:
                    dst_ref[:, :] = (
                        src[:, :].astype(f32) + c_delta
                    ).astype(ED)
            elif reorder == "wideselect" and "reorder" not in _SKIP:
                # Same select tree, matrix-at-a-time: ONE (M*B_s, D) select
                # per tree node (log2(M) levels, M-1 nodes total) instead
                # of an M-loop of per-block trees — Mosaic pays a fixed
                # cost per op (round-2 lesson), so fewer/wider ops win when
                # the work is overhead-bound.  Level-0 operands are the M
                # source blocks each tiled M-fold vertically; the condition
                # is the (M*B_s, 1) column stack of each destination
                # block's parent index.
                # (M*B_s, 1) column stack of per-dst-block parent indexes
                # (masked lane-reduce, NOT a sub-128 lane slice: Mosaic
                # rejects lane offsets that are not 128-multiples)
                pcol = jnp.concatenate(
                    [
                        jnp.sum(
                            jnp.where(lane_m == m, st["parent"], 0),
                            axis=1,
                            keepdims=True,
                        )
                        for m in range(M)
                    ],
                    axis=0,
                )
                level = [
                    jnp.concatenate([src[p * B_s : (p + 1) * B_s, :]] * M,
                                    axis=0)
                    for p in range(M)
                ]
                bit = 1
                while len(level) > 1:
                    sel = (pcol & bit) != 0
                    level = [
                        jnp.where(sel, level[2 * i + 1], level[2 * i])
                        for i in range(len(level) // 2)
                    ]
                    bit <<= 1
                dst_ref[:, :] = (
                    level[0].astype(f32)
                    + (c_delta if c_delta is not None else 0.0)
                ).astype(ED)
            elif reorder == "select" and "reorder" not in _SKIP:
                # Beam reorder as a bit-exact SELECT TREE: destination
                # block m picks, per frame, one of the M aligned B_s-row
                # slices of E via log2(M) levels of full-rate vector
                # selects keyed on the parent index bits (conditions are
                # (B_s, 1) columns broadcast over D lanes).  Identical row
                # moves to the dynamic_gather path, but selects run at
                # vector rate while the cross-sublane gather shuffle does
                # not.
                src_blocks = [
                    src[p * B_s : (p + 1) * B_s, :] for p in range(M)
                ]
                for m in range(M):
                    cond = jnp.sum(
                        jnp.where(lane_m == m, st["parent"], 0),
                        axis=1,
                        keepdims=True,
                    )  # (B_s, 1) parent index for dst block m
                    level = src_blocks
                    bit = 1
                    while len(level) > 1:
                        sel = (cond & bit) != 0
                        level = [
                            jnp.where(sel, level[2 * i + 1], level[2 * i])
                            for i in range(len(level) // 2)
                        ]
                        bit <<= 1
                    picked = level[0].astype(f32)
                    dst_ref[m * B_s : (m + 1) * B_s, :] = (
                        picked
                        + (
                            c_delta[m * B_s : (m + 1) * B_s, :]
                            if c_delta is not None
                            else 0.0
                        )
                    ).astype(ED)
            else:
                e_groups = [
                    src[g * 8 * B_s : (g + 1) * 8 * B_s, :].reshape(
                        8, B_s * D
                    )
                    for g in range(G)
                ]
                parent_T = st["parent_T"]

                def idx_for_half(h):
                    ph = jax.lax.slice(parent_T, (8 * h, 0), (8 * (h + 1), B_s))
                    return jnp.broadcast_to(
                        ph[:, :, None], (8, B_s, D)
                    ).reshape(8, B_s * D)

                for h in range(G):
                    if "reorder" in _SKIP:
                        picked = src[8 * h * B_s : 8 * (h + 1) * B_s, :]
                    else:
                        picked = _gather_rows_grouped(
                            e_groups, idx_for_half(h)
                        ).reshape(8 * B_s, D)
                    dst_ref[8 * h * B_s : 8 * (h + 1) * B_s, :] = (
                        picked.astype(f32)
                        + (
                            c_delta[8 * h * B_s : 8 * (h + 1) * B_s, :]
                            if c_delta is not None
                            else 0.0
                        )
                    ).astype(ED)

        return [ph0_rescore, ph1_select, ph2_ext, ph3_move]

    def run_zipped(step_args):
        """Run one step for each sub-tile with phases zipped across
        sub-tiles; returns the per-sub ss columns."""
        phase_lists = [codebook_step_phases(*a) for a in step_args]
        out = [None] * len(phase_lists)
        for i in range(4):
            for s, phases in enumerate(phase_lists):
                r = phases[i]()
                if i == 1:
                    out[s] = r
        return out

    def codebook_step(t, ctx, src, dst_ref, ss_col, first, last, ch_src,
                      ch_dst, pool=True, s_src=None, s_dst=None):
        return run_zipped(
            [(t, ctx, src, dst_ref, ss_col, first, last, ch_src, ch_dst,
              pool, s_src, s_dst)]
        )[0]

    x = x_ref[:]  # (B_t, D)

    def _s(ctx, i):  # scale ref riding with E buffer i (int8 only);
        # fixed-scale mode keeps ONE per-pass scale column in SA
        if not INT8:
            return None
        return ctx[6] if FIXS else ctx[6 + i]

    def one_pass_with(mask):
        # Sub-tiles are processed with their codebook steps interleaved in
        # one instruction stream; their chains are independent, so one
        # sub-tile's MXU rescore overlaps the other's VPU selection.
        if mask is not None and SUBT > 1 and zip_skew:
            return one_pass_skewed(mask, zip_skew)
        sss = []
        for sub in range(SUBT):
            ctx = ctxs[sub]
            EA_ref, chosenA, sol_ref = ctx[0], ctx[3], ctx[5]
            x_s = jax.lax.slice(x, (sub * B_s, 0), ((sub + 1) * B_s, D))

            def add_codebook(s, acc, sol_ref=sol_ref):
                sol_s = sol_ref[pl.ds(s * B_s, B_s), :]
                return acc + matmul(
                    onehot_bt(sol_s), centers_ref[pl.ds(s * cs, cs), :]
                )

            e = jax.lax.fori_loop(0, nc, add_codebook, -x_s)
            # chosen parity: step 0 seeds A; odd steps gather A->B, even
            # B->A; nc is even so the last (odd) step leaves state in B.
            sss.append(
                codebook_step(0, ctx, e, EA_ref, None, True, False,
                              chosenA, chosenA,
                              s_dst=ctx[6] if INT8 else None)
            )

        if mask is None:
            def pair_step(i, sss):
                out = list(sss)
                for parity in (1, 2):  # codebooks 2i+1 (A->B), 2i+2 (B->A)
                    if parity == 1:
                        out = run_zipped([
                            (2 * i + 1, ctxs[s], ctxs[s][0], ctxs[s][1],
                             out[s], False, False, ctxs[s][3], ctxs[s][4],
                             True, _s(ctxs[s], 0), _s(ctxs[s], 1))
                            for s in range(SUBT)
                        ])
                    else:
                        out = run_zipped([
                            (2 * i + 2, ctxs[s], ctxs[s][1], ctxs[s][0],
                             out[s], False, False, ctxs[s][4], ctxs[s][3],
                             True, _s(ctxs[s], 1), _s(ctxs[s], 0))
                            for s in range(SUBT)
                        ])
                return tuple(out)

            sss = tuple(sss)
            if nc > 2:
                sss = jax.lax.fori_loop(0, (nc - 2) // 2, pair_step, sss)
            sss = list(sss)
            sss = run_zipped([
                (nc - 1, ctxs[s], ctxs[s][0], ctxs[s][1], sss[s],
                 False, True, ctxs[s][3], ctxs[s][4], True,
                 _s(ctxs[s], 0), _s(ctxs[s], 1))
                for s in range(SUBT)
            ])
            ch_fin = 4  # chosenB: nc even -> odd number of gather steps
        else:
            # ---- static per-codebook schedule: the codebook loop is
            # UNROLLED (Python loop) so each step's kind (pool vs R1) and
            # the resulting buffer parity are compile-time constants.  Pool
            # steps ping-pong E/chosen; R1 steps update them in place.
            e_cur, e_alt = 0, 1  # ctx slot indexes: EA_ref, EB_ref
            ch_cur, ch_alt = 3, 4  # chosenA, chosenB (step 0 seeded A)
            cells = [dict() for _ in range(SUBT)]  # lazy_r1 pending state
            prev_defer = False
            for t in range(1, nc):
                pool = bool(mask[t])
                last = t == nc - 1
                defer = lazy_r1 and not pool and not last
                if pool:
                    sss = run_zipped([
                        (t, ctxs[s], ctxs[s][e_cur], ctxs[s][e_alt], sss[s],
                         False, last, ctxs[s][ch_cur], ctxs[s][ch_alt], True,
                         _s(ctxs[s], e_cur), _s(ctxs[s], e_alt),
                         prev_defer, False, cells[s])
                        for s in range(SUBT)
                    ])
                    e_cur, e_alt = e_alt, e_cur
                    ch_cur, ch_alt = ch_alt, ch_cur
                else:
                    assert not prev_defer, (
                        "lazy_r1 requires no two consecutive deferring R1 "
                        "steps", mask)
                    sss = run_zipped([
                        (t, ctxs[s], ctxs[s][e_cur], ctxs[s][e_cur], sss[s],
                         False, last, ctxs[s][ch_cur], ctxs[s][ch_cur], False,
                         _s(ctxs[s], e_cur), _s(ctxs[s], e_cur),
                         False, defer, cells[s])
                        for s in range(SUBT)
                    ])
                prev_defer = defer
            ch_fin = ch_cur

        # ---- pass end: best candidate per sub via block-wise packed min
        # over the ss column (m ids in the low mantissa bits)
        for sub in range(SUBT):
            pass_end(sub, sss[sub], ch_fin)
        return 0

    def pass_end(sub, ss_col, ch_fin):
        m_ids = jnp.concatenate(
            [jnp.full((B_s, 1), m, jnp.int32) for m in range(M)], axis=0
        )
        ctx = ctxs[sub]
        chosen_fin, sol_ref = ctx[ch_fin], ctx[5]
        enc_col = _encode_scores(ss_col, m_ids)  # (M*B_s, 1)
        best_enc = enc_col[0:B_s, :]
        for m in range(1, M):
            best_enc = jnp.minimum(
                best_enc, enc_col[m * B_s : (m + 1) * B_s, :]
            )
        best = pltpu.bitcast(best_enc, jnp.int32) & _LANE_MASK  # (B_s, 1)
        best_pad = pad_row(best.T)  # (1, CW)
        idx_best = jnp.concatenate(
            [jnp.broadcast_to(best_pad, (8, CW))] * nc, axis=1
        )
        ch_groups = [
            chosen_fin[g * 8 * nc : (g + 1) * 8 * nc, :].reshape(8, nc * CW)
            for g in range(G)
        ]
        winner = _gather_rows_grouped(ch_groups, idx_best)  # (8, nc*CW)
        winner_col = winner[0:1, :].T  # (nc*CW, 1)
        if CW == B_s:
            sol_ref[:, :] = winner_col
        else:
            for t in range(nc):
                sol_ref[t * B_s : (t + 1) * B_s, :] = winner_col[
                    t * CW : t * CW + B_s, :
                ]

    def one_pass_skewed(mask, skew):
        """The static-schedule pass with the sub-tile phase streams SKEWED:
        sub s leads sub s+1 by ``skew`` phases in the emission order, so in
        steady state each MXU phase of one sub-tile is followed in program
        order by an INDEPENDENT (different-sub) phase instead of its own
        consumer (odd skews pair MXU phases with the other sub's VPU
        phases: phases alternate MXU/VPU within a step).  Same-phase
        zipping (skew 0, ``one_pass_with``) leaves each matmul's consumer
        only one op behind it — this is the software-pipelined variant
        (VERDICT r3 item 7).  Bit-identical per-frame results: only the
        emission order of independent instruction chains changes."""
        finals = {}

        def stream(sub):
            ctx = ctxs[sub]
            ss_cell = [None]

            def wrap(phases):
                yield phases[0]

                def ph1(p=phases[1]):
                    ss_cell[0] = p()

                yield ph1
                yield phases[2]
                yield phases[3]

            def root_phases():
                x_s = jax.lax.slice(x, (sub * B_s, 0), ((sub + 1) * B_s, D))

                def add_codebook(s, acc, sol_ref=ctx[5]):
                    sol_s = sol_ref[pl.ds(s * B_s, B_s), :]
                    return acc + matmul(
                        onehot_bt(sol_s), centers_ref[pl.ds(s * cs, cs), :]
                    )

                e = jax.lax.fori_loop(0, nc, add_codebook, -x_s)
                return codebook_step_phases(
                    0, ctx, e, ctx[0], None, True, False, ctx[3], ctx[3],
                    True, None, _s(ctx, 0)
                )

            yield from wrap(root_phases())
            e_cur, e_alt, ch_cur, ch_alt = 0, 1, 3, 4
            cell = {}  # lazy_r1 pending state (per sub-tile stream)
            prev_defer = False
            for t in range(1, nc):
                pool = bool(mask[t])
                last = t == nc - 1
                defer = lazy_r1 and not pool and not last
                if pool:
                    def mk(t=t, ec=e_cur, ea=e_alt, cc=ch_cur, ca=ch_alt,
                           last=last, pi=prev_defer):
                        return codebook_step_phases(
                            t, ctx, ctx[ec], ctx[ea], ss_cell[0], False,
                            last, ctx[cc], ctx[ca], True,
                            _s(ctx, ec), _s(ctx, ea), pi, False, cell)
                    e_cur, e_alt = e_alt, e_cur
                    ch_cur, ch_alt = ch_alt, ch_cur
                else:
                    assert not prev_defer, (
                        "lazy_r1 requires no two consecutive deferring R1 "
                        "steps", mask)

                    def mk(t=t, ec=e_cur, cc=ch_cur, last=last, po=defer):
                        return codebook_step_phases(
                            t, ctx, ctx[ec], ctx[ec], ss_cell[0], False,
                            last, ctx[cc], ctx[cc], False,
                            _s(ctx, ec), _s(ctx, ec), False, po, cell)
                prev_defer = defer
                yield from wrap(mk())
            finals[sub] = (ss_cell, ch_cur)

        streams = [stream(s) for s in range(SUBT)]

        def advance(s):
            ph = next(streams[s], None)
            if ph is None:
                return False
            ph()
            return True

        alive = [True] * SUBT
        # prime: earlier subs lead later ones by `skew` phases each
        for s in range(SUBT):
            for _ in range(skew * (SUBT - 1 - s)):
                alive[s] = alive[s] and advance(s)
        while any(alive):
            for s in range(SUBT):
                if alive[s]:
                    alive[s] = advance(s)
        for sub in range(SUBT):
            ss_cell, ch_fin = finals[sub]
            pass_end(sub, ss_cell[0], ch_fin)
        return 0

    if pool_mask is not None and isinstance(pool_mask[0], tuple):
        # per-pass schedules: the pass loop is unrolled so each pass gets
        # its own static mask (e.g. the "alt-parity" schedule pools even
        # codebooks in passes 0/2 and odd codebooks in pass 1)
        assert len(pool_mask) == passes, (pool_mask, passes)
        for p_mask in pool_mask:
            one_pass_with(p_mask)
    else:
        jax.lax.fori_loop(
            0, passes, lambda p, _: one_pass_with(pool_mask), 0
        )

    for sub in range(SUBT):
        sol_ref = ctxs[sub][5]
        out_cols = [sol_ref[t * B_s : (t + 1) * B_s, :] for t in range(nc)]
        out_ref[sub * B_s : (sub + 1) * B_s, :] = jnp.concatenate(
            out_cols, axis=1
        )

@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "M", "R", "passes", "block_b", "interpret", "impl",
        "interleave", "pool_mask", "cross_value", "reorder", "e_dtype",
        "requant", "zip_skew", "init_precision", "sel_impl", "lazy_r1",
    ),
)
def seqbeam_encode_indexes(
    params: QuantizerParams,
    config: QuantizerConfig,
    x: jax.Array,
    M: int = 16,
    R: int = 8,
    passes: int = 3,
    block_b: int = 128,
    interpret: bool = False,
    init_indexes: jax.Array | None = None,
    impl: str = "v2",
    interleave: int = 1,
    pool_mask: tuple | None = None,
    cross_value: bool = False,
    reorder: str = "gather",
    e_dtype: str = "f32",
    requant: str = "step",
    zip_skew: int = 0,
    init_precision: str = "highest",
    sel_impl: str = "lohi",
    lazy_r1: bool = False,
) -> jax.Array:
    """Encode (B, dim) frames to (B, nc) int32 indexes with the fused
    sequential-beam kernel.  Initialisation (logits argmax, or the caller's
    ``init_indexes``, e.g. from a coordinate-descent warm start) runs in
    XLA.  ``impl``: "v2" (default, restructured bookkeeping) or "v1".
    ``interleave``: number of independent sub-tiles whose steps are
    interleaved in one instruction stream (v2 only; per-frame results are
    independent of this knob).  Measured a wash on v5e — a toy probe showed
    Mosaic hiding ~60% of a VPU chain under a concurrent MXU chain, but the
    real kernel's chains see no benefit (run-to-run chip variance ~10%
    dwarfs it) — kept for future schedulers.

    ``pool_mask`` (v2 only): per-codebook tuple of bools selecting the
    step kind each pass — True = full pool step (top-R per parent + top-M
    of the pool, beam reorder), False = R1 step (best child per parent, no
    reorder/chosen-gather, single selection round — ~half the cost).  The
    entry for codebook 0 is ignored (step 0 is always the beam fan-out).
    None = all-pool (the fori-loop code path, identical selection
    semantics).  See experiments/pool_schedule_sweep.py for the measured
    quality of mixed schedules.

    ``cross_value`` (v2 only): pass each step's rescore matmul result from
    the MXU phase to the selection phase as an SSA value instead of through
    the cross scratch ref — bit-identical results; a scheduling experiment
    for the sub-tile phase-zip (ref round-trips may serialize independent
    sub-tiles' phases under coarse memory disambiguation).

    ``reorder`` (v2 only): "gather" = sublane dynamic_gather beam reorder;
    "select" = the same row moves as a log2(M)-level full-rate vector
    select tree keyed on the parent index bits (bit-identical outputs; a
    performance A/B for the cross-sublane gather path); "wideselect" =
    the same tree with one full-height (M*B_s, D) select per tree node
    instead of an M-loop of per-block trees (fewer, wider ops).

    (A one-hot permutation-MATMUL reorder was also considered and is
    FLOP-dead: the (M*B_s, M*B_s) x (M*B_s, D) contraction costs ~60x the
    rescore matmul because the MXU cannot exploit the one-hot sparsity.)

    ``e_dtype`` (v2 + select reorders only): "f32" (default), "bf16", or
    "int8" storage for the candidate error buffers.  Rescore already casts
    E to bf16, so bf16 storage only adds rounding at the per-step
    E += c_delta accumulation; it halves the reorder/extension traffic.
    "int8" (select reorder only) keeps E as int8 with per-candidate f32
    scales (requantized after every extension) and quantizes the centers
    per-codebook, so rescore AND extension run int8 x int8 -> int32 on the
    MXU's 2x int8 peak; search quality is measured identical to f32/bf16
    on the trained flagship (+0.96% vs beam-5,
    experiments/int8ec_quality_d512_b8.json).

    ``zip_skew`` (v2, interleave>=2, static pool_mask only): skew the
    sub-tile phase streams by N phases in emission order, so each MXU
    matmul is followed in program order by the other sub-tile's
    INDEPENDENT work instead of its own consumer (odd skews pair MXU
    phases with the other sub's VPU phases).  Bit-identical results —
    pure instruction-scheduling A/B (VERDICT r3 item 7).

    ``sel_impl`` (v2 only): "lohi" (original) re-minimums the two folded
    128-lane halves every selection round and masks the extracted lane in
    both; "fold" folds once and masks each extracted min by packed-value
    equality (unique by construction) — bit-identical extraction order,
    ~3 fewer full-width VPU passes per round in the kernel's dominant
    selection phase.

    ``lazy_r1`` (v2, static pool_mask, select reorder, step requant): R1
    steps defer their codeword delta one step — no extension matmul, no
    (M*B_s, D) in-place dequant+extend+requant (the R1 move is pure VPU
    work on a VPU-bound kernel); the next pool step corrects its scores
    via a precomputed cross-codebook Gram block and applies both deltas in
    its merged move.  NOT bit-identical (the Gram correction runs in bf16;
    the skipped R1 requantization round-trip slightly changes int8 E
    rounding) — quality must be re-measured before promotion."""
    assert SEQBEAM_SUPPORTED(config), config
    assert impl == "v2" or (
        e_dtype == "f32" and requant == "step" and zip_skew == 0
        and sel_impl == "lohi" and not lazy_r1
    ), (impl, e_dtype, requant, zip_skew, sel_impl, lazy_r1)
    if pool_mask is not None:
        assert impl == "v2", "pool_mask requires impl='v2'"
        # "altparity" measured +0.96% vs beam-5 at M8R4p3 on the
        # dim=512/8B flagship (experiments/pool_schedule2_d512_b8.json)
        pool_mask = _normalize_pool_mask(
            pool_mask, config.num_codebooks, passes
        )
    nc, cs, D = config.num_codebooks, config.codebook_size, config.dim
    B = x.shape[0]
    B_pad = -(-B // block_b) * block_b
    if B_pad != B:
        x = jnp.concatenate([x, jnp.zeros((B_pad - B, D), x.dtype)], axis=0)

    if init_indexes is None:
        # init_precision="default": single-pass bf16 MXU for the init
        # logits (HIGHEST = 6 passes) — the argmax only seeds the beam,
        # which refines for `passes` sweeps; quality must be re-measured
        # on chip before promoting (the headline margin is +0.96% of 1%).
        assert init_precision in ("highest", "default"), init_precision
        logits = _search.compute_logits(
            params, config, x,
            precision=(jax.lax.Precision.DEFAULT
                       if init_precision == "default" else None),
        )
        idx0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, nc)
    else:
        idx0 = init_indexes.astype(jnp.int32)
        if idx0.shape[0] != B_pad:
            idx0 = jnp.concatenate(
                [idx0, jnp.zeros((B_pad - idx0.shape[0], nc), jnp.int32)], axis=0
            )
    centers = scaled_centers(params, config.scale_speed).astype(jnp.float32)
    centers_flat = centers.reshape(nc * cs, D).astype(jnp.bfloat16)
    cs_sumsq = jnp.sum(centers * centers, axis=-1)  # (nc, cs) f32
    # modified per-codebook Gram blocks: Gmod_t[i, j] = csq[t,j] - 2 c_i.c_j
    gram = jnp.einsum("tid,tjd->tij", centers, centers)
    gmod_flat = (cs_sumsq[:, None, :] - 2.0 * gram).reshape(
        nc * cs, cs
    ).astype(jnp.bfloat16)

    if impl == "v2":
        SUBT = interleave if block_b % interleave == 0 else 1
        B_s = block_b // SUBT
        if B_s not in (64, 128, 256, 512):
            SUBT, B_s = 1, block_b
        # zip_skew is only honored on the static-mask interleaved path; a
        # silent no-op would invalidate a perf A/B without any signal
        # (results are identical either way), so reject it loudly.
        assert not zip_skew or (SUBT > 1 and pool_mask is not None), (
            "zip_skew requires interleave>=2 (dividing block_b into a "
            "supported sub-tile height) and a static pool_mask; got "
            f"SUBT={SUBT}, pool_mask={'static' if pool_mask is not None else None}"
        )
        assert e_dtype in ("f32", "bf16", "int8"), e_dtype
        assert e_dtype == "f32" or reorder in ("select", "wideselect"), (
            "bf16/int8 E requires a select-tree reorder (dynamic_gather is "
            "f32/int32-only)")
        int8 = e_dtype == "int8"
        assert not int8 or (reorder == "select" and not cross_value)
        if lazy_r1:
            assert pool_mask is not None and reorder == "select" and (
                requant == "step" and not cross_value
            ), "lazy_r1 requires a static pool_mask, select reorder, step requant"
            for m_ in pool_mask:
                for t_ in range(1, nc - 1):
                    assert m_[t_] or m_[t_ + 1], (
                        "lazy_r1: a deferring R1 step must be followed by "
                        "a pool step", m_)
        _ED = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}[
            e_dtype
        ]
        scratch = []
        for _ in range(SUBT):
            scratch += [
                pltpu.VMEM((M * B_s, D), _ED),
                pltpu.VMEM((M * B_s, D), _ED),
                # cross scratch is dead under cross_value — allocate a
                # dummy tile to return the VMEM to the compiler's temps
                pltpu.VMEM(
                    (8, 128) if cross_value else (M * B_s, cs),
                    jnp.int32 if int8 else jnp.float32,
                ),
                pltpu.VMEM((M * nc, max(128, B_s)), jnp.int32),
                pltpu.VMEM((M * nc, max(128, B_s)), jnp.int32),
                pltpu.VMEM((nc * B_s, 1), jnp.int32),
            ]
            if int8:
                # per-candidate f32 dequant scales riding with EA/EB
                scratch += [
                    pltpu.VMEM((M * B_s, 1), jnp.float32),
                    pltpu.VMEM((M * B_s, 1), jnp.float32),
                ]
        assert requant == "step" or int8, (requant, e_dtype)
        kernel = functools.partial(
            _seqbeam_kernel_v2, B_t=block_b, D=D, nc=nc, cs=cs, M=M, R=R,
            passes=passes, SUBT=SUBT, pool_mask=pool_mask,
            cross_value=cross_value, reorder=reorder, e_dtype=e_dtype,
            requant=requant, zip_skew=zip_skew, sel_impl=sel_impl,
            lazy_r1=lazy_r1,
        )
    else:
        scratch = [
            pltpu.VMEM((M * block_b, D), jnp.float32),
            pltpu.VMEM((M * block_b, D), jnp.float32),
            pltpu.VMEM((M * block_b, cs), jnp.float32),
            pltpu.VMEM((M * nc, 128), jnp.int32),
            pltpu.VMEM((M * nc, 128), jnp.int32),
            pltpu.VMEM((nc * block_b, 1), jnp.int32),
        ]
        kernel = functools.partial(
            _seqbeam_kernel, B_t=block_b, D=D, nc=nc, cs=cs, M=M, R=R,
            passes=passes,
        )
    in_specs = [
        pl.BlockSpec((block_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, nc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nc * cs, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nc, cs), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [x, idx0, centers_flat, cs_sumsq]
    if impl == "v2":
        in_specs.append(
            pl.BlockSpec((nc * cs, cs), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(gmod_flat)
        if lazy_r1:
            # cross-codebook Gram blocks for the deferred-R1 score
            # correction: block t = C_{t-1} . C_t^T (block 0 unused)
            gx = jnp.einsum(
                "tid,tjd->tij", centers[:-1], centers[1:]
            )  # (nc-1, cs, cs)
            gx_flat = jnp.concatenate(
                [jnp.zeros((1, cs, cs), gx.dtype), gx], axis=0
            ).reshape(nc * cs, cs).astype(jnp.bfloat16)
            in_specs.append(
                pl.BlockSpec(
                    (nc * cs, cs), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )
            inputs.append(gx_flat)
        if e_dtype == "int8":
            # symmetric per-codebook int8 centers + f32 scales: quality
            # screened kernel-faithfully at +0.96% vs beam-5 on the trained
            # flagship — identical to the f32/bf16 kernel
            # (experiments/int8ec_quality_d512_b8.json, "int8EC-block").
            amax = jnp.max(jnp.abs(centers), axis=(1, 2))  # (nc,)
            csc = jnp.where(amax > 0, amax / 127.0, 1.0)
            centers_i8 = jnp.round(
                centers / csc[:, None, None]
            ).astype(jnp.int8).reshape(nc * cs, D)
            in_specs.append(
                pl.BlockSpec(
                    (nc * cs, D), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )
            in_specs.append(
                pl.BlockSpec((nc, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            inputs.append(centers_i8)
            inputs.append(csc.reshape(nc, 1))
            if requant == "bound":
                # per-codebook worst-case |c(j) - c(i)|_inf of the int8
                # table (csc units) = max over dims of (column max - column
                # min); drives the bound-propagated scale step.  Only passed
                # in bound mode so other int8 programs keep their compile
                # cache entries.
                ci = centers_i8.reshape(nc, cs, D).astype(jnp.float32)
                cmax = jnp.max(
                    jnp.max(ci, axis=1) - jnp.min(ci, axis=1), axis=1
                )  # (nc,)
                in_specs.append(
                    pl.BlockSpec(
                        (nc, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
                    )
                )
                inputs.append(cmax.reshape(nc, 1))
    grid = (B_pad // block_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_b, nc), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, nc), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:B]
