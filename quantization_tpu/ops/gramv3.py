"""Gram-table sequential-beam encode kernel (v3): no per-candidate error
buffer.

The v2 kernel (ops/seqbeam.py) carries an explicit error vector
``E_m = recon_m - x`` per beam candidate and spends most of its device
time on E bookkeeping: the beam reorder that moves (M*B_s, D) rows
between parent slots, the extension one-hot-difference matmul, and the
score assembly around the rescore matmul (cost split in
NOTES_ROUND3.md).  v3 eliminates E entirely by scoring codebook ``t``
against a precomputed codeword Gram matrix.  With
``F_m = sum_s w_s(ch_m_s) - x`` (the candidate's full reconstruction
error) and carried ``ss_m = ||F_m||^2``:

    S_m(j) = ||F_m - w_t(i_m) + w_t(j)||^2  =  ss_m - Q_m(i_m) + Q_m(j)
    Q_m(j) = 2 * (SG_m(j) - XC_t(j))
    SG_m(j) = sum_s Gtil[s, t][ch_m_s, j]

where ``Gtil`` is the (nc*cs, nc*cs) Gram matrix
``Gtil[s,t][i,j] = w_s(i) . w_t(j)`` with every diagonal block replaced
by the broadcast row ``csq_t[j] / 2``: the t-th one-hot then emits the
``+csq_t[j]`` norm term from the same matmul and every ``w_t(i)`` cross
term cancels against the ``Q_m(i_m)`` lane gather.  ``XC = x @ W^T`` is
a cheap XLA-side precompute streamed in per tile.

Per codebook step this leaves ONE one-hot matmul
(M*B_s, nc*cs) @ (nc*cs, cs), one 256-lane gather, and the selection —
replacing v2's rescore + shared + extension matmuls, both E buffers,
and the E reorder.  The carried per-candidate state is the index row
(M*B_s, 128) int32 (lane s = chosen index of codebook s) and the score
column; the index-row beam reorder is a select tree over 128-lane
blocks, 1/4 the traffic of v2's bf16 E reorder at dim=512 (and
independent of dim: v3 supports ANY dim — D only enters the XLA-side
XC / root-score precompute).

Quality: screened in experiments/gramscore_quality.py against the
trained flagship — bf16 tables +0.86% rel err vs the reference beam-5
(allpool M8R4p3), per-row int8 +0.89%, one-global-scale int8 (the MXU
2x-peak path, `g_dtype="int8"`) measured there as "int8gg".  For int8
the whole kernel runs in scale-divided units: XC and the root score are
pre-divided by the table scale on the XLA side, so the kernel needs no
scale plumbing and rankings are unchanged (positive scale).

Selection semantics (top-R per parent via packed-mantissa argmin
rounds, exact top-M of the M*R pool with parent bits packed above the
lane bits, R1 steps on masked codebooks, per-pass winner restart) are
identical to v2 — the quality screens of experiments/sim_pool_quality.py
apply unchanged.

Reference algorithm being replaced: the 5-iteration pair-tree beam of
`/root/reference/quantization/quantization.py:308-548`.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import QuantizerConfig, QuantizerParams, scaled_centers
from ..core import search
from .seqbeam import (
    _INF,
    _LANE_BITS,
    _LANE_MASK,
    _encode_scores,
    _min_packed,
    _gather_lane256,
    _normalize_pool_mask,
)


def GRAMV3_SUPPORTED(config: QuantizerConfig) -> bool:
    """v3 constraints: cs=256 packing and a Gram matrix that fits VMEM
    (nc*cs <= 2048 lanes -> <= 8 codebooks).  Any dim."""
    return config.codebook_size == 256 and config.num_codebooks in (2, 4, 8)


# Cost-bisect instrumentation (QTPU_GRAMV3_SKIP=piece,piece,...): stubs out
# kernel pieces to time the rest.  Results are WRONG with any skip active —
# timing only.  Pieces: onehot, matmul, assembly, sel, reorder.
_SKIP = frozenset(
    s for s in _os.environ.get("QTPU_GRAMV3_SKIP", "").split(",") if s
)

# The kernel's VMEM working set (double-buffered xcr tile + the resident
# Gram table + one-hot/score temporaries) crosses XLA's default 16 MiB
# scoped-vmem budget at block_b=256 on long grids; v5e has 128 MiB of VMEM,
# so raise the per-kernel cap rather than shrink the tile.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pass_modes(mask, nc: int):
    """Per-pass step mode for the fori-loop kernel: "pool" if every
    non-first step of the pass runs pool selection, "r1" if none does,
    None (ineligible) for mixed schedules like altparity.  Step 0 is the
    fan-out regardless, so mask[p][0] is irrelevant."""
    modes = []
    for pm in mask:
        tail = pm[1:nc]
        if all(tail):
            modes.append("pool")
        elif not any(tail):
            modes.append("r1")
        else:
            return None
    return tuple(modes)


def _folded_rounds(S, rounds: int):
    """``rounds`` packed-min extractions over raw scores S (rows, 256),
    folded to 128 lanes up front (ids packed first — identical results,
    ~40% cheaper rounds; same construction as the v2 kernel)."""
    rows, cs = S.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, cs), 1)
    enc = _encode_scores(S, lanes)
    lo = enc[:, 0:128]
    hi = enc[:, 128:256]
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    outs = []
    for _ in range(rounds):
        val, pos, emin = _min_packed(jnp.minimum(lo, hi))
        lo = jnp.where(lane_h == pos, _INF, lo)
        hi = jnp.where(lane_h == pos - 128, _INF, hi)
        outs.append((val, pos, emin))
    return outs


def _select_tree(blocks, cond_col):
    """Reduce M aligned row blocks to one by the bit-keyed select tree
    (cond_col: per-row parent index, broadcast over lanes)."""
    level = list(blocks)
    bit = 1
    while len(level) > 1:
        sel = (cond_col & bit) != 0
        level = [
            jnp.where(sel, level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
        bit <<= 1
    return level[0]


def _extract_lane(tc, lane_iota, t):
    """Column t of an index-row array via a lane-masked reduce (direct
    column slices carry lane offsets Mosaic rejects downstream); t may be
    a traced scalar."""
    return jnp.sum(jnp.where(lane_iota == t, tc, 0), axis=1, keepdims=True)


def _step_nonfirst(tc, ss, SG, xc_t, t, pool: bool, M: int, R: int):
    """One non-first codebook step given the step's matmul result SG
    (M*B_s, cs): score assembly, selection (pool or R1), index-row beam
    reorder.  ``t`` may be a traced scalar.  Returns (tc, ss)."""
    MB, cs = SG.shape
    B_s = MB // M
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (MB, 128), 1)
    if "assembly" in _SKIP:
        S = SG
    else:
        Q = 2.0 * (SG - jnp.concatenate([xc_t] * M, axis=0))  # (M*B_s, cs)
        i_col = _extract_lane(tc, lane_full, t)
        S = (ss - _gather_lane256(Q, i_col)) + Q

    if "sel" in _SKIP:
        pos = jnp.sum(jnp.where(lane_full == t, tc, 0), axis=1, keepdims=True)
        return jnp.where(lane_full == t, pos, tc), ss

    if not pool:
        # R1: best child per parent, slot order kept, no reorder
        val, pos, _ = _folded_rounds(S, 1)[0]  # (M*B_s, 1)
        return jnp.where(lane_full == t, pos, tc), val

    # ---- pool selection: top-R per parent, exact top-M of the M*R pool
    # with the parent id packed above the lane bits (v2's mechanism)
    lane_pool = jax.lax.broadcasted_iota(jnp.int32, (B_s, M * R), 1)
    picks = _folded_rounds(S, R)
    vRe = jnp.concatenate([e for _, _, e in picks], axis=1)
    pool0 = jnp.concatenate(
        [vRe[m * B_s : (m + 1) * B_s, :] for m in range(M)], axis=1
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
            pltpu.bitcast(bits & ~(mbits | _LANE_MASK), jnp.float32)
        )
    ss_new = jnp.concatenate(v_cols, axis=0)  # (M*B_s, 1)

    # ---- index-row beam reorder: one select tree over the M source
    # blocks, all destinations at once, with the lane-t overwrite folded
    # into the root
    pcol = jnp.concatenate(p_cols, axis=0)  # (M*B_s, 1)
    jcol = jnp.concatenate(j_cols, axis=0)  # (M*B_s, 1)
    if "reorder" in _SKIP:
        return jnp.where(lane_full == t, jcol, tc), ss_new
    src_blocks = [
        jnp.concatenate([tc[m * B_s : (m + 1) * B_s, :]] * M, axis=0)
        for m in range(M)
    ]
    picked = _select_tree(src_blocks, pcol)
    return jnp.where(lane_full == t, jcol, picked), ss_new


def _fanout_first(sol, ss_root, SG0, xc_0, t, M: int):
    """The t==t0 step: M-way fan-out from the single root candidate
    (1/M of a full rescore).  Returns (tc, ss)."""
    B_s = sol.shape[0]
    lane_128 = jax.lax.broadcasted_iota(jnp.int32, (B_s, 128), 1)
    Q0 = 2.0 * (SG0 - xc_0)  # (B_s, cs)
    i0 = _extract_lane(sol, lane_128, t)
    S0 = (ss_root - _gather_lane256(Q0, i0)) + Q0
    picks = _folded_rounds(S0, M)
    ss = jnp.concatenate([v for v, _, _ in picks], axis=0)
    tc = jnp.concatenate(
        [jnp.where(lane_128 == t, pos, sol) for _, pos, _ in picks],
        axis=0,
    )  # (M*B_s, 128)
    return tc, ss


def _pass_winner(tc, ss, M: int):
    """Pass end: per-frame winner via the packed m-id min.  Returns
    (sol (B_s, 128), ss_root (B_s, 1))."""
    MB = tc.shape[0]
    B_s = MB // M
    m_ids = jnp.concatenate(
        [jnp.full((B_s, 1), m, jnp.int32) for m in range(M)], axis=0
    )
    enc_col = _encode_scores(ss, m_ids)  # (M*B_s, 1)
    best_enc = enc_col[0:B_s, :]
    for m in range(1, M):
        best_enc = jnp.minimum(best_enc, enc_col[m * B_s : (m + 1) * B_s, :])
    bits = pltpu.bitcast(best_enc, jnp.int32)
    best = bits & _LANE_MASK  # (B_s, 1)
    ss_root = pltpu.bitcast(bits & ~_LANE_MASK, jnp.float32)
    sol = _select_tree(
        [tc[m * B_s : (m + 1) * B_s, :] for m in range(M)], best
    )
    return sol, ss_root


def _gramv3_fori_kernel(
    # inputs
    xcr_ref,  # (nc*B_t, cs) f32: row t*B_t+b = xc[b, t*cs:(t+1)*cs]
    init_ref,  # (B_t, 128) int32
    ss0_ref,  # (B_t, 1) f32
    gtr_ref,  # (nc*K, cs) g_dtype: rows t*K..: Gtil[:, t*cs:(t+1)*cs]
    # outputs
    out_ref,  # (B_t, 128) int32
    *,
    B_t: int,
    nc: int,
    cs: int,
    M: int,
    R: int,
    passes: int,
    modes: tuple,  # per-pass "pool" | "r1"
    g_dtype: str,
    SUBT: int = 1,
):
    """The compile-friendly variant of the v3 kernel: the inner codebook
    steps run under a ``lax.fori_loop`` (one emitted step body per pass
    instead of nc-1), which keeps the Mosaic program size independent of
    nc.  Requires a per-pass-uniform pool schedule (see ``_pass_modes``);
    semantics are bit-identical to the unrolled kernel (asserted in
    tests/test_search_alternatives.py)."""
    assert cs == 256 and nc * cs <= 2048
    assert M & (M - 1) == 0 and 8 <= M <= 64 and M * R <= 256
    assert B_t % SUBT == 0, (B_t, SUBT)
    B_s = B_t // SUBT
    K = nc * cs
    f32 = jnp.float32
    lane_128_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_s, 128), 1)
    lane_cs_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_s, cs), 1)
    mat_dtype = jnp.int8 if g_dtype == "int8" else jnp.bfloat16

    def mm_sg(oh, gt):
        if "matmul" in _SKIP:
            return jax.lax.slice(oh, (0, 0), (oh.shape[0], cs)).astype(f32)
        if g_dtype == "int8":
            acc = jnp.dot(oh, gt, preferred_element_type=jnp.int32)
            return acc.astype(f32)
        return jnp.dot(oh, gt, preferred_element_type=f32)

    def onehot_rows(tc):
        rows = tc.shape[0]
        lane_iota = (
            lane_128_full
            if rows == M * B_s
            else jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        )
        lane_cs = (
            lane_cs_full
            if rows == M * B_s
            else jax.lax.broadcasted_iota(jnp.int32, (rows, cs), 1)
        )
        if "onehot" in _SKIP:
            # keep the tc dependency through one cheap column, skip the
            # nc extract+compare builds
            col = jnp.sum(jnp.where(lane_iota == 0, tc, 0), axis=1,
                          keepdims=True)
            return jnp.concatenate(
                [(lane_cs == col).astype(mat_dtype)] * nc, axis=1
            )
        blocks = []
        for s in range(nc):
            col = jnp.sum(
                jnp.where(lane_iota == s, tc, 0), axis=1, keepdims=True
            )
            blocks.append((lane_cs == col).astype(mat_dtype))
        return jnp.concatenate(blocks, axis=1)  # (rows, K)

    def gt_slice(t):
        return gtr_ref[pl.ds(t * K, K), :]  # (K, cs)

    def xc_slice(t, u):
        return xcr_ref[pl.ds(t * B_t + u * B_s, B_s), :]  # (B_s, cs)

    # ---- per-sub-tile root state (phase-zipped when SUBT > 1)
    init_all = init_ref[:]
    ss0_all = ss0_ref[:]
    sols = [
        jax.lax.slice(init_all, (u * B_s, 0), ((u + 1) * B_s, 128))
        for u in range(SUBT)
    ]
    ss_roots = [
        jax.lax.slice(ss0_all, (u * B_s, 0), ((u + 1) * B_s, 1))
        for u in range(SUBT)
    ]

    for p in range(passes):
        pool = modes[p] == "pool"

        # t=0 fan-out (static step, unrolled)
        gt0 = gt_slice(0)
        sg0s = [mm_sg(onehot_rows(sols[u]), gt0) for u in range(SUBT)]
        states = []
        for u in range(SUBT):
            states.append(
                _fanout_first(sols[u], ss_roots[u], sg0s[u], xc_slice(0, u),
                              0, M)
            )

        # t in [1, nc): one fori body per pass
        def body(t, carry, pool=pool):
            gt = gt_slice(t)
            sgs = [mm_sg(onehot_rows(tc), gt) for tc, _ in carry]
            out = []
            for u, ((tc, ss), sg) in enumerate(zip(carry, sgs)):
                out.append(
                    _step_nonfirst(tc, ss, sg, xc_slice(t, u), t, pool, M, R)
                )
            return tuple(out)

        states = jax.lax.fori_loop(1, nc, body, tuple(states))

        for u in range(SUBT):
            sols[u], ss_roots[u] = _pass_winner(states[u][0], states[u][1], M)

    for u in range(SUBT):
        out_ref[u * B_s : (u + 1) * B_s, :] = sols[u]


def _gramv3_kernel(
    # inputs
    xc_ref,  # (B_t, nc*cs) f32: x . w_t(j) lanes, scale-divided for int8
    init_ref,  # (B_t, 128) int32: initial indexes in lanes [0, nc)
    ss0_ref,  # (B_t, 1) f32: ||F_root||^2 of the init, scale-divided
    gtil_ref,  # (nc*cs, nc*cs) g_dtype Gram matrix, csq/2 diagonal blocks
    # outputs
    out_ref,  # (B_t, 128) int32: winner indexes in lanes [0, nc)
    *,
    B_t: int,
    nc: int,
    cs: int,
    M: int,
    R: int,
    passes: int,
    pool_mask: tuple | None,
    g_dtype: str,
    SUBT: int = 1,
):
    assert cs == 256 and nc * cs <= 2048
    assert M & (M - 1) == 0 and 8 <= M <= 64 and M * R <= 256
    assert B_t % SUBT == 0, (B_t, SUBT)
    B_s = B_t // SUBT
    K = nc * cs
    f32 = jnp.float32
    lane_128 = jax.lax.broadcasted_iota(jnp.int32, (B_s, 128), 1)
    lane_128_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_s, 128), 1)
    lane_cs_full = jax.lax.broadcasted_iota(jnp.int32, (M * B_s, cs), 1)
    lane_pool = jax.lax.broadcasted_iota(jnp.int32, (B_s, M * R), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (B_s, M), 1)
    mat_dtype = jnp.int8 if g_dtype == "int8" else jnp.bfloat16

    if pool_mask is None:
        pool_mask = ((True,) * nc,) * passes

    def mm_sg(oh, t):
        """SG = OH @ Gtil[:, t*cs:(t+1)*cs] -> (rows, cs) f32."""
        gt = gtil_ref[:, pl.ds(t * cs, cs)]  # (K, cs)
        if g_dtype == "int8":
            acc = jnp.dot(oh, gt, preferred_element_type=jnp.int32)
            return acc.astype(f32)
        return jnp.dot(oh, gt, preferred_element_type=f32)

    def onehot_rows(tc, lane_iota):
        """(rows, 128) index rows -> (rows, K) one-hot in mat_dtype."""
        rows = tc.shape[0]
        lane_cs = lane_cs_full if rows == M * B_s else jax.lax.broadcasted_iota(
            jnp.int32, (rows, cs), 1
        )
        blocks = []
        for s in range(nc):
            col = jnp.sum(
                jnp.where(lane_iota == s, tc, 0), axis=1, keepdims=True
            )  # (rows, 1)
            blocks.append((lane_cs == col).astype(mat_dtype))
        return jnp.concatenate(blocks, axis=1)  # (rows, K)

    def extract_lane(tc, lane_iota, t):
        return jnp.sum(jnp.where(lane_iota == t, tc, 0), axis=1, keepdims=True)

    def folded_rounds(S, rounds):
        """``rounds`` packed-min extractions over raw scores S (rows, 256),
        folded to 128 lanes up front (ids packed first — identical results,
        ~40% cheaper rounds; same construction as the v2 kernel)."""
        rows = S.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, cs), 1)
        enc = _encode_scores(S, lanes)
        lo = enc[:, 0:128]
        hi = enc[:, 128:256]
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        outs = []
        for _ in range(rounds):
            val, pos, emin = _min_packed(jnp.minimum(lo, hi))
            lo = jnp.where(lane_h == pos, _INF, lo)
            hi = jnp.where(lane_h == pos - 128, _INF, hi)
            outs.append((val, pos, emin))
        return outs

    def select_tree(blocks, cond_col):
        """Reduce M aligned row blocks to one by the bit-keyed select tree
        (cond_col: per-row parent index, broadcast over lanes)."""
        level = list(blocks)
        bit = 1
        while len(level) > 1:
            sel = (cond_col & bit) != 0
            level = [
                jnp.where(sel, level[2 * i + 1], level[2 * i])
                for i in range(len(level) // 2)
            ]
            bit <<= 1
        return level[0]

    # ---- per-sub-tile root state.  With SUBT=2 the two sub-tiles' steps
    # are emitted phase-zipped (s0.matmul, s1.matmul, s0.select, s1.select)
    # so each sub-tile's independent VPU selection sits next to the other's
    # MXU matmul in program order.  Per-frame semantics are identical to
    # SUBT=1 (asserted in tests).
    xc_all = xc_ref[:]  # (B_t, K) f32
    init_all = init_ref[:]
    ss0_all = ss0_ref[:]
    subs = []
    for u in range(SUBT):
        subs.append(
            {
                "xc": jax.lax.slice(
                    xc_all, (u * B_s, 0), ((u + 1) * B_s, K)
                ),
                "sol": jax.lax.slice(
                    init_all, (u * B_s, 0), ((u + 1) * B_s, 128)
                ),
                "ss_root": jax.lax.slice(
                    ss0_all, (u * B_s, 0), ((u + 1) * B_s, 1)
                ),
                "tc": None,  # (M*B_s, 128) candidate index rows
                "ss": None,  # (M*B_s, 1) carried ||F||^2
            }
        )

    def step_phases(st, t, pool, first):
        def xc_t():
            return jax.lax.slice(
                st["xc"], (0, t * cs), (B_s, (t + 1) * cs)
            )

        def ph0():  # one-hot build + the step's single matmul
            if first:
                return mm_sg(onehot_rows(st["sol"], lane_128), t)
            return mm_sg(onehot_rows(st["tc"], lane_128_full), t)

        def ph1(SG):  # assembly, selection, index-row reorder
            if first:
                # M-way fan-out from the single root candidate: 1/M of a
                # full rescore
                Q0 = 2.0 * (SG - xc_t())  # (B_s, cs)
                i0 = extract_lane(st["sol"], lane_128, t)
                S0 = (st["ss_root"] - _gather_lane256(Q0, i0)) + Q0
                picks = folded_rounds(S0, M)
                st["ss"] = jnp.concatenate([v for v, _, _ in picks], axis=0)
                st["tc"] = jnp.concatenate(
                    [
                        jnp.where(lane_128 == t, pos, st["sol"])
                        for _, pos, _ in picks
                    ],
                    axis=0,
                )  # (M*B_s, 128)
                return

            Q = 2.0 * (
                SG - jnp.concatenate([xc_t()] * M, axis=0)
            )  # (M*B_s, cs)
            i_col = extract_lane(st["tc"], lane_128_full, t)
            S = (st["ss"] - _gather_lane256(Q, i_col)) + Q

            if not pool:
                # R1: best child per parent, slot order kept, no reorder
                val, pos, _ = folded_rounds(S, 1)[0]  # (M*B_s, 1)
                st["ss"] = val
                st["tc"] = jnp.where(lane_128_full == t, pos, st["tc"])
                return

            # ---- pool selection: top-R per parent, exact top-M of the
            # M*R pool with the parent id packed above the lane bits
            # (same mechanism as the v2 kernel)
            picks = folded_rounds(S, R)
            vRe = jnp.concatenate([e for _, _, e in picks], axis=1)
            pool0 = jnp.concatenate(
                [vRe[m * B_s : (m + 1) * B_s, :] for m in range(M)], axis=1
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
                    pltpu.bitcast(bits & ~(mbits | _LANE_MASK), jnp.float32)
                )
            st["ss"] = jnp.concatenate(v_cols, axis=0)  # (M*B_s, 1)

            # ---- index-row beam reorder: one select tree over the M
            # source blocks, all destinations at once (the (M*B_s, 128)
            # analogue of v2's wideselect), with the lane-t overwrite
            # folded into the root
            pcol = jnp.concatenate(p_cols, axis=0)  # (M*B_s, 1)
            jcol = jnp.concatenate(j_cols, axis=0)  # (M*B_s, 1)
            tc = st["tc"]
            src_blocks = [
                jnp.concatenate(
                    [tc[m * B_s : (m + 1) * B_s, :]] * M, axis=0
                )
                for m in range(M)
            ]
            picked = select_tree(src_blocks, pcol)
            st["tc"] = jnp.where(lane_128_full == t, jcol, picked)

        return ph0, ph1

    for p in range(passes):
        mask = pool_mask[p]
        for t in range(nc):
            first = t == 0
            pool = bool(mask[t]) and not first
            phases = [step_phases(st, t, pool, first) for st in subs]
            sgs = [ph0() for ph0, _ in phases]
            for (_, ph1), sg in zip(phases, sgs):
                ph1(sg)

        # ---- pass end: winner per frame via the packed m-id min
        for st in subs:
            m_ids = jnp.concatenate(
                [jnp.full((B_s, 1), m, jnp.int32) for m in range(M)], axis=0
            )
            enc_col = _encode_scores(st["ss"], m_ids)  # (M*B_s, 1)
            best_enc = enc_col[0:B_s, :]
            for m in range(1, M):
                best_enc = jnp.minimum(
                    best_enc, enc_col[m * B_s : (m + 1) * B_s, :]
                )
            bits = pltpu.bitcast(best_enc, jnp.int32)
            best = bits & _LANE_MASK  # (B_s, 1)
            st["ss_root"] = pltpu.bitcast(bits & ~_LANE_MASK, jnp.float32)
            tc = st["tc"]
            st["sol"] = select_tree(
                [tc[m * B_s : (m + 1) * B_s, :] for m in range(M)], best
            )

    for u, st in enumerate(subs):
        out_ref[u * B_s : (u + 1) * B_s, :] = st["sol"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "M", "R", "passes", "pool_mask", "g_dtype", "block_b",
        "interleave", "interpret", "loop",
    ),
)
def gramv3_encode_indexes(
    params: QuantizerParams,
    config: QuantizerConfig,
    x: jax.Array,
    M: int = 8,
    R: int = 4,
    passes: int = 3,
    pool_mask=None,
    g_dtype: str = "bf16",
    block_b: int = 128,
    interleave: int = 1,
    interpret: bool = False,
    loop: str = "auto",
    init_indexes: jax.Array | None = None,
) -> jax.Array:
    """Encode (B, dim) -> (B, nc) int32 indexes with the v3 Gram kernel.

    ``g_dtype``: "bf16" (default) or "int8" (one global table scale; the
    kernel runs in scale-divided units — see module docstring).
    ``pool_mask`` accepts the same forms as the v2 kernel (None = pool on
    every step, per-step bools, per-pass tuples, or the named schedules).
    ``interleave``: split the tile into this many sub-tiles whose step
    phases are emitted zipped (semantics-neutral scheduling knob — one
    sub-tile's matmul next to the other's selection in program order).
    ``loop``: "fori" runs the inner codebook steps under a lax.fori_loop
    (Mosaic program size independent of nc — the unrolled passes*nc-step
    program compiles pathologically slowly at nc=8); requires a
    per-pass-uniform pool schedule.  "unroll" forces full unrolling
    (any schedule); "auto" (default) picks fori whenever eligible.
    Both variants are bit-identical (asserted in tests).
    """
    assert GRAMV3_SUPPORTED(config), (config.codebook_size,
                                      config.num_codebooks)
    nc, cs, D = config.num_codebooks, config.codebook_size, config.dim
    B = x.shape[0]
    assert x.shape == (B, D)
    B_pad = -(-B // block_b) * block_b
    if B_pad != B:
        x = jnp.concatenate([x, jnp.zeros((B_pad - B, D), x.dtype)], axis=0)
        if init_indexes is not None:
            init_indexes = jnp.concatenate(
                [
                    init_indexes,
                    jnp.zeros((B_pad - B, nc), init_indexes.dtype),
                ],
                axis=0,
            )
    K = nc * cs
    mask = _normalize_pool_mask(pool_mask, nc, passes)
    if mask is None:
        mask = ((True,) * nc,) * passes

    centers = scaled_centers(params, config.scale_speed)  # (nc, cs, D) f32
    ctab = centers.reshape(K, D).astype(jnp.bfloat16)
    csq = jnp.sum(
        centers.astype(jnp.bfloat16).astype(jnp.float32) ** 2, axis=-1
    )  # (nc, cs)

    # Gram matrix with every diagonal block replaced by the broadcast row
    # csq_t[j]/2 (bf16 inputs, f32 accumulate — the same rounding the v2
    # kernel's MXU applies to its cross terms)
    g = jnp.dot(ctab, ctab.T, preferred_element_type=jnp.float32)  # (K, K)
    blk = jnp.repeat(jnp.arange(nc), cs)  # (K,) block id per row/col
    eye = (blk[:, None] == blk[None, :]).astype(jnp.float32)  # (K, K)
    gtil_f32 = g * (1.0 - eye) + eye * (csq.reshape(K) / 2.0)[None, :]

    if g_dtype == "int8":
        amax = jnp.max(jnp.abs(gtil_f32))
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        gtil = jnp.round(gtil_f32 / scale).astype(jnp.int8)
        inv = 1.0 / scale
    else:
        gtil = gtil_f32.astype(jnp.bfloat16)
        inv = jnp.float32(1.0)

    # XLA-side precomputes: XC, argmax init, root score — all scale-divided
    # for int8 so the kernel is scale-free
    xc = jnp.dot(
        x.astype(jnp.bfloat16), ctab.T, preferred_element_type=jnp.float32
    )  # (B, K)
    if init_indexes is None:
        logits = search.compute_logits(params, config, x)
        init_indexes = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    recon0 = jnp.take_along_axis(
        centers[None], init_indexes[:, :, None, None], axis=2
    )[:, :, 0, :].sum(axis=1)
    ss0 = jnp.sum((recon0 - x) ** 2, axis=-1, keepdims=True)  # (B, 1)
    init_pad = jnp.pad(init_indexes, ((0, 0), (0, 128 - nc)))

    modes = _pass_modes(mask, nc)
    if loop == "auto":
        loop = "fori" if modes is not None else "unroll"
    if loop == "fori":
        if modes is None:
            raise ValueError(
                "loop='fori' needs a per-pass-uniform pool schedule; "
                f"got {mask}"
            )
        grid = B_pad // block_b
        # tile-major row layouts so the fori body's dynamic slicing is on
        # sublanes: xcr row i*(nc*B_t) + t*B_t + b = xc[tile i, frame b,
        # lanes t*cs:(t+1)*cs]; gtr row t*K + i = Gtil[i, t*cs + j]
        xcr = (
            (xc * inv)
            .reshape(grid, block_b, nc, cs)
            .transpose(0, 2, 1, 3)
            .reshape(grid * nc * block_b, cs)
        )
        gtr = (
            gtil.reshape(K, nc, cs)
            .transpose(1, 0, 2)
            .reshape(nc * K, cs)
        )
        kernel = functools.partial(
            _gramv3_fori_kernel,
            B_t=block_b,
            nc=nc,
            cs=cs,
            M=M,
            R=R,
            passes=passes,
            modes=modes,
            g_dtype=g_dtype,
            SUBT=interleave,
        )
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((nc * block_b, cs), lambda i: (i, 0)),
                pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
                pl.BlockSpec((block_b, 1), lambda i: (i, 0)),
                pl.BlockSpec((nc * K, cs), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B_pad, 128), jnp.int32),
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(xcr, init_pad, ss0 * inv, gtr)
        return out[:B, :nc]

    kernel = functools.partial(
        _gramv3_kernel,
        B_t=block_b,
        nc=nc,
        cs=cs,
        M=M,
        R=R,
        passes=passes,
        pool_mask=mask,
        g_dtype=g_dtype,
        SUBT=interleave,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, K), lambda i: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((K, K), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B_pad, 128), jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xc * inv, init_pad, ss0 * inv, gtil)
    return out[:B, :nc]
