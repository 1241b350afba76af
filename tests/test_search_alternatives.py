"""Tests for the TPU-native search alternatives: exact coordinate descent
(``refine_indexes_cd``) and the fused sequential-beam kernel (interpret
mode).  The reference only ships the pair-tree beam
(`quantization/quantization.py:308-548`); these searches are this
framework's additions, quality-validated against the beam in
experiments/seqbeam_quality.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu import core
from quantization_tpu.core import codec, search
from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes, SEQBEAM_SUPPORTED


def _setup(key, dim, cs, nc, B=64):
    config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)
    params = core.init_quantizer_params(key, config)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, dim))
    return config, params, x


def _err(centers, x, indexes):
    recon = core.decode_indexes(centers, indexes)
    return np.asarray(jnp.sum((recon - x) ** 2, axis=-1))


class TestCoordinateDescent:
    def test_monotone_and_coordinatewise_optimal(self):
        config, params, x = _setup(jax.random.PRNGKey(0), 32, 16, 4)
        centers = core.scaled_centers(params, config.scale_speed)
        idx0 = jax.random.randint(jax.random.PRNGKey(2), (64, 4), 0, 16)
        e0 = _err(centers, x, idx0)
        idx1 = search.refine_indexes_cd(centers, x, idx0, sweeps=1)
        e1 = _err(centers, x, idx1)
        assert (e1 <= e0 + 1e-4).all()

        # After convergence, every coordinate is optimal given the others.
        idx = idx0
        for _ in range(8):
            idx = search.refine_indexes_cd(centers, x, idx, sweeps=1)
        e = _err(centers, x, idx)
        idx_np = np.asarray(idx)
        cn = np.asarray(centers)
        xn = np.asarray(x)
        for n in range(4):
            recon_wo = (
                cn[np.arange(4)[None, :], idx_np].sum(1) - cn[n][idx_np[:, n]]
            )
            # best possible choice for codebook n
            cand = recon_wo[:, None, :] + cn[n][None, :, :]  # (B, cs, dim)
            best = ((cand - xn[:, None, :]) ** 2).sum(-1).min(1)
            assert np.allclose(best, e, atol=1e-3), n

    def test_cd_beats_argmax_init(self):
        config, params, x = _setup(jax.random.PRNGKey(3), 64, 16, 8)
        i0 = search.compute_indexes(params, config, x, 0)
        i_cd = search.compute_indexes(params, config, x, 3, search="cd")
        centers = core.scaled_centers(params, config.scale_speed)
        assert _err(centers, x, i_cd).mean() < _err(centers, x, i0).mean()

    def test_unknown_search_raises(self):
        config, params, x = _setup(jax.random.PRNGKey(4), 16, 16, 2)
        with pytest.raises(ValueError):
            search.compute_indexes(params, config, x, 1, search="nope")


class TestSeqbeamKernel:
    def test_supported_gate(self):
        ok = core.QuantizerConfig(dim=512, codebook_size=256, num_codebooks=8)
        assert SEQBEAM_SUPPORTED(ok)
        assert not SEQBEAM_SUPPORTED(
            core.QuantizerConfig(dim=512, codebook_size=16, num_codebooks=8)
        )
        assert not SEQBEAM_SUPPORTED(
            core.QuantizerConfig(dim=100, codebook_size=256, num_codebooks=8)
        )

    def test_matches_numpy_mirror(self):
        """Bit-exact agreement with a straightforward NumPy implementation
        of the kernel's exact semantics: algebraically-folded rescoring with
        bf16 MXU rounding, packed-mantissa argmin selection (values
        truncated to 15 mantissa bits, ties to the lowest lane), carried
        candidate sumsq, and the one-hot-difference extension matmul."""
        config, params, x = _setup(jax.random.PRNGKey(5), 128, 256, 4, B=128)
        out = seqbeam_encode_indexes(
            params, config, x, passes=2, interpret=True, impl="v1"
        )

        M, R, passes = 16, 8, 2
        LM = 255  # lane mask (8 bits)
        centers_f32 = np.asarray(
            core.scaled_centers(params, config.scale_speed), np.float32
        )
        nc, cs, D = centers_f32.shape
        ctab = np.asarray(
            jnp.asarray(centers_f32).astype(jnp.bfloat16).astype(jnp.float32)
        )  # the kernel stores codebooks in bf16
        css = np.asarray(jnp.sum(jnp.asarray(centers_f32) ** 2, axis=-1), np.float32)
        logits = np.asarray(search.compute_logits(params, config, x))
        sol = logits.argmax(-1).astype(np.int32)  # (B, nc)
        xn = np.asarray(x, np.float32)
        B = xn.shape[0]

        def bf16(a):
            return np.asarray(
                jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32), np.float32
            )

        def mm(a, b):  # bf16 x bf16 -> f32 accumulate
            return (bf16(a).astype(np.float32) @ b.astype(np.float32)).astype(
                np.float32
            )

        def enc_pack(sv, lanes):
            bits = np.maximum(sv, 0.0).astype(np.float32).view(np.int32)
            return ((bits & ~LM) | lanes).view(np.float32)

        def min_packed(enc):
            emin = enc.min(axis=1, keepdims=True)
            bits = emin.view(np.int32)
            return (bits & ~LM).view(np.float32), bits & LM, emin

        for _ in range(passes):
            e = np.zeros((B, D), np.float32) - xn
            for t in range(nc):
                e = e + ctab[t][sol[:, t]]  # one-hot matmul == bf16 row pick
            E = np.repeat(e[None, :, :], M, axis=0)  # (M, B, D) f32
            chosen = np.repeat(sol[None, :, :], M, axis=0)  # (M, B, nc)
            ss = np.broadcast_to((e * e).sum(-1)[:, None], (B, M)).copy()
            for t in range(nc):
                cross = np.stack([mm(E[m], ctab[t].T) for m in range(M)])  # (M,B,cs)
                c_cur = ctab[t][sol[:, t]]  # (B, D)
                q = mm(c_cur, ctab[t].T)  # (B, cs)
                cc = q[np.arange(B), sol[:, t]]  # (B,)
                Ec = cross[:, np.arange(B), sol[:, t]]  # (M, B)
                S = (
                    (ss.T - 2.0 * Ec + cc[None, :])[:, :, None]
                    + css[t][None, None, :]
                    + 2.0 * (cross - q[None])
                )  # (M, B, cs)
                lanes_cs = np.arange(cs, dtype=np.int32)[None, :]
                if t == 0:
                    enc0 = enc_pack(S[0], np.broadcast_to(lanes_cs, (B, cs)).copy())
                    j = np.zeros((B, M), np.int32)
                    vals = np.zeros((B, M), np.float32)
                    for m in range(M):
                        v, pos, _ = min_packed(enc0)
                        j[:, m] = pos[:, 0]
                        vals[:, m] = v[:, 0]
                        enc0[lanes_cs == pos] = 1e30
                    parent = np.zeros((B, M), np.int32)
                else:
                    vR = np.zeros((B, M, R), np.float32)
                    jR = np.zeros((B, M, R), np.int32)
                    for m in range(M):
                        enc = enc_pack(
                            S[m], np.broadcast_to(lanes_cs, (B, cs)).copy()
                        )
                        for r in range(R):
                            v, pos, _ = min_packed(enc)
                            vR[:, m, r] = v[:, 0]
                            jR[:, m, r] = pos[:, 0]
                            enc[lanes_cs == pos] = 1e30
                    poolv = vR.reshape(B, M * R)
                    poolj = jR.reshape(B, M * R)
                    lanes_p = np.arange(M * R, dtype=np.int32)[None, :]
                    encp = enc_pack(poolv, np.broadcast_to(lanes_p, (B, M * R)).copy())
                    parent = np.zeros((B, M), np.int32)
                    j = np.zeros((B, M), np.int32)
                    vals = np.zeros((B, M), np.float32)
                    for m in range(M):
                        v, pos, _ = min_packed(encp)
                        parent[:, m] = pos[:, 0] // R
                        j[:, m] = poolj[np.arange(B), pos[:, 0]]
                        vals[:, m] = v[:, 0]
                        encp[lanes_p == pos] = 1e30
                # extension: E_new = E[parent] + (c_t(j) - c_t(i_t))
                delta = ctab[t][j] - c_cur[None, :, :].transpose(1, 0, 2)  # (B,M,D)
                E = (
                    E[parent.T, np.arange(B)[None, :], :]
                    + delta.transpose(1, 0, 2)
                )
                chosen = chosen[parent.T, np.arange(B)[None, :], :]
                chosen[:, :, t] = j.T
                ss = vals
            lanes_m = np.arange(M, dtype=np.int32)[None, :]
            _, best, _ = min_packed(enc_pack(ss, np.broadcast_to(lanes_m, (B, M)).copy()))
            sol = chosen[best[:, 0], np.arange(B), :]

        assert (np.asarray(out) == sol).all()

    def test_v2_matches_v1_quality(self):
        """The v2 kernel reorganizes the score assembly (Gram-folded shared
        row, packed-parent pool), changing f32 association order and the
        shared-term rounding (bf16 Gram input), so outputs are not bit-equal
        to v1 — but the reconstruction error must be equal to ~1e-4 relative
        and the selected indexes nearly identical."""
        config, params, x = _setup(jax.random.PRNGKey(5), 128, 256, 4, B=128)
        o1 = seqbeam_encode_indexes(
            params, config, x, passes=2, interpret=True, impl="v1"
        )
        o2 = seqbeam_encode_indexes(
            params, config, x, passes=2, interpret=True, impl="v2"
        )
        centers = core.scaled_centers(params, config.scale_speed)
        e1, e2 = _err(centers, x, o1).sum(), _err(centers, x, o2).sum()
        assert abs(e2 - e1) / e1 < 1e-3, (e1, e2)
        assert (np.asarray(o1) == np.asarray(o2)).mean() > 0.95

    def test_improves_over_init_and_padding(self):
        config, params, x = _setup(jax.random.PRNGKey(6), 128, 256, 2, B=100)
        # B=100 exercises the padding path (block_b=64 -> padded to 128).
        out = seqbeam_encode_indexes(params, config, x, passes=1, interpret=True)
        assert out.shape == (100, 2)
        centers = core.scaled_centers(params, config.scale_speed)
        i0 = search.compute_indexes(params, config, x, 0)
        assert _err(centers, x, out).mean() <= _err(centers, x, i0).mean()


class TestEncodeSearchMethodAPI:
    def test_codec_encode_methods_agree_on_shape(self):
        config, params, x = _setup(jax.random.PRNGKey(7), 128, 256, 2, B=64)
        for method, iters in (("beam", 2), ("cd", 2), ("seqbeam", 1)):
            if method == "seqbeam":
                # interpret path only on CPU
                from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

                codes = seqbeam_encode_indexes(params, config, x, passes=1,
                                               interpret=True)
                codes = core.pack_indexes(codes, config.codebook_size)
            else:
                codes = core.encode(params, config, x, iters,
                                    search_method=method)
            assert codes.shape == (64, 2) and codes.dtype == jnp.uint8

    def test_quantizer_encode_search_method(self):
        from quantization_tpu.models.quantizer import Quantizer

        q = Quantizer(dim=64, codebook_size=16, num_codebooks=4,
                      key=jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
        cb = q.encode(x, refine_indexes_iters=2)
        cc = q.encode(x, refine_indexes_iters=2, search_method="cd")
        assert cb.shape == cc.shape == (32, 2)
        # both decode to sane reconstructions
        for c in (cb, cc):
            r = q.decode(c)
            assert float(jnp.mean((r - x) ** 2)) < float(jnp.mean(x ** 2))


def test_interleave_is_semantics_neutral():
    """The SUBT sub-tile interleave (scheduling knob) must not change any
    output: per-frame search is independent of how the tile is split."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(9), config)
    x = jax.random.normal(jax.random.PRNGKey(10), (128, 128))
    o1 = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                interpret=True, interleave=1)
    o2 = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                interpret=True, interleave=2)
    assert (np.asarray(o1) == np.asarray(o2)).all()


def test_cross_value_is_bit_identical():
    """cross_value (rescore result as SSA value instead of a scratch-ref
    round-trip) is a pure scheduling knob: outputs must be bit-identical,
    on both the fori (mask=None) and static-schedule paths."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(21), config)
    x = jax.random.normal(jax.random.PRNGKey(22), (128, 128))
    for kw in (
        dict(),
        dict(pool_mask="altparity", interleave=2),
    ):
        o_ref = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                       interpret=True, **kw)
        o_val = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                       interpret=True, cross_value=True, **kw)
        assert (np.asarray(o_ref) == np.asarray(o_val)).all(), kw


def test_select_reorder_is_bit_identical():
    """reorder="select" replaces the sublane-gather beam reorder with a
    log2(M)-level vector select tree — the SAME row moves, so outputs must
    be bit-identical to the gather path on both schedule paths."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(30), config)
    x = jax.random.normal(jax.random.PRNGKey(31), (128, 128))
    for kw in (
        dict(block_b=128),
        dict(block_b=128, pool_mask="altparity", interleave=2),
    ):
        o_g = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                     interpret=True, reorder="gather", **kw)
        o_s = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                     interpret=True, reorder="select", **kw)
        assert (np.asarray(o_g) == np.asarray(o_s)).all(), kw
        o_w = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                     interpret=True, reorder="wideselect",
                                     **kw)
        assert (np.asarray(o_g) == np.asarray(o_w)).all(), kw


def test_bf16_e_buffer_quality():
    """e_dtype="bf16" only adds rounding at the per-step E += c_delta
    accumulation (rescore casts E to bf16 either way), so its
    reconstruction error must be within a whisker of the f32 variant's.
    Not bit-identical by construction — compare errors, not indexes."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(40), config)
    x = jax.random.normal(jax.random.PRNGKey(41), (128, 128))
    centers = core.scaled_centers(params, config.scale_speed)

    def err(indexes):
        recon = codec.decode_indexes(centers, np.asarray(indexes))
        return float(jnp.sum((recon - x) ** 2))

    kw = dict(M=8, R=4, passes=2, interpret=True, block_b=128,
              reorder="select", pool_mask="altparity")
    e_f32 = err(seqbeam_encode_indexes(params, config, x, **kw))
    e_bf16 = err(seqbeam_encode_indexes(params, config, x, e_dtype="bf16",
                                        **kw))
    assert e_bf16 <= 1.02 * e_f32, (e_bf16, e_f32)
    with pytest.raises(AssertionError):
        seqbeam_encode_indexes(params, config, x, e_dtype="bf16",
                               reorder="gather", M=8, R=4, passes=2,
                               interpret=True)


def test_pool_mask_schedules():
    """pool_mask contracts: an all-pool mask is bit-identical to the
    default (fori) path; the "altparity" string resolves to the per-pass
    even/odd schedule; R1-heavy schedules still improve on the init."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(13), config)
    x = jax.random.normal(jax.random.PRNGKey(14), (64, 128))
    kw = dict(M=8, R=4, passes=2, interpret=True, block_b=64)
    o_def = seqbeam_encode_indexes(params, config, x, **kw)
    o_all = seqbeam_encode_indexes(params, config, x, pool_mask=(True,) * 4, **kw)
    assert (np.asarray(o_def) == np.asarray(o_all)).all()

    even = (True, False, True, False)
    odd = (False, True, False, True)
    o_str = seqbeam_encode_indexes(params, config, x, pool_mask="altparity", **kw)
    o_tup = seqbeam_encode_indexes(params, config, x, pool_mask=(even, odd), **kw)
    assert (np.asarray(o_str) == np.asarray(o_tup)).all()

    centers = core.scaled_centers(params, config.scale_speed)
    i0 = search.compute_indexes(params, config, x, 0)
    for mask in ((False,) * 4, (even, odd)):
        out = seqbeam_encode_indexes(params, config, x, pool_mask=mask, **kw)
        assert _err(centers, x, out).mean() <= _err(centers, x, i0).mean()


def test_kernel_nc16_interpret():
    """The 16-codebook config (16 B/frame at cs=256) is inside
    SEQBEAM_SUPPORTED; assert the kernel handles it and improves on the
    argmax init."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=16)
    params = core.init_quantizer_params(jax.random.PRNGKey(11), config)
    x = jax.random.normal(jax.random.PRNGKey(12), (64, 128))
    out = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=1,
                                 interpret=True, block_b=64)
    assert out.shape == (64, 16)
    centers = core.scaled_centers(params, config.scale_speed)
    i0 = search.compute_indexes(params, config, x, 0)
    assert _err(centers, x, out).mean() <= _err(centers, x, i0).mean()


class TestGramV3:
    """The v3 Gram-table kernel (ops/gramv3.py): no per-candidate error
    buffer; scores come from a precomputed Gram matrix with csq/2 diagonal
    blocks.  Selection semantics are shared with v2."""

    def test_matches_numpy_mirror(self):
        """Bit-exact agreement with a NumPy implementation of the kernel's
        exact semantics at nc=2 (where the one-hot Gram matmul has two
        nonzero products per output, so the MXU's f32 accumulation order
        cannot differ from NumPy's), covering both table dtypes, pool and
        R1 steps, the packed-parent pool, and the per-pass winner restart."""
        from quantization_tpu.ops.gramv3 import gramv3_encode_indexes

        config, params, x = _setup(jax.random.PRNGKey(30), 128, 256, 2, B=64)
        nc, cs = 2, 256
        M, R, passes = 8, 2, 2
        pool_mask = ((True, True), (True, False))  # one R1 step in pass 2
        LM = 255

        centers = core.scaled_centers(params, config.scale_speed)
        ctab = centers.reshape(nc * cs, 128).astype(jnp.bfloat16)
        csq = jnp.sum(
            centers.astype(jnp.bfloat16).astype(jnp.float32) ** 2, axis=-1
        )
        # replicate the wrapper's XLA-side precomputes with jnp (identical
        # expressions), then run the step loop in NumPy
        g = jnp.dot(ctab, ctab.T, preferred_element_type=jnp.float32)
        blk = jnp.repeat(jnp.arange(nc), cs)
        eye = (blk[:, None] == blk[None, :]).astype(jnp.float32)
        gtil_f32 = g * (1.0 - eye) + eye * (csq.reshape(nc * cs) / 2.0)[None, :]
        xc = jnp.dot(
            x.astype(jnp.bfloat16), ctab.T, preferred_element_type=jnp.float32
        )
        logits = search.compute_logits(params, config, x)
        init = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        recon0 = jnp.take_along_axis(
            centers[None], init[:, :, None, None], axis=2
        )[:, :, 0, :].sum(axis=1)
        ss0 = jnp.sum((recon0 - x) ** 2, axis=-1, keepdims=True)

        for g_dtype in ("bf16", "int8"):
            if g_dtype == "int8":
                amax = jnp.max(jnp.abs(gtil_f32))
                scale = jnp.where(amax > 0, amax / 127.0, 1.0)
                gq = jnp.round(gtil_f32 / scale).astype(jnp.int8)
                gtab = np.asarray(gq, np.int32)  # int32 row sums == int8 MXU
                xcn = np.asarray(xc * (1.0 / scale), np.float32)
                ssn = np.asarray(ss0 * (1.0 / scale), np.float32)
            else:
                gtab = np.asarray(
                    gtil_f32.astype(jnp.bfloat16).astype(jnp.float32),
                    np.float32,
                )
                xcn = np.asarray(xc, np.float32)
                ssn = np.asarray(ss0, np.float32)
            B = 64
            sol = np.asarray(init, np.int32)  # (B, nc)
            ss_root = ssn[:, 0].copy()  # (B,)
            lanes_cs = np.arange(cs, dtype=np.int32)[None, :]

            def enc_pack(sv, lanes):
                bits = np.maximum(sv, 0.0).astype(np.float32).view(np.int32)
                return ((bits & ~LM) | lanes).view(np.float32)

            for p in range(passes):
                mask = pool_mask[p]
                for t in range(nc):
                    if t == 0:
                        rows = sum(
                            gtab[s * cs + sol[:, s]] for s in range(nc)
                        ).astype(np.float32)
                        Q0 = 2.0 * (
                            rows[:, t * cs : (t + 1) * cs]
                            - xcn[:, t * cs : (t + 1) * cs]
                        )
                        Qi = Q0[np.arange(B), sol[:, t]]
                        S0 = (ss_root - Qi)[:, None] + Q0
                        enc = enc_pack(
                            S0, np.broadcast_to(lanes_cs, (B, cs)).copy()
                        )
                        j = np.zeros((B, M), np.int32)
                        vals = np.zeros((B, M), np.float32)
                        for m in range(M):
                            emin = enc.min(axis=1)
                            bits = emin.view(np.int32)
                            j[:, m] = bits & LM
                            vals[:, m] = (bits & ~LM).view(np.float32)
                            enc[enc == emin[:, None]] = 1e30
                        chosen = np.repeat(sol[:, None, :], M, axis=1)
                        chosen[:, :, t] = j
                        ss = vals  # (B, M)
                        continue
                    # full rescore for all M candidates
                    rows = np.zeros((B, M, cs), np.float32)
                    for m in range(M):
                        r = sum(
                            gtab[s * cs + chosen[:, m, s]] for s in range(nc)
                        ).astype(np.float32)
                        rows[:, m] = r[:, t * cs : (t + 1) * cs]
                    Q = 2.0 * (rows - xcn[:, None, t * cs : (t + 1) * cs])
                    Qi = np.take_along_axis(
                        Q, chosen[:, :, t][:, :, None], axis=2
                    )[:, :, 0]
                    S = (ss - Qi)[:, :, None] + Q  # (B, M, cs)
                    if not mask[t]:
                        # R1: one packed round per parent, in place
                        enc = enc_pack(
                            S.reshape(B * M, cs),
                            np.broadcast_to(lanes_cs, (B * M, cs)).copy(),
                        )
                        emin = enc.min(axis=1)
                        bits = emin.view(np.int32)
                        chosen[:, :, t] = (bits & LM).reshape(B, M)
                        ss = (bits & ~LM).view(np.float32).reshape(B, M)
                        continue
                    # pool: R packed rounds per parent, then M pool rounds
                    vRe = np.zeros((B, M, R), np.float32)
                    enc = enc_pack(
                        S.reshape(B * M, cs),
                        np.broadcast_to(lanes_cs, (B * M, cs)).copy(),
                    )
                    for r in range(R):
                        emin = enc.min(axis=1)
                        vRe[:, :, r] = emin.reshape(B, M)
                        enc[enc == emin[:, None]] = 1e30
                    pool0 = vRe.reshape(B, M * R)  # lane = m*R + r
                    mbits = (M - 1) << 8
                    lanes_p = np.arange(M * R, dtype=np.int32)[None, :]
                    mconst = (lanes_p // R) << 8
                    penc = (
                        (pool0.view(np.int32) & ~mbits) | mconst
                    ).view(np.float32)
                    parent = np.zeros((B, M), np.int32)
                    jj = np.zeros((B, M), np.int32)
                    vals = np.zeros((B, M), np.float32)
                    for m in range(M):
                        emin = penc.min(axis=1)
                        bits = emin.view(np.int32)
                        jj[:, m] = bits & LM
                        parent[:, m] = (bits >> 8) & (M - 1)
                        vals[:, m] = (bits & ~(mbits | LM)).view(np.float32)
                        penc[penc == emin[:, None]] = 1e30
                    chosen = np.take_along_axis(
                        chosen, parent[:, :, None], axis=1
                    )
                    chosen[:, :, t] = jj
                    ss = vals
                # pass end: winner via packed m-id min
                lanes_m = np.arange(M, dtype=np.int32)[None, :]
                encm = enc_pack(ss, np.broadcast_to(lanes_m, (B, M)).copy())
                emin = encm.min(axis=1)
                bits = emin.view(np.int32)
                best = bits & LM
                ss_root = (bits & ~LM).view(np.float32)
                sol = chosen[np.arange(B), best, :]

            out = gramv3_encode_indexes(
                params, config, x, M=M, R=R, passes=passes,
                pool_mask=pool_mask, g_dtype=g_dtype, block_b=64,
                interpret=True,
            )
            assert (np.asarray(out) == sol).all(), g_dtype

    def test_quality_matches_v2(self):
        """Same selection semantics, different scoring arithmetic: the v3
        reconstruction error must track the v2 kernel closely at both
        table dtypes, and the supported-gate covers any dim."""
        from quantization_tpu.ops.gramv3 import (
            GRAMV3_SUPPORTED, gramv3_encode_indexes)

        config, params, x = _setup(jax.random.PRNGKey(31), 128, 256, 4, B=64)
        centers = core.scaled_centers(params, config.scale_speed)
        o2 = seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                    interpret=True, block_b=64)
        e2 = _err(centers, x, o2).sum()
        for g_dtype in ("bf16", "int8"):
            o3 = gramv3_encode_indexes(params, config, x, M=8, R=4, passes=2,
                                       g_dtype=g_dtype, block_b=64,
                                       interpret=True)
            e3 = _err(centers, x, o3).sum()
            assert abs(e3 - e2) / e2 < 5e-3, (g_dtype, e2, e3)
        # dim is unconstrained for v3 (no error buffer): 96 is not a
        # multiple of 128 and is rejected by the v2 gate
        cfg96 = core.QuantizerConfig(dim=96, codebook_size=256,
                                     num_codebooks=2)
        assert GRAMV3_SUPPORTED(cfg96) and not SEQBEAM_SUPPORTED(cfg96)
        p96 = core.init_quantizer_params(jax.random.PRNGKey(32), cfg96)
        x96 = jax.random.normal(jax.random.PRNGKey(33), (64, 96))
        o96 = gramv3_encode_indexes(p96, cfg96, x96, M=8, R=2, passes=1,
                                    block_b=64, interpret=True)
        c96 = core.scaled_centers(p96, cfg96.scale_speed)
        i0 = search.compute_indexes(p96, cfg96, x96, 0)
        assert _err(c96, x96, o96).mean() <= _err(c96, x96, i0).mean()

    def test_interleave_is_semantics_neutral(self):
        """The v3 sub-tile phase zip (interleave=2) is a pure scheduling
        knob: outputs must be bit-identical to interleave=1."""
        from quantization_tpu.ops.gramv3 import gramv3_encode_indexes

        config, params, x = _setup(jax.random.PRNGKey(34), 128, 256, 2, B=128)
        kw = dict(M=8, R=2, passes=2, block_b=128, interpret=True)
        o1 = gramv3_encode_indexes(params, config, x, interleave=1, **kw)
        o2 = gramv3_encode_indexes(params, config, x, interleave=2, **kw)
        assert (np.asarray(o1) == np.asarray(o2)).all()

    def test_fori_matches_unrolled(self):
        """The fori-loop kernel (one emitted step body per pass; Mosaic
        program size independent of nc) must be bit-identical to the
        unrolled kernel for every supported table dtype, interleave, and
        per-pass-uniform schedule; mixed schedules are rejected."""
        import pytest
        from quantization_tpu.ops.gramv3 import gramv3_encode_indexes

        config, params, x = _setup(jax.random.PRNGKey(35), 128, 256, 4, B=128)
        nc = 4
        for g_dtype in ("bf16", "int8"):
            for il in (1, 2):
                kw = dict(M=8, R=2, passes=2, block_b=64, g_dtype=g_dtype,
                          interleave=il, interpret=True)
                o_u = gramv3_encode_indexes(params, config, x,
                                            loop="unroll", **kw)
                o_f = gramv3_encode_indexes(params, config, x,
                                            loop="fori", **kw)
                assert (np.asarray(o_u) == np.asarray(o_f)).all(), (
                    g_dtype, il)
        # an all-R1 second pass is fori-eligible too
        mask = ((True,) * nc, (False,) * nc)
        kw = dict(M=8, R=2, passes=2, block_b=64, pool_mask=mask,
                  interpret=True)
        o_u = gramv3_encode_indexes(params, config, x, loop="unroll", **kw)
        o_f = gramv3_encode_indexes(params, config, x, loop="fori", **kw)
        assert (np.asarray(o_u) == np.asarray(o_f)).all()
        # mixed (altparity-style) schedules cannot run under fori
        with pytest.raises(ValueError):
            gramv3_encode_indexes(params, config, x, loop="fori",
                                  pool_mask="altparity", M=8, R=2, passes=2,
                                  block_b=64, interpret=True)


def test_zip_skew_is_bit_identical():
    """zip_skew (sub-tile phase-stream skew, the software-pipelining knob)
    only reorders INDEPENDENT instruction chains in emission order — the
    per-frame search must be bit-identical to the same-phase zip, for
    every E storage dtype the skewed path supports."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(40), config)
    x = jax.random.normal(jax.random.PRNGKey(41), (128, 128))
    for kw in (
        dict(reorder="select", e_dtype="int8"),
        dict(reorder="select", e_dtype="int8", requant="pass"),
        dict(reorder="select", e_dtype="bf16"),
    ):
        o0 = seqbeam_encode_indexes(
            params, config, x, M=8, R=4, passes=2, block_b=128,
            pool_mask="altparity", interleave=2, interpret=True, **kw)
        for zs in (1, 2):
            oz = seqbeam_encode_indexes(
                params, config, x, M=8, R=4, passes=2, block_b=128,
                pool_mask="altparity", interleave=2, interpret=True,
                zip_skew=zs, **kw)
            assert (np.asarray(o0) == np.asarray(oz)).all(), (kw, zs)


def test_requant_bound_improves_over_init():
    """requant="bound" propagates int8 E scales as the upper bound
    s_parent + cmax_t/127 instead of the exact row max (sim-screened at
    +0.98% vs beam-5 on the trained flagship); the kernel path must still
    strictly improve on the argmax init."""
    from quantization_tpu.core import search as _search
    from quantization_tpu.core.codec import decode_indexes
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=2)
    params = core.init_quantizer_params(jax.random.PRNGKey(50), config)
    x = jax.random.normal(jax.random.PRNGKey(51), (128, 128))
    centers = core.scaled_centers(params, config.scale_speed)
    init = jnp.argmax(
        _search.compute_logits(params, config, x), -1).astype(jnp.int32)
    err0 = float(jnp.sum((decode_indexes(centers, init) - x) ** 2))
    out = seqbeam_encode_indexes(
        params, config, x, M=8, R=4, passes=1, block_b=128,
        pool_mask="altparity", interleave=2, reorder="select",
        e_dtype="int8", requant="bound", zip_skew=1, interpret=True)
    err = float(jnp.sum((decode_indexes(centers, jnp.asarray(out)) - x) ** 2))
    assert err < err0, (err, err0)


def test_sel_fold_is_bit_identical():
    """sel_impl="fold" replaces the per-round lo/hi re-minimum with a
    partner-promotion scheme (g holds pair mins, gmax the pair maxes;
    extraction promotes the consumed lane's partner) — the same multiset is
    extracted in the same order, so outputs must be bit-identical on the
    fori, static-schedule, and int8 paths, including M=16 fan-outs."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(40), config)
    x = jax.random.normal(jax.random.PRNGKey(41), (128, 128))
    for kw in (
        dict(M=8, R=4),
        dict(M=8, R=4, pool_mask="altparity", interleave=2,
             reorder="select", e_dtype="int8"),
        dict(M=16, R=4, pool_mask="altparity", reorder="select"),
    ):
        o_ref = seqbeam_encode_indexes(params, config, x, passes=2,
                                       interpret=True, **kw)
        o_f = seqbeam_encode_indexes(params, config, x, passes=2,
                                     interpret=True, sel_impl="fold", **kw)
        assert (np.asarray(o_ref) == np.asarray(o_f)).all(), kw


def test_lazy_r1_matches_eager():
    """lazy_r1 defers R1-step deltas into the next pool step (Gram-block
    score correction + merged extension).  Not bit-identical by contract
    (the correction runs in bf16; the skipped R1 requantization changes
    int8 rounding), but on a small config the indexes should agree almost
    everywhere and the reconstruction error must match closely."""
    from quantization_tpu.core.codec import decode_indexes
    from quantization_tpu.core.types import scaled_centers
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(21), config)
    x = jax.random.normal(jax.random.PRNGKey(22), (128, 128))
    centers = scaled_centers(params, config.scale_speed)

    def relerr(idx):
        r = decode_indexes(centers, jnp.asarray(idx))
        return float(jnp.sum((r - x) ** 2) / jnp.sum(x * x))

    for kw in (
        dict(M=8, R=4, reorder="select"),
        dict(M=8, R=4, reorder="select", e_dtype="int8", interleave=2,
             zip_skew=1),
    ):
        o_e = seqbeam_encode_indexes(params, config, x, passes=2,
                                     interpret=True, pool_mask="altparity",
                                     **kw)
        o_l = seqbeam_encode_indexes(params, config, x, passes=2,
                                     interpret=True, pool_mask="altparity",
                                     lazy_r1=True, **kw)
        agree = float((np.asarray(o_e) == np.asarray(o_l)).mean())
        assert agree >= 0.98, (agree, kw)
        re_, rl = relerr(o_e), relerr(o_l)
        assert abs(re_ - rl) <= 2e-3 * re_, (re_, rl, kw)


def test_lazy_r1_rejects_bad_schedules():
    """A deferring R1 step must be followed by a pool step; dynamic
    (mask=None) schedules are rejected outright."""
    from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(21), config)
    x = jax.random.normal(jax.random.PRNGKey(22), (64, 128))
    with pytest.raises(AssertionError):
        seqbeam_encode_indexes(
            params, config, x, passes=1, interpret=True, reorder="select",
            pool_mask=(True, False, False, True), lazy_r1=True)
    with pytest.raises(AssertionError):
        seqbeam_encode_indexes(
            params, config, x, passes=1, interpret=True, reorder="select",
            lazy_r1=True)  # no static mask
