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
from quantization_tpu.core import search
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
        of the same algorithm (cap-R selection, bf16 matmul rounding)."""
        config, params, x = _setup(jax.random.PRNGKey(5), 128, 256, 4, B=128)
        out = seqbeam_encode_indexes(params, config, x, passes=2, interpret=True)

        M, R, passes = 16, 8, 2
        centers = np.asarray(
            core.scaled_centers(params, config.scale_speed), np.float32
        )
        nc, cs, D = centers.shape
        logits = np.asarray(search.compute_logits(params, config, x))
        idx = logits.argmax(-1).astype(np.int32)
        xn = np.asarray(x, np.float32)
        css = (centers * centers).sum(-1)
        B = xn.shape[0]

        def bf16(a):
            return np.asarray(
                jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)
            )

        for _ in range(passes):
            e = centers[np.arange(nc)[None, :], idx].sum(1) - xn
            E = np.repeat(e[:, None, :], M, axis=1)
            chosen = np.repeat(idx[:, None, :], M, axis=1)
            for t in range(nc):
                c_cur = bf16(centers[t])[idx[:, t]]
                E2 = E - c_cur[:, None, :]
                ss = (E2 * E2).sum(-1)
                cross = np.einsum("bmd,kd->bmk", bf16(E2), bf16(centers[t]))
                S = ss[:, :, None] + css[t][None, None, :] + 2.0 * cross
                if t == 0:
                    s0 = S[:, 0, :].copy()
                    j = np.zeros((B, M), np.int32)
                    parent = np.zeros((B, M), np.int32)
                    for m in range(M):
                        pos = s0.argmin(1)
                        j[:, m] = pos
                        s0[np.arange(B), pos] = 1e30
                else:
                    vR = np.zeros((B, M * R), np.float32)
                    jR = np.zeros((B, M * R), np.int32)
                    for m in range(M):
                        sm = S[:, m, :].copy()
                        for r in range(R):
                            pos = sm.argmin(1)
                            vR[:, m * R + r] = sm[np.arange(B), pos]
                            jR[:, m * R + r] = pos
                            sm[np.arange(B), pos] = 1e30
                    parent = np.zeros((B, M), np.int32)
                    j = np.zeros((B, M), np.int32)
                    pool = vR.copy()
                    for m in range(M):
                        pos = pool.argmin(1)
                        parent[:, m] = pos // R
                        j[:, m] = jR[np.arange(B), pos]
                        pool[np.arange(B), pos] = 1e30
                E = E2[np.arange(B)[:, None], parent] + bf16(centers[t])[j]
                chosen = chosen[np.arange(B)[:, None], parent]
                chosen[:, :, t] = j
            fin = (E * E).sum(-1)
            idx = chosen[np.arange(B), fin.argmin(1)]

        assert (np.asarray(out) == idx).all()

    def test_improves_over_init_and_padding(self):
        config, params, x = _setup(jax.random.PRNGKey(6), 128, 256, 2, B=100)
        # B=100 exercises the padding path (block_b=64 -> padded to 128).
        out = seqbeam_encode_indexes(params, config, x, passes=1, interpret=True)
        assert out.shape == (100, 2)
        centers = core.scaled_centers(params, config.scale_speed)
        i0 = search.compute_indexes(params, config, x, 0)
        assert _err(centers, x, out).mean() <= _err(centers, x, i0).mean()
