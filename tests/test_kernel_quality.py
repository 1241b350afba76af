"""Quality-regression guard for the shipped kernel search configs.

The headline claim (kernel within 1% relative reconstruction error of the
reference beam-5, `quantization/quantization.py:308-548`) is measured on
TPU over 8K frames in experiments/; this test pins it in CI using the
committed trained dim=256/4B quantizer and the interpret-mode kernels on a
2K paired frame set — same frames for both searches, so the comparison is
paired and stable.  The gate is tied to the actual parity bar: each
shipped config must stay within beam5 * 1.012 summed squared error (the
measured deltas are +0.6-0.9%; a drift past ~1.2% on this paired set means
the 1% headline claim no longer holds).

The trained artifact is committed (experiments/q256_4_full.npz); a missing
artifact is a test FAILURE, not a skip — this gate must always run.
"""

import pathlib

import jax
import jax.numpy as jnp
import pytest

from quantization_tpu import core
from quantization_tpu.core import codec, search
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.ops.gramv3 import gramv3_encode_indexes
from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes
from quantization_tpu.utils.serialization import load_quantizer

QPATH = pathlib.Path(__file__).resolve().parents[1] / "experiments" / "q256_4_full.npz"
N_FRAMES = 2048
BAR = 1.012  # vs beam-5; the shipped parity claim is 1% on 8K TPU frames


@pytest.fixture(scope="module")
def trained():
    assert QPATH.exists(), (
        f"trained quantizer artifact missing: {QPATH} — the quality gate "
        "must always run; restore the committed file")
    q = load_quantizer(QPATH)
    sampler = make_mlp_sampler(q.config.dim, jax.random.PRNGKey(42))
    x = sampler(jax.random.PRNGKey(7), N_FRAMES)
    centers = core.scaled_centers(q.params, q.config.scale_speed)

    def sse(idx):
        recon = codec.decode_indexes(centers, idx)
        return float(jnp.sum((recon - x) ** 2))

    beam5 = sse(search.compute_indexes(q.params, q.config, x, 5, search="beam"))
    return q, x, sse, beam5


@pytest.mark.slow
def test_seqbeam_gather_f32_within_bar(trained):
    # the gather/f32 kernel variant (pre-round-3 auto config) — kept
    # pinned as the baseline the shipped select/bf16-E config was
    # validated against on the real chip
    q, x, sse, beam5 = trained
    kernel = sse(
        seqbeam_encode_indexes(
            q.params, q.config, x, M=8, R=4, passes=2,
            pool_mask="altparity", block_b=256, interleave=2,
            interpret=True,
        )
    )
    assert kernel <= beam5 * BAR, (kernel / beam5, kernel, beam5)


@pytest.mark.slow
def test_seqbeam_auto_config_within_bar(trained):
    # exactly the shipped auto config (core/codec.py): M=8, R=4, altparity
    # pool schedule, interleave=2, select-tree reorder, bf16 E (real-chip
    # quality: d256 +0.71%, d512 +0.96% vs beam-5,
    # experiments/kernel_quality_*.json); this pins it in CI.
    q, x, sse, beam5 = trained
    kernel = sse(
        seqbeam_encode_indexes(
            q.params, q.config, x, M=8, R=4, passes=2,
            pool_mask="altparity", block_b=256, interleave=2,
            reorder="select", e_dtype="bf16", interpret=True,
        )
    )
    assert kernel <= beam5 * BAR, (kernel / beam5, kernel, beam5)


@pytest.mark.slow
def test_seqbeam_int8_within_bar(trained):
    # the int8-resident-E config (round 4): int8 E with per-candidate f32
    # scales, per-codebook int8 centers, int8 x int8 -> int32 rescore and
    # extension (sim: +0.96% at d512, identical to f32/bf16,
    # experiments/int8ec_quality_d512_b8.json)
    q, x, sse, beam5 = trained
    kernel = sse(
        seqbeam_encode_indexes(
            q.params, q.config, x, M=8, R=4, passes=2,
            pool_mask="altparity", block_b=256, interleave=2,
            reorder="select", e_dtype="int8", interpret=True,
        )
    )
    assert kernel <= beam5 * BAR, (kernel / beam5, kernel, beam5)


@pytest.mark.slow
@pytest.mark.parametrize("g_dtype", ["bf16", "int8"])
def test_gramv3_within_bar(trained, g_dtype):
    q, x, sse, beam5 = trained
    kernel = sse(
        gramv3_encode_indexes(
            q.params, q.config, x, M=8, R=4, passes=3,
            g_dtype=g_dtype, block_b=256, interpret=True,
        )
    )
    assert kernel <= beam5 * BAR, (g_dtype, kernel / beam5, kernel, beam5)
