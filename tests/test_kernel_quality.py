"""Quality-regression guard for the auto/seqbeam search config.

The headline claim (kernel within 1% relative reconstruction error of the
reference beam-5) is measured on TPU over 8K frames in experiments/; this
test pins a loose version of it in CI using the committed trained
dim=256/4B quantizer and the interpret-mode kernel on a small frame set —
same frames for both searches, so the comparison is paired and stable.
"""

import pathlib

import jax
import jax.numpy as jnp
import pytest

from quantization_tpu import core
from quantization_tpu.core import codec, search
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.ops.seqbeam import seqbeam_encode_indexes
from quantization_tpu.utils.serialization import load_quantizer

QPATH = pathlib.Path(__file__).resolve().parents[1] / "experiments" / "q256_4_full.npz"


@pytest.mark.slow
def test_kernel_quality_within_bar_on_trained_quantizer():
    if not QPATH.exists():
        pytest.skip("trained quantizer artifact not present")
    q = load_quantizer(QPATH)
    params, config = q.params, q.config
    sampler = make_mlp_sampler(config.dim, jax.random.PRNGKey(42))
    x = sampler(jax.random.PRNGKey(7), 256)
    centers = core.scaled_centers(params, config.scale_speed)

    def sse(idx):
        recon = codec.decode_indexes(centers, idx)
        return float(jnp.sum((recon - x) ** 2))

    beam5 = sse(search.compute_indexes(params, config, x, 5, search="beam"))
    # the auto config at dim=256/4B: M=8, R=4, 2 passes
    kernel = sse(
        seqbeam_encode_indexes(params, config, x, M=8, R=4, passes=2,
                               interpret=True)
    )
    # Measured +0.59% on 8K frames; allow 2% on this 256-frame paired subset.
    assert kernel <= beam5 * 1.02, (kernel, beam5)
