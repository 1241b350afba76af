"""Tests for the beam-search refinement (SURVEY.md section 2 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu import core


def _setup(key, dim, cs, nc, B=64):
    config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)
    params = core.init_quantizer_params(key, config)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, dim))
    return config, params, x


def _recon_err(params, config, x, indexes):
    centers = core.scaled_centers(params, config.scale_speed)
    recon = core.decode_indexes(centers, indexes)
    return float(jnp.sum((recon - x) ** 2))


def test_k_cutoff_schedule():
    # Matches the reference formula (`quantization/quantization.py:453-463`).
    assert core.k_cutoff_schedule(16, 1) == 8
    assert core.k_cutoff_schedule(256, 1) == 16
    assert core.k_cutoff_schedule(256, 2) == 16
    assert core.k_cutoff_schedule(256, 4) == 32
    assert core.k_cutoff_schedule(256, 16) == 64
    assert core.k_cutoff_schedule(256, 1 << 20) == 128


def test_search_plan_nc8_cs256():
    # The prototypical cs=256, nc=8 schedule from SURVEY.md section 3.1:
    # (8,256,1) ->prune-> (8,16,1) ->combine-> (4,256,2) ->prune-> (4,16,2)
    # ->combine-> (2,256,4) ->prune(32)-> (2,32,4) ->combine-> (1,1024,8)
    # ->prune-> (1,1,8) -> done.
    plan = core.search_plan(8, 256)
    ops = [(op, n, k) for op, n, k, _ in plan]
    assert ops == [
        ("prune", 8, 16),
        ("combine", 4, 256),
        ("prune", 4, 16),
        ("combine", 2, 256),
        ("prune", 2, 32),
        ("combine", 1, 1024),
        ("prune", 1, 1),
        ("done", 1, 1),
    ]


def test_refine_exact_for_two_codebooks():
    # For nc=2 a single refinement pass evaluates all cs^2 combinations with
    # exact sum-squared errors, so it must match brute force exactly.
    key = jax.random.PRNGKey(10)
    config, params, x = _setup(key, dim=8, cs=4, nc=2, B=32)
    centers = core.scaled_centers(params, config.scale_speed)
    start = jnp.zeros((x.shape[0], 2), dtype=jnp.int32)
    refined = core.refine_indexes(centers, x, start)

    # brute force over all 16 combinations
    c0, c1 = np.asarray(centers[0]), np.asarray(centers[1])
    xs = np.asarray(x)
    best = []
    for b in range(xs.shape[0]):
        errs = [
            (np.sum((c0[i] + c1[j] - xs[b]) ** 2), (i, j))
            for i in range(4)
            for j in range(4)
        ]
        best.append(min(errs)[1])
    np.testing.assert_array_equal(np.asarray(refined), np.asarray(best))


@pytest.mark.parametrize("cs,nc,dim", [(16, 8, 64), (16, 4, 32), (256, 4, 64)])
def test_refine_reduces_error_from_argmax_init(cs, nc, dim):
    key = jax.random.PRNGKey(11)
    config, params, x = _setup(key, dim, cs, nc)
    idx0 = core.compute_indexes(params, config, x, refine_indexes_iters=0)
    idx1 = core.compute_indexes(params, config, x, refine_indexes_iters=1)
    idx3 = core.compute_indexes(params, config, x, refine_indexes_iters=3)
    e0 = _recon_err(params, config, x, idx0)
    e1 = _recon_err(params, config, x, idx1)
    e3 = _recon_err(params, config, x, idx3)
    # Refinement improves on the argmax init (with untrained centers the
    # argmax init is already strong since centers == to_logits rows at init),
    # and extra iterations don't worsen the result.
    assert e1 < e0, (e0, e1)
    assert e3 <= e1 * 1.001, (e1, e3)


@pytest.mark.parametrize("cs,nc,dim", [(16, 8, 64), (256, 4, 64)])
def test_refine_improves_substantially_from_bad_init(cs, nc, dim):
    # From an all-zeros init (the worst case), one refinement pass must
    # recover most of the gap to the argmax-init quality.
    key = jax.random.PRNGKey(14)
    config, params, x = _setup(key, dim, cs, nc)
    centers = core.scaled_centers(params, config.scale_speed)
    zero = jnp.zeros((x.shape[0], nc), dtype=jnp.int32)
    e_zero = _recon_err(params, config, x, zero)
    refined = core.refine_indexes(centers, x, zero)
    e_ref = _recon_err(params, config, x, refined)
    # Untrained centers are tiny (~dim**-0.5 uniform), so even the optimal
    # reconstruction removes only part of x's energy; ~20% is what one pass
    # achieves here.
    assert e_ref < 0.85 * e_zero, (e_zero, e_ref)


def test_refine_indexes_in_range():
    key = jax.random.PRNGKey(12)
    config, params, x = _setup(key, dim=32, cs=16, nc=8)
    idx = core.compute_indexes(params, config, x, refine_indexes_iters=2)
    a = np.asarray(idx)
    assert a.shape == (x.shape[0], 8)
    assert a.min() >= 0 and a.max() < 16


def test_compute_indexes_jits_once_per_shape():
    key = jax.random.PRNGKey(13)
    config, params, x = _setup(key, dim=16, cs=16, nc=2, B=8)
    fn = jax.jit(
        lambda p, x: core.compute_indexes(p, config, x, refine_indexes_iters=2)
    )
    out1 = fn(params, x)
    out2 = fn(params, x + 0.0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
