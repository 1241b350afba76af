"""Tests for the multi-kmeans prototype family (SURVEY.md section 2 #13)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.models import multi_kmeans as mk
from quantization_tpu.train.multi_kmeans_trainer import MultiKmeansTrainer


def _setup(dim=16, cs=4, nc=8, B=64, seed=0):
    params = mk.init_multi_kmeans_params(jax.random.PRNGKey(seed), dim, cs, nc)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, dim))
    return params, x


def test_refine_pass_picks_per_codebook_argmin():
    """One refine pass returns, for every codebook, the argmin over entries of
    the squared error with all OTHER codebooks held at their input values —
    the defining property of the (Jacobi-style) coordinate-descent step.
    Verified against a brute-force O(B*nc*cs*dim) computation."""
    params, x = _setup()
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (x.shape[0], 8)), dtype=jnp.int32)
    out = mk.refine_indexes(params, x, idx)

    c = np.asarray(params.centers)  # (nc, cs, dim)
    xs = np.asarray(x)
    old = c[np.arange(8)[None, :], np.asarray(idx)]  # (B, nc, dim)
    x_err = old.sum(1) - xs  # (B, dim)
    # brute force: error when codebook n is switched to entry k
    mod = x_err[:, None, None, :] - old[:, :, None, :] + c[None]  # (B,nc,cs,dim)
    sumsq = (mod ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(out), sumsq.argmin(2))


def test_refine_improves_from_zero():
    # Jacobi-style simultaneous updates are not per-step monotone (all
    # codebooks move against the same stale assignment), but a few passes
    # must beat the zero init overall — same contract as the reference's
    # "works OK in practice" note (`multi_kmeans.py:210-214`).
    params, x = _setup()
    zero = jnp.zeros((x.shape[0], 8), dtype=jnp.int32)
    e_zero = float(jnp.sum((mk.decode(params, zero) - x) ** 2))
    idx = mk.encode(params, x, num_iters=4)
    e_ref = float(jnp.sum((mk.decode(params, idx) - x) ** 2))
    assert e_ref < e_zero, (e_zero, e_ref)


def test_encode_as_bytes_roundtrip():
    params, x = _setup(cs=16, nc=4)
    packed = mk.encode(params, x, num_iters=2, as_bytes=True)
    assert packed.dtype == jnp.uint8 and packed.shape == (64, 2)
    plain = mk.encode(params, x, num_iters=2, as_bytes=False)
    np.testing.assert_allclose(
        np.asarray(mk.decode(params, packed)),
        np.asarray(mk.decode(params, plain)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_stochastic_refine_gradient_routing():
    """frame_entropy grads -> frame_entropy_scale only; reconstruction grads
    -> centers only (the .detach() routing of `multi_kmeans.py:296-317`)."""
    params, x = _setup()
    idx = jnp.zeros((x.shape[0], 8), dtype=jnp.int32)
    key = jax.random.PRNGKey(5)

    g_fe = jax.grad(
        lambda p: mk.refine_indexes_stochastic(p, x, idx, key).frame_entropy
    )(params)
    assert np.abs(np.asarray(g_fe.frame_entropy_scale)).max() > 0
    assert np.abs(np.asarray(g_fe.centers)).max() == 0

    g_rec = jax.grad(
        lambda p: mk.refine_indexes_stochastic(p, x, idx, key).reconstruction_loss
    )(params)
    assert np.abs(np.asarray(g_rec.centers)).max() > 0
    assert np.abs(np.asarray(g_rec.frame_entropy_scale)).max() == 0


def test_product_growth_preserves_decode():
    params, x = _setup(cs=4, nc=4)
    grown = mk.product_params(params)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (10, 4)), dtype=jnp.int32)
    idx_new = idx[:, 0::2] * 4 + idx[:, 1::2]
    np.testing.assert_allclose(
        np.asarray(mk.decode(params, idx)),
        np.asarray(mk.decode(grown, idx_new)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_staged_trainer_learns():
    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(0))
    trainer = MultiKmeansTrainer(
        dim=dim, codebook_size=4, num_codebooks=4, num_stages=2,
        iters_per_stage=80, lr=0.003, seed=0,
    )
    x_eval = sampler(jax.random.PRNGKey(1), 512)
    q0 = trainer.get_quantizer()
    err0 = float(q0.compute_ref_loss(x_eval))
    key = jax.random.PRNGKey(2)
    while not trainer.done():
        key, sub = jax.random.split(key)
        trainer.step(sampler(sub, 256))
    q = trainer.get_quantizer()
    # grew once: cs 4 -> 16, nc 4 -> 2
    assert q.codebook_size == 16 and q.num_codebooks == 2
    err1 = float(q.compute_ref_loss(x_eval))
    assert err1 < err0 * 0.9, (err0, err1)
