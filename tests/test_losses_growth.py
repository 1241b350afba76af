"""Tests for compute_loss gradient routing and product-quantizer growth."""

import jax
import jax.numpy as jnp
import numpy as np

from quantization_tpu import core


def _setup(key, dim=32, cs=16, nc=4, B=64):
    config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)
    params = core.init_quantizer_params(key, config)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, dim))
    return config, params, x


def test_loss_values_sane():
    config, params, x = _setup(jax.random.PRNGKey(20))
    losses = core.compute_loss(params, config, x, refine_indexes_iters=1)
    assert float(losses.rel_reconstruction_loss) > 0
    assert float(losses.logprob_loss) > 0  # -mean log softmax > 0
    # entropy losses are (log cs - H)/log cs in [0, 1] (H <= log cs)
    assert -1e-5 <= float(losses.logits_entropy_loss) <= 1.0
    assert -1e-5 <= float(losses.index_entropy_loss) <= 1.0


def test_gradient_routing():
    """recon loss -> centers/centers_scale only; logprob -> to_logits/logits_scale
    only (the routing documented at `quantization/quantization.py:684-699`)."""
    config, params, x = _setup(jax.random.PRNGKey(21))

    g_recon = jax.grad(
        lambda p: core.compute_loss(p, config, x, 1).rel_reconstruction_loss
    )(params)
    assert np.abs(np.asarray(g_recon.centers)).max() > 0
    assert np.abs(np.asarray(g_recon.centers_scale)).max() > 0
    assert np.abs(np.asarray(g_recon.to_logits_w)).max() == 0
    assert np.abs(np.asarray(g_recon.to_logits_b)).max() == 0
    assert np.abs(np.asarray(g_recon.logits_scale)).max() == 0

    g_logprob = jax.grad(
        lambda p: core.compute_loss(p, config, x, 1).logprob_loss
    )(params)
    assert np.abs(np.asarray(g_logprob.to_logits_w)).max() > 0
    assert np.abs(np.asarray(g_logprob.logits_scale)).max() > 0
    assert np.abs(np.asarray(g_logprob.centers)).max() == 0
    assert np.abs(np.asarray(g_logprob.centers_scale)).max() == 0

    # index_entropy_loss is a pure diagnostic: no gradient at all.
    g_ie = jax.grad(
        lambda p: core.compute_loss(p, config, x, 1).index_entropy_loss
    )(params)
    for leaf in jax.tree_util.tree_leaves(g_ie):
        assert np.abs(np.asarray(leaf)).max() == 0


def test_product_growth_matches_explicit_loop():
    config, params, _ = _setup(jax.random.PRNGKey(22), dim=8, cs=4, nc=4)
    new_params = core.product_params(params, config)
    nc, cs, dim = 4, 4, 8
    new_cs = cs * cs

    c = np.asarray(params.centers)
    w = np.asarray(params.to_logits_w)
    b = np.asarray(params.to_logits_b)
    # Explicit triple loop, as in `quantization/quantization.py:100-111`.
    for c_out in range(nc // 2):
        c1, c2 = 2 * c_out, 2 * c_out + 1
        for k1 in range(cs):
            for k2 in range(cs):
                k_out = k1 * cs + k2
                np.testing.assert_allclose(
                    np.asarray(new_params.centers[c_out, k_out]),
                    c[c1, k1] + c[c2, k2],
                    rtol=1e-6,
                )
                row_out = new_cs * c_out + k_out
                np.testing.assert_allclose(
                    np.asarray(new_params.to_logits_w[row_out]),
                    w[cs * c1 + k1] + w[cs * c2 + k2],
                    rtol=1e-6,
                )
                np.testing.assert_allclose(
                    np.asarray(new_params.to_logits_b[row_out]),
                    b[cs * c1 + k1] + b[cs * c2 + k2],
                    rtol=1e-6,
                )
    # scales copied
    assert float(new_params.logits_scale) == float(params.logits_scale)
    assert float(new_params.centers_scale) == float(params.centers_scale)


def test_product_growth_preserves_reconstruction():
    """Decoding index pair (i, j) in the grown quantizer must equal the sum of
    decoding i and j in the parents: the product quantizer represents exactly
    the same reconstructions."""
    config, params, _ = _setup(jax.random.PRNGKey(23), dim=16, cs=4, nc=4)
    new_config = config.product_config()
    new_params = core.product_params(params, config)

    old_centers = core.scaled_centers(params, config.scale_speed)
    new_centers = core.scaled_centers(new_params, new_config.scale_speed)

    rng = np.random.default_rng(0)
    idx_old = jnp.asarray(rng.integers(0, 4, size=(10, 4)), dtype=jnp.int32)
    # combined index for pair c: k1 * cs + k2 where k1 = idx[2c], k2 = idx[2c+1]
    idx_new = idx_old[:, 0::2] * 4 + idx_old[:, 1::2]
    np.testing.assert_allclose(
        np.asarray(core.decode_indexes(old_centers, idx_old)),
        np.asarray(core.decode_indexes(new_centers, idx_new)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_codebook_correlations():
    config, params, _ = _setup(jax.random.PRNGKey(24))
    corr = np.asarray(core.codebook_correlations(params, config))
    assert corr.shape == (4, 4)
    np.testing.assert_allclose(np.diag(corr), 1.0, rtol=1e-5)
    np.testing.assert_allclose(corr, corr.T, rtol=1e-5)
    assert (corr >= -1e-5).all() and (corr <= 1.0 + 1e-5).all()


def test_serialization_roundtrip(tmp_path):
    from quantization_tpu import load_quantizer, save_quantizer
    from quantization_tpu.models.quantizer import Quantizer

    q = Quantizer(dim=16, codebook_size=16, num_codebooks=4, key=jax.random.PRNGKey(25))
    path = tmp_path / "q.npz"
    save_quantizer(path, q)
    q2 = load_quantizer(path)
    assert q2.get_id() == q.get_id()  # id round-trip (`test_train_hdf5.py:54`)
    assert q2.config == q.config
    for a, b in zip(
        jax.tree_util.tree_leaves(q.params), jax.tree_util.tree_leaves(q2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = jax.random.normal(jax.random.PRNGKey(26), (7, 16))
    np.testing.assert_array_equal(
        np.asarray(q.encode(x, 2)), np.asarray(q2.encode(x, 2))
    )
