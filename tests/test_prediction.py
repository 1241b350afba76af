"""Tests for the JointCodebookLoss predictor (SURVEY.md section 2 #11)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from quantization_tpu.models.prediction import (
    JointCodebookLoss,
    init_joint_codebook_params,
    joint_codebook_logits,
    joint_codebook_loss,
)


def _setup(key=0, N=32, P=24, nc=4, cs=8, hidden=16):
    k = jax.random.PRNGKey(key)
    params = init_joint_codebook_params(k, P, nc, hidden, cs)
    pred = jax.random.normal(jax.random.fold_in(k, 1), (N, P))
    idx = jax.random.randint(jax.random.fold_in(k, 2), (N, nc), 0, cs)
    return params, pred, idx


def test_loss_positive_and_shape():
    params, pred, idx = _setup()
    loss = joint_codebook_loss(params, pred, idx)
    assert loss.shape == ()
    assert float(loss) > 0


def test_reduction_modes():
    params, pred, idx = _setup()
    s = float(joint_codebook_loss(params, pred, idx, reduction="sum"))
    m = float(joint_codebook_loss(params, pred, idx, reduction="mean"))
    n = joint_codebook_loss(params, pred, idx, reduction="none")
    assert n.shape == idx.shape
    np.testing.assert_allclose(s, float(jnp.sum(n)), rtol=1e-5)
    np.testing.assert_allclose(m, s / idx.size, rtol=1e-5)


def test_ignore_index_masks_padding():
    params, pred, idx = _setup(N=16)
    # pad half the frames entirely (the reference contract: padding is
    # all-or-nothing per frame, `quantization/prediction.py:166-171`)
    idx_padded = jnp.concatenate(
        [idx[:8], jnp.full_like(idx[8:], -100)], axis=0
    )
    full = float(joint_codebook_loss(params, pred[:8], idx[:8]))
    masked = float(joint_codebook_loss(params, pred, idx_padded))
    np.testing.assert_allclose(full, masked, rtol=1e-5)


def test_joint_dependency_on_previous_codebooks():
    """Changing codebook 0's index must change the logits of codebooks >= 1
    (joint prediction) but not of codebook 0 itself (causality)."""
    params, pred, idx = _setup()
    logits_a = joint_codebook_logits(params, pred, idx)
    idx_b = idx.at[:, 0].set((idx[:, 0] + 1) % 8)
    logits_b = joint_codebook_logits(params, pred, idx_b)
    np.testing.assert_allclose(
        np.asarray(logits_a[:, 0]), np.asarray(logits_b[:, 0]), rtol=1e-5
    )
    assert np.abs(np.asarray(logits_a[:, 1:]) - np.asarray(logits_b[:, 1:])).max() > 1e-4


def test_last_codebook_not_used_as_input():
    """Codebook nc-1 is predicted but never embedded (only the first nc-1
    feed the joint model)."""
    params, pred, idx = _setup()
    idx_b = idx.at[:, -1].set((idx[:, -1] + 3) % 8)
    np.testing.assert_allclose(
        np.asarray(joint_codebook_logits(params, pred, idx)),
        np.asarray(joint_codebook_logits(params, pred, idx_b)),
        rtol=1e-5,
    )


def test_checkpoint_grads_match_plain():
    """jax.checkpoint must not change gradients (the reference's
    checkpoint.py tests the analogous property)."""
    params, pred, idx = _setup()
    plain = jax.grad(lambda p: joint_codebook_loss(p, pred, idx))(params)
    remat = jax.grad(
        lambda p: jax.checkpoint(joint_codebook_loss)(p, pred, idx)
    )(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(plain), jax.tree_util.tree_leaves(remat)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_module_wrapper_and_training_progress():
    """Train the predictor against a learnable mapping: indexes derived from
    the predictor features themselves must become much more predictable."""
    nc, cs, P = 4, 8, 24
    module = JointCodebookLoss(
        predictor_channels=P,
        num_codebooks=nc,
        hidden_channels=32,
        codebook_size=cs,
        key=jax.random.PRNGKey(3),
    )
    k = jax.random.PRNGKey(4)
    w = jax.random.normal(jax.random.fold_in(k, 0), (nc, P, cs))

    def make_batch(key, N=256):
        pred = jax.random.normal(key, (N, P))
        # idx[b, n] = argmax_k (pred[b] @ w[n])[k]: deterministic, linearly
        # separable -> the linear2b bypass path can learn it.
        idx = jnp.argmax(jnp.einsum("bp,npk->bnk", pred, w), axis=-1)
        return pred, idx.astype(jnp.int32)

    tx = optax.adam(3e-3)
    params = module.params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pred, idx):
        loss, g = jax.value_and_grad(module.loss_fn)(params, pred, idx)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    pred0, idx0 = make_batch(jax.random.fold_in(k, 1))
    loss0 = float(module.loss_fn(params, pred0, idx0)) / idx0.size
    for i in range(150):
        pred, idx = make_batch(jax.random.fold_in(k, i + 2))
        params, opt_state, _ = step(params, opt_state, pred, idx)
    loss1 = float(module.loss_fn(params, pred0, idx0)) / idx0.size
    assert loss1 < loss0 * 0.8, (loss0, loss1)


def test_predictor_trainer_workflow():
    """Packaged equivalent of `quantization/test_train_hdf5.py:79-134`:
    train the joint predictor against a frozen quantizer; CE loss per
    frame must drop well below the uniform-distribution entropy."""
    import math

    from quantization_tpu.models.quantizer import Quantizer
    from quantization_tpu.train.predictor_trainer import PredictorTrainer

    dim, nc, cs = 16, 4, 8
    q = Quantizer(dim=dim, codebook_size=cs, num_codebooks=nc,
                  key=jax.random.PRNGKey(0))
    trainer = PredictorTrainer(q, predictor_channels=dim, hidden_channels=32,
                               num_iters=60, lr=1e-2, seed=1,
                               encode_refine_iters=1)
    key = jax.random.PRNGKey(2)
    first = last = None
    while not trainer.done():
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (128, dim))
        loss = trainer.step(x)
        first = loss if first is None else first
        last = loss
    # the predictor sees the exact frame the quantizer encodes, so it should
    # beat chance (uniform CE = nc * log(cs)) quickly
    assert last < first
    assert last < 0.8 * nc * math.log(cs)

    mod = trainer.get_predictor()
    x = jax.random.normal(jax.random.PRNGKey(3), (64, dim))
    idx = q.encode(x, refine_indexes_iters=1, as_bytes=False)
    out = mod(x, idx)
    assert out.shape == ()
