"""Trainer for the JointCodebookLoss predictor.

Packages the reference's predictor-training workflow
(`quantization/test_train_hdf5.py:79-134`): against a FROZEN quantizer,
predict each frame's codebook indexes from an external feature vector
(optionally the noisy frame itself), minimizing the joint autoregressive
cross-entropy.  Reference schedule: Adam(lr 1e-3), StepLR(2000, 0.5),
10k iters (`test_train_hdf5.py:108-133`).
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models import prediction
from ..models.quantizer import Quantizer

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=None)
def _make_step():
    # jit handles per-shape retracing; lr is applied outside the optimizer as
    # a host-scheduled scalar (reference: Adam + StepLR,
    # `test_train_hdf5.py:108-131`).
    tx = optax.scale_by_adam()

    def step(params, opt_state, predictor, indexes, lr):
        def loss_fn(p):
            return prediction.joint_codebook_loss(
                p, predictor, indexes, reduction="sum"
            ) / predictor.shape[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a - lr * u, params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


class PredictorTrainer:
    """Usage (mirrors `quantization/test_train_hdf5.py:79-134`)::

        trainer = PredictorTrainer(quantizer, predictor_channels=dim)
        for x in batches:                    # (B, dim) frames
            loss = trainer.step(x)           # predictor features default to x
        predictor = trainer.get_predictor()  # JointCodebookLoss module
    """

    def __init__(
        self,
        quantizer: Quantizer,
        predictor_channels: int,
        hidden_channels: int = 512,
        num_iters: int = 10000,
        lr: float = 1.0e-3,
        lr_step: int = 2000,
        lr_gamma: float = 0.5,
        *,
        encode_refine_iters: int = 5,
        noise_level: float = 0.0,
        seed: Optional[int] = None,
    ):
        self.quantizer = quantizer
        self.num_iters = num_iters
        self.lr = lr
        self.lr_step = lr_step
        self.lr_gamma = lr_gamma
        self.encode_refine_iters = encode_refine_iters
        self.noise_level = noise_level
        self.cur_iter = 0
        if seed is None:
            seed = int.from_bytes(__import__("os").urandom(4), "little")
        self._key = jax.random.PRNGKey(seed)
        self.params = prediction.init_joint_codebook_params(
            self._next_key(),
            predictor_channels,
            quantizer.num_codebooks,
            hidden_channels,
            quantizer.codebook_size,
        )
        self.opt_state = optax.scale_by_adam().init(self.params)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def done(self) -> bool:
        return self.cur_iter >= self.num_iters

    def _lr_now(self) -> float:
        return self.lr * self.lr_gamma ** math.floor(self.cur_iter / self.lr_step)

    def step(self, x, predictor_features=None) -> float:
        """One optimization step.  ``x``: (B, dim) frames; the frozen
        quantizer encodes (optionally noised) frames to target indexes;
        ``predictor_features`` defaults to ``x`` (the reference's setup:
        predict the codes from the un-noised frame,
        `test_train_hdf5.py:118-121`)."""
        x = jnp.asarray(x, jnp.float32)
        target_in = x
        if self.noise_level > 0.0:
            target_in = x + self.noise_level * jax.random.normal(
                self._next_key(), x.shape
            )
        indexes = self.quantizer.encode(
            target_in,
            refine_indexes_iters=self.encode_refine_iters,
            as_bytes=False,
        )
        feats = x if predictor_features is None else jnp.asarray(predictor_features)
        step_fn = _make_step()
        self.params, self.opt_state, loss = step_fn(
            self.params,
            self.opt_state,
            feats,
            jax.lax.stop_gradient(indexes),
            jnp.float32(self._lr_now()),
        )
        self.cur_iter += 1
        if self.cur_iter % 200 == 0:
            logger.info(
                "predictor iter %d, loss/frame %.3f", self.cur_iter, float(loss)
            )
        return float(loss)

    def get_predictor(self) -> prediction.JointCodebookLoss:
        mod = prediction.JointCodebookLoss(
            predictor_channels=self.params.linear1_w.shape[1],
            num_codebooks=self.quantizer.num_codebooks,
            hidden_channels=self.params.linear1_w.shape[0],
            codebook_size=self.quantizer.codebook_size,
        )
        mod.params = self.params
        return mod
