"""Staged trainer for the multi-kmeans prototype.

Replicates the reference's driver (`multi_kmeans.py:331-407`): train
``iters_per_stage`` steps, grow the quantizer (cs -> cs^2, nc -> nc/2),
multiply the target frame entropy by 1.5 and halve the lr, repeat for
``num_stages`` total stages.  Loss per step: expected reconstruction loss +
entropy_scale * class-entropy loss + |frame_entropy - target|
(`multi_kmeans.py:393`).  Optimizer: Adam(0.9, 0.9, eps 1e-9, wd 1e-6) with
StepLR(1000, 0.5) (`multi_kmeans.py:362-367`).
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import multi_kmeans as mk

logger = logging.getLogger(__name__)


def _make_tx():
    return optax.chain(
        optax.add_decayed_weights(1.0e-6),
        optax.scale_by_adam(b1=0.9, b2=0.9, eps=1e-9),
    )


@functools.lru_cache(maxsize=None)
def _make_step(shape_key, entropy_scale: float, num_iters: int):
    tx = _make_tx()

    def step(params, opt_state, x, key, lr, target_frame_entropy):
        def loss_fn(p):
            out = mk.forward(p, x, key, num_iters)
            tot = (
                out.reconstruction_loss
                + entropy_scale * out.entropy_loss
                + jnp.abs(out.frame_entropy - target_frame_entropy)
            )
            return tot, out

        grads, out = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
        return params, opt_state, out

    return jax.jit(step, donate_argnums=(0, 1))


class MultiKmeansTrainer:
    def __init__(
        self,
        dim: int,
        codebook_size: int = 4,
        num_codebooks: int = 16,
        num_stages: int = 3,
        iters_per_stage: int = 10000,
        lr: float = 0.001,
        target_frame_entropy: float = 0.2,
        entropy_scale: float = 1.0e-7,
        refine_iters: int = 4,
        *,
        seed: Optional[int] = None,
    ):
        self.dim = dim
        self.num_stages = num_stages
        self.iters_per_stage = iters_per_stage
        self.lr = lr
        self.target_frame_entropy = target_frame_entropy
        self.entropy_scale = entropy_scale
        self.refine_iters = refine_iters
        self.stage = 0
        self.iter_in_stage = 0
        if seed is None:
            seed = int.from_bytes(__import__("os").urandom(4), "little")
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31)))
        self.params = mk.init_multi_kmeans_params(
            self._next_key(), dim, codebook_size, num_codebooks
        )
        self.opt_state = _make_tx().init(self.params)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def done(self) -> bool:
        return self.stage >= self.num_stages

    def _lr_now(self) -> float:
        # StepLR(step_size=1000, gamma=0.5) within the stage; base lr halved
        # per stage (`multi_kmeans.py:367,406`).
        base = self.lr * 0.5 ** self.stage
        return base * 0.5 ** math.floor(self.iter_in_stage / 1000)

    def step(self, x) -> mk.StochasticRefineOut:
        assert not self.done()
        x = jnp.asarray(x, dtype=jnp.float32).reshape(-1, self.dim)
        shape_key = self.params.centers.shape
        step_fn = _make_step(shape_key, self.entropy_scale, self.refine_iters)
        target = self.target_frame_entropy * 1.5 ** self.stage
        self.params, self.opt_state, out = step_fn(
            self.params,
            self.opt_state,
            x,
            self._next_key(),
            jnp.float32(self._lr_now()),
            jnp.float32(target),
        )
        self.iter_in_stage += 1
        if self.iter_in_stage >= self.iters_per_stage:
            self.stage += 1
            self.iter_in_stage = 0
            if not self.done():
                self.params = mk.product_params(self.params)
                self.opt_state = _make_tx().init(self.params)
        return out

    def get_quantizer(self) -> mk.MultiKmeansQuantizer:
        nc, cs, dim = self.params.centers.shape
        return mk.MultiKmeansQuantizer(dim, cs, nc, params=self.params)
