"""Trainer tests: two-phase schedule, lr schedule, learning progress,
mid-phase checkpoint/resume (SURVEY.md sections 2 #9 and 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu import core
from quantization_tpu.data.synthetic import make_mlp_sampler
from quantization_tpu.train.trainer import QuantizerTrainer


def _rel_err(trainer, x, iters=2):
    losses = core.compute_loss(trainer.params, trainer.config, x, iters)
    return float(losses.rel_reconstruction_loss)


def test_lr_schedule_matches_steplr():
    t = QuantizerTrainer(
        dim=16, bytes_per_frame=2, phase_one_iters=100, phase_two_iters=200,
        lr=0.004, seed=0, diagnostics=False,
    )
    # phase 1: StepLR(step=25, gamma=0.5) from lr0
    assert t._lr_for_iter(0) == 0.004
    assert t._lr_for_iter(24) == 0.004
    assert t._lr_for_iter(25) == 0.002
    assert t._lr_for_iter(99) == 0.0005
    assert t._lr_for_iter(100) == 0.004 * 0.5 ** 4  # last phase-1 step
    # phase 2: base halved, StepLR(step=50) counting from the first phase-2 step
    assert t._lr_for_iter(101) == 0.002
    assert t._lr_for_iter(150) == 0.002
    assert t._lr_for_iter(151) == 0.001
    assert t._lr_for_iter(300) == 0.002 * 0.5 ** 3


def test_two_phase_training_learns():
    dim, bpf = 32, 2
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(0))
    trainer = QuantizerTrainer(
        dim=dim,
        bytes_per_frame=bpf,
        phase_one_iters=60,
        phase_two_iters=60,
        lr=0.01,
        seed=1,
        diagnostics=False,
    )
    # phase 1 config (`quantization/quantization.py:627-628`)
    assert trainer.config.codebook_size == 16
    assert trainer.config.num_codebooks == 2 * bpf

    key = jax.random.PRNGKey(2)
    x_eval = sampler(jax.random.PRNGKey(3), 256)
    err_start = _rel_err(trainer, x_eval)

    i = 0
    saw_phase2 = False
    while not trainer.done():
        key, sub = jax.random.split(key)
        trainer.step(sampler(sub, 256))
        i += 1
        if trainer.config.codebook_size == 256:
            saw_phase2 = True
    assert saw_phase2
    assert i == 121  # p1 + p2 + 1 steps (`done` is cur_iter > p1 + p2)
    assert trainer.config.num_codebooks == bpf

    err_end = _rel_err(trainer, x_eval)
    assert err_end < err_start * 0.8, (err_start, err_end)

    q = trainer.get_quantizer()
    codes = q.encode(x_eval, refine_indexes_iters=2)
    assert codes.shape == (256, bpf) and codes.dtype == jnp.uint8
    recon = q.decode(codes)
    rel = float(
        jnp.sum((recon - x_eval) ** 2)
        / jnp.sum((x_eval - q.get_data_mean()) ** 2)
    )
    assert abs(rel - err_end) < 0.05, (rel, err_end)


def test_get_quantizer_asserts_before_done():
    t = QuantizerTrainer(
        dim=16, bytes_per_frame=1, phase_one_iters=5, phase_two_iters=5,
        seed=0, diagnostics=False,
    )
    with pytest.raises(AssertionError):
        t.get_quantizer()


def test_checkpoint_resume_mid_phase(tmp_path):
    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(5))
    kw = dict(
        dim=dim, bytes_per_frame=1, phase_one_iters=20, phase_two_iters=20,
        lr=0.01, seed=7, diagnostics=False,
    )
    t1 = QuantizerTrainer(**kw)
    key = jax.random.PRNGKey(6)
    batches = []
    for i in range(30):
        key, sub = jax.random.split(key)
        batches.append(sampler(sub, 64))
    for b in batches[:12]:
        t1.step(b)
    path = tmp_path / "ckpt.npz"
    t1.save_checkpoint(path)

    # continue t1; resume t2 from checkpoint with the same remaining batches
    t2 = QuantizerTrainer.load_checkpoint(path, diagnostics=False)
    assert t2.cur_iter == 12
    for b in batches[12:]:
        t1.step(b)
        t2.step(b)
    assert t1.cur_iter == t2.cur_iter
    assert t1.config == t2.config
    for a, b_ in zip(
        jax.tree_util.tree_leaves(t1.params),
        jax.tree_util.tree_leaves(t2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)


def test_step_many_matches_step_loop():
    """step_many (one lax.scan dispatch per phase chunk) must match the
    step-by-step driver: same RNG stream, same lr schedule, same phase
    transition, numerically equal parameters."""
    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(5))
    kw = dict(
        dim=dim, bytes_per_frame=1, phase_one_iters=20, phase_two_iters=20,
        lr=0.01, seed=7, diagnostics=False,
    )
    t1 = QuantizerTrainer(**kw)
    t2 = QuantizerTrainer(**kw)
    key = jax.random.PRNGKey(6)
    batches = []
    while not t1.done():
        key, sub = jax.random.split(key)
        batches.append(sampler(sub, 64))
        t1.step(batches[-1])

    xs = jnp.stack(batches)
    # drive t2 in uneven chunks crossing the phase boundary
    pos = 0
    for chunk in (7, 19, 11, len(batches)):
        take = min(chunk, len(batches) - pos)
        if take == 0:
            break
        t2.step_many(xs[pos : pos + take])
        pos += take
    assert t2.cur_iter == t1.cur_iter
    assert t2.config == t1.config
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params),
        jax.tree_util.tree_leaves(t2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_beam_finetune_boundary_and_equivalence(monkeypatch):
    """``beam_finetune_iters``: the final N steps resolve to the exact beam
    even under a kernel ``train_search``, and the extra step_many chunk
    split at the switch changes nothing numerically when both sides
    resolve to the same search."""
    from quantization_tpu.ops import seqbeam as seqbeam_mod

    # boundary resolution (search string only; no kernel execution)
    tr = QuantizerTrainer(
        dim=16, bytes_per_frame=1, phase_one_iters=10, phase_two_iters=10,
        seed=0, diagnostics=False, train_search="seqbeam",
        beam_finetune_iters=5,
    )
    monkeypatch.setattr(seqbeam_mod, "SEQBEAM_SUPPORTED", lambda cfg: True)
    # total steps run at cur_iter 0..20; the last 5 are 16..20
    assert tr._finetune_start() == 16
    assert tr._search_for_config(15) == "seqbeam"
    assert tr._search_for_config(16) == "beam"
    assert tr._search_for_config(20) == "beam"

    # step_many equivalence: finetune on vs off, both beam on CPU — the
    # only difference is the chunk split at the switch
    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(5))
    kw = dict(
        dim=dim, bytes_per_frame=1, phase_one_iters=12, phase_two_iters=12,
        lr=0.01, seed=7, diagnostics=False,
    )
    t1 = QuantizerTrainer(**kw)
    t2 = QuantizerTrainer(**kw, beam_finetune_iters=5)
    key = jax.random.PRNGKey(6)
    batches = []
    for _ in range(12 + 12 + 1):
        key, sub = jax.random.split(key)
        batches.append(sampler(sub, 64))
    xs = jnp.stack(batches)
    t1.step_many(xs)
    t2.step_many(xs)
    assert t1.done() and t2.done()
    assert t1.cur_iter == t2.cur_iter
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params),
        jax.tree_util.tree_leaves(t2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_beam_finetune_defaults_and_checkpoint_meta(tmp_path):
    """Round-4 behaviors: the hybrid finetune tail defaults ON for kernel
    train_search (1000, clamped to phase_two_iters), OFF for beam/auto; and
    save/load_checkpoint round-trips the search routing (explicit kwargs
    still override)."""
    kw = dict(dim=16, bytes_per_frame=1, phase_one_iters=10,
              phase_two_iters=10, seed=0, diagnostics=False)
    assert QuantizerTrainer(**kw).beam_finetune_iters == 0
    assert QuantizerTrainer(**kw, train_search="beam").beam_finetune_iters == 0
    # kernel search: default 1000, clamped to phase_two_iters=10
    t = QuantizerTrainer(**kw, train_search="seqbeam")
    assert t.beam_finetune_iters == 10
    # explicit values clamp too
    t = QuantizerTrainer(**kw, train_search="seqbeam", beam_finetune_iters=7)
    assert t.beam_finetune_iters == 7
    t = QuantizerTrainer(**kw, train_search="seqbeam", beam_finetune_iters=99)
    assert t.beam_finetune_iters == 10

    # checkpoint meta round-trip
    path = tmp_path / "ckpt.npz"
    t.save_checkpoint(path)
    t2 = QuantizerTrainer.load_checkpoint(path, diagnostics=False)
    assert t2.train_search == "seqbeam"
    assert t2.beam_finetune_iters == 10
    t3 = QuantizerTrainer.load_checkpoint(
        path, diagnostics=False, train_search="beam", beam_finetune_iters=0
    )
    assert t3.train_search == "beam" and t3.beam_finetune_iters == 0


def test_multi_kmeans_init():
    """init='multi_kmeans' seeds phase-1 codebooks from a short
    multi-kmeans fit; to_logits rows start as clones of the fitted
    centers (the inverse of `quantization/quantization.py:38-42`)."""
    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(5))
    data = sampler(jax.random.PRNGKey(6), 512)
    t = QuantizerTrainer(
        dim=dim, bytes_per_frame=1, phase_one_iters=5, phase_two_iters=5,
        seed=7, diagnostics=False, init="multi_kmeans", init_data=data,
        init_iters=10,
    )
    np.testing.assert_array_equal(
        np.asarray(t.params.to_logits_w),
        np.asarray(t.params.centers).reshape(-1, dim),
    )
    while not t.done():
        t.step(sampler(jax.random.PRNGKey(8), 64))
    q = t.get_quantizer()
    codes = q.encode(data)
    assert codes.shape == (512, 1)


def test_gaussian_shannon_bound_sanity():
    """Train on unit-Gaussian data and compare against the Shannon
    rate-distortion bound D = 2^(-2R) — the reference prints this next to
    its measured error (`quantization/test_quantization.py:51-84`); here it
    is asserted: measured distortion must be above the information-theoretic
    bound and within a small factor of it after a short training run."""
    from quantization_tpu.data.synthetic import gaussian_sampler, shannon_distortion

    dim, bpf = 16, 2  # R = 1 bit/dim -> D = 0.25
    sampler = gaussian_sampler(dim)
    trainer = QuantizerTrainer(
        dim=dim, bytes_per_frame=bpf, phase_one_iters=150, phase_two_iters=150,
        lr=0.005, seed=0, diagnostics=False,
    )
    key = jax.random.PRNGKey(1)
    while not trainer.done():
        key, sub = jax.random.split(key)
        trainer.step(sampler(sub, 256))
    q = trainer.get_quantizer()
    x = sampler(jax.random.PRNGKey(2), 4096)
    recon = q.decode(q.encode(x))
    # relative error == distortion for unit-variance zero-mean data
    d = float(jnp.sum((recon - x) ** 2) / jnp.sum(x ** 2))
    bound = shannon_distortion(dim, bpf)
    assert d > bound, (d, bound)  # can't beat Shannon
    assert d < 3.0 * bound, (d, bound)  # but should get within a small factor
