"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md section 4 (e)):
data-parallel and tensor-parallel execution must be numerically equivalent to
single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu import core
from quantization_tpu.parallel import mesh as pmesh
from quantization_tpu.train.trainer import QuantizerTrainer, make_optimizer

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(dim=32, cs=16, nc=4, B=64, seed=0):
    config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)
    params = core.init_quantizer_params(jax.random.PRNGKey(seed), config)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, dim))
    return config, params, x


@requires_8
def test_mesh_shapes():
    m = pmesh.make_mesh()
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = pmesh.make_mesh(num_data=4, num_model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}


@requires_8
@pytest.mark.parametrize("num_model", [1, 2])
def test_sharded_encode_matches_single_device(num_model):
    config, params, x = _setup()
    expected = core.encode(params, config, x, refine_indexes_iters=2)

    mesh = pmesh.make_mesh(num_data=8 // num_model, num_model=num_model)
    sp = pmesh.shard_params(params, mesh)
    sx = pmesh.shard_batch(x, mesh)
    got = jax.jit(lambda p, x: core.encode(p, config, x, refine_indexes_iters=2))(
        sp, sx
    )
    np.testing.assert_array_equal(np.asarray(expected), np.asarray(got))


@requires_8
def test_sharded_decode_matches_single_device():
    config, params, x = _setup()
    codes = core.encode(params, config, x, refine_indexes_iters=1)
    expected = core.decode(params, config, codes)

    mesh = pmesh.make_mesh(num_data=4, num_model=2)
    sp = pmesh.shard_params(params, mesh)
    sc = jax.device_put(codes, pmesh.batch_only_sharding(mesh))
    got = jax.jit(lambda p, c: core.decode(p, config, c))(sp, sc)
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@requires_8
def test_dp_train_step_matches_single_device():
    """One optimization step with frames sharded over 8 devices must produce
    the same parameters as the unsharded step (GSPMD gradient psum == the
    single-device batch gradient)."""
    config, params, x = _setup(B=128)
    tx = make_optimizer()

    def train_step(params, opt_state, x):
        from quantization_tpu.train.trainer import total_loss

        def loss_fn(p):
            losses = core.compute_loss(p, config, x, 1)
            return total_loss(losses), losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new = jax.tree_util.tree_map(lambda p, u: p - 0.01 * u, params, updates)
        return new, opt_state, losses

    opt_state = tx.init(params)
    p_single, _, l_single = jax.jit(train_step)(params, opt_state, x)

    mesh = pmesh.make_mesh()  # 8-way data parallel
    sp = pmesh.shard_params(params, mesh)
    s_opt = tx.init(sp)
    sx = pmesh.shard_batch(x, mesh)
    p_shard, _, l_shard = jax.jit(train_step)(sp, s_opt, sx)

    np.testing.assert_allclose(
        float(l_single.rel_reconstruction_loss),
        float(l_shard.rel_reconstruction_loss),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_shard)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@requires_8
def test_trainer_with_mesh():
    from quantization_tpu.data.synthetic import make_mlp_sampler

    mesh = pmesh.make_mesh(num_data=8)
    sampler = make_mlp_sampler(16, jax.random.PRNGKey(0))
    t = QuantizerTrainer(
        dim=16, bytes_per_frame=1, phase_one_iters=8, phase_two_iters=8,
        seed=0, diagnostics=False, mesh=mesh,
    )
    key = jax.random.PRNGKey(1)
    while not t.done():
        key, sub = jax.random.split(key)
        t.step(sampler(sub, 64))
    q = t.get_quantizer()
    codes = q.encode(sampler(key, 32), refine_indexes_iters=1)
    assert codes.shape == (32, 1)


@requires_8
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 8) and out.dtype == jnp.uint8
    ge.dryrun_multichip(8)


def test_step_many_with_mesh_matches_single_device():
    """The lax.scan multi-step driver under a data-parallel mesh must
    produce the same parameters as unsharded execution (GSPMD inserts the
    gradient psum; math is identical)."""
    from quantization_tpu.data.synthetic import make_mlp_sampler
    from quantization_tpu.train.trainer import QuantizerTrainer

    dim = 16
    sampler = make_mlp_sampler(dim, jax.random.PRNGKey(3))
    xs = jnp.stack([sampler(jax.random.PRNGKey(10 + i), 64) for i in range(12)])
    kw = dict(dim=dim, bytes_per_frame=1, phase_one_iters=5, phase_two_iters=5,
              lr=0.01, seed=9, diagnostics=False)
    t_plain = QuantizerTrainer(**kw)
    t_plain.step_many(xs)
    mesh = pmesh.make_mesh(num_data=4, num_model=1)
    t_mesh = QuantizerTrainer(mesh=mesh, **kw)
    t_mesh.step_many(xs)
    assert t_mesh.cur_iter == t_plain.cur_iter
    for a, b in zip(jax.tree_util.tree_leaves(t_plain.params),
                    jax.tree_util.tree_leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_bulk_encode_decode_sharded_match_single_device():
    """parallel.encode_sharded / decode_sharded over the 'data' axis must
    equal unsharded execution (bulk corpus encoding is embarrassingly
    parallel over frames)."""
    from quantization_tpu.parallel.bulk import decode_sharded, encode_sharded

    config = core.QuantizerConfig(dim=32, codebook_size=16, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    mesh = pmesh.make_mesh(num_data=8, num_model=1)
    codes_sh = encode_sharded(params, config, x, mesh, refine_indexes_iters=2)
    codes = core.encode(params, config, x, 2)
    np.testing.assert_array_equal(np.asarray(codes_sh), np.asarray(codes))
    recon_sh = decode_sharded(params, config, codes_sh, mesh)
    recon = core.decode(params, config, codes)
    np.testing.assert_allclose(np.asarray(recon_sh), np.asarray(recon),
                               rtol=1e-6, atol=1e-6)


@requires_8
def test_encode_sharded_with_kernel_search_interpret():
    """VERDICT r2 item 8: `encode_sharded` composed with a *kernel* search
    must work structurally — the Pallas kernel runs per-device under
    shard_map, its internal block_b padding applied to the device-local
    shard, with an uneven global batch (B=100 over 8 devices -> padded to
    104, per-shard 13 -> kernel-padded to block_b) — and must match the
    same kernel run unsharded."""
    from quantization_tpu.parallel.bulk import encode_sharded

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=2)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 128))
    mesh = pmesh.make_mesh(num_data=8, num_model=1)
    kw = dict(M=8, R=4, block_b=64, interpret=True)
    codes_sh = encode_sharded(
        params, config, x, mesh, refine_indexes_iters=1,
        search_method="seqbeam", **kw,
    )
    codes = core.encode(
        params, config, x, 1, search_method="seqbeam", **kw
    )
    np.testing.assert_array_equal(np.asarray(codes_sh), np.asarray(codes))


@requires_8
def test_encode_sharded_divides_work_per_device():
    """Scaling honesty: under encode_sharded each device must receive only
    its 1/ndata shard of the frames (the per-device batch divides the
    work; collectives-free data parallelism)."""
    from quantization_tpu.parallel.bulk import encode_sharded

    config, params, x = _setup(B=128)
    mesh = pmesh.make_mesh(num_data=8, num_model=1)
    codes = encode_sharded(params, config, x, mesh, refine_indexes_iters=1)
    [shard] = {s.data.shape for s in codes.addressable_shards}
    assert shard == (128 // 8, codes.shape[1]), shard
