"""Real multi-process jax.distributed data-parallel training driver.

Each process owns a disjoint ShardStream partition of the corpus
(``host_index=jax.process_index()``), contributes its half of every global
batch via ``jax.make_array_from_process_local_data``, and runs the standard
``QuantizerTrainer`` over the global ('data',) mesh — gradients psum across
processes via GSPMD.  A single-process run on the concatenated corpus must
produce the same final parameters (the equality is asserted by
tests/test_multiprocess.py, which spawns both).

Usage (one invocation per process, plus one single-process reference):
    python experiments/multiprocess_train.py <outdir> <process_id> <nproc> \
        <coordinator_port> <steps>
    python experiments/multiprocess_train.py <outdir> single <nproc> 0 <steps>

Env (set by the caller): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<devices per process>.
The corpus must exist at <outdir>/corpus (written by the caller).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

DIM, BPF, BATCH = 16, 1, 64


def local_batches(corpus, host_index, num_hosts, steps):
    from quantization_tpu.data.shards import ShardStream

    # force_python: the native loader's reader threads make batch order
    # nondeterministic; the python pool is seed-deterministic.
    stream = iter(
        ShardStream(
            corpus,
            batch_size=BATCH // num_hosts,
            host_index=host_index,
            num_hosts=num_hosts,
            seed=7,
            pool_frames=256,
            force_python=True,
        )
    )
    return [next(stream) for _ in range(steps)]


def main() -> None:
    outdir = pathlib.Path(sys.argv[1])
    proc = sys.argv[2]
    nproc = int(sys.argv[3])
    port = int(sys.argv[4])
    steps = int(sys.argv[5])
    corpus = outdir / "corpus"

    import jax

    # The container's sitecustomize pins JAX_PLATFORMS=axon at interpreter
    # startup; env overrides are a no-op, the config update is not.
    jax.config.update("jax_platforms", "cpu")

    if proc == "single":
        pid, single = 0, True
    else:
        pid, single = int(proc), False
        from quantization_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
        assert jax.process_count() == nproc, jax.process_count()
        assert jax.process_index() == pid, jax.process_index()

    from quantization_tpu.parallel.mesh import data_sharding, make_mesh
    from quantization_tpu.train.trainer import QuantizerTrainer

    mesh = make_mesh()  # all global devices on the 'data' axis
    trainer = QuantizerTrainer(
        dim=DIM,
        bytes_per_frame=BPF,
        phase_one_iters=steps // 2,
        phase_two_iters=steps,
        lr=0.005,
        seed=0,
        diagnostics=False,
        mesh=mesh,
    )
    sharding = data_sharding(mesh)

    if single:
        # concatenate the two hosts' partitions in host order: identical
        # global batches to the distributed run
        halves = [local_batches(corpus, h, nproc, steps) for h in range(nproc)]
        for s in range(steps):
            x = np.concatenate([halves[h][s] for h in range(nproc)])
            trainer.step(jax.device_put(x, sharding))
    else:
        mine = local_batches(corpus, pid, nproc, steps)
        for s in range(steps):
            x = jax.make_array_from_process_local_data(sharding, mine[s])
            trainer.step(x)

    params = jax.device_get(
        jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            ),
            trainer.params,
        )
    )
    if pid == 0:
        tag = "single" if single else "dist"
        np.savez(
            outdir / f"params_{tag}.npz",
            **{
                "centers": np.asarray(params.centers),
                "to_logits_w": np.asarray(params.to_logits_w),
                "to_logits_b": np.asarray(params.to_logits_b),
                "logits_scale": np.asarray(params.logits_scale),
                "centers_scale": np.asarray(params.centers_scale),
            },
        )
        print(f"{tag} done: {jax.process_count() if not single else 1} proc, "
              f"{len(jax.devices())} devices", flush=True)


if __name__ == "__main__":
    main()
