"""Real multi-process jax.distributed execution (SURVEY.md §4(e)).

Spawns two OS processes that initialize jax.distributed against a localhost
coordinator, each streaming a disjoint ShardStream partition of the corpus
and training data-parallel over the global mesh — then asserts the final
parameters match a single-process run on the concatenated corpus.  This
exercises the actual multi-host code path (process coordination, per-host
corpus partitioning, make_array_from_process_local_data, GSPMD gradient
psum over processes), which the virtual single-process mesh cannot."""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
DRIVER = REPO / "experiments" / "multiprocess_train.py"
STEPS = 6


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single(tmp_path):
    from quantization_tpu.data.shards import write_shards

    rng = np.random.default_rng(0)
    corpus = tmp_path / "corpus"
    write_shards(
        corpus,
        [rng.normal(size=(600, 16)).astype(np.float16) for _ in range(4)],
        frames_per_shard=600,
    )

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(tmp_path), str(pid), "2",
             str(port), str(STEPS)],
            env=_env(2),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "dist done: 2 proc, 4 devices" in outs[0]

    single = subprocess.run(
        [sys.executable, str(DRIVER), str(tmp_path), "single", "2", "0",
         str(STEPS)],
        env=_env(4),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert single.returncode == 0, single.stdout[-2000:] + single.stderr[-2000:]

    dist = np.load(tmp_path / "params_dist.npz")
    ref = np.load(tmp_path / "params_single.npz")
    for k in ref.files:
        np.testing.assert_allclose(dist[k], ref[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)
