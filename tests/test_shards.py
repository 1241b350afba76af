"""Sharded raw-f16 corpus format + native C++ streaming loader
(quantization_tpu/data/shards.py, data/native/qtz_loader.cc) — the
scalable replacement for the reference's whole-corpus-in-RAM shuffle
(`quantization/quantization.py:798-809`)."""

import numpy as np
import pytest

from quantization_tpu.data import shards as sh


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    dim = 32
    arrays = [rng.normal(size=(1000, dim)).astype(np.float16) + 10 * i for i in range(5)]
    manifest = sh.write_shards(d, arrays, frames_per_shard=1200)
    return d, manifest, arrays


def test_write_shards_manifest(corpus):
    d, manifest, arrays = corpus
    assert manifest["dim"] == 32
    assert sum(s["frames"] for s in manifest["shards"]) == 5000
    # shard sizes on disk match
    for s in manifest["shards"]:
        raw = np.fromfile(d / s["file"], dtype="<f2")
        assert raw.size == s["frames"] * 32


@pytest.mark.parametrize("force_python", [False, True])
def test_stream_batches(corpus, force_python):
    d, manifest, arrays = corpus
    stream = sh.ShardStream(
        d, batch_size=256, seed=1, pool_frames=2048, repeat=True,
        force_python=force_python,
    )
    if not force_python:
        assert stream.native, "native loader failed to build"
    it = iter(stream)
    seen = []
    for _ in range(30):
        b = next(it)
        assert b.shape == (256, 32) and b.dtype == np.float32
        seen.append(b)
    allb = np.concatenate(seen)
    # frames come from the corpus: each frame's integer offset (added above)
    # identifies its source array
    means = np.round(allb.mean(axis=1) / 10).astype(int)
    assert set(np.unique(means)) <= {0, 1, 2, 3, 4}
    # the stream mixes shards: over 30 batches we should see several sources
    assert len(set(np.unique(means))) >= 3
    stream.close()


def test_multihost_partition(corpus):
    d, manifest, arrays = corpus
    files = set()
    for host in range(2):
        s = sh.ShardStream(d, batch_size=64, host_index=host, num_hosts=2,
                           force_python=True)
        files.update(s._paths)
        s2 = sh.ShardStream(d, batch_size=64, host_index=1 - host, num_hosts=2,
                            force_python=True)
        assert not (set(s._paths) & set(s2._paths))
    assert len(files) == len(manifest["shards"])


@pytest.mark.parametrize("force_python", [False, True])
def test_non_repeat_exhausts(corpus, force_python):
    d, manifest, arrays = corpus
    stream = sh.ShardStream(d, batch_size=512, seed=3, pool_frames=1024,
                            repeat=False, force_python=force_python)
    batches = list(stream)
    total = sum(b.shape[0] for b in batches)
    # every frame exactly once (final partial batch included), no duplicates:
    # both the native loader and the python fallback draw without replacement
    assert total == 5000
    # all but the last batch must be exactly batch_size (chunked drain)
    assert all(b.shape[0] == 512 for b in batches[:-1])
    # frame identity: the corpus construction makes every frame unique, so
    # concatenating and deduplicating rows must preserve the count
    allb = np.concatenate(batches)
    assert np.unique(allb, axis=0).shape[0] == 5000


def test_sequential_iteration_preserves_order(corpus):
    d, manifest, arrays = corpus
    expected = np.concatenate([a.astype(np.float32) for a in arrays])
    got = np.concatenate(list(sh.iter_shards_sequential(d, batch_size=300)))
    np.testing.assert_array_equal(got, expected)
    # two-host partition covers the corpus disjointly (by shard)
    per_host = [
        np.concatenate(
            list(sh.iter_shards_sequential(d, batch_size=300,
                                           host_index=h, num_hosts=2))
        )
        for h in range(2)
    ]
    assert sum(p.shape[0] for p in per_host) == 5000


def test_convert_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(2)
    path = tmp_path / "c.h5"
    with h5py.File(path, "w") as hf:
        for i in range(3):
            hf.create_dataset(f"dataset_{i}", data=rng.normal(size=(100, 16)).astype(np.float16))
    manifest = sh.convert_hdf5_to_shards(path, tmp_path / "out")
    assert manifest["dim"] == 16
    assert sum(s["frames"] for s in manifest["shards"]) == 300


def test_batch_size_exceeding_pool_rejected(corpus):
    d, manifest, arrays = corpus
    with pytest.raises(ValueError, match="pool_frames"):
        sh.ShardStream(d, batch_size=2048, pool_frames=1024, force_python=True)
