"""Tests for the HDF5 data path (SURVEY.md section 2 #10)."""

import numpy as np
import pytest

from quantization_tpu.data.hdf5 import (
    minibatch_iterator,
    read_hdf5_data,
    stream_hdf5_frames,
    write_hdf5_data,
)


def _write_corpus(path, n_datasets=10, frames_per=100, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    arrays = [
        rng.standard_normal((frames_per, dim)).astype(np.float16)
        for _ in range(n_datasets)
    ]
    tot = write_hdf5_data(str(path), arrays)
    return arrays, tot


def test_write_read_roundtrip(tmp_path):
    path = tmp_path / "corpus.hdf5"
    arrays, tot = _write_corpus(path)
    assert tot == 1000
    train, valid = read_hdf5_data(str(path), seed=0)
    assert train.dtype == np.float16
    # small corpus: 5% validation split, no 10k cap; this is the path that
    # crashes in the reference (float slice bound).
    assert valid.shape == (50, 16)
    assert train.shape == (950, 16)
    # every original frame appears exactly once across train+valid
    all_rows = np.concatenate([train, valid])
    orig = np.concatenate([a for a in arrays])
    assert (
        np.sort(all_rows.view(np.uint16).reshape(-1, 16), axis=0)
        == np.sort(orig.view(np.uint16).reshape(-1, 16), axis=0)
    ).all()


def test_valid_cap(tmp_path):
    path = tmp_path / "big.hdf5"
    _write_corpus(path, n_datasets=5, frames_per=1000, dim=4)
    train, valid = read_hdf5_data(str(path), max_valid_frames=100, seed=0)
    assert valid.shape[0] == 100  # capped below 5% * 5000 = 250


def test_multidim_datasets(tmp_path):
    import h5py

    path = tmp_path / "nd.hdf5"
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("a", data=rng.standard_normal((4, 5, 8)).astype(np.float16))
        hf.create_dataset("b", data=rng.standard_normal((20, 8)).astype(np.float16))
    train, valid = read_hdf5_data(str(path))
    assert train.shape[0] + valid.shape[0] == 40
    assert train.shape[1] == 8


def test_stream_partitions_across_hosts(tmp_path):
    path = tmp_path / "corpus.hdf5"
    _write_corpus(path, n_datasets=8, frames_per=64, dim=8)
    seen = []
    for host in range(2):
        it = stream_hdf5_frames(
            str(path),
            batch_size=32,
            host_index=host,
            num_hosts=2,
            shuffle_buffer_frames=128,
            repeat=False,
        )
        host_frames = np.concatenate(list(it))
        seen.append(host_frames)
    # each host sees half the corpus (4 datasets * 64 frames), disjointly
    assert seen[0].shape[0] == 256 and seen[1].shape[0] == 256
    a = set(map(bytes, seen[0].view(np.uint16).reshape(seen[0].shape[0], -1)))
    b = set(map(bytes, seen[1].view(np.uint16).reshape(seen[1].shape[0], -1)))
    assert not (a & b)


def test_stream_shuffles(tmp_path):
    path = tmp_path / "corpus.hdf5"
    arrays, _ = _write_corpus(path, n_datasets=4, frames_per=64, dim=8)
    it = stream_hdf5_frames(
        str(path), batch_size=64, shuffle_buffer_frames=256, repeat=False, seed=3
    )
    first = next(it)
    # the first emitted batch should not be the first dataset in order
    assert not np.array_equal(first, arrays[0])
    assert first.shape == (64, 8)


def test_stream_repeat_continues(tmp_path):
    path = tmp_path / "corpus.hdf5"
    _write_corpus(path, n_datasets=2, frames_per=64, dim=8)
    it = stream_hdf5_frames(
        str(path), batch_size=32, shuffle_buffer_frames=64, repeat=True
    )
    batches = [next(it) for _ in range(20)]  # > one epoch (128 frames)
    assert all(b.shape == (32, 8) for b in batches)


def test_minibatch_iterator():
    data = np.arange(100, dtype=np.float32).reshape(50, 2)
    it = minibatch_iterator(data, 16, seed=0, repeat=False)
    batches = list(it)
    assert len(batches) == 3  # 50 // 16, ragged tail dropped
    assert all(b.shape == (16, 2) for b in batches)


def test_iter_hdf5_sequential_order(tmp_path):
    from quantization_tpu.data.hdf5 import iter_hdf5_sequential

    path = tmp_path / "seq.hdf5"
    arrays, tot = _write_corpus(path, n_datasets=3, frames_per=70)
    expected = np.concatenate([a.astype(np.float32) for a in arrays])
    got = np.concatenate(list(iter_hdf5_sequential(str(path), batch_size=64)))
    np.testing.assert_array_equal(got, expected)
