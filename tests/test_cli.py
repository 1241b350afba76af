"""End-to-end CLI workflow: convert -> train -> encode -> decode
(the reference has no CLI at all; its workflows are hand-run __main__
scripts, INSTALL.md:5-11)."""

import numpy as np
import pytest

from quantization_tpu.cli import main
from quantization_tpu.data.shards import write_shards


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    rng = np.random.default_rng(0)
    write_shards(d, [rng.normal(size=(2000, 16)).astype(np.float16)
                     for _ in range(2)], frames_per_shard=1500)
    return d


def test_train_encode_decode_roundtrip(corpus, tmp_path):
    qpath = tmp_path / "q.npz"
    main([
        "train", "--data", str(corpus), "--dim", "16", "--bytes-per-frame", "1",
        "--out", str(qpath), "--iters", "10", "--batch", "64", "--chunk", "7",
        "--quiet",
    ])
    assert qpath.exists()

    codes = tmp_path / "codes.npy"
    main([
        "encode", "--quantizer", str(qpath), "--data", str(corpus),
        "--out", str(codes), "--limit", "256", "--refine-iters", "2",
        "--batch", "128",
    ])
    c = np.load(codes)
    assert c.shape == (256, 1) and c.dtype == np.uint8

    recon = tmp_path / "recon.npy"
    main([
        "decode", "--quantizer", str(qpath), "--codes", str(codes),
        "--out", str(recon),
    ])
    r = np.load(recon)
    assert r.shape == (256, 16)

    # Order preservation: codes row k must be the encoding of corpus frame k
    # (bulk encode reads shards sequentially, not through the shuffle pool).
    from quantization_tpu.data.shards import iter_shards_sequential
    from quantization_tpu.utils.serialization import load_quantizer

    frames = np.concatenate(
        list(iter_shards_sequential(corpus, batch_size=128))
    )[:256]
    q = load_quantizer(qpath)
    expected = np.asarray(q.encode(frames, refine_indexes_iters=2))
    np.testing.assert_array_equal(np.load(codes), expected)


def test_convert_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = tmp_path / "c.h5"
    with h5py.File(path, "w") as hf:
        hf.create_dataset("dataset_0", data=np.zeros((100, 8), np.float16))
    main(["convert", "--hdf5", str(path), "--out", str(tmp_path / "shards")])
    assert (tmp_path / "shards" / "manifest.json").exists()


def test_train_with_kmeans_init(corpus, tmp_path):
    qpath = tmp_path / "qk.npz"
    main([
        "train", "--data", str(corpus), "--dim", "16", "--bytes-per-frame", "1",
        "--out", str(qpath), "--iters", "5", "--batch", "64",
        "--init", "multi_kmeans", "--quiet",
    ])
    assert qpath.exists()
