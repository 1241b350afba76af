"""Torch checkpoint interop (utils/torch_interop.py): a reference-trained
``quantizer.pt`` (torch.save of state_dict, `test_train_hdf5.py:47-54`)
loads here with identical decode outputs, and our quantizers export back
into torch-loadable state dicts."""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from quantization_tpu import Quantizer
from quantization_tpu.utils.torch_interop import (
    load_torch_quantizer,
    quantizer_from_state_dict,
    save_torch_quantizer,
    to_torch_state_dict,
)

REFERENCE = pathlib.Path("/root/reference")


def _reference_quantizer(dim=32, cs=16, nc=4):
    """Construct (and lightly train) the reference torch Quantizer."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(REFERENCE))
    try:
        from quantization.quantization import Quantizer as TorchQuantizer
    finally:
        sys.path.pop(0)
    torch.manual_seed(0)
    q = TorchQuantizer(dim=dim, codebook_size=cs, num_codebooks=nc)
    opt = torch.optim.Adam(q.parameters(), lr=0.005)
    for _ in range(100):
        x = torch.randn(64, dim)
        tot = sum(q.compute_loss(x, refine_indexes_iters=1)[:3])
        opt.zero_grad()
        tot.backward()
        opt.step()
    return q


def test_load_reference_checkpoint_identical_decode(tmp_path):
    tq = _reference_quantizer()
    path = tmp_path / "quantizer.pt"
    torch.save(tq.state_dict(), path)

    q = load_torch_quantizer(str(path))
    assert q.get_id() == tq.get_id()  # id_buf re-hydration
    assert (q.dim, q.codebook_size, q.num_codebooks) == (32, 16, 4)

    codes = np.random.default_rng(1).integers(0, 16, (128, 4))
    ours = np.asarray(q.decode(codes))
    theirs = tq.decode(torch.from_numpy(codes)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    # the index predictor (logits path) must also transfer: same argmax
    x = torch.randn(256, 32, generator=torch.Generator().manual_seed(2))
    ours_idx = np.asarray(q.encode(x.numpy(), refine_indexes_iters=0,
                                   as_bytes=False))
    theirs_idx = tq.encode(x, refine_indexes_iters=0, as_bytes=False).numpy()
    assert (ours_idx == theirs_idx).mean() > 0.99  # f32 argmax ties excepted


def test_export_to_torch_roundtrip(tmp_path):
    import jax

    q = Quantizer(dim=16, codebook_size=16, num_codebooks=2,
                  key=jax.random.PRNGKey(3))
    path = tmp_path / "ours.pt"
    save_torch_quantizer(str(path), q)

    q2 = load_torch_quantizer(str(path))
    assert q2.get_id() == q.get_id()
    codes = np.random.default_rng(4).integers(0, 16, (64, 2))
    np.testing.assert_allclose(
        np.asarray(q.decode(codes)), np.asarray(q2.decode(codes)),
        rtol=1e-6, atol=1e-7,
    )

    # and the exported dict is accepted by the reference module itself
    if REFERENCE.exists():
        sys.path.insert(0, str(REFERENCE))
        try:
            from quantization.quantization import Quantizer as TorchQuantizer
        finally:
            sys.path.pop(0)
        tq = TorchQuantizer(dim=16, codebook_size=16, num_codebooks=2)
        tq.load_state_dict(torch.load(path, weights_only=True))
        assert tq.get_id() == q.get_id()
        theirs = tq.decode(torch.from_numpy(codes)).detach().numpy()
        np.testing.assert_allclose(np.asarray(q.decode(codes)), theirs,
                                   rtol=1e-5, atol=1e-6)


def test_state_dict_direct():
    sd = {
        "to_logits.weight": np.zeros((8 * 16, 4), np.float32),
        "to_logits.bias": np.zeros((8 * 16,), np.float32),
        "centers": np.ones((8, 16, 4), np.float32),
        "logits_scale": np.float32(0.0),
        "centers_scale": np.float32(0.0),
    }
    q = quantizer_from_state_dict(sd)
    recon = np.asarray(q.decode(np.zeros((4, 8), np.int64)))
    np.testing.assert_allclose(recon, 8.0)  # sum of 8 all-ones codewords


def test_serialization_pt_dispatch(tmp_path):
    """save_quantizer/load_quantizer route .pt paths through torch interop,
    so the CLI accepts reference checkpoints directly."""
    import jax

    from quantization_tpu.utils.serialization import load_quantizer, save_quantizer

    q = Quantizer(dim=16, codebook_size=16, num_codebooks=2,
                  key=jax.random.PRNGKey(5))
    path = tmp_path / "q.pt"
    save_quantizer(path, q)
    q2 = load_quantizer(path)
    assert q2.get_id() == q.get_id()
    codes = np.random.default_rng(6).integers(0, 16, (32, 2))
    np.testing.assert_allclose(
        np.asarray(q.decode(codes)), np.asarray(q2.decode(codes)), rtol=1e-6
    )
