"""Torch checkpoint interop: load/save the reference's persistence format.

The reference persists quantizers as ``torch.save(quantizer.state_dict(),
'quantizer.pt')`` and re-hydrates the 8-hex-char identity from the ``id_buf``
uint8 buffer on load (`quantization/quantization.py:49-59`,
`quantization/test_train_hdf5.py:47-54`).  This module makes the two formats
interchangeable, so a reference-trained ``quantizer.pt`` drops straight into
this framework (and vice versa):

    q = load_torch_quantizer("quantizer.pt")     # -> quantization_tpu.Quantizer
    sd = to_torch_state_dict(q)                  # -> dict for torch.save

State-dict keys (`quantization/quantization.py:38-59`):
  ``to_logits.weight`` (nc*cs, dim), ``to_logits.bias`` (nc*cs,),
  ``centers`` (nc, cs, dim), ``logits_scale`` (), ``centers_scale`` (),
  ``id_buf`` (8,) uint8 — the ASCII bytes of the hex id string.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import QuantizerParams
from ..models.quantizer import Quantizer


def _to_numpy(v) -> np.ndarray:
    """Tensor/array -> float32 numpy without importing torch."""
    if hasattr(v, "detach"):  # torch.Tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def quantizer_from_state_dict(state_dict: dict) -> Quantizer:
    """Build a :class:`Quantizer` from a reference-format state dict
    (tensors or arrays)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    centers = sd["centers"].astype(np.float32)
    nc, cs, dim = centers.shape
    w = sd["to_logits.weight"].astype(np.float32)
    b = sd["to_logits.bias"].astype(np.float32)
    assert w.shape == (nc * cs, dim), (w.shape, centers.shape)
    assert b.shape == (nc * cs,), b.shape
    params = QuantizerParams(
        centers=jnp.asarray(centers),
        to_logits_w=jnp.asarray(w),
        to_logits_b=jnp.asarray(b),
        logits_scale=jnp.asarray(sd["logits_scale"], jnp.float32).reshape(()),
        centers_scale=jnp.asarray(sd["centers_scale"], jnp.float32).reshape(()),
    )
    id_str = None
    if "id_buf" in sd:
        id_str = bytes(np.asarray(sd["id_buf"], np.uint8).tolist()).decode("utf-8")
    return Quantizer(
        dim, cs, nc, params=params, id_str=id_str
    )


def load_torch_quantizer(path_or_state_dict) -> Quantizer:
    """Load a reference-trained ``quantizer.pt`` (path, file object, or an
    already-loaded state dict) as a :class:`Quantizer`."""
    if isinstance(path_or_state_dict, dict):
        return quantizer_from_state_dict(path_or_state_dict)
    import torch

    sd = torch.load(path_or_state_dict, map_location="cpu", weights_only=True)
    return quantizer_from_state_dict(sd)


def to_torch_state_dict(q: Quantizer) -> dict:
    """Export a :class:`Quantizer` as a reference-format state dict of torch
    tensors, loadable by ``quantization.Quantizer(...).load_state_dict``."""
    import torch

    p = q.params
    return {
        "to_logits.weight": torch.from_numpy(np.array(p.to_logits_w)).float(),
        "to_logits.bias": torch.from_numpy(np.array(p.to_logits_b)).float(),
        "centers": torch.from_numpy(np.array(p.centers)).float(),
        "logits_scale": torch.from_numpy(
            np.array(p.logits_scale, np.float32)
        ).reshape(()),
        "centers_scale": torch.from_numpy(
            np.array(p.centers_scale, np.float32)
        ).reshape(()),
        "id_buf": torch.tensor(list(q.get_id().encode("utf-8")), dtype=torch.uint8),
    }


def save_torch_quantizer(path, q: Quantizer) -> None:
    """``torch.save`` a :class:`Quantizer` in the reference's format."""
    import torch

    torch.save(to_torch_state_dict(q), path)
