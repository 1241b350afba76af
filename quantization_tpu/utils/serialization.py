"""Quantizer save/load.

The reference uses plain ``torch.save(state_dict)`` / ``load_state_dict``
(`quantization/test_train_hdf5.py:47-51`) with the uint8 identity buffer
re-hydrated on load (`quantization/quantization.py:53-59`).  Here the on-disk
format is a single ``.npz`` holding the parameter arrays plus the config and
the identity string — self-describing, so ``load_quantizer`` does not need a
pre-constructed module of matching shape.
"""

from __future__ import annotations

import io
import json
import os
from typing import Union

import jax
import numpy as np

from ..core.types import QuantizerConfig, QuantizerParams
from ..models.quantizer import Quantizer

_FORMAT_VERSION = 1


def save_quantizer(path: Union[str, os.PathLike], quantizer: Quantizer) -> None:
    if str(path).endswith((".pt", ".pth")):
        # reference-format torch checkpoint, loadable by the reference's
        # `Quantizer.load_state_dict` (`quantization/quantization.py:55-59`)
        from .torch_interop import save_torch_quantizer

        save_torch_quantizer(path, quantizer)
        return
    params = jax.device_get(quantizer.params)
    meta = dict(
        format_version=_FORMAT_VERSION,
        id_str=quantizer.id_str,
        dim=quantizer.config.dim,
        codebook_size=quantizer.config.codebook_size,
        num_codebooks=quantizer.config.num_codebooks,
        scale_speed=quantizer.config.scale_speed,
    )
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode("utf-8"), dtype=np.uint8),
        centers=np.asarray(params.centers),
        to_logits_w=np.asarray(params.to_logits_w),
        to_logits_b=np.asarray(params.to_logits_b),
        logits_scale=np.asarray(params.logits_scale),
        centers_scale=np.asarray(params.centers_scale),
    )
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_quantizer(path: Union[str, os.PathLike]) -> Quantizer:
    if str(path).endswith((".pt", ".pth")):
        # reference-format torch checkpoint (`test_train_hdf5.py:47-54`)
        from .torch_interop import load_torch_quantizer

        return load_torch_quantizer(path)
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode("utf-8"))
        assert meta["format_version"] == _FORMAT_VERSION, meta
        params = QuantizerParams(
            centers=jax.numpy.asarray(z["centers"]),
            to_logits_w=jax.numpy.asarray(z["to_logits_w"]),
            to_logits_b=jax.numpy.asarray(z["to_logits_b"]),
            logits_scale=jax.numpy.asarray(z["logits_scale"]),
            centers_scale=jax.numpy.asarray(z["centers_scale"]),
        )
    return Quantizer(
        meta["dim"],
        meta["codebook_size"],
        meta["num_codebooks"],
        params=params,
        id_str=meta["id_str"],
        scale_speed=meta["scale_speed"],
    )
