"""Property tests for pack/unpack and encode/decode (SURVEY.md section 4 (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu import core
from quantization_tpu.models.quantizer import Quantizer


@pytest.mark.parametrize("cs,nc", [(2, 16), (4, 8), (16, 8), (16, 2), (256, 4), (256, 1)])
def test_pack_unpack_roundtrip(cs, nc):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, cs, size=(37, nc)), dtype=jnp.int32)
    packed = core.pack_indexes(idx, cs)
    assert packed.dtype == jnp.uint8
    unpacked = core.unpack_indexes(packed, cs, nc)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(idx))


def test_packed_width():
    # cs=256: 1 index/byte; cs=16: 2; cs=4: 4; cs=2: 8
    for cs, nc, width in [(256, 8, 8), (16, 8, 4), (4, 8, 2), (2, 8, 1)]:
        idx = jnp.zeros((3, nc), dtype=jnp.int32)
        assert core.pack_indexes(idx, cs).shape == (3, width)


@pytest.mark.parametrize("cs,nc,dim", [(16, 8, 64), (256, 4, 32)])
def test_decode_gather_equals_onehot(cs, nc, dim):
    key = jax.random.PRNGKey(1)
    config = core.QuantizerConfig(dim=dim, codebook_size=cs, num_codebooks=nc)
    params = core.init_quantizer_params(key, config)
    centers = core.scaled_centers(params, config.scale_speed)
    idx = jax.random.randint(jax.random.PRNGKey(2), (19, nc), 0, cs)
    a = core.decode_indexes(centers, idx)
    b = core.decode_onehot(centers, idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_decode_accepts_packed_and_unpacked():
    q = Quantizer(dim=32, codebook_size=16, num_codebooks=8, key=jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (11, 32))
    codes_bytes = q.encode(x, refine_indexes_iters=1, as_bytes=True)
    codes_int = q.encode(x, refine_indexes_iters=1, as_bytes=False)
    assert codes_bytes.shape == (11, 4) and codes_bytes.dtype == jnp.uint8
    assert codes_int.shape == (11, 8)
    np.testing.assert_allclose(
        np.asarray(q.decode(codes_bytes)),
        np.asarray(q.decode(codes_int)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_encode_preserves_leading_shape():
    q = Quantizer(dim=16, codebook_size=16, num_codebooks=4, key=jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 5, 16))
    codes = q.encode(x, refine_indexes_iters=0)
    assert codes.shape == (3, 5, 2)
    recon = q.decode(codes)
    assert recon.shape == (3, 5, 16)


def test_encode_decode_idempotence():
    # encode(decode(encode(x))) == encode(x): re-encoding a reconstruction
    # must return the same codes (the reconstruction is exactly representable).
    q = Quantizer(dim=24, codebook_size=16, num_codebooks=4, key=jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (50, 24))
    codes = q.encode(x, refine_indexes_iters=3)
    recon = q.decode(codes)
    codes2 = q.encode(recon, refine_indexes_iters=3)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_decode_kernel_matches_gather_path():
    """Fused Pallas decode (interpret mode) vs the f32 gather path: equal
    up to the kernel's bf16 codebook rounding."""
    from quantization_tpu.ops.decode import decode_kernel, DECODE_KERNEL_SUPPORTED

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    assert DECODE_KERNEL_SUPPORTED(config)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    codes = jnp.uint8(jax.random.randint(jax.random.PRNGKey(1), (300, 4), 0, 256))
    a = decode_kernel(params, config, codes, interpret=True)
    b = core.decode(params, config, codes)
    assert a.shape == b.shape == (300, 128)
    scale = float(jnp.max(jnp.abs(b)))
    assert float(jnp.max(jnp.abs(a - b))) < 0.01 * scale


def test_auto_search_falls_back_to_beam_off_tpu():
    """On non-TPU backends (this suite runs on CPU) the "auto" search must
    produce byte-identical output to the reference-parity beam."""
    import jax
    import numpy as np

    from quantization_tpu import core

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(3), config)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 128))
    a = core.encode(params, config, x, 5, search_method="auto")
    b = core.encode(params, config, x, 5, search_method="beam")
    assert (np.asarray(a) == np.asarray(b)).all()


def test_auto_with_kwargs_off_tpu_raises():
    """search kwargs cannot silently vanish into the beam fallback: auto on
    an unsupported backend/config with explicit M/R must raise."""
    import jax
    import pytest

    from quantization_tpu import core

    config = core.QuantizerConfig(dim=128, codebook_size=256, num_codebooks=4)
    params = core.init_quantizer_params(jax.random.PRNGKey(3), config)
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 128))
    with pytest.raises(ValueError, match="seqbeam"):
        core.encode(params, config, x, 5, search_method="auto", M=32)


def test_auto_margin_guard_demotes_out_of_bar_config(monkeypatch):
    """The auto margin guard (VERDICT r3): a candidate whose measured
    on-chip quality delta exceeds the 1% bar is never auto-selected — auto
    demotes to the next candidate, and to the exact beam when all kernel
    candidates are out of bar.  Routing is exercised by faking the TPU
    backend and the hardware tables; the kernel call itself is stubbed."""
    import jax

    from quantization_tpu import core
    from quantization_tpu.ops import seqbeam as seqbeam_mod
    from quantization_tpu.ops import verify as verify_mod

    config = core.QuantizerConfig(dim=512, codebook_size=256, num_codebooks=8)
    params = core.init_quantizer_params(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 512))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(verify_mod, "kernel_verified", lambda name: True)
    calls = []

    def fake_kernel(params, config, x, **kw):
        calls.append(kw)
        return jnp.zeros((x.shape[0], config.num_codebooks), jnp.int32)

    monkeypatch.setattr(seqbeam_mod, "seqbeam_encode_indexes", fake_kernel)

    quality = {}
    monkeypatch.setattr(
        verify_mod, "quality_delta_pct", lambda name: quality.get(name)
    )

    # no measurements -> headline config (M=8, 3 passes)
    core.encode(params, config, x, 5, search_method="auto")
    assert calls[-1]["M"] == 8 and calls[-1]["passes"] == 3

    # headline out of bar -> demote to the M16 margin config (2 passes)
    quality = {"seqbeam_hl_d512": 1.4, "seqbeam_m16_d512": 0.75}
    core.encode(params, config, x, 5, search_method="auto")
    assert calls[-1]["M"] == 16 and calls[-1]["passes"] == 2

    # everything out of bar -> exact beam (kernel never called)
    quality = {"seqbeam_hl_d512": 1.4, "seqbeam_m16_d512": 1.2}
    n = len(calls)
    out = core.encode(params, config, x, 5, search_method="auto")
    assert len(calls) == n  # no kernel dispatch
    ref = core.encode(params, config, x, 5, search_method="beam")
    assert (np.asarray(out) == np.asarray(ref)).all()

    # COMBINED margin (VERDICT r4 item 4): an encode delta that is inside
    # the bar alone (0.95%) but crosses it once multiplied by the measured
    # training ratio (x1.001 -> +1.051% combined) must also demote.
    monkeypatch.setattr(verify_mod, "train_ratio_vs_torch", lambda: 1.001)
    quality = {"seqbeam_hl_d512": 0.95, "seqbeam_m16_d512": 0.75}
    core.encode(params, config, x, 5, search_method="auto")
    assert calls[-1]["M"] == 16 and calls[-1]["passes"] == 2
    # and with a parity-level trainer (ratio ~1.0) the same delta passes
    monkeypatch.setattr(verify_mod, "train_ratio_vs_torch", lambda: 1.0)
    core.encode(params, config, x, 5, search_method="auto")
    assert calls[-1]["M"] == 8 and calls[-1]["passes"] == 3
