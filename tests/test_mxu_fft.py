"""Four-step MXU FFT backend vs jnp.fft (the spec) and end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.spectral.mxu_fft import fft2_mxu, irfft2_mxu, rfft2_mxu


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("h,w", [(16, 16), (64, 32), (128, 256), (256, 512)])
def test_rfft2_matches_jnp(rng, h, w):
    y = rng.standard_normal((2, h, w)).astype(np.float32)
    ref = np.asarray(jnp.fft.rfft2(y))
    got = np.asarray(rfft2_mxu(jnp.asarray(y)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("h,w", [(16, 16), (64, 32), (256, 512)])
def test_irfft2_matches_jnp(rng, h, w):
    spec = jnp.fft.rfft2(rng.standard_normal((2, h, w)).astype(np.float32))
    ref = np.asarray(jnp.fft.irfft2(spec, s=(h, w)))
    got = np.asarray(irfft2_mxu(spec, w))
    np.testing.assert_allclose(got, ref, atol=3e-6 * np.abs(ref).max() * 100)


def test_fft2_full_matches_jnp(rng):
    y = rng.standard_normal((3, 64, 128)).astype(np.float32)
    ref = np.asarray(jnp.fft.fft2(y.astype(np.complex64)))
    got = np.asarray(fft2_mxu(jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.abs(ref).max())


def test_roundtrip(rng):
    x = rng.random((256, 512)).astype(np.float32)
    back = np.asarray(irfft2_mxu(rfft2_mxu(jnp.asarray(x)), 512))
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_pipeline_mxu_equals_xla_backend(rng):
    from pbmm_tpu.engine.pipeline import magnify_frame_pair
    from pbmm_tpu.utils.metrics import psnr

    prev = rng.random((40, 56, 3)).astype(np.float32)
    cur = np.roll(prev, 1, axis=1)
    base = MagnifyConfig(phase_scale=10.0)
    ref = np.asarray(magnify_frame_pair(prev, cur, base))
    got = np.asarray(
        magnify_frame_pair(prev, cur, base.replace(fft_backend="mxu"))
    )
    assert psnr(got, ref) > 70.0


def test_mxu_requires_rfft():
    with pytest.raises(ValueError):
        MagnifyConfig(fft_backend="mxu", use_rfft=False)
