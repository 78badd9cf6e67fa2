"""Pallas radix-2 FFT vs numpy (interpret mode on CPU, SURVEY.md §4d)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.spectral.pallas_fft import (
    bit_reverse_permutation,
    bitrev_freq_axis,
    fft2_bitrev,
    ifft2_bitrev,
)


def test_bit_reverse_permutation():
    rev = bit_reverse_permutation(8)
    assert list(rev) == [0, 4, 2, 6, 1, 5, 3, 7]
    rev2 = bit_reverse_permutation(16)
    assert list(rev2[rev2]) == list(range(16))  # involution


def test_bitrev_freq_axis_matches_centered_grid():
    n = 32
    f = bitrev_freq_axis(n)
    rev = bit_reverse_permutation(n)
    # bin r holds natural frequency rev[r]; its centered-grid value is
    # rev[r]/n for rev[r] < n/2 else rev[r]/n - 1.
    k = rev / n
    want = np.where(k < 0.5, k, k - 1.0)
    np.testing.assert_allclose(f, want, atol=1e-7)


@pytest.mark.parametrize("shape", [(1, 32, 32), (2, 64, 128)])
def test_forward_matches_numpy(rng, shape):
    x = rng.random(shape).astype(np.float32)
    re, im = fft2_bitrev(jnp.asarray(x), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = np.fft.fft2(x)
    rev_h = bit_reverse_permutation(shape[1])
    rev_w = bit_reverse_permutation(shape[2])
    want_brev = want[:, rev_h][:, :, rev_w]
    scale = np.abs(want).max()
    assert np.abs(got - want_brev).max() / scale < 1e-5


def test_roundtrip_identity(rng):
    x = rng.random((1, 64, 64)).astype(np.float32)
    re, im = fft2_bitrev(jnp.asarray(x), interpret=True)
    rre, rim = ifft2_bitrev(re, im, interpret=True)
    np.testing.assert_allclose(np.asarray(rre), x, atol=1e-4)
    assert np.abs(np.asarray(rim)).max() < 1e-4


def test_inverse_matches_numpy(rng):
    # Arbitrary (non-Hermitian) spectrum: permute a numpy spectrum into
    # bitrev layout, run the Pallas inverse, compare with np.fft.ifft2.
    spec = (rng.random((1, 32, 32)) + 1j * rng.random((1, 32, 32))).astype(
        np.complex64
    )
    rev = bit_reverse_permutation(32)
    sb = spec[:, rev][:, :, rev]
    rre, rim = ifft2_bitrev(
        jnp.asarray(sb.real), jnp.asarray(sb.imag), interpret=True
    )
    want = np.fft.ifft2(spec)
    got = np.asarray(rre) + 1j * np.asarray(rim)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_pipeline_with_pallas_fft_backend_matches_xla(rng):
    """End-to-end: the Pallas spectral backend (interpret mode) must match
    the XLA full-fft path."""
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.engine.pipeline import magnify_frame_pair
    from pbmm_tpu.oracle.synthetic import oscillating_bar
    from pbmm_tpu.utils.metrics import psnr

    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    cfg_p = MagnifyConfig(fft_backend="pallas", use_rfft=False,
                          interpret_pallas=True)
    cfg_x = MagnifyConfig(use_rfft=False)
    a = np.asarray(magnify_frame_pair(frames[1], frames[2], cfg_p))
    b = np.asarray(magnify_frame_pair(frames[1], frames[2], cfg_x))
    assert psnr(a, b) > 70.0
