"""FFT conventions vs numpy oracles (SURVEY.md §4a): the centered transforms
must equal the reference's (-1)^(x+y)-modulation chain."""

import numpy as np
import jax.numpy as jnp

from pbmm_tpu.spectral.fft import fft2_centered, ifft2_centered


def _reference_forward(y):
    """Literal reference chain: premodulate by (-1)^(x+y), then plain FFT
    (`FFT.compute:175-189`, `MotionMagnificationProcessor.cs:508-553`)."""
    h, w = y.shape
    mod = (-1.0) ** (np.add.outer(np.arange(h), np.arange(w)))
    return np.fft.fft2(y * mod)


def _reference_inverse(spec):
    """conj -> FFT -> conj -> /(WH) -> (-1)^(x+y)
    (`MotionMagnificationProcessor.cs:563-616`)."""
    h, w = spec.shape
    z = np.conj(np.fft.fft2(np.conj(spec))) / (h * w)
    mod = (-1.0) ** (np.add.outer(np.arange(h), np.arange(w)))
    return z * mod


def test_forward_equals_reference_modulation_chain(rng):
    y = rng.random((64, 64)).astype(np.float32)
    got = np.asarray(fft2_centered(jnp.asarray(y)))
    want = _reference_forward(y.astype(np.float64))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_inverse_equals_reference_chain(rng):
    spec = (rng.random((32, 32)) + 1j * rng.random((32, 32))).astype(np.complex64)
    got = np.asarray(ifft2_centered(jnp.asarray(spec)))
    want = _reference_inverse(spec.astype(np.complex128))
    assert np.max(np.abs(got - want)) < 1e-5


def test_roundtrip_identity(rng):
    y = rng.random((4, 32, 32)).astype(np.float32)  # batched
    rec = np.asarray(jnp.real(ifft2_centered(fft2_centered(jnp.asarray(y)))))
    np.testing.assert_allclose(rec, y, atol=1e-4)


def test_fftshift_equals_modulation_for_even_n(rng):
    # The equivalence the implementation relies on (even N only — guaranteed
    # by power-of-two padding).
    y = rng.random((16, 16))
    a = np.fft.fftshift(np.fft.fft2(y))
    b = _reference_forward(y)
    np.testing.assert_allclose(a, b, atol=1e-9)
