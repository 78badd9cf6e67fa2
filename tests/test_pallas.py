"""Pallas fused band/phase kernel vs the jnp formulation (interpret mode on
CPU — SURVEY.md §4d)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.phase.amplify import pyramid_phase_amplify
from pbmm_tpu.pyramid.filters import amplified_level_flags, radial_filter_bank


def _spectra(rng, n=128):
    img = rng.random((n, n))
    img2 = np.roll(img, 1, axis=1)
    s1 = np.fft.fftshift(np.fft.fft2(img)).astype(np.complex64)
    s2 = np.fft.fftshift(np.fft.fft2(img2)).astype(np.complex64)
    return jnp.asarray(s2), jnp.asarray(s1)


def test_pipeline_with_pallas_flag(rng):
    """End-to-end pipeline with use_pallas (interpret on CPU) matches the
    jnp path."""
    from pbmm_tpu.engine.pipeline import magnify_frame_pair
    from pbmm_tpu.oracle.synthetic import oscillating_bar

    frames = oscillating_bar(size=64, frames=3)
    base = MagnifyConfig(use_rfft=False)
    pall = MagnifyConfig(use_pallas=True, interpret_pallas=True,
                         use_rfft=False)
    a = np.asarray(magnify_frame_pair(frames[1], frames[2], base))
    b = np.asarray(magnify_frame_pair(frames[1], frames[2], pall))
    assert np.abs(a - b).max() < 1e-4


# ---- procedural (constant-free) kernel -------------------------------------

@pytest.mark.parametrize("layout", ["centered", "bitrev2d"])
@pytest.mark.parametrize("phase_scale", [10.0, 2.5])
def test_procedural_kernel_matches_xla_procedural(rng, layout, phase_scale):
    from pbmm_tpu.phase.amplify import pyramid_phase_amplify_procedural
    from pbmm_tpu.phase.pallas_kernels import (
        pyramid_phase_amplify_pallas_procedural,
    )

    cfg = MagnifyConfig(phase_scale=phase_scale)
    n = 128
    cur, prev = _spectra(rng, n)
    if layout == "bitrev2d":
        from pbmm_tpu.spectral.pallas_fft import bit_reverse_permutation

        # Relabel the centered spectra into bitrev order: undo the shift,
        # then permute both axes.
        rev = bit_reverse_permutation(n)
        def to_bitrev(s):
            nat = jnp.fft.ifftshift(s, axes=(-2, -1))
            return nat[rev][:, rev]
        cur, prev = to_bitrev(cur), to_bitrev(prev)
    want = np.asarray(pyramid_phase_amplify_procedural(
        cur, prev, cfg, layout=layout, full_pad_w=n))
    got = np.asarray(pyramid_phase_amplify_pallas_procedural(
        cur, prev, cfg, layout, interpret=True))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-5


def test_pipeline_procedural_pallas_flag(rng):
    """End-to-end with use_pallas + pallas FFT backend (interpret on CPU)
    matches the XLA procedural path."""
    from pbmm_tpu.engine.pipeline import magnify_frame_pair
    from pbmm_tpu.utils.metrics import psnr

    prev = rng.random((40, 56, 3)).astype(np.float32)
    cur = np.roll(prev, 1, axis=1)
    base = MagnifyConfig(phase_scale=10.0)
    ref = np.asarray(magnify_frame_pair(prev, cur, base))
    got = np.asarray(magnify_frame_pair(prev, cur, base.replace(
        fft_backend="pallas", use_rfft=False, use_pallas=True,
        interpret_pallas=True)))
    assert psnr(got, ref) > 70.0
