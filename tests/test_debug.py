"""Debug-view renderers vs the shader math they transcribe."""

import numpy as np
import jax.numpy as jnp

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob
from pbmm_tpu.utils.debug import (
    bandpass_weights_view,
    debug_frame_view,
    filtered_phase_delta_view,
    magnitude_view,
    phase_view,
    spatial_frequency_map,
    split_screen,
)


def test_magnitude_view_formula(rng):
    z = (rng.random((8, 8)) + 1j * rng.random((8, 8))).astype(np.complex64)
    got = np.asarray(magnitude_view(jnp.asarray(z)))
    want = np.log10(10 * np.abs(z) + 1) / 4
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_phase_view_range(rng):
    z = (rng.random((8, 8)) - 0.5 + 1j * (rng.random((8, 8)) - 0.5)).astype(
        np.complex64
    )
    v = np.asarray(phase_view(jnp.asarray(z)))
    assert v.min() >= 0.0 and v.max() <= 2.0  # |pi| / (pi/2) = 2


def test_split_screen_shape():
    a = jnp.ones((16, 16))
    b = jnp.zeros((16, 16))
    s = np.asarray(split_screen(a, b))
    assert s.shape == (16, 16)
    assert s[:, :8].min() == 1.0 and s[:, 8:].max() == 0.0


def test_bilinear_resize_exact_values():
    """Pin the GPU sampling convention: dest pixel centers -> (u,v) in
    [0,1] -> source texel grid at u*W-0.5 with clamp-to-edge, which is
    exactly how `ShowSplitScreen` draws a full texture onto a half-screen
    quad (`MotionMagnificationProcessor.cs:458-487`)."""
    from pbmm_tpu.utils.debug import bilinear_resize

    src = jnp.arange(4.0).reshape(1, 4)  # [0, 1, 2, 3] along x
    got = np.asarray(bilinear_resize(src, 1, 2))
    # out x=0 -> u=0.25 -> sx=0.5 -> (src[0]+src[1])/2 = 0.5
    # out x=1 -> u=0.75 -> sx=2.5 -> (src[2]+src[3])/2 = 2.5
    np.testing.assert_allclose(got, [[0.5, 2.5]], atol=1e-6)

    # a linear ramp resamples to the same linear ramp (bilinear is exact
    # on affine signals away from the clamped border)
    ramp = jnp.arange(32.0).reshape(1, 32) / 31.0
    up = np.asarray(bilinear_resize(ramp, 1, 64))[0]
    diffs = np.diff(up[2:-2])
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-5)


def test_split_screen_resamples_full_textures():
    """Each half must contain the WHOLE input texture (bilinearly squeezed
    2:1), not its decimated half: content at the input's right edge must
    appear at each half's right edge."""
    left = jnp.zeros((8, 16)).at[:, -1].set(1.0)
    right = jnp.zeros((8, 16)).at[:, 0].set(1.0)
    s = np.asarray(split_screen(left, right))
    assert s.shape == (8, 16)
    assert s[:, 7].max() > 0.4  # left texture's right edge, end of half 1
    assert s[:, 8].max() > 0.4  # right texture's left edge, start of half 2
    assert s[:, 1:6].max() < 1e-6  # interior of half 1 stays empty


def test_spatial_frequency_map_center_zero():
    m = np.asarray(spatial_frequency_map(32, 32))
    assert m[16, 16] == 0.0
    assert abs(m[0, 0] - 1.0) < 1e-6  # corner clamps to 1


def test_bandpass_weights_view_colors():
    cfg = MagnifyConfig(mode="standard")
    v = np.asarray(bandpass_weights_view(64, 64, cfg))
    assert v.shape == (64, 64, 3)
    # DC (center) is below the low cutoff -> rejected -> blue
    assert v[32, 32, 2] == 1.0 and v[32, 32, 1] == 0.0


def test_filtered_phase_delta_view_range(rng):
    cfg = MagnifyConfig(mode="standard")
    z1 = np.fft.fftshift(np.fft.fft2(rng.random((32, 32)))).astype(np.complex64)
    z2 = np.fft.fftshift(np.fft.fft2(rng.random((32, 32)))).astype(np.complex64)
    v = np.asarray(filtered_phase_delta_view(jnp.asarray(z1), jnp.asarray(z2), cfg))
    assert np.isfinite(v).all()


def test_debug_frame_view_shapes():
    frame = oscillating_gaussian_blob(height=40, width=24, frames=1)[0]
    cfg = MagnifyConfig()
    for mag, ph in [(True, False), (False, True), (True, True)]:
        out = np.asarray(
            debug_frame_view(jnp.asarray(frame), cfg, mag, ph)
        )
        assert out.shape == frame.shape


def test_stage_times_smoke():
    from pbmm_tpu.utils.profiling import stage_times

    clip = oscillating_gaussian_blob(height=32, width=32, frames=4)
    cfg = MagnifyConfig()
    t = stage_times(clip, cfg, reps=1)
    assert set(t) == {"preprocess_fft", "phase_amplify", "ifft_postprocess"}
    assert all(v > 0 for v in t.values())
