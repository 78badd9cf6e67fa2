"""Fully-fused Pallas spectral path vs the generic pipeline (interpret
mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.oracle.synthetic import oscillating_bar
from pbmm_tpu.parallel.sharding import magnify_clip_batched
from pbmm_tpu.spectral.fused import (
    fused_eligible,
    phase_col_ifft,
    row_ifft_magnitude,
    windowed_row_fft,
)
from pbmm_tpu.utils.metrics import psnr


FUSED = MagnifyConfig(fft_backend="pallas", use_rfft=False,
                      use_fused_spectral=True, interpret_pallas=True)
GENERIC = MagnifyConfig()  # default xla+rfft


def test_eligibility():
    assert fused_eligible(FUSED)
    assert not fused_eligible(GENERIC)  # xla backend
    from pbmm_tpu.config import TemporalConfig

    assert not fused_eligible(
        FUSED.replace(temporal=TemporalConfig(mode="iir_bandpass"))
    )
    assert not fused_eligible(FUSED.replace(mode="standard"))


def test_windowed_row_fft_matches_unfused(rng):
    from pbmm_tpu.spectral.pallas_fft import _fft_axis

    y = rng.random((2, 64, 64)).astype(np.float32)
    win_y = (0.5 * (1 - np.cos(2 * np.pi * (np.arange(64) + 0.5) / 64)))
    windowed = y * win_y[:, None] * win_y[None, :]
    re_w, im_w = windowed_row_fft(jnp.asarray(y), interpret=True)
    re_u, im_u = _fft_axis(jnp.asarray(windowed.astype(np.float32)), None,
                           2, False, 1.0, True)
    np.testing.assert_allclose(np.asarray(re_w), np.asarray(re_u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(im_w), np.asarray(im_u), atol=1e-3)


def test_fused_clip_matches_generic_pipeline():
    frames = oscillating_bar(size=64, frames=4, bar_width=2)
    out_f = np.asarray(magnify_clip_batched(frames, FUSED))
    out_g = np.asarray(magnify_clip_batched(frames, GENERIC))
    assert psnr(out_f, out_g) > 70.0


def test_fused_steerable_matches_generic():
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    out_f = np.asarray(magnify_clip_batched(frames,
                                            FUSED.replace(orientations=4)))
    out_g = np.asarray(magnify_clip_batched(frames,
                                            GENERIC.replace(orientations=4)))
    assert psnr(out_f, out_g) > 70.0


def test_fused_chroma_rgb_matches_generic():
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    out_f = np.asarray(magnify_clip_batched(frames,
                                            FUSED.replace(chroma="rgb")))
    out_g = np.asarray(magnify_clip_batched(frames,
                                            GENERIC.replace(chroma="rgb")))
    assert psnr(out_f, out_g) > 70.0


def test_fused_real_reconstruction():
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    out_f = np.asarray(
        magnify_clip_batched(frames, FUSED.replace(reconstruct="real"))
    )
    out_g = np.asarray(
        magnify_clip_batched(frames, GENERIC.replace(reconstruct="real"))
    )
    assert psnr(out_f, out_g) > 70.0


def test_fused_non_integer_scale():
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    out_f = np.asarray(
        magnify_clip_batched(frames, FUSED.replace(phase_scale=2.5))
    )
    out_g = np.asarray(
        magnify_clip_batched(frames, GENERIC.replace(phase_scale=2.5))
    )
    assert psnr(out_f, out_g) > 70.0


def test_row_windowed_parity_nonsquare(rng):
    """A frame whose padded geometry activates real row windowing
    (150x500 -> 512x512 pad, content cover rows [128, 384)): the
    row-windowed fused path must match the generic XLA pipeline.
    Guards `aligned_row_window` / `col_fft_zero_padded` /
    `phase_col_ifft(out_rows=...)` end to end."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, magnify_frame_pair
    from pbmm_tpu.spectral.fused import aligned_row_window

    geom = geometry_for(150, 500)
    assert (geom.pad_h, geom.pad_w) == (512, 512)
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, geom.pad_h)
    assert 0 < r0 and r1 < 512  # genuinely windowed
    b0, b1 = blur_row_window(geom, FUSED)
    assert (b0, b1) != (0, 512)

    prev = rng.random((150, 500, 3)).astype(np.float32)
    cur = np.clip(prev + 0.01 * rng.random((150, 500, 3)), 0, 1).astype(
        np.float32
    )
    out_f = np.asarray(magnify_frame_pair(prev, cur, FUSED))
    out_g = np.asarray(magnify_frame_pair(prev, cur, GENERIC))
    assert psnr(out_f, out_g) > 70.0
