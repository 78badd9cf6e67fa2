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

    # All first-class modes AND both temporal models are served (standard
    # + IIR since r3; the steerable pyramid extension since r4).
    assert fused_eligible(
        FUSED.replace(temporal=TemporalConfig(mode="iir_bandpass"))
    )
    assert fused_eligible(FUSED.replace(mode="standard"))
    assert fused_eligible(FUSED.replace(phase_scale=2.5))
    assert fused_eligible(FUSED.replace(orientations=4))


def test_fused_standard_mode_matches_generic():
    """Standard mode through the fused kernels (polynomial atan2 +
    range-reduced sincos + procedural w(f)) vs the XLA pipeline."""
    frames = oscillating_bar(size=64, frames=4, bar_width=2)
    out_f = np.asarray(magnify_clip_batched(frames,
                                            FUSED.replace(mode="standard")))
    out_g = np.asarray(
        magnify_clip_batched(frames, GENERIC.replace(mode="standard"))
    )
    assert psnr(out_f, out_g) > 70.0


def test_fused_standard_scene_config_matches_generic():
    """The demo scene's serialized overrides (phase_scale=1,
    high_cutoff=0.3, steepness=2) in standard mode."""
    from pbmm_tpu.config import MagnifyConfig

    scene = MagnifyConfig.scene_defaults().replace(mode="standard")
    fused = scene.replace(fft_backend="pallas", use_rfft=False,
                          use_fused_spectral=True, interpret_pallas=True)
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    out_f = np.asarray(magnify_clip_batched(frames, fused))
    out_g = np.asarray(magnify_clip_batched(frames, scene))
    assert psnr(out_f, out_g) > 70.0


def test_fused_standard_no_bandpass_and_steepness_float():
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    for kw in ({"apply_bandpass": False}, {"filter_steepness": 2.7}):
        out_f = np.asarray(magnify_clip_batched(
            frames, FUSED.replace(mode="standard", **kw)))
        out_g = np.asarray(magnify_clip_batched(
            frames, GENERIC.replace(mode="standard", **kw)))
        assert psnr(out_f, out_g) > 70.0, kw


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


def test_disjoint_band_detection():
    # The single-cos fast path fires exactly when the amplified bands'
    # interiors are disjoint: geometric spacing ratio q >= 3.  Defaults
    # (L=5, 0.05/0.45: q=3, touching) and L=4 (q=9) qualify; L=6
    # (q~2.08, overlapping) and L=3 (zero-mask quirk) do not.
    from pbmm_tpu.spectral.fused import _disjoint_bands, _mask_params

    assert _disjoint_bands(_mask_params(MagnifyConfig())) is not None
    assert _disjoint_bands(
        _mask_params(MagnifyConfig(pyramid_levels=4))) is not None
    assert _disjoint_bands(
        _mask_params(MagnifyConfig(pyramid_levels=6))) is None
    assert _disjoint_bands(
        _mask_params(MagnifyConfig(pyramid_levels=3))) is None


def test_fused_overlapping_bands_matches_generic():
    # L=6 takes the generic per-band loop (bands overlap); parity must
    # hold there too.
    frames = oscillating_bar(size=64, frames=3, bar_width=2)
    cfg_f = FUSED.replace(pyramid_levels=6)
    cfg_g = GENERIC.replace(pyramid_levels=6)
    out_f = np.asarray(magnify_clip_batched(frames, cfg_f))
    out_g = np.asarray(magnify_clip_batched(frames, cfg_g))
    assert psnr(out_f, out_g) > 70.0


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


HERM = FUSED.replace(use_hermitian_spectral=True)


class TestHermitianHalf:
    """Hermitian-half kept-lane layout (`spectral/hermitian.py`): the
    column FFT / phase pass / column IFFT carry only the kept 128-lane
    tiles; the row-IFFT kernel reconstructs the missing tiles in VMEM."""

    def test_tile_math(self, rng):
        """Partner symmetry of the bitrev layout + exact reconstruction,
        against numpy's FFT (fp64)."""
        from pbmm_tpu.spectral.hermitian import (
            hermitian_kept_width,
            kept_lane_indices,
            kept_tiles,
            missing_tile_sources,
            reconstruction_plan,
        )
        from pbmm_tpu.spectral.pallas_fft import bit_reverse_permutation

        w = 1024
        assert hermitian_kept_width(w) == 640  # 5 of 8 tiles
        rev = bit_reverse_permutation(w)
        x = rng.standard_normal(w)
        xb = np.fft.fft(x)[rev]  # bitrev position layout
        kidx = kept_lane_indices(w)
        plan = reconstruction_plan(w)
        rebuilt = np.concatenate([
            xb[kidx][kp * 128:(kp + 1) * 128][::-1].conj() if flip
            else xb[kidx][kp * 128:(kp + 1) * 128]
            for kp, flip in plan
        ])
        np.testing.assert_allclose(rebuilt, xb, rtol=1e-10, atol=1e-10)
        # every missing tile's source is kept, and sources invert to kept
        kt = set(kept_tiles(w))
        for m, s in missing_tile_sources(w).items():
            assert m not in kt and s in kt

    def test_inactive_below_512(self):
        from pbmm_tpu.spectral.hermitian import hermitian_saves

        assert not hermitian_saves(64)
        assert not hermitian_saves(256)
        assert hermitian_saves(512)
        assert hermitian_saves(2048)

    def test_frame_pair_matches_generic(self, rng):
        """512x512 pad (kept width 384 of 512): the kept-lane fused path
        must match the generic XLA pipeline."""
        from pbmm_tpu.core.window import geometry_for
        from pbmm_tpu.engine.pipeline import (
            hermitian_active,
            magnify_frame_pair,
        )

        geom = geometry_for(300, 400)
        assert hermitian_active(HERM, geom)
        prev = rng.random((300, 400, 3)).astype(np.float32)
        cur = np.clip(prev + 0.01 * rng.random((300, 400, 3)), 0, 1).astype(
            np.float32
        )
        out_h = np.asarray(magnify_frame_pair(prev, cur, HERM))
        out_g = np.asarray(magnify_frame_pair(prev, cur, GENERIC))
        assert psnr(out_h, out_g) > 70.0

    def test_batched_clip_matches_full_width(self):
        """The batched fused engine under the kept layout vs the same
        engine full-width."""
        frames = oscillating_bar(size=280, frames=3, bar_width=4)
        out_h = np.asarray(magnify_clip_batched(frames, HERM))
        out_f = np.asarray(magnify_clip_batched(frames, FUSED))
        assert psnr(out_h, out_f) > 70.0

    def test_standard_mode_hermitian(self, rng):
        """Standard mode preserves the lane-Hermitian symmetry too (w(f)
        even, delta odd, gates even): kept-lane standard vs generic."""
        from pbmm_tpu.engine.pipeline import magnify_frame_pair

        prev = rng.random((300, 400, 3)).astype(np.float32)
        cur = np.clip(prev + 0.01 * rng.random((300, 400, 3)), 0, 1).astype(
            np.float32
        )
        out_h = np.asarray(
            magnify_frame_pair(prev, cur, HERM.replace(mode="standard"))
        )
        out_g = np.asarray(
            magnify_frame_pair(prev, cur, GENERIC.replace(mode="standard"))
        )
        assert psnr(out_h, out_g) > 70.0

    def test_scan_engine_state_shapes(self):
        """The carried previous-spectrum state is kept-width; chunked
        streaming threads it across calls."""
        from pbmm_tpu.engine.video import magnify_video

        frames = oscillating_bar(size=280, frames=4, bar_width=4)
        whole, _ = magnify_video(frames, HERM)
        first, st = magnify_video(frames[:2], HERM)
        assert st.prev_spec_re.shape[-1] == 384  # kept width of 512
        rest, _ = magnify_video(frames[2:], HERM, state=st)
        resumed = np.concatenate([np.asarray(first), np.asarray(rest)])
        np.testing.assert_allclose(resumed, np.asarray(whole), atol=1e-5)


def test_batched_chunk_engine_matches_per_frame_scan():
    """The spectrum-resident batched chunk engine (r5:
    `engine.video._chunk_colspec`) against a literal per-frame
    `video_step` loop — identical math, no scan glue."""
    from pbmm_tpu.engine.video import (
        _colspec_ok,
        magnify_video,
        video_init,
        video_step,
    )

    frames = oscillating_bar(size=280, frames=5, bar_width=4)
    cfg = MagnifyConfig(fft_backend="pallas", use_rfft=False,
                        use_fused_spectral=True, use_hermitian_spectral=True,
                        interpret_pallas=True)
    assert _colspec_ok(cfg, frames.shape[1:])
    got, _ = magnify_video(frames, cfg)

    state = video_init(frames[0], cfg)
    outs = [np.asarray(frames[0], np.float32)]
    for t in range(1, len(frames)):
        state, out = video_step(state, jnp.asarray(frames[t]), cfg)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(
        np.asarray(got), np.stack(outs), atol=2e-5,
        err_msg="batched chunk engine diverged from the per-frame scan")


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
