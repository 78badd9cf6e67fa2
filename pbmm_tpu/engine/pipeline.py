"""The per-frame pipeline — pure, jittable, config-static.

This is the TPU-native equivalent of the reference orchestrator's per-frame
sequence (`ProcessFrameWithPyramidDecomposition`,
`MotionMagnificationProcessor.cs:145-206`, and the standard path `:208-232`),
reduced from ~115 GPU dispatches to:

    rgb->yiq -> pad+window          (fused elementwise by XLA)
    1 forward FFT (per processed channel; the reference runs 2 per frame
      because it re-FFTs the previous frame — we cache its spectrum)
    1 fused band/phase pass         (phase.amplify / phase.standard)
    1 inverse FFT
    blur -> combine -> yiq->rgb -> crop   (fused elementwise)

All functions take the config as a static argument and derive geometry from
(static) shapes at trace time.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.color import rgb_to_yiq, yiq_to_rgb
from pbmm_tpu.core.window import (
    Geometry,
    crop_center,
    gaussian_blur5,
    geometry_for,
    hann2d,
    pad_center,
)
from pbmm_tpu.phase.amplify import pyramid_phase_amplify_procedural
from pbmm_tpu.phase.pallas_kernels import pyramid_phase_amplify_pallas
from pbmm_tpu.phase.standard import bandpass_weight_map_jnp, standard_phase_amplify
from pbmm_tpu.phase.temporal import TemporalState, temporal_apply, temporal_init
from pbmm_tpu.pyramid.filters import amplified_level_flags, filter_bank
from pbmm_tpu.spectral.fft import fft2_centered, ifft2_centered
from pbmm_tpu.core.complexop import wrap_phase


def _geometry(frame_shape, cfg: MagnifyConfig) -> Geometry:
    h, w = frame_shape[-3], frame_shape[-2]
    return geometry_for(h, w, cfg.pad_mode)


def preprocess(
    frame_rgb: jnp.ndarray, cfg: MagnifyConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., H, W, 3) RGB -> (spectra (..., C, Hp, Wp) complex64, windowed
    YIQ (..., Hp, Wp, 3) f32).  Leading batch dims (frames/videos) batch the
    FFT directly — no vmap — so XLA sees one large transform.

    Mirrors Blit(RGBToYIQ) -> PadTexture (+Hann) -> ExtractYChannel ->
    PerformFFT (`MotionMagnificationProcessor.cs:147-155`), with C = 1
    channel (Y) in reference mode or 3 (Y, I, Q) when `chroma="rgb"`.
    """
    with jax.named_scope("pbmm.preprocess"):
        geom = _geometry(frame_rgb.shape, cfg)
        yiq = rgb_to_yiq(frame_rgb.astype(jnp.float32))
        padded = pad_center(yiq, geom)
        win = hann2d(geom.pad_h, geom.pad_w)
        windowed = padded * win[..., None]
        if cfg.chroma == "rgb":
            chans = jnp.moveaxis(windowed, -1, -3)  # (..., 3, Hp, Wp)
        else:
            chans = windowed[..., 0][..., None, :, :]  # (..., 1, Hp, Wp) — Y
        with jax.named_scope("pbmm.fft"):
            spec = fft2_centered(chans)
        return spec, windowed


def amplify_spectrum(
    cur_spec: jnp.ndarray,
    prev_spec: jnp.ndarray,
    cfg: MagnifyConfig,
    temporal_state: Optional[TemporalState] = None,
) -> Tuple[jnp.ndarray, Optional[TemporalState]]:
    """Dispatch to the pyramid or standard phase core; threads temporal
    state when an IIR temporal filter is configured."""
    with jax.named_scope("pbmm.phase_amplify"):
        return _amplify_spectrum_impl(cur_spec, prev_spec, cfg, temporal_state)


def _amplify_spectrum_impl(cur_spec, prev_spec, cfg, temporal_state):
    pad_h, pad_w = cur_spec.shape[-2:]

    delta_override = None
    new_state = temporal_state
    if cfg.temporal.mode != "two_frame":
        delta = wrap_phase(jnp.angle(prev_spec) - jnp.angle(cur_spec))
        if temporal_state is None:
            temporal_state = temporal_init(delta.shape, cfg.temporal)
        delta_override, new_state = temporal_apply(
            delta, temporal_state, cfg.temporal
        )

    if cfg.mode == "pyramid":
        if cfg.use_pallas:
            masks = filter_bank(pad_h, pad_w, cfg)
            flags = amplified_level_flags(cfg)
            mod = pyramid_phase_amplify_pallas(
                cur_spec,
                prev_spec,
                masks,
                flags,
                cfg.phase_scale,
                cfg.magnitude_threshold,
                delta_override=delta_override,
                interpret=cfg.interpret_pallas,
            )
        else:
            # Procedural masks: constant-free, fuses into one VPU pass.
            mod = pyramid_phase_amplify_procedural(
                cur_spec, prev_spec, cfg, delta_override=delta_override
            )
    else:
        weight = bandpass_weight_map_jnp(pad_h, pad_w, cfg)
        mod = standard_phase_amplify(
            cur_spec,
            prev_spec,
            weight,
            cfg.phase_scale,
            cfg.magnitude_threshold,
            cfg.magnitude_scale,
            cfg.apply_magnitude_scale,
            delta_override=delta_override,
        )
    return mod, new_state


def postprocess(
    mod_spec: jnp.ndarray,
    windowed_yiq: jnp.ndarray,
    cfg: MagnifyConfig,
) -> jnp.ndarray:
    """(..., C, Hp, Wp) modified spectra + (..., Hp, Wp, 3) windowed YIQ ->
    (..., Hp, Wp, 3) RGB (padded; caller crops).  Batch dims flow through.

    Mirrors PerformIFFT (magnitude reconstruction, `FFT.compute:143-150`) ->
    ApplyAntiAliasing -> CombineYIQChannels -> YIQToRGB (saturate) ->
    CropTexture (`MotionMagnificationProcessor.cs:196-205`).
    """
    pad_h, pad_w = mod_spec.shape[-2:]
    with jax.named_scope("pbmm.ifft"):
        rec = ifft2_centered(mod_spec)
    if cfg.reconstruct == "magnitude":
        chans = jnp.abs(rec)
    else:
        chans = jnp.real(rec)
    with jax.named_scope("pbmm.blur"):
        chans = gaussian_blur5(chans, cfg.blur_size)

    if cfg.chroma == "rgb":
        out_yiq = jnp.moveaxis(chans, -3, -1)  # all three planes processed
    else:
        # Processed Y + the *windowed* original I/Q
        # (`CombineYIQChannels.shader:44-57` reads the windowed padded YIQ).
        y = chans[..., 0, :, :]
        out_yiq = jnp.concatenate(
            [y[..., None], windowed_yiq[..., 1:]], axis=-1
        )

    if cfg.compensate_window:
        win = hann2d(pad_h, pad_w)
        out_yiq = out_yiq / jnp.maximum(win, 1e-3)[..., None]

    return yiq_to_rgb(out_yiq, saturate=True)


def magnify_frame_pair(
    prev_rgb: jnp.ndarray, cur_rgb: jnp.ndarray, cfg: MagnifyConfig
) -> jnp.ndarray:
    """Stateless two-frame magnification, reference-faithful: both frames are
    fully pre-processed (the reference re-FFTs the previous frame every
    frame, `MotionMagnificationProcessor.cs:151-156`).

    Args:
      prev_rgb, cur_rgb: (H, W, 3) f32 RGB in [0, 1].
    Returns (H, W, 3) f32 RGB.
    """
    geom = _geometry(cur_rgb.shape, cfg)
    cur_spec, cur_windowed = preprocess(cur_rgb, cfg)
    prev_spec, _ = preprocess(prev_rgb, cfg)
    mod_spec, _ = amplify_spectrum(cur_spec, prev_spec, cfg)
    rgb_padded = postprocess(mod_spec, cur_windowed, cfg)
    return crop_center(rgb_padded, geom)
