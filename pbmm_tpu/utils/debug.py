"""Debug / observability renderers.

Reproduces the reference's visual-debugging surface (SURVEY.md §5 metrics
row) as pure array functions: the spectrum magnitude/phase views behind
`showMagnitude`/`showPhase` (`MotionMagnificationProcessor.cs:234-257`) and
the standard-mode diagnostic kernels
(`PhaseDifferenceComputeShader.compute:182-259` — dead code in the reference
but genuinely useful for parity debugging).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.complexop import wrap_phase
from pbmm_tpu.core.window import crop_center
from pbmm_tpu.engine.pipeline import _geometry, preprocess
from pbmm_tpu.phase.standard import bandpass_weight_map_jnp


def magnitude_view(spec: jnp.ndarray) -> jnp.ndarray:
    """Log-scaled spectrum magnitude, `ConvertComplexMagToTexScaled`
    (`FFT.compute:153-161`): log10(10|z| + 1) / 4."""
    return jnp.log10(10.0 * jnp.abs(spec) + 1.0) / 4.0


def phase_view(spec: jnp.ndarray) -> jnp.ndarray:
    """Normalized absolute phase, `ConvertComplexPhaseToTex`
    (`FFT.compute:164-172`): |atan2(im, re)| / (pi/2)."""
    return jnp.abs(jnp.angle(spec)) / (jnp.pi / 2.0)


def bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """GPU-convention bilinear resample of the last two axes: destination
    pixel centers map to source texture coordinates (u, v) = ((x+0.5)/W_out,
    (y+0.5)/H_out), sampled at source texel grid (u*W_src - 0.5) with
    clamp-to-edge — Unity's default sampler state for RenderTextures."""
    src_h, src_w = img.shape[-2:]
    sy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * src_h - 0.5
    sx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * src_w - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, src_h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, src_w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, src_h - 1)
    x1 = jnp.minimum(x0 + 1, src_w - 1)
    fy = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)
    fx = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    top = (img[..., y0, :][..., :, x0] * (1 - fx)
           + img[..., y0, :][..., :, x1] * fx)
    bot = (img[..., y1, :][..., :, x0] * (1 - fx)
           + img[..., y1, :][..., :, x1] * fx)
    return top * (1 - fy[..., :, None]) + bot * fy[..., :, None]


def split_screen(left: jnp.ndarray, right: jnp.ndarray,
                 out_h: int = 0, out_w: int = 0) -> jnp.ndarray:
    """Side-by-side composite: each input's FULL texture is bilinearly
    resampled into one half-width quad of the output, exactly as
    `ShowSplitScreen` draws each texture over a half-screen ortho quad with
    full [0,1] texcoords (`MotionMagnificationProcessor.cs:458-487`)."""
    out_h = out_h or left.shape[-2]
    out_w = out_w or left.shape[-1]
    return jnp.concatenate(
        [bilinear_resize(left, out_h, out_w // 2),
         bilinear_resize(right, out_h, out_w - out_w // 2)],
        axis=-1,
    )


def spatial_frequency_map(pad_h: int, pad_w: int) -> jnp.ndarray:
    """`GenerateSpatialFrequencyMap` (`PhaseDifferenceComputeShader.compute:
    182-192`): radius / 0.707 clamped to 1."""
    fy = jnp.arange(pad_h, dtype=jnp.float32) / pad_h - 0.5
    fx = jnp.arange(pad_w, dtype=jnp.float32) / pad_w - 0.5
    return jnp.minimum(
        jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2) / 0.707, 1.0
    )


def bandpass_weights_view(pad_h: int, pad_w: int, cfg: MagnifyConfig) -> jnp.ndarray:
    """(H, W, 3) color-coded weight map, `GenerateBandpassWeights`
    (`PhaseDifferenceComputeShader.compute:195-217`): blue = rejected,
    green = passed (scaled), red = enhanced."""
    w = bandpass_weight_map_jnp(pad_h, pad_w, cfg)
    w_n = jnp.clip(w / jnp.maximum(cfg.motion_sensitivity * 2.0, 1.0), 0.0, 1.0)
    blue = w_n < 0.1
    red = w_n > 1.5  # unreachable after the clamp — faithful to the shader
    r = jnp.where(red, 1.0, 0.0)
    g = jnp.where(blue | red, 0.0, w_n)
    b = jnp.where(blue, 1.0, 0.0)
    return jnp.stack([r, g, b], axis=-1)


def filtered_phase_delta_view(
    cur: jnp.ndarray, prev: jnp.ndarray, cfg: MagnifyConfig
) -> jnp.ndarray:
    """`GenerateFilteredPhaseDelta` (`PhaseDifferenceComputeShader.compute:
    220-259`): weighted wrapped delta mapped [-pi, pi] -> [0, 1]; gated bins
    render black (0)."""
    pad_h, pad_w = cur.shape[-2:]
    w = bandpass_weight_map_jnp(pad_h, pad_w, cfg)
    gate = (jnp.abs(cur) < cfg.magnitude_threshold) | (
        jnp.abs(prev) < cfg.magnitude_threshold
    )
    delta = wrap_phase(jnp.angle(prev) - jnp.angle(cur)) * w
    norm = (delta + jnp.pi) / (2.0 * jnp.pi)
    return jnp.where(gate, 0.0, norm)


def debug_frame_view(
    frame_rgb: jnp.ndarray,
    cfg: MagnifyConfig,
    show_magnitude: bool = True,
    show_phase: bool = False,
) -> jnp.ndarray:
    """The `ProcessDebugView` path (`MotionMagnificationProcessor.cs:
    234-257`): FFT the current frame's Y plane and render the requested
    spectrum view(s), cropped back to frame size.  Both flags set => split
    screen."""
    geom = _geometry(frame_rgb.shape, cfg)
    # Debug views render the DC-centered full spectrum regardless of the
    # production spectral path.
    spec, _ = preprocess(
        frame_rgb, cfg.replace(use_rfft=False, fft_backend="xla")
    )
    spec0 = spec[..., 0, :, :]
    if show_magnitude and show_phase:
        img = split_screen(magnitude_view(spec0), phase_view(spec0))
    elif show_phase:
        img = phase_view(spec0)
    else:
        img = magnitude_view(spec0)
    img = crop_center(img, geom)
    return jnp.repeat(img[..., None], 3, axis=-1)
