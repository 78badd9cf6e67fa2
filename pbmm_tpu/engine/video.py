"""Streaming video magnification via `lax.scan`.

The reference's only cross-frame state is `previousSourceTexture` plus a
first-frame flag (`MotionMagnificationProcessor.cs:56-57,75,111-117,142`).
Here the carried state is an explicit, serializable pytree (`VideoState`) of
f32 arrays: the previous frame's spectrum (split re/im — complex64 cannot
cross host<->device on all TPU runtimes), optional previous-frame pixels for
the no-cache parity mode, temporal IIR filter taps, and the frame index.
That makes long video jobs resumable mid-stream (SURVEY.md §5
checkpoint/resume row) — see `engine.state`.

First-frame semantics match `OnRenderImage`'s bootstrap: frame 0 passes
through unmodified (`MotionMagnificationProcessor.cs:111-117`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.color import unit_float
from pbmm_tpu.core.complexop import combine
from pbmm_tpu.engine.pipeline import (
    amplify_reconstruct_fused,
    amplify_spectrum,
    fused_reconstruct_ok,
    postprocess,
    posttail,
    preprocess,
)
from pbmm_tpu.phase.temporal import TemporalState, temporal_init


class VideoState(NamedTuple):
    """Scan carry / checkpointable pipeline state. f32/i32 leaves only."""

    prev_spec_re: jnp.ndarray  # (C, Hp, Wp) f32 (empty if not caching)
    prev_spec_im: jnp.ndarray
    prev_frame: jnp.ndarray  # (H, W, 3) f32 (empty if caching spectra)
    temporal: TemporalState
    frame_idx: jnp.ndarray  # () i32


def video_init(first_frame: jnp.ndarray, cfg: MagnifyConfig) -> VideoState:
    """Bootstrap state from frame 0.

    `frame_idx` counts frames consumed/emitted so far (so it starts at 1:
    frame 0 has passed through) — the resume driver
    (`io.stream.stream_magnify_resumable`) uses it as the output offset.
    """
    spec, _ = preprocess(first_frame, cfg)
    if cfg.cache_prev_spectrum:
        sre, sim = jnp.real(spec), jnp.imag(spec)
        pframe = jnp.zeros((0, 0, 0), jnp.float32)
    else:
        sre = sim = jnp.zeros((0, 0, 0), jnp.float32)
        pframe = unit_float(first_frame)
    tstate = temporal_init(spec.shape, cfg.temporal)
    return VideoState(sre, sim, pframe, tstate, jnp.int32(1))


def video_step(
    state: VideoState, frame: jnp.ndarray, cfg: MagnifyConfig
) -> Tuple[VideoState, jnp.ndarray]:
    """Process one frame; returns (new_state, magnified RGB frame)."""
    cur_spec, cur_yiq = preprocess(frame, cfg)

    if cfg.cache_prev_spectrum:
        prev_spec = combine(state.prev_spec_re, state.prev_spec_im)
    else:
        # Reference-faithful: fully re-process the previous frame
        # (`MotionMagnificationProcessor.cs:151-156`).
        prev_spec, _ = preprocess(state.prev_frame, cfg)

    if fused_reconstruct_ok(cfg, cur_spec.shape):
        # Phase pass fused into the column-IFFT kernel, |z| into the
        # row-IFFT kernel (`spectral/fused.py`) — no modified spectrum or
        # complex reconstruction in HBM; only the crop+blur-halo rows are
        # ever written back (`blur_row_window`).
        from pbmm_tpu.core.window import geometry_for
        from pbmm_tpu.engine.pipeline import blur_row_window

        geom = geometry_for(frame.shape[-3], frame.shape[-2], cfg.pad_mode)
        rows = blur_row_window(geom, cfg)
        chans, new_temporal = amplify_reconstruct_fused(
            cur_spec, prev_spec, cfg, out_rows=rows, full_w=geom.pad_w,
            temporal_state=state.temporal,
        )
        out = jnp.moveaxis(
            posttail(chans, cur_yiq, cfg, row0=rows[0]), -3, -1
        )
    else:
        mod_spec, new_temporal = amplify_spectrum(
            cur_spec, prev_spec, cfg, state.temporal
        )
        out = jnp.moveaxis(postprocess(mod_spec, cur_yiq, cfg), -3, -1)

    if cfg.cache_prev_spectrum:
        sre, sim = jnp.real(cur_spec), jnp.imag(cur_spec)
        pframe = state.prev_frame
    else:
        sre, sim = state.prev_spec_re, state.prev_spec_im
        pframe = unit_float(frame)
    new_state = VideoState(
        sre, sim, pframe, new_temporal, state.frame_idx + 1
    )
    return new_state, out


def _batched_ok(cfg: MagnifyConfig, frame_shape) -> bool:
    """Whether the scan-free batched chunk engine serves this config: the
    fused spectral path in two-frame mode with the previous spectrum
    cached.  (The IIR temporal carry is sequential -> scan; the no-cache
    parity mode re-FFTs the previous frame -> scan.)"""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import hermitian_active
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    if not (cfg.cache_prev_spectrum and cfg.temporal.mode == "two_frame"):
        return False
    geom = geometry_for(frame_shape[-3], frame_shape[-2], cfg.pad_mode)
    wk = (hermitian_kept_width(geom.pad_w)
          if hermitian_active(cfg, geom) else geom.pad_w)
    return fused_reconstruct_ok(cfg, (geom.pad_h, wk))


def _chunk_batched(frames, state: VideoState, cfg: MagnifyConfig):
    """Whole-chunk processing with NO per-frame scan: every frame's FFT
    runs in one batched dispatch, and the phase/col-IFFT kernel reads the
    frame-pair stream through shifted index maps over ONE array
    (`phase_col_ifft(pair_offset=...)`) — the previous frame's spectrum is
    just the preceding planes.  Removes the scan glue the per-frame
    carry costs (frame unstack, output stack, carried-spectrum copies,
    ~0.15 ms/frame at 1080p) while computing the identical math.

    For y_only chroma the pre/post stages run transpose-free: channels-
    last Y/I/Q extraction (`preprocess_cl`) and the fused Pallas post
    kernel (`engine.post_pallas`) when the geometry qualifies."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, preprocess_cl
    from pbmm_tpu.spectral.fused import phase_col_ifft

    t = frames.shape[0]
    h, w = frames.shape[-3], frames.shape[-2]
    geom = geometry_for(h, w, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    rgb = cfg.chroma == "rgb"
    c = 3 if rgb else 1
    sre, sim, i_plane, q_plane = preprocess_cl(frames, cfg)
    flat_re = jnp.concatenate([state.prev_spec_re, sre], axis=0)
    flat_im = jnp.concatenate([state.prev_spec_im, sim], axis=0)
    with jax.named_scope("pbmm.phase_ifft_fused"):
        # Grouped stream: up to 4 frames per grid step — interior planes
        # fetched once per step (fewer spectra reads) and the static
        # phase planes amortize across the chunk.
        grp = 4 if (t * c) % 4 == 0 else (2 if (t * c) % 2 == 0 else 0)
        if grp:
            from pbmm_tpu.spectral.fused import phase_col_ifft_grouped

            rre, rim = phase_col_ifft_grouped(
                flat_re, flat_im, cfg, out_rows=rows,
                full_w=geom.pad_w, planes=c, group=grp,
                interpret=cfg.interpret_pallas,
            )
        else:
            rre, rim = phase_col_ifft(
                flat_re, flat_im, None, None, cfg, out_rows=rows,
                full_w=geom.pad_w, pair_offset=c,
                interpret=cfg.interpret_pallas,
            )
        outs = _tail_block(rre, rim, i_plane, q_plane, cfg, geom, rows,
                           t, h, w)
    new_state = VideoState(
        sre[-c:], sim[-c:], state.prev_frame,
        state.temporal, state.frame_idx + jnp.int32(t),
    )
    return outs, new_state


def _tail_block(rre, rim, i_plane, q_plane, cfg, geom, rows, t, h, w):
    """Pipeline tail from the phase/col-IFFT outputs to RGB frames: the
    merged row-IFFT+post kernel where it serves (y_only + fused post
    geometry — the real reconstruction never exists in HBM, r4), else
    the two-kernel row-IFFT -> post chain."""
    from pbmm_tpu.core.window import hann2d_region
    from pbmm_tpu.engine.post_pallas import post_pallas_ok, rowifft_post_fused
    from pbmm_tpu.spectral.fused import row_ifft_magnitude

    hr = rows[1] - rows[0]
    if cfg.chroma != "rgb" and post_pallas_ok(geom, cfg, rows[0], hr):
        win = hann2d_region(geom)
        rp, gp, bp = rowifft_post_fused(
            rre, rim, i_plane, q_plane, win, cfg, rows[0], h, w,
            cfg.pad_mode, full_w=geom.pad_w,
            interpret=cfg.interpret_pallas,
        )
        return jnp.stack([rp, gp, bp], axis=-1)
    rec = row_ifft_magnitude(
        rre, rim, magnitude=(cfg.reconstruct == "magnitude"),
        pad_h=geom.pad_h, full_w=geom.pad_w,
        interpret=cfg.interpret_pallas,
    )
    return _post_block(rec, i_plane, q_plane, cfg, geom, rows, t, h, w)


def _colspec_ok(cfg: MagnifyConfig, frame_shape) -> bool:
    """Whether the spectrum-resident chunk engine (r5,
    `spectral.fused.colspec_chunk`) serves this config: the fused
    spectral path with cached spectra, in either temporal mode, any
    chroma — the column stages and the carried state live in
    VMEM scratch, so the 2D spectrum never exists in HBM."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import hermitian_active
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    if _os.environ.get("PBMM_COLCHUNK", "1") == "0":
        return False
    if not (cfg.cache_prev_spectrum
            and cfg.temporal.mode in ("two_frame", "iir_bandpass")):
        return False
    geom = geometry_for(frame_shape[-3], frame_shape[-2], cfg.pad_mode)
    wk = (hermitian_kept_width(geom.pad_w)
          if hermitian_active(cfg, geom) else geom.pad_w)
    return fused_reconstruct_ok(cfg, (geom.pad_h, wk))


def _chunk_colspec(frames, state: VideoState, cfg: MagnifyConfig):
    """Spectrum-resident chunk engine (r5): pre + row-FFT batch over the
    chunk, then ONE kernel runs every frame's column-FFT + band/phase +
    column-IFFT with the previous frame's spectrum (and the IIR low-pass
    taps) carried across the frame axis in VMEM scratch
    (`colspec_chunk`), then the merged row-IFFT+post kernel batches
    again.  vs the r4 engines: the column spectrum's HBM round trip
    (~30-65 MB/frame) is gone, and the same kernel serves two-frame,
    IIR, y_only and rgb (no grouped/scan special cases)."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, preprocess_cl
    from pbmm_tpu.spectral.fused import colspec_chunk

    t = frames.shape[0]
    h, w = frames.shape[-3], frames.shape[-2]
    geom = geometry_for(h, w, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    c = 3 if cfg.chroma == "rgb" else 1
    from pbmm_tpu.spectral.fused import aligned_row_window

    r0, _ = aligned_row_window(geom.y0, geom.y0 + geom.in_h, geom.pad_h)
    rre_rows, rim_rows, i_plane, q_plane = preprocess_cl(
        frames, cfg, through_col=False
    )
    iir = cfg.temporal.mode == "iir_bandpass"
    lp_kw = {}
    if iir:
        lp_kw = dict(lp_fast=state.temporal.lp_fast,
                     lp_slow=state.temporal.lp_slow)
    with jax.named_scope("pbmm.colspec_chunk"):
        res = colspec_chunk(
            rre_rows, rim_rows, state.prev_spec_re, state.prev_spec_im,
            cfg, pad_h=geom.pad_h, row0=r0, out_rows=rows,
            full_w=geom.pad_w, planes=c,
            interpret=cfg.interpret_pallas, **lp_kw,
        )
        if iir:
            rres, rims, npr, npi, nlpf, nlps = res
            new_temporal = TemporalState(nlpf, nlps)
        else:
            rres, rims, npr, npi = res
            new_temporal = state.temporal
        outs = _tail_block(rres, rims, i_plane, q_plane, cfg, geom, rows,
                           t, h, w)
    new_state = VideoState(
        npr, npi, state.prev_frame, new_temporal,
        state.frame_idx + jnp.int32(t),
    )
    return outs, new_state


def _batched_iir_ok(cfg: MagnifyConfig, frame_shape) -> bool:
    """Whether the hybrid IIR chunk engine serves this config: fused
    spectral path with the IIR temporal mode and cached spectra.  Only
    the phase/col-IFFT stage is truly sequential (the IIR low-pass carry);
    everything else batches."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import hermitian_active
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    if not (cfg.cache_prev_spectrum
            and cfg.temporal.mode == "iir_bandpass"):
        return False
    geom = geometry_for(frame_shape[-3], frame_shape[-2], cfg.pad_mode)
    wk = (hermitian_kept_width(geom.pad_w)
          if hermitian_active(cfg, geom) else geom.pad_w)
    return fused_reconstruct_ok(cfg, (geom.pad_h, wk))


def _chunk_batched_iir(frames, state: VideoState, cfg: MagnifyConfig):
    """Hybrid chunk engine for the streaming IIR temporal mode (r4): the
    pre stage and both forward FFTs run as ONE batched dispatch over the
    whole chunk, a `lax.scan` threads the sequential IIR low-pass carry
    through per-frame phase/col-IFFT kernel calls, and the row-IFFT +
    post stages batch again over the scan's stacked outputs.  The scan
    engine pays the per-frame glue on EVERY stage; here it remains only
    around the one stage whose math is inherently sequential."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, preprocess_cl
    from pbmm_tpu.spectral.fused import (
        phase_col_ifft_at,
        phase_col_ifft_iir_chunk,
    )

    t = frames.shape[0]
    h, w = frames.shape[-3], frames.shape[-2]
    geom = geometry_for(h, w, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    rgb = cfg.chroma == "rgb"
    c = 3 if rgb else 1
    sre, sim, i_plane, q_plane = preprocess_cl(frames, cfg)
    all_re = jnp.concatenate([state.prev_spec_re, sre], axis=0)
    all_im = jnp.concatenate([state.prev_spec_im, sim], axis=0)

    if c == 1:
        # The whole chunk's sequential recurrence runs INSIDE one kernel
        # (frame axis inner, lp/prev state in VMEM scratch per lane
        # block): zero per-frame HBM state traffic, no scan glue.
        with jax.named_scope("pbmm.phase_ifft_fused"):
            rres, rims, nlpf, nlps = phase_col_ifft_iir_chunk(
                all_re, all_im,
                state.temporal.lp_fast, state.temporal.lp_slow, cfg,
                out_rows=rows, full_w=geom.pad_w,
                interpret=cfg.interpret_pallas,
            )
            outs = _tail_block(rres, rims, i_plane, q_plane, cfg, geom,
                               rows, t, h, w)
        new_state = VideoState(
            sre[-1:], sim[-1:], state.prev_frame,
            TemporalState(nlpf, nlps),
            state.frame_idx + jnp.int32(t),
        )
        return outs, new_state

    def step(carry, i):
        lpf, lps = carry
        # The kernel addresses frame i's planes in the chunk stream via
        # a scalar-prefetch index map — no dynamic-slice copies.
        rre, rim, nlpf, nlps = phase_col_ifft_at(
            all_re, all_im, lpf, lps, i, cfg, out_rows=rows,
            full_w=geom.pad_w, planes=c,
            interpret=cfg.interpret_pallas,
        )
        return (nlpf, nlps), (rre, rim)

    init = (state.temporal.lp_fast, state.temporal.lp_slow)
    (nlpf, nlps), (rres, rims) = jax.lax.scan(
        step, init, jnp.arange(t, dtype=jnp.int32)
    )
    hr = rows[1] - rows[0]
    wk = rres.shape[-1]
    with jax.named_scope("pbmm.phase_ifft_fused"):
        outs = _tail_block(
            rres.reshape((t * c, hr, wk)), rims.reshape((t * c, hr, wk)),
            i_plane, q_plane, cfg, geom, rows, t, h, w)
    new_state = VideoState(
        sre[-c:], sim[-c:], state.prev_frame,
        TemporalState(nlpf, nlps),
        state.frame_idx + jnp.int32(t),
    )
    return outs, new_state


def _post_block(rec, i_plane, q_plane, cfg, geom, rows, t, h, w):
    """Shared post tail of the batched engines: fused Pallas post kernel
    where eligible, else the XLA posttail; returns (T, H, W, 3) RGB."""
    from pbmm_tpu.core.window import hann2d_region
    from pbmm_tpu.engine.pipeline import posttail
    from pbmm_tpu.engine.post_pallas import post_fused, post_pallas_ok

    rgb = cfg.chroma == "rgb"
    hr = rows[1] - rows[0]
    if post_pallas_ok(geom, cfg, rows[0], hr):
        win = hann2d_region(geom)
        if rgb:
            from pbmm_tpu.engine.post_pallas import post_fused_rgb

            rp, gp, bp = post_fused_rgb(
                rec, win, cfg, rows[0], h, w, cfg.pad_mode,
                interpret=cfg.interpret_pallas,
            )
        else:
            rp, gp, bp = post_fused(
                rec, i_plane, q_plane, win, cfg, rows[0], h, w,
                cfg.pad_mode, interpret=cfg.interpret_pallas,
            )
        return jnp.stack([rp, gp, bp], axis=-1)
    if rgb:
        chans = rec.reshape((t, 3, hr, geom.pad_w))
        # posttail's rgb branch reads yiq_small only for geometry; the
        # zero array is unused -> DCE'd by XLA.
        return jnp.moveaxis(
            posttail(chans, jnp.zeros((t, 3, h, w), jnp.float32), cfg,
                     row0=rows[0]), -3, -1)
    chans = rec.reshape((t, 1, hr, geom.pad_w))
    yiq3 = jnp.stack([i_plane, i_plane, q_plane], axis=-3)
    return jnp.moveaxis(posttail(chans, yiq3, cfg, row0=rows[0]), -3, -1)


import os as _os

_chunk_batched_jit = functools.partial(jax.jit, static_argnames=("cfg",))(
    lambda frames, state, cfg: _chunk_batched(frames, state, cfg)
)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _chunk_scan(frames, state: VideoState, cfg: MagnifyConfig):
    final_state, outs = jax.lax.scan(
        lambda s, f: video_step(s, f, cfg), state, frames
    )
    return outs, final_state


def _use_batched(cfg: MagnifyConfig) -> bool:
    """Engine select: `cfg.engine` (static, hashed, checkpointed).  The
    PBMM_SCANFREE env var survives only as an A/B measurement override
    (0 forces scan, 1 forces batched-where-eligible); read per call so
    scripts can flip it between runs."""
    env = _os.environ.get("PBMM_SCANFREE")
    if env is not None:
        return env == "1"
    return cfg.engine == "batched"


_chunk_batched_iir_jit = functools.partial(
    jax.jit, static_argnames=("cfg",)
)(lambda frames, state, cfg: _chunk_batched_iir(frames, state, cfg))


_chunk_colspec_jit = functools.partial(
    jax.jit, static_argnames=("cfg",)
)(lambda frames, state, cfg: _chunk_colspec(frames, state, cfg))


def _tight_pallas(cfg: MagnifyConfig) -> bool:
    return cfg.pad_mode == "tight" and cfg.fft_backend == "pallas"


def _magnify_chunk(frames, state: VideoState, cfg: MagnifyConfig):
    if _use_batched(cfg) and frames.shape[0] > 0:
        if _colspec_ok(cfg, frames.shape):
            return _chunk_colspec_jit(frames, state, cfg)
        if _batched_ok(cfg, frames.shape):
            return _chunk_batched_jit(frames, state, cfg)
        if _batched_iir_ok(cfg, frames.shape):
            return _chunk_batched_iir_jit(frames, state, cfg)
    if _tight_pallas(cfg):
        # The per-frame Pallas kernels are pow-2-only on the column axis;
        # only the spectrum-resident chunk engine carries the four-step
        # tight-height transform.
        raise ValueError(
            "pad_mode='tight' with fft_backend='pallas' requires the "
            "batched engine with cached spectra (engine='batched', "
            "cache_prev_spectrum=True, fused spectral path); use "
            "fft_backend='xla' for other engine combinations"
        )
    return _chunk_scan(frames, state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _magnify_bootstrap(frames, cfg: MagnifyConfig):
    if _tight_pallas(cfg) and _colspec_ok(cfg, frames.shape):
        # Tight-height bootstrap: `video_init`'s standalone column FFT is
        # pow-2-only, so frame 0 runs THROUGH the chunk kernel against a
        # zero previous spectrum instead.  Every gate sees |prev| = 0 < tau
        # (pass-through) and the IIR delta is atan2(0, 0) = 0 (lp taps stay
        # zero), so the carried state after frame 0 is exactly
        # {spectrum(frame 0), zero taps} — frame 0's output plane is
        # discarded and replaced by the reference's first-frame
        # passthrough (`MotionMagnificationProcessor.cs:111-117`).
        from pbmm_tpu.core.window import geometry_for
        from pbmm_tpu.engine.pipeline import hermitian_active
        from pbmm_tpu.spectral.hermitian import hermitian_kept_width

        geom = geometry_for(frames.shape[-3], frames.shape[-2],
                            cfg.pad_mode)
        wk = (hermitian_kept_width(geom.pad_w)
              if hermitian_active(cfg, geom) else geom.pad_w)
        c = 3 if cfg.chroma == "rgb" else 1
        zeros = jnp.zeros((c, geom.pad_h, wk), jnp.float32)
        state = VideoState(
            zeros, zeros, jnp.zeros((0, 0, 0), jnp.float32),
            temporal_init((c, geom.pad_h, wk), cfg.temporal),
            jnp.int32(0),
        )
        outs, final_state = _magnify_chunk(frames, state, cfg)
        first_out = unit_float(frames[0])[None]
        return jnp.concatenate([first_out, outs[1:]], axis=0), final_state
    state = video_init(frames[0], cfg)
    first_out = unit_float(frames[0])[None]
    outs, final_state = _magnify_chunk(frames[1:], state, cfg)
    return jnp.concatenate([first_out, outs], axis=0), final_state


def magnify_video(
    frames: jnp.ndarray, cfg: MagnifyConfig, state: VideoState = None
) -> Tuple[jnp.ndarray, VideoState]:
    """Magnify a clip.

    Args:
      frames: (T, H, W, 3) f32 RGB in [0, 1].
      state: optional carry from a previous chunk (streaming / resume).
        When None, frame 0 bootstraps the state and passes through
        unmodified, like the reference's first rendered frame.

    Returns (out_frames (T, H, W, 3), final_state).  Chunked streaming:
    call repeatedly with consecutive clips, threading the returned state.

    The whole clip runs as ONE cached executable (jit with `cfg` static —
    the analog of `OnValidate` retracing on parameter edits); repeat calls
    with the same shapes/config dispatch without retracing.
    """
    frames = jnp.asarray(frames)
    if not cfg.apply_motion_magnification:
        # Reference bypass: frames pass through untouched, but the previous
        # frame keeps being tracked so re-enabling magnification mid-stream
        # pairs with the true predecessor
        # (`MotionMagnificationProcessor.cs:126-139,142`).
        new_state = _bypass_state(frames, cfg)
        if state is not None:
            new_state = new_state._replace(
                frame_idx=state.frame_idx + jnp.int32(frames.shape[0])
            )
        return unit_float(frames), new_state
    if state is None:
        return _magnify_bootstrap(frames, cfg)
    return _magnify_chunk(frames, state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _bypass_state(frames, cfg: MagnifyConfig) -> VideoState:
    state = video_init(frames[-1], cfg)
    return state._replace(frame_idx=jnp.int32(frames.shape[0]))
