"""Pallas TPU kernel for the fused band/phase amplification pass.

This is the TPU-native "compute kernel layer" replacing the reference's
dispatch sequence ApplyPyramidFilter x2L -> ProcessPyramidPhaseDifference xL
-> InitializeAccumulator -> AccumulatePyramidLevel xL
(`MotionMagnificationProcessor.cs:158-194`; HLSL kernels in
`PyramidOperations.compute` / `PyramidPhaseDifference.compute`): one VPU pass
over the spectrum computing the phase delta once and accumulating gated mask
sums, with the band loop statically unrolled over VMEM-resident mask tiles.

Complex arrays are carried as (re, im) f32 pairs — Mosaic has no complex
dtype.  Tiles are (TILE_H, W) rows so the lane dimension stays 128-aligned
for any power-of-two W >= 128.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbmm_tpu.core.complexop import TWO_PI


def _pick_tile_h(h: int, w: int, n_masks: int) -> int:
    """Choose a row-tile height keeping ~(7 + n_masks) tiles under a VMEM
    budget (double-buffered by the pipeline)."""
    budget = 6 * 1024 * 1024  # bytes of VMEM for all operands of one step
    n_planes = 7 + n_masks  # 4 in + 2 out + delta? + masks (over-estimate)
    tile = h
    while tile > 8 and tile * w * 4 * n_planes > budget:
        tile //= 2
    return max(tile, 8)


def _wrap(x):
    return x - TWO_PI * jnp.round(x / TWO_PI)


def _make_kernel(n_masks: int, flags: tuple, phase_scale: float,
                 magnitude_threshold: float, has_override: bool):
    def kernel(*refs):
        if has_override:
            cur_re, cur_im, prev_re, prev_im, masks, delta_ref, out_re, out_im = refs
        else:
            cur_re, cur_im, prev_re, prev_im, masks, out_re, out_im = refs
        cr = cur_re[0]
        ci = cur_im[0]
        pr = prev_re[0]
        pi_ = prev_im[0]
        cur_mag = jnp.sqrt(cr * cr + ci * ci)
        prev_mag = jnp.sqrt(pr * pr + pi_ * pi_)
        if has_override:
            delta = delta_ref[0]
        else:
            delta = _wrap(jnp.arctan2(pi_, pr) - jnp.arctan2(ci, cr))

        tau = jnp.float32(magnitude_threshold)
        total = jnp.zeros_like(cr)
        amped = jnp.zeros_like(cr)
        for i in range(n_masks):  # static unroll over mask planes
            m = masks[i]
            total = total + m
            if flags[i]:
                gate = (cur_mag * m >= tau) & (prev_mag * m >= tau)
                amped = amped + jnp.where(gate, m, 0.0)

        ang = jnp.float32(phase_scale) * delta
        rot_re = (total - amped) + amped * jnp.cos(ang)
        rot_im = amped * jnp.sin(ang)
        out_re[0] = cr * rot_re - ci * rot_im
        out_im[0] = cr * rot_im + ci * rot_re

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "flags_t",
        "phase_scale",
        "magnitude_threshold",
        "interpret",
    ),
)
def _amplify_pallas(
    cur_re,
    cur_im,
    prev_re,
    prev_im,
    masks,
    delta_override,
    flags_t: tuple,
    phase_scale: float,
    magnitude_threshold: float,
    interpret: bool,
):
    c, h, w = cur_re.shape
    n_masks = masks.shape[0]
    tile_h = _pick_tile_h(h, w, n_masks)
    grid = (c, pl.cdiv(h, tile_h))

    def chan_map(ci, hi):
        return (ci, hi, 0)

    def mask_map(ci, hi):
        return (0, hi, 0)

    chan_spec = pl.BlockSpec((1, tile_h, w), chan_map, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (n_masks, tile_h, w), mask_map, memory_space=pltpu.VMEM
    )
    has_override = delta_override is not None
    in_specs = [chan_spec, chan_spec, chan_spec, chan_spec, mask_spec]
    inputs = [cur_re, cur_im, prev_re, prev_im, masks]
    if has_override:
        in_specs.append(chan_spec)
        inputs.append(delta_override)

    kernel = _make_kernel(
        n_masks, flags_t, phase_scale, magnitude_threshold, has_override
    )
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(chan_spec, chan_spec),
        out_shape=(
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)
    return out_re, out_im


def pyramid_phase_amplify_pallas(
    cur: jnp.ndarray,
    prev: jnp.ndarray,
    masks: jnp.ndarray,
    amp_flags: np.ndarray,
    phase_scale: float,
    magnitude_threshold: float,
    delta_override: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `phase.amplify.pyramid_phase_amplify`.

    Accepts (C, H, W) or (H, W) complex spectra; splits to f32 pairs at the
    kernel boundary.
    """
    squeeze = cur.ndim == 2
    if squeeze:
        cur, prev = cur[None], prev[None]
        if delta_override is not None:
            delta_override = delta_override[None]
    out_re, out_im = _amplify_pallas(
        jnp.real(cur),
        jnp.imag(cur),
        jnp.real(prev),
        jnp.imag(prev),
        masks,
        delta_override,
        tuple(bool(f) for f in amp_flags),
        float(phase_scale),
        float(magnitude_threshold),
        bool(interpret),
    )
    out = jax.lax.complex(out_re, out_im)
    return out[0] if squeeze else out
