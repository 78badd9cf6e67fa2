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



# ---------------------------------------------------------------------------
# Procedural variant: masks computed in-kernel from frequency-axis vectors.
# ---------------------------------------------------------------------------

def _smoothstep(t):
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _radial_mask(f, i: int, levels: int, min_f: float, max_f: float):
    """In-kernel radial mask: ramp parameters from the single shared
    source of truth (`pyramid.filters.radial_level_params`), evaluated
    with Mosaic-legal ops (`GeneratePyramidFilters`,
    `PyramidOperations.compute:25-87`); `f` is the radius tile."""
    from pbmm_tpu.pyramid.filters import (
        radial_level_params,
        radial_profile_from_params,
    )

    kind, lo, hi, _ = radial_level_params(levels, min_f, max_f)[i]
    return radial_profile_from_params(f, kind, lo, hi,
                                      smoothstep=_smoothstep)


def _make_procedural_kernel(levels: int, min_f: float, max_f: float,
                            phase_scale: float, tau: float,
                            orientations: int = 0):
    s = float(phase_scale)
    int_scale = s.is_integer() and 0 <= s <= 64
    steer = orientations > 1 and levels >= 3

    def kernel(fy_ref, fx_ref, cur_re, cur_im, prev_re, prev_im,
               out_re, out_im):
        from pbmm_tpu.spectral.fused import _sector_weights

        cr, ci = cur_re[0], cur_im[0]
        pr, pi_ = prev_re[0], prev_im[0]
        fy = fy_ref[...][:, 0:1]  # (tile_h, 1)
        fx = fx_ref[...][0:1, :]  # (1, w)
        f = jnp.sqrt(fy * fy + fx * fx)

        cur_mag = jnp.sqrt(cr * cr + ci * ci)
        prev_mag = jnp.sqrt(pr * pr + pi_ * pi_)
        gate_mag = jnp.minimum(cur_mag, prev_mag)

        sect = _sector_weights(fy, fx, orientations) if steer else None
        total = jnp.zeros_like(f)
        amped = jnp.zeros_like(cr)
        for i in range(levels):  # static unroll, profiles fused on the VPU
            m = _radial_mask(f, i, levels, min_f, max_f)
            total = total + m
            if 0 < i < levels - 1:
                if steer:
                    # K sector masks m*a_k per mid band; per-sector gates.
                    for a in sect:
                        mk = m * a
                        amped = amped + jnp.where(
                            gate_mag * mk >= tau, mk, 0.0)
                else:
                    amped = amped + jnp.where(gate_mag * m >= tau, m, 0.0)

        if int_scale:
            # Trig-free: (prev*conj(cur)/|.|)^s == e^{i*s*wrap(dphi)}.
            rr = pr * cr + pi_ * ci
            ri = pi_ * cr - pr * ci
            m2 = rr * rr + ri * ri
            inv = jnp.where(
                m2 > 0, jax.lax.rsqrt(jnp.maximum(m2, 1e-38)), 0.0
            )
            ur, ui = rr * inv, ri * inv
            wr = jnp.ones_like(ur)
            wi = jnp.zeros_like(ui)
            n = int(s)
            br, bi = ur, ui
            first = True
            while n > 0:
                if n & 1:
                    if first:
                        wr, wi = br, bi
                        first = False
                    else:
                        wr, wi = wr * br - wi * bi, wr * bi + wi * br
                n >>= 1
                if n:
                    br, bi = br * br - bi * bi, 2.0 * br * bi
        else:
            # Same product form as `phase.amplify.phase_delta`: one atan2,
            # already wrapped (and the same ±pi branch choice, so the two
            # formulations agree bin-for-bin).
            rr = pr * cr + pi_ * ci
            ri = pi_ * cr - pr * ci
            ang = jnp.float32(s) * jnp.arctan2(ri, rr)
            wr, wi = jnp.cos(ang), jnp.sin(ang)

        er = (total - amped) + amped * wr
        ei = amped * wi
        out_re[0] = cr * er - ci * ei
        out_im[0] = cr * ei + ci * er

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("levels", "min_f", "max_f", "phase_scale", "tau",
                     "orientations", "interpret"),
)
def _amplify_pallas_procedural(
    cur_re, cur_im, prev_re, prev_im, fy, fx,
    levels: int, min_f: float, max_f: float,
    phase_scale: float, tau: float, orientations: int, interpret: bool,
):
    c, h, w = cur_re.shape
    tile_h = min(h, 128) if h * w <= 2**21 else 64
    grid = (c, pl.cdiv(h, tile_h))

    chan_spec = pl.BlockSpec(
        (1, tile_h, w), lambda ci, hi: (ci, hi, 0), memory_space=pltpu.VMEM
    )
    fy_spec = pl.BlockSpec(
        (tile_h, 128), lambda ci, hi: (hi, 0), memory_space=pltpu.VMEM
    )
    fx_spec = pl.BlockSpec(
        (8, w), lambda ci, hi: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_procedural_kernel(levels, min_f, max_f, phase_scale, tau,
                                     orientations)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fy_spec, fx_spec, chan_spec, chan_spec, chan_spec,
                  chan_spec],
        out_specs=(chan_spec, chan_spec),
        out_shape=(
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        ),
        interpret=interpret,
    )(fy, fx, cur_re, cur_im, prev_re, prev_im)
    return out_re, out_im


def pyramid_phase_amplify_pallas_procedural(
    cur: jnp.ndarray,
    prev: jnp.ndarray,
    cfg,
    layout: str,
    interpret: bool = False,
) -> jnp.ndarray:
    """Constant-free fused band/phase pass: radial masks are evaluated
    in-kernel from (H,)/(W,) frequency-axis vectors (any spectral layout),
    so per-frame HBM traffic is exactly the two input spectra + the output
    — no mask planes.  Serves the radial (reference) bank and the
    steerable angular extension (orientations > 1: in-kernel sector
    windows via `spectral.fused._sector_weights`, r4); temporal-override
    variants fall back to the XLA procedural pass.

    Requires lane-aligned spectra (W % 128 == 0) and pyramid mode without
    delta override.
    """
    from pbmm_tpu.pyramid.filters import freq_axes_jnp

    shape = cur.shape
    h, w = shape[-2:]
    cur = cur.reshape((-1, h, w))  # collapse all leading (batch/chan) dims
    prev = prev.reshape((-1, h, w))
    fy_v, fx_v = freq_axes_jnp(h, w, layout)
    fy = jnp.broadcast_to(jnp.reshape(fy_v, (h, 1)), (h, 128))
    fx = jnp.broadcast_to(jnp.reshape(fx_v, (1, w)), (8, w))
    out_re, out_im = _amplify_pallas_procedural(
        jnp.real(cur), jnp.imag(cur), jnp.real(prev), jnp.imag(prev),
        fy, fx,
        int(cfg.pyramid_levels), float(cfg.min_frequency),
        float(cfg.max_frequency), float(cfg.phase_scale),
        float(cfg.magnitude_threshold), int(cfg.orientations),
        bool(interpret),
    )
    return jax.lax.complex(out_re, out_im).reshape(shape)
