"""Fused Pallas post-stage: blur -> chroma combine -> YIQ->RGB -> crop.

The XLA form of the post tail (`engine.pipeline.posttail`) is correct but
re-reads its input once per blur tap when fused (the 9-tap separable
Gaussian amplifies reads ~9x; measured 0.22 ms/frame of blur alone at
1080p/T=16 vs a 0.033 ms byte floor, and the TPU conv emitter is no
better).  This kernel computes the identical math in one pass over VMEM
blocks:

  reconstruction rows (region layout)  --H blur--> --V blur--> crop
  + windowed original I/Q (channels-last planes) -> YIQ->RGB -> clip
  -> three (T, H, W) R/G/B planes (the caller stacks minor-3 once).

Reference chain: ApplyAntiAliasing -> CombineYIQChannels -> YIQToRGB ->
CropTexture (`MotionMagnificationProcessor.cs:196-205`), with the blur
math of `GaussianBlur.shader:52-57` via the derived discrete taps
(`core.window.blur_taps`) and the H-then-V pass order (`:427-431`).

Halo scheme: output rows split into `ob`-row blocks; each grid step reads
TWO consecutive `ib`-row input blocks of the reconstruction region (the
same array passed twice with index maps k and k+1, k = (ob*j + yoff - r)
// ib) and dynamic-slices the (ob + 2r)-row vertical window from their
concatenation.  Horizontal taps ride `pltpu.roll` across the full padded
width; the crop's column offset is a lane roll + aligned slice.
`post_pallas_ok` verifies every constraint numerically at trace time;
ineligible geometries fall back to the XLA posttail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbmm_tpu.core.color import YIQ_TO_RGB
from pbmm_tpu.core.window import Geometry, blur_taps, geometry_for


def _radius(cfg) -> int:
    return (len(blur_taps(cfg.blur_size)) - 1) // 2


def _out_block(h: int) -> int:
    """Largest 8-multiple divisor of h that is <= 192 (pipeline-friendly
    block height); 0 if none exists."""
    best = 0
    for ob in range(8, 193, 8):
        if h % ob == 0:
            best = ob
    return best


def post_pallas_ok(geom: Geometry, cfg, rows0: int, region_h: int) -> bool:
    """Whether this geometry/config is served by the fused post kernels
    (`post_fused` for y_only, `post_fused_rgb` for chroma="rgb" — same
    halo/alignment constraints, r4)."""
    r = _radius(cfg)
    # Full blur halo inside the padded frame on every side (so the
    # edge-replicate fallback of `blur_then_crop` is never consulted).
    if not (geom.y0 >= r and geom.x0 >= r
            and geom.pad_h - geom.y0 - geom.in_h >= r
            and geom.pad_w - geom.x0 - geom.in_w >= r):
        return False
    if geom.in_w % 128 != 0 or geom.pad_w % 128 != 0:
        return False
    ob = _out_block(geom.in_h)
    if not ob:
        return False
    yoff = geom.y0 - rows0 - r  # region row of the first V-tap
    if yoff < 0:
        return False
    # Input blocks are ALSO ob rows (ragged tail allowed: Pallas pads) so
    # the in-block slice offset yoff - e is STATIC (Mosaic has no dynamic
    # sublane slice).  The window must fit in two consecutive blocks and
    # never read past the real region rows.
    e = yoff % 8  # static sub-8 remainder folded into the tap offsets
    s = yoff - e  # 8-aligned static slice base within block j
    wve = -(-(ob + 2 * r + e) // 8) * 8
    if s + wve > 2 * ob:
        return False
    last_need = ob * (geom.in_h // ob - 1) + s + wve
    return last_need <= region_h


@functools.partial(jax.jit, static_argnames=("cfg", "rows0", "in_h", "in_w",
                                             "pad_mode", "interpret"))
def post_fused(chans, i_plane, q_plane, win, cfg, rows0: int,
               in_h: int, in_w: int, pad_mode: str,
               interpret: bool = False):
    """(T, Hr, Wp) reconstruction rows + (T, H, W) original I/Q planes +
    (H, W) crop-region Hann -> three (T, H, W) R, G, B planes.

    Exact math of `posttail` (blur_then_crop -> windowed-chroma combine ->
    optional window compensation / YIQ gains -> YIQ->RGB saturate) in one
    Pallas pass; callers must have checked `post_pallas_ok`.
    """
    t, hr, wp = chans.shape
    geom = geometry_for(in_h, in_w, pad_mode)
    r = _radius(cfg)
    taps = [float(v) for v in blur_taps(cfg.blur_size)]
    ob = _out_block(in_h)
    yoff = geom.y0 - rows0 - r
    ib = ob  # input blocks match output blocks -> static slice offset
    e = yoff % 8  # static: ob % 8 == 0 keeps it constant across blocks
    wv = -(-(ob + 2 * r + e) // 8) * 8
    x0 = geom.x0
    m = YIQ_TO_RGB
    gains = (tuple(float(g) for g in cfg.yiq_gains)
             if cfg.apply_yiq_gains else (1.0, 1.0, 1.0))
    comp = bool(cfg.compensate_window)

    grid = (t, in_h // ob)

    # ch_a: block 0 only (j-constant index map -> fetched once per frame,
    # consumed by the j==0 scratch bootstrap); ch_b: block j+1.  With the
    # rolling scratch, each region block is fetched exactly once.
    ch_a = pl.BlockSpec((1, ib, wp), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    nb = -(-hr // ib)  # ragged tail block is zero-padded by Pallas
    ch_b = pl.BlockSpec(
        (1, ib, wp),
        lambda i, j: (i, jnp.minimum(j + 1, nb - 1), 0),
        memory_space=pltpu.VMEM)
    iq_spec = pl.BlockSpec((1, ob, in_w), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((ob, in_w), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ob, in_w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def kernel(ca_ref, cb_ref, i_ref, q_ref, w_ref, r_ref, g_ref, b_ref,
               sc_ref):
        # Rolling scratch carry (r4): block j was read as ch_b at step
        # j-1 and carried in VMEM scratch, so each region row is read
        # from HBM exactly once per frame (ch_a fetches only block 0,
        # once per frame — its index map is constant in j).
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            sc_ref[...] = ca_ref[0]

        two = jnp.concatenate([sc_ref[...], cb_ref[0]], axis=0)  # (2*ib, wp)
        sc_ref[...] = cb_ref[0]  # carry for step j+1
        w128 = two[yoff - e:yoff - e + wv]  # static 8-aligned slice
        # Horizontal taps via lane rolls (wrap-around touches only the
        # pad border columns, > r outside the crop).
        hb = w128 * taps[r]
        for k2 in range(1, r + 1):
            hb = hb + (pltpu.roll(w128, k2, 1) * taps[r - k2]
                       + pltpu.roll(w128, wp - k2, 1) * taps[r + k2])
        # Vertical taps: static sublane slices of the window (e = sub-8
        # alignment remainder of the slice base).
        vb = hb[e:e + ob] * taps[0]
        for k2 in range(1, 2 * r + 1):
            vb = vb + hb[e + k2:e + k2 + ob] * taps[k2]
        # Column crop: lane roll to the crop origin, then aligned slice.
        y = pltpu.roll(vb, wp - x0, 1)[:, :in_w]

        wn = w_ref[...]
        iw = i_ref[0] * wn
        qw = q_ref[0] * wn
        if comp:
            inv = 1.0 / jnp.maximum(wn, 1e-3)
            y = y * inv
            iw = iw * inv
            qw = qw * inv
        y = y * jnp.float32(gains[0])
        iw = iw * jnp.float32(gains[1])
        qw = qw * jnp.float32(gains[2])
        for d, o_ref in enumerate((r_ref, g_ref, b_ref)):
            o_ref[0] = jnp.clip(
                y * float(m[d, 0]) + iw * float(m[d, 1])
                + qw * float(m[d, 2]), 0.0, 1.0)

    out_shape = jax.ShapeDtypeStruct((t, in_h, in_w), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ch_a, ch_b, iq_spec, iq_spec, win_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((ib, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chans, chans, i_plane, q_plane, win)


@functools.partial(jax.jit, static_argnames=("cfg", "rows0", "in_h", "in_w",
                                             "pad_mode", "full_w",
                                             "out_layout", "interpret"))
def rowifft_post_fused(rre, rim, i_plane, q_plane, win, cfg, rows0: int,
                       in_h: int, in_w: int, pad_mode: str,
                       full_w=None, rgb_u8=None,
                       out_layout: str = "tuple3",
                       interpret: bool = False):
    """(T, Hr, Wk) phase/col-IFFT output rows + (T, H, W) original I/Q
    planes + (H, W) crop-region Hann -> three (T, H, W) R, G, B planes.

    r5 ingestion/emission fusion (VERDICT r4 ask 3):
      rgb_u8: optional (T, 3, H, W) uint8 planar RGB frames — the
        original-chroma I/Q are then computed IN KERNEL from the u8
        planes (3 bytes/px read instead of 8 of f32 I/Q; `i_plane`/
        `q_plane` must be None).  Replaces `RGBToYIQ.shader:46-50` at
        the byte level for 8-bit sources.
      out_layout: "tuple3" (three (T, H, W) f32 planes — the caller
        stacks), "planar" (ONE (T, 3, H, W) f32 array written directly
        by the kernel — no interleave pass ever runs), or "planar_u8"
        (same, quantized round(255 x) to uint8 — 1/4 the output bytes;
        the y4m/display contract).

    The r4 deepest fusion on the tail: the row-axis IFFT (Hermitian
    rebuild + all log2(W) stages + |z|) runs INSIDE the post kernel on
    each 120-row block as it streams through VMEM — the real
    reconstruction never exists in HBM (the standalone
    `row_ifft_magnitude` write + `post_fused` read were 2x9.4 MB/frame).
    The row transform is perfectly row-local, so the same two-block +
    rolling-scratch halo scheme as `post_fused` applies, with the
    scratch carrying the TRANSFORMED |z| rows (each block is inverse-
    transformed exactly once per frame).

    y_only chroma only (the rgb variant keeps the two-kernel tail);
    callers must have checked `post_pallas_ok` and the fused path.
    """
    from pbmm_tpu.spectral.fused import make_row_ifft_block
    from pbmm_tpu.spectral.pallas_fft import (
        _dif_twiddles,
        _intra_group_matrix,
    )

    t, hr, wk = rre.shape
    geom = geometry_for(in_h, in_w, pad_mode)
    wp = full_w if full_w is not None else wk
    transform, extra_inputs, extra_specs = make_row_ifft_block(
        wk, wp, pad_h=geom.pad_h,
        magnitude=(cfg.reconstruct == "magnitude"),
    )
    r = _radius(cfg)
    taps = [float(v) for v in blur_taps(cfg.blur_size)]
    ob = _out_block(in_h)
    yoff = geom.y0 - rows0 - r
    ib = ob
    e = yoff % 8
    wv = -(-(ob + 2 * r + e) // 8) * 8
    x0 = geom.x0
    m = YIQ_TO_RGB
    gains = (tuple(float(g) for g in cfg.yiq_gains)
             if cfg.apply_yiq_gains else (1.0, 1.0, 1.0))
    comp = bool(cfg.compensate_window)

    grid = (t, in_h // ob)
    nb = -(-hr // ib)
    u8_chroma = rgb_u8 is not None
    if u8_chroma:
        assert i_plane is None and q_plane is None
    from pbmm_tpu.core.color import RGB_TO_YIQ

    # sp_a: block 0 only (j-constant index map -> fetched once per frame,
    # consumed by the j==0 scratch bootstrap); sp_b: block j+1 (the one
    # new block per step).  Total fetch = each block exactly once.
    sp_a = pl.BlockSpec((1, ib, wk), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    sp_b = pl.BlockSpec(
        (1, ib, wk),
        lambda i, j: (i, jnp.minimum(j + 1, nb - 1), 0),
        memory_space=pltpu.VMEM)
    iq_spec = pl.BlockSpec((1, ob, in_w), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    u8_spec = pl.BlockSpec((1, 3, ob, in_w), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((ob, in_w), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ob, in_w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    pl_out_spec = pl.BlockSpec((1, 3, ob, in_w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)

    def kernel(ra, ia_, rb, ib2, *rest):
        if u8_chroma:
            u8_ref = rest[0]
            rest = rest[1:]
        else:
            i_ref, q_ref = rest[:2]
            rest = rest[2:]
        w_ref = rest[0]
        rest = rest[1:]
        extra_refs = rest[:len(extra_inputs)]
        rest = rest[len(extra_inputs):]
        if out_layout == "tuple3":
            r_ref, g_ref, b_ref, sc_ref = rest
        else:
            o_ref, sc_ref = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            sc_ref[...] = transform(ra[0], ia_[0], extra_refs)

        new_mag = transform(rb[0], ib2[0], extra_refs)
        two = jnp.concatenate([sc_ref[...], new_mag], axis=0)
        sc_ref[...] = new_mag
        w128 = two[yoff - e:yoff - e + wv]
        hb = w128 * taps[r]
        for k2 in range(1, r + 1):
            hb = hb + (pltpu.roll(w128, k2, 1) * taps[r - k2]
                       + pltpu.roll(w128, wp - k2, 1) * taps[r + k2])
        vb = hb[e:e + ob] * taps[0]
        for k2 in range(1, 2 * r + 1):
            vb = vb + hb[e + k2:e + k2 + ob] * taps[k2]
        y = pltpu.roll(vb, wp - x0, 1)[:, :in_w]

        wn = w_ref[...]
        if u8_chroma:
            # Original-chroma I/Q from the uint8 planes, in VMEM: the
            # RGBToYIQ rows 1-2 FMA'd with the 1/255 scale folded in.
            # (Mosaic has no u8 -> f32 cast; go through i32.)
            ru = u8_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
            gu = u8_ref[0, 1].astype(jnp.int32).astype(jnp.float32)
            bu = u8_ref[0, 2].astype(jnp.int32).astype(jnp.float32)
            s = 1.0 / 255.0
            my = RGB_TO_YIQ
            iw = (ru * float(my[1, 0] * s) + gu * float(my[1, 1] * s)
                  + bu * float(my[1, 2] * s)) * wn
            qw = (ru * float(my[2, 0] * s) + gu * float(my[2, 1] * s)
                  + bu * float(my[2, 2] * s)) * wn
        else:
            iw = i_ref[0] * wn
            qw = q_ref[0] * wn
        if comp:
            inv = 1.0 / jnp.maximum(wn, 1e-3)
            y = y * inv
            iw = iw * inv
            qw = qw * inv
        y = y * jnp.float32(gains[0])
        iw = iw * jnp.float32(gains[1])
        qw = qw * jnp.float32(gains[2])
        chans = [
            jnp.clip(y * float(m[d, 0]) + iw * float(m[d, 1])
                     + qw * float(m[d, 2]), 0.0, 1.0)
            for d in range(3)
        ]
        if out_layout == "tuple3":
            for ch, o in zip(chans, (r_ref, g_ref, b_ref)):
                o[0] = ch
        elif out_layout == "planar":
            for d in range(3):
                o_ref[0, d] = chans[d]
        else:  # planar_u8
            for d in range(3):
                # f32 -> i32 -> u8 (no direct f32 -> u8 cast in Mosaic);
                # chans are clipped to [0, 1] so the i32 value fits u8.
                o_ref[0, d] = jnp.round(
                    chans[d] * 255.0).astype(jnp.int32).astype(jnp.uint8)

    in_specs = [sp_a, sp_a, sp_b, sp_b]
    inputs = [rre, rim, rre, rim]
    if u8_chroma:
        in_specs.append(u8_spec)
        inputs.append(rgb_u8)
    else:
        in_specs += [iq_spec, iq_spec]
        inputs += [i_plane, q_plane]
    in_specs.append(win_spec)
    inputs.append(win)
    in_specs += list(extra_specs)
    inputs += list(extra_inputs)

    if out_layout == "tuple3":
        out_shape3 = jax.ShapeDtypeStruct((t, in_h, in_w), jnp.float32)
        out_specs = (out_spec, out_spec, out_spec)
        out_shape = (out_shape3, out_shape3, out_shape3)
    else:
        dt = jnp.uint8 if out_layout == "planar_u8" else jnp.float32
        out_specs = pl_out_spec
        out_shape = jax.ShapeDtypeStruct((t, 3, in_h, in_w), dt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ib, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("cfg", "rows0", "in_h", "in_w",
                                             "pad_mode", "interpret"))
def post_fused_rgb(chans3, win, cfg, rows0: int,
                   in_h: int, in_w: int, pad_mode: str,
                   interpret: bool = False):
    """(3T, Hr, Wp) reconstruction rows (plane-minor frame-major: frame
    t's Y/I/Q at rows 3t..3t+2) + (H, W) crop-region Hann -> three
    (T, H, W) R, G, B planes.

    The chroma="rgb" post tail (r4): ALL three planes are processed
    reconstructions (`posttail`'s `out_yiq = chans` branch — no original-
    chroma combine, no window re-multiply), so the kernel blurs and crops
    each plane, then applies optional window compensation / YIQ gains and
    the RGB matrix + saturate.  Same halo scheme as `post_fused`; callers
    must have checked `post_pallas_ok`.
    """
    t3, hr, wp = chans3.shape
    t = t3 // 3
    geom = geometry_for(in_h, in_w, pad_mode)
    r = _radius(cfg)
    taps = [float(v) for v in blur_taps(cfg.blur_size)]
    ob = _out_block(in_h)
    yoff = geom.y0 - rows0 - r
    ib = ob
    e = yoff % 8
    wv = -(-(ob + 2 * r + e) // 8) * 8
    x0 = geom.x0
    m = YIQ_TO_RGB
    gains = (tuple(float(g) for g in cfg.yiq_gains)
             if cfg.apply_yiq_gains else (1.0, 1.0, 1.0))
    comp = bool(cfg.compensate_window)

    grid = (t, in_h // ob)
    nb = -(-hr // ib)  # ragged tail block is zero-padded by Pallas

    def plane_specs(c):
        # a: block 0 only (j-constant -> one fetch per plane per frame,
        # the scratch bootstrap); b: block j+1 (one new block per step).
        a = pl.BlockSpec((1, ib, wp), lambda i, j, c=c: (3 * i + c, 0, 0),
                         memory_space=pltpu.VMEM)
        b = pl.BlockSpec(
            (1, ib, wp),
            lambda i, j, c=c: (3 * i + c, jnp.minimum(j + 1, nb - 1), 0),
            memory_space=pltpu.VMEM)
        return a, b

    in_specs = []
    for c in range(3):
        in_specs.extend(plane_specs(c))
    win_spec = pl.BlockSpec((ob, in_w), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    in_specs.append(win_spec)
    out_spec = pl.BlockSpec((1, ob, in_w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def _blur_crop(two):
        w128 = two[yoff - e:yoff - e + wv]
        hb = w128 * taps[r]
        for k2 in range(1, r + 1):
            hb = hb + (pltpu.roll(w128, k2, 1) * taps[r - k2]
                       + pltpu.roll(w128, wp - k2, 1) * taps[r + k2])
        vb = hb[e:e + ob] * taps[0]
        for k2 in range(1, 2 * r + 1):
            vb = vb + hb[e + k2:e + k2 + ob] * taps[k2]
        return pltpu.roll(vb, wp - x0, 1)[:, :in_w]

    def kernel(ya, yb, ia, ib_, qa, qb, w_ref, r_ref, g_ref, b_ref,
               sy, si, sq):
        # Rolling scratch carries, one per plane (see `post_fused`).
        j = pl.program_id(1)
        planes = []
        for pa, pb, sc in ((ya, yb, sy), (ia, ib_, si), (qa, qb, sq)):
            @pl.when(j == 0)
            def _(pa=pa, sc=sc):
                sc[...] = pa[0]

            planes.append(_blur_crop(
                jnp.concatenate([sc[...], pb[0]], axis=0)))
            sc[...] = pb[0]
        y, iw, qw = planes
        if comp:
            inv = 1.0 / jnp.maximum(w_ref[...], 1e-3)
            y = y * inv
            iw = iw * inv
            qw = qw * inv
        y = y * jnp.float32(gains[0])
        iw = iw * jnp.float32(gains[1])
        qw = qw * jnp.float32(gains[2])
        for d, o_ref in enumerate((r_ref, g_ref, b_ref)):
            o_ref[0] = jnp.clip(
                y * float(m[d, 0]) + iw * float(m[d, 1])
                + qw * float(m[d, 2]), 0.0, 1.0)

    out_shape = jax.ShapeDtypeStruct((t, in_h, in_w), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((ib, wp), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chans3, chans3, chans3, chans3, chans3, chans3, win)
