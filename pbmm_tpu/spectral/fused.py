"""Fully-fused spectral pipeline kernels (Pallas, bitrev layout).

Beyond `pallas_fft.py`'s per-axis FFT kernels, this module fuses the
neighboring elementwise stages into the FFT kernels themselves, removing
whole HBM round trips from the per-frame hot path (r4 kernel set):

  k1: window multiply -> row-FFT   (the Hann window is applied to the
      padded Y block in VMEM before the stages; Hermitian-half kept
      lanes out)
  k2: `colspec_chunk` (r5, the hot path): column-FFT + band/phase
      amplification + column-IFFT for the WHOLE chunk in one kernel —
      frame axis is the inner grid dim and the previous frame's column
      spectrum (plus the IIR low-pass taps) ride VMEM scratch across it,
      so the 2D spectrum never exists in HBM.  Host-precomputed per-bin
      planes (`_static_phase_planes`) are fetched once per lane block
      per chunk.  (The r4 k2/k3 split — `col_fft_zero_padded` +
      `phase_col_ifft` — remains for the per-frame scan engine and the
      spatially-sharded engine.)
  k3: row-IFFT -> |z| — standalone here (`row_ifft_magnitude`), or fully
      merged with the post stage (`engine.post_pallas.rowifft_post_fused`
      via `make_row_ifft_block`) so the reconstruction never exists in
      HBM.

Eligibility (`fused_eligible`): pyramid (radial or steerable) or standard
mode, two-frame or IIR temporal, magnitude or real reconstruction.  The
engine falls back to the unfused kernels otherwise (`engine/pipeline.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbmm_tpu.spectral.hermitian import (
    hermitian_kept_width,
    hermitian_saves,
    kept_lane_indices,
    kept_segments,
    kept_tiles,
    reconstruction_plan,
    reversal_matrix,
)
from pbmm_tpu.spectral.pallas_fft import (
    _LANE_BLOCK,
    _ROW_BLOCK,
    _apply_intra_group,
    _dif_twiddles,
    _fft_stages,
    _intra_group_matrix,
    _roll,
    bitrev_freq_axis,
)


def _hann_vec(n: int) -> np.ndarray:
    i = (np.arange(n, dtype=np.float64) + 0.5) / n
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i))).astype(np.float32)


def aligned_row_window(lo: int, hi: int, pad_h: int,
                       block: int = _ROW_BLOCK):
    """Smallest block-aligned [r0, r1) covering [lo, hi), clamped to the
    padded height.  The spatial-row windowing backbone: at 1080p/2048^2
    only 1152 of 2048 padded rows carry content (pad rows are exact zeros
    pre-FFT) or survive the crop+blur-halo (post-IFFT), so the row-axis
    kernels process 56% of the rows, bit-exactly."""
    r0 = max(0, (lo // block) * block)
    r1 = min(pad_h, -(-hi // block) * block)
    return r0, r1


@functools.partial(jax.jit, static_argnames=("pad_h", "row0", "keep_half",
                                              "interpret"))
def windowed_row_fft(y: jnp.ndarray, pad_h: int = 0, row0: int = 0,
                     keep_half: bool = False, interpret: bool = False):
    """(B, Hc, W) content rows of the padded real Y plane -> row-axis FFT
    of (window * y), bitrev cols.  `pad_h`/`row0` locate the Hc-row slab
    inside the padded frame so the Hann row weights use absolute rows
    (pad_h=0 means Hc == padded height).

    Fuses `WindowingFunction.shader`'s separable Hann (pixel-center uv)
    into the first FFT kernel — the windowed plane never exists in HBM.

    `keep_half=True` writes back only the Hermitian-half kept lane tiles
    (`spectral/hermitian.py`): the input rows are real, so the sliced-off
    tiles are conj-lane-reversals of kept ones — 9/16 of the spectrum
    bytes at W=2048, sliced in VMEM before the (only) HBM write.
    """
    b, h, w = y.shape
    pad_h = pad_h or h
    twr_np, twi_np = _dif_twiddles(w, False)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(w, False)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]
    wy = jnp.asarray(_hann_vec(pad_h)[row0:row0 + h])[:, None]  # (Hc, 1)
    wx = jnp.asarray(_hann_vec(w))[None, :]  # (1, W) row

    block_h = min(_ROW_BLOCK, h)
    grid = (b, pl.cdiv(h, block_h))
    spec = pl.BlockSpec((1, block_h, w), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    # Window vectors as 2D (H,1)/(1,W) arrays so blocks stay tile-legal
    # (a (1, block_h) lane slice would violate lane divisibility).
    wy_spec = pl.BlockSpec((block_h, 1), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    wx_spec = pl.BlockSpec((1, w), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, w), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    segs = kept_segments(w) if keep_half else None
    wk = hermitian_kept_width(w) if keep_half else w
    out_spec = pl.BlockSpec((1, block_h, wk), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def _keep(x):
        if segs is None or wk == w:
            return x
        # Maximal contiguous runs (3 at W=2048), not per-tile slices.
        return jnp.concatenate(
            [x[:, s * 128:e * 128] for s, e in segs], axis=1
        )

    def kernel(y_ref, wy_ref, wx_ref, twr_ref, twi_ref, gr_ref, gi_ref,
               ore, oim):
        from pbmm_tpu.spectral.pallas_fft import _apply_intra_group

        yy = y_ref[0] * wy_ref[:] * wx_ref[:]
        keep_gm = segs is not None and wk != w and w >= 128
        rr, ii = _fft_stages(yy, None, w, 1, False, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]),
                             apply_gm=not keep_gm)
        rr, ii = _keep(rr), _keep(ii)
        if keep_gm:
            # The intra-group stages are tile-local, so the matmul runs
            # on the kept tiles only — 9/16 of the MXU work at W=2048.
            rr, ii = _apply_intra_group(rr, ii, gr_ref[...], gi_ref[...], 1)
        ore[0] = rr
        oim[0] = ii

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, wy_spec, wx_spec, tw_spec, tw_spec, gm_spec, gm_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wk), jnp.float32),
            jax.ShapeDtypeStruct((b, h, wk), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(y, wy, wx, twr, twi, gr, gi)


@functools.partial(jax.jit, static_argnames=("coeffs", "pad_h", "pad_w",
                                             "y0", "x0", "row0",
                                             "keep_half", "interpret"))
def windowed_row_fft_u8planar(frames_u8, coeffs, pad_h: int, pad_w: int,
                              y0: int, x0: int, row0: int,
                              keep_half: bool = False,
                              interpret: bool = False):
    """(T, 3, H, W) planar uint8 frames -> row-axis FFT of the windowed
    luma slab, straight from the 8-bit source (r5, VERDICT r4 ask 3):
    the Y = coeffs . rgb FMA, the 1/255 scale, the center pad and the
    Hann window all happen in VMEM — the f32 Y slab never exists in HBM
    (the XLA pre stage's 9.4 MB write + 9.4 MB re-read at 1080p become
    ~12 MB of u8 reads).  Replaces `RGBToYIQ.shader:46-50` +
    `PadTexture`/`ApplyWindowingFunction`
    (`MotionMagnificationProcessor.cs:358-421`) at the byte level.

    Geometry: the output covers the block-aligned content-row window
    [row0, row0 + Hc) of the padded frame (`aligned_row_window`); each
    64-row output block needs input rows offset by `off = y0 - row0`
    (in [0, 64)), so the kernel reads TWO consecutive 64-row input
    blocks and takes the static window with a sublane roll — the same
    two-block scheme as the post kernel's blur halo.  `coeffs` is the
    static (c_r, c_g, c_b) Y row of the color matrix.
    """
    t, nch, h_in, w_in = frames_u8.shape
    assert nch == 3
    assert frames_u8.dtype == jnp.uint8
    twr_np, twi_np = _dif_twiddles(pad_w, False)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(pad_w, False)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]
    B = _ROW_BLOCK
    r1 = min(pad_h, -(-(y0 + h_in) // B) * B)
    hc = r1 - row0
    assert hc % B == 0
    wy = jnp.asarray(_hann_vec(pad_h)[row0:row0 + hc])[:, None]  # (Hc, 1)
    wx = jnp.asarray(_hann_vec(pad_w))[None, :]
    off = y0 - row0
    assert 0 <= off < B
    start = B - off  # first needed row inside the two-block window
    e = start % 8
    base = start - e  # 8-aligned slice base; roll by e aligns the rest
    nbi = -(-h_in // B)  # input blocks (ragged tail zero-padded)

    grid = (t, hc // B)

    def in_map_a(i, j):
        return (i, 0, jnp.maximum(j - 1, 0), 0)

    def in_map_b(i, j):
        return (i, 0, jnp.minimum(j, nbi - 1), 0)

    u8_spec_a = pl.BlockSpec((1, 3, B, w_in), in_map_a,
                             memory_space=pltpu.VMEM)
    u8_spec_b = pl.BlockSpec((1, 3, B, w_in), in_map_b,
                             memory_space=pltpu.VMEM)
    wy_spec = pl.BlockSpec((B, 1), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    wx_spec = pl.BlockSpec((1, pad_w), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, pad_w), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    segs = kept_segments(pad_w) if keep_half else None
    wk = hermitian_kept_width(pad_w) if keep_half else pad_w
    out_spec = pl.BlockSpec((1, B, wk), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    cr_, cg_, cb_ = (float(c) for c in coeffs)

    def _keep(x):
        if segs is None or wk == pad_w:
            return x
        return jnp.concatenate(
            [x[:, s * 128:e2 * 128] for s, e2 in segs], axis=1
        )

    def kernel(ua_ref, ub_ref, wy_ref, wx_ref, twr_ref, twi_ref,
               gr_ref, gi_ref, ore, oim):
        j = pl.program_id(1)

        def luma(u_ref):
            # Same op ORDER as unit_float + the plane FMA (u8 -> f32,
            # * 1/255, then the matrix row) so the result is
            # bit-identical to the XLA pre path.
            s = jnp.float32(1.0 / 255.0)
            r = u_ref[0, 0].astype(jnp.int32).astype(jnp.float32) * s
            g = u_ref[0, 1].astype(jnp.int32).astype(jnp.float32) * s
            b2 = u_ref[0, 2].astype(jnp.int32).astype(jnp.float32) * s
            return r * cr_ + g * cg_ + b2 * cb_

        two = jnp.concatenate([luma(ua_ref), luma(ub_ref)], axis=0)
        rows = _roll(two, -e, 0)[base:base + B]  # input rows of block j
        # Zero the rows outside the real content (the j=0 / tail blocks
        # read clamped neighbors): content iff 0 <= input row < H.
        in_row = (j * B - off
                  + jax.lax.broadcasted_iota(jnp.int32, (B, w_in), 0))
        rows = jnp.where((in_row >= 0) & (in_row < h_in), rows, 0.0)
        # Center pad the columns in VMEM, then the separable Hann.
        parts = []
        if x0 > 0:
            parts.append(jnp.zeros((B, x0), jnp.float32))
        parts.append(rows)
        if x0 + w_in < pad_w:
            parts.append(jnp.zeros((B, pad_w - x0 - w_in), jnp.float32))
        yy = (jnp.concatenate(parts, axis=1) if len(parts) > 1 else rows)
        yy = yy * wy_ref[:] * wx_ref[:]
        keep_gm = segs is not None and wk != pad_w and pad_w >= 128
        rr, ii = _fft_stages(yy, None, pad_w, 1, False, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]),
                             apply_gm=not keep_gm)
        rr, ii = _keep(rr), _keep(ii)
        if keep_gm:
            rr, ii = _apply_intra_group(rr, ii, gr_ref[...], gi_ref[...], 1)
        ore[0] = rr
        oim[0] = ii

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u8_spec_a, u8_spec_b, wy_spec, wx_spec, tw_spec,
                  tw_spec, gm_spec, gm_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((t, hc, wk), jnp.float32),
            jax.ShapeDtypeStruct((t, hc, wk), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(frames_u8, frames_u8, wy, wx, twr, twi, gr, gi)


@functools.partial(jax.jit, static_argnames=("pad_h", "row0", "interpret"))
def col_fft_zero_padded(re, im, pad_h: int, row0: int = 0,
                        interpret: bool = False):
    """(B, Hc, W) row-spectra of the content rows -> (B, pad_h, W) forward
    column FFT, with the content slab zero-embedded at `row0` *inside the
    kernel* (concat with VMEM zeros): the padded frame's zero rows have
    zero row-FFTs, so they are never read from HBM.  Bit-exact vs the
    full-height transform."""
    b, h, w = re.shape
    twr_np, twi_np = _dif_twiddles(pad_h, False)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(pad_h, False)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]

    block_w = min(_LANE_BLOCK, w)
    grid = (b, pl.cdiv(w, block_w))
    in_spec = pl.BlockSpec((1, h, block_w), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, pad_h, block_w), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, pad_h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    def embed(x):
        parts = []
        if row0 > 0:
            parts.append(jnp.zeros((row0, x.shape[1]), jnp.float32))
        parts.append(x)
        if row0 + h < pad_h:
            parts.append(jnp.zeros((pad_h - row0 - h, x.shape[1]),
                                   jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x

    def kernel(re_ref, im_ref, twr_ref, twi_ref, gr_ref, gi_ref, ore, oim):
        rr, ii = _fft_stages(embed(re_ref[0]), embed(im_ref[0]), pad_h, 0,
                             False, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]))
        ore[0] = rr
        oim[0] = ii

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, tw_spec, tw_spec, gm_spec, gm_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, pad_h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, pad_h, w), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(re, im, twr, twi, gr, gi)


# ---------------------------------------------------------------------------
# Mixed-radix (four-step) column transform for tight heights H = m * 128
# ---------------------------------------------------------------------------
#
# The reference pads 1080 -> 2048 rows only because its radix-2 FFT needs
# a power of two (`MotionMagnificationProcessor.cs:298-302,531-535`).  On
# TPU any H = m*128 works: Cooley-Tukey H = m x 128 with the 128-point
# factor as a dense per-block MXU matmul and the m-point factor as an
# unrolled cross-block combine (m^2 complex scalar FMAs on (128, lanes)
# slices).  1080p pads to 1152 = 9*128 — 0.5625x the column work and
# spectrum bytes of the pow-2 rule.
#
# Layout ("fourstep"): position p = k1*128 + k2 holds frequency
# k = k1 + m*k2 (k1 = block, k2 = within-block).  Forward: natural rows
# in -> fourstep order out; inverse consumes fourstep and emits natural
# rows — the permutations cancel across fwd -> phase -> inv exactly like
# the row axis' bitrev DIF/DIT pairing.  Mask/weight planes are simply
# evaluated at the fourstep frequencies (`col_freq_axis`).


def _is_pow2(n: int) -> bool:
    return n & (n - 1) == 0


def col_freq_axis(n: int) -> np.ndarray:
    """Centered normalized frequency of each COLUMN position in the
    pipeline's working layout: bitrev for pow-2 heights, fourstep for
    tight heights (n = m*128)."""
    if _is_pow2(n):
        return bitrev_freq_axis(n)
    m = n // 128
    assert m * 128 == n, f"tight height must be a multiple of 128: {n}"
    p = np.arange(n)
    k = (p // 128) + m * (p % 128)
    v = k.astype(np.float64) / n
    return np.where(v < 0.5, v, v - 1.0).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _dense_dft128(inverse: bool):
    """Dense 128-point DFT matrix (re, im) f32: A[k, n] = W_128^{+-kn}.
    The 128-factor of the four-step split — one MXU matmul per block via
    `_apply_intra_group(axis=0)` (same b3 3-pass bf16 dots)."""
    k = np.arange(128)[:, None]
    n = np.arange(128)[None, :]
    sign = +2.0 if inverse else -2.0
    a = np.exp(sign * 1j * np.pi * (k * n % 128) / 128.0)
    return a.real.astype(np.float32), a.imag.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _fourstep_twiddle(h: int, inverse: bool):
    """Per-sublane twiddle vector (re, im) of shape (h, 1):
    tw[k1*128 + n2] = W_H^{+-k1*n2} — the cross-factor twiddle of the
    four-step split (it depends only on the sublane index, so it is one
    broadcast complex multiply in the kernel)."""
    m = h // 128
    p = np.arange(h)
    k1 = p // 128
    n2 = p % 128
    sign = +2.0 if inverse else -2.0
    w = np.exp(sign * 1j * np.pi * ((k1 * n2) % h) / float(h))
    return (w.real.astype(np.float32)[:, None],
            w.imag.astype(np.float32)[:, None])


@functools.lru_cache(maxsize=16)
def _combine_weights(m: int, inverse: bool):
    """The m-point DFT scalars W_m^{+-k1*n1} as python float pairs,
    embedded in the unrolled kernel combine (no refs: m^2 <= 256
    complex constants)."""
    sign = +2.0 if inverse else -2.0
    out = {}
    for k1 in range(m):
        for n1 in range(m):
            w = np.exp(sign * 1j * np.pi * ((k1 * n1) % m) / float(m))
            out[(k1, n1)] = (float(w.real), float(w.imag))
    return out


def _block_dft_combine(re, im, m: int, inverse: bool):
    """Cross-block m-point DFT on a (m*128, L) VMEM block: out block k1 =
    sum_n1 W_m^{+-k1 n1} * in block n1.  Unrolled complex scalar FMAs on
    128-row slices; exact-zero/one weights skip their multiplies."""
    ws = _combine_weights(m, inverse)
    blocks = [(re[n1 * 128:(n1 + 1) * 128], im[n1 * 128:(n1 + 1) * 128])
              for n1 in range(m)]
    outs_r, outs_i = [], []
    for k1 in range(m):
        acc_r = None
        acc_i = None
        for n1 in range(m):
            wr, wi = ws[(k1, n1)]
            xr, xi = blocks[n1]
            if abs(wi) < 1e-30:
                tr = xr if wr == 1.0 else (-xr if wr == -1.0 else xr * wr)
                ti = xi if wr == 1.0 else (-xi if wr == -1.0 else xi * wr)
            elif abs(wr) < 1e-30:
                tr = -xi * wi
                ti = xr * wi
            else:
                tr = xr * wr - xi * wi
                ti = xr * wi + xi * wr
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        outs_r.append(acc_r)
        outs_i.append(acc_i)
    return jnp.concatenate(outs_r, axis=0), jnp.concatenate(outs_i, axis=0)


def _fourstep_col(re, im, h: int, inverse: bool, twr_ref, twi_ref,
                  dft_r, dft_i):
    """Full four-step column transform on a (h, L) VMEM block.
    Forward: combine -> twiddle -> per-block dense DFT-128 (natural in,
    fourstep out).  Inverse: per-block inverse DFT-128 -> conj twiddle ->
    conj combine (fourstep in, natural out, unnormalized)."""
    m = h // 128
    tr = twr_ref[:]
    ti = twi_ref[:]
    if not inverse:
        re, im = _block_dft_combine(re, im, m, False)
        re, im = re * tr - im * ti, re * ti + im * tr
        return _apply_intra_group(re, im, dft_r, dft_i, 0)
    re, im = _apply_intra_group(re, im, dft_r, dft_i, 0)
    re, im = re * tr - im * ti, re * ti + im * tr
    return _block_dft_combine(re, im, m, True)


def _mask_params(cfg):
    """Static per-plane radial-profile parameters (kind, lo, hi,
    amplified) — from the single shared source of truth
    (`pyramid.filters.radial_level_params`); only the in-kernel
    evaluation below (polynomial cos) is Mosaic-specific."""
    from pbmm_tpu.pyramid.filters import radial_level_params

    return radial_level_params(
        cfg.pyramid_levels, cfg.min_frequency, cfg.max_frequency
    )


@functools.lru_cache(maxsize=1)
def _cos_poly_coeffs():
    """Even-power polynomial coefficients approximating cos on [-pi, pi]
    to ~1e-8 absolute (Chebyshev fit, f64 -> f32): the VPU's hardware cos
    costs ~10x a multiply-add chain, and the raised-cosine band masks are
    evaluated three times per bin per frame."""
    xs = np.linspace(-np.pi, np.pi, 20001)
    deg = 16
    c = np.polynomial.chebyshev.Chebyshev.fit(xs, np.cos(xs), deg)
    p = c.convert(kind=np.polynomial.Polynomial)
    coef = p.coef.astype(np.float64)
    even = coef[0::2]  # odd powers vanish by symmetry of the fit
    return tuple(float(v) for v in even)


def _cos_pi(u):
    """cos(u) for u in [-pi, pi] via the even Horner polynomial."""
    cs = _cos_poly_coeffs()
    v = u * u
    acc = jnp.float32(cs[-1])
    for c in cs[-2::-1]:
        acc = acc * v + jnp.float32(c)
    return acc


@functools.lru_cache(maxsize=1)
def _atan_poly_coeffs():
    """Odd polynomial atan(t) = t * P(t^2) on [-1, 1], ~1e-9 absolute
    (Chebyshev fit): Mosaic has no atan2 lowering, so the standard-mode
    phase delta is evaluated with this + quadrant selects.

    The fit domain MUST be the symmetric [-1, 1]: only there is atan odd
    so the even power-series coefficients genuinely vanish (a [0, 1] fit
    has nonzero even terms, and dropping them corrupts the value — the
    r3 probe caught exactly that: 1.2 rad error at t ~ 1)."""
    ts = np.linspace(-1.0, 1.0, 40001)
    deg = 21
    c = np.polynomial.chebyshev.Chebyshev.fit(ts, np.arctan(ts), deg)
    p = c.convert(kind=np.polynomial.Polynomial)
    coef = p.coef.astype(np.float64)
    odd = coef[1::2]  # even powers vanish (odd function, symmetric fit)
    return tuple(float(v) for v in odd)


def _atan2_poly(y, x):
    """atan2(y, x) via the odd polynomial + quadrant logic (VPU-only).
    (0, 0) returns 0 (the gated-bin convention, like `_unit_rotation`)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    # The guard constant must be a NORMAL f32: 1e-38 is subnormal and
    # flushes to zero under the TPU/XLA FTZ regime, turning the exact
    # (0, 0) input (e.g. the zero-previous-spectrum bootstrap frame) into
    # 0/0 = NaN that then contaminates the IIR low-pass taps.  1e-37 is
    # normal; bins with 0 < |z| < 1e-37 are ~1e37x below the magnitude
    # gate and pass through regardless.
    t = mn / jnp.maximum(mx, jnp.float32(1e-37))
    v = t * t
    cs = _atan_poly_coeffs()
    acc = jnp.float32(cs[-1])
    for c in cs[-2::-1]:
        acc = acc * v + jnp.float32(c)
    a = t * acc
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


@functools.lru_cache(maxsize=1)
def _sin_poly_coeffs():
    """Odd polynomial sin(u) = u * Q(u^2) on [-pi, pi], ~1e-8 absolute."""
    xs = np.linspace(-np.pi, np.pi, 20001)
    deg = 17
    c = np.polynomial.chebyshev.Chebyshev.fit(xs, np.sin(xs), deg)
    p = c.convert(kind=np.polynomial.Polynomial)
    coef = p.coef.astype(np.float64)
    odd = coef[1::2]
    return tuple(float(v) for v in odd)


def _sin_pi(u):
    """sin(u) for u in [-pi, pi]."""
    cs = _sin_poly_coeffs()
    v = u * u
    acc = jnp.float32(cs[-1])
    for c in cs[-2::-1]:
        acc = acc * v + jnp.float32(c)
    return u * acc


_TWO_PI = float(2.0 * np.pi)


def _sincos_any(theta):
    """(cos, sin) of an arbitrary-magnitude angle: range-reduce to
    [-pi, pi] (theta can reach phase_scale * pi * w_max in standard
    mode), then the polynomial pair."""
    r = theta - _TWO_PI * jnp.round(theta * jnp.float32(1.0 / _TWO_PI))
    return _cos_pi(r), _sin_pi(r)


def _pow_static(x, p: float):
    """x**p for non-negative x with a STATIC exponent: unrolled squaring
    for small integers, exp(p*log(x)) otherwise (both Mosaic-legal)."""
    p = float(p)
    if p.is_integer() and 0 <= p <= 16:
        n = int(p)
        acc = None
        base = x
        while n > 0:
            if n & 1:
                acc = base if acc is None else acc * base
            base = base * base
            n >>= 1
        return acc if acc is not None else jnp.ones_like(x)
    return jnp.exp(jnp.float32(p) * jnp.log(jnp.maximum(x, 1e-38)))


def _standard_weight_block(freq, cfg):
    """The standard mode's radial phase-delta weight w(f), evaluated
    procedurally on a VMEM block — exact math of
    `calculate_spatial_frequency` + `calculate_bandpass_weight`
    (`PhaseDifferenceComputeShader.compute:74-122`), with pow as
    integer-unroll/exp-log and sin via the [-pi, pi] polynomial
    (sin(pi t) == cos(pi (t - 1/2)) keeps the argument in range)."""
    f = jnp.minimum(freq * jnp.float32(1.0 / 0.707), 1.0)
    if not cfg.apply_bandpass:
        return jnp.ones_like(f)
    lo = max(float(cfg.low_freq_cutoff), 1e-3)
    hi_div = max(1.0 - float(cfg.high_freq_cutoff), 1e-3)
    steep = float(cfg.filter_steepness)
    w = jnp.ones_like(f)
    w = jnp.where(f < cfg.low_freq_cutoff,
                  _pow_static(f * jnp.float32(1.0 / lo), steep), w)
    w = jnp.where(f > cfg.high_freq_cutoff,
                  _pow_static((1.0 - f) * jnp.float32(1.0 / hi_div), steep),
                  w)
    w = w * jnp.float32(cfg.motion_sensitivity)
    edge = float(cfg.edge_enhancement) if cfg.enhance_edges else 0.0
    if edge:
        t = (f - cfg.low_freq_cutoff) / (
            cfg.high_freq_cutoff - cfg.low_freq_cutoff
        )
        mid = (f > cfg.low_freq_cutoff) & (f < cfg.high_freq_cutoff)
        # sin(pi t) = cos(pi (t - 0.5)); mid-band t in (0, 1).
        s = _cos_pi(jnp.float32(np.pi) * (jnp.clip(t, 0.0, 1.0) - 0.5))
        w = jnp.where(mid, w * (1.0 + jnp.float32(edge) * s), w)
    return jnp.maximum(w, 0.0)


def _phase_block_standard(cr, ci, pr, pi_, fy_col, fx_row, cfg,
                          w_plane=None):
    """Standard-mode whole-spectrum amplification on one VMEM block
    (`ProcessPhaseDifference`, `PhaseDifferenceComputeShader.compute:
    124-179`): delta = atan2 of prev*conj(cur), rotated by
    delta * w(f) * phase_scale — transcendentals via the polynomial
    atan2/sincos (Mosaic has no native lowering for them).  `w_plane`:
    optional host-precomputed w(f) (the grouped-stream static plane)."""
    if w_plane is not None:
        w = w_plane
    else:
        freq = jnp.sqrt(fy_col * fy_col + fx_row * fx_row)
        w = _standard_weight_block(freq, cfg)
    tau2 = jnp.float32(cfg.magnitude_threshold) ** 2
    gate_pass = ((cr * cr + ci * ci) < tau2) | ((pr * pr + pi_ * pi_) < tau2)

    r_re = pr * cr + pi_ * ci  # prev * conj(cur)
    r_im = pi_ * cr - pr * ci
    delta = _atan2_poly(r_im, r_re)
    rot_re, rot_im = _sincos_any(
        delta * w * jnp.float32(cfg.phase_scale)
    )
    out_re = cr * rot_re - ci * rot_im
    out_im = cr * rot_im + ci * rot_re
    return (jnp.where(gate_pass, cr, out_re),
            jnp.where(gate_pass, ci, out_im))


def _disjoint_bands(params):
    """If every amplified plane is a raised-cosine band and the bands'
    interiors are pairwise disjoint (true for the geometric spacing
    whenever the ratio q = (max/min)^(1/(L-3)) >= 3 — e.g. the reference
    defaults L=5, 0.05/0.45 where q = 3 exactly, bands touching at their
    zero endpoints), return the (lo, hi) list sorted by lo; else None.

    Disjointness lets the kernel evaluate the amplified-band sum with ONE
    cos polynomial (select the active band's ramp coordinate, evaluate
    once) and ONE magnitude gate instead of one of each per band — the
    phase chain is the dominant compute in the fused phase/col-IFFT
    kernel (~0.07 ms of its 0.14 ms at 1080p, `benchmarks/kdecomp.py`).
    """
    bands = [(lo, hi) for kind, lo, hi, amp in params if amp]
    if not bands or any(kind != "band" for kind, _, _, amp in params if amp):
        return None
    bands.sort()
    for (lo1, hi1), (lo2, hi2) in zip(bands, bands[1:]):
        # Interior overlap disqualifies; touching endpoints are fine
        # (the raised cosine is 0 there).  The epsilon absorbs fp
        # rounding of the geometric band centers (q == 3 exactly makes
        # hi1 == lo2 up to ~1e-16): an overlap that small lives where
        # both masks are O((eps/width)^2) ~ 1e-12 — below f32 noise.
        if hi1 > lo2 + 1e-6 * (hi1 - lo1):
            return None
    return bands


def _eval_mask(kind, lo, hi, freq):
    if kind == "zero":
        return jnp.zeros_like(freq)
    if kind == "high":
        t = jnp.clip((freq - lo) / (hi - lo), 0.0, 1.0)
        ss = t * t * (3.0 - 2.0 * t)
        return jnp.where(freq > hi, 1.0, jnp.where(freq > lo, ss, 0.0))
    if kind == "low":
        t = jnp.clip((freq - lo) / (hi - lo), 0.0, 1.0)
        ss = 1.0 - t * t * (3.0 - 2.0 * t)
        return jnp.where(freq < lo, 1.0, jnp.where(freq < hi, ss, 0.0))
    # raised-cosine band; clip keeps the poly argument in [-pi, pi]
    # (out-of-band bins are zeroed by the select anyway)
    t = jnp.clip((freq - lo) / (hi - lo), 0.0, 1.0)
    band = 0.5 * (1.0 + _cos_pi(2.0 * jnp.pi * (t - 0.5)))
    return jnp.where((freq >= lo) & (freq <= hi), band, 0.0)


def _sector_weights(fy_col, fx_row, k_or: int):
    """The K partition-of-unity angular sector windows of the steerable
    extension, evaluated procedurally on a VMEM block (matches
    `pyramid.filters.angular_profiles_jnp` / the independent fp64 oracle
    `oracle/reference.py::steerable_mask_planes`):

        a_k = |cos(theta - pi k/K)|^(2(K-1)) / sum_k' |cos(...)|^(2(K-1))

    Trig-free evaluation (r4): cos^2(theta - phi) = (1 + cos(2theta)
    cos(2phi) + sin(2theta) sin(2phi)) / 2, and the double angle is
    ALGEBRAIC in the frequency pair — cos(2theta) = (fx^2 - fy^2)/r^2,
    sin(2theta) = 2 fx fy / r^2 — so no atan2/sincos polynomial runs at
    all; the even power is (c^2)^(K-1) square-and-multiply.  The
    normalizer is not just positive but CONSTANT: sum_k cos^{2m}(theta -
    pi k/K) for m = K-1 equals K * C(2m, m) / 4^m for every theta (the
    binomial expansion's only surviving harmonics cos(2j theta) with
    K | j have j <= m < K, i.e. j = 0), so the per-bin division
    disappears into a host-constant multiply.  At DC (r = 0) the
    convention theta = atan2(0,0) = 0 gives cos2t = 1, sin2t = 0."""
    from math import comb

    fy = jnp.broadcast_to(fy_col, (fy_col.shape[0], fx_row.shape[1]))
    fx = jnp.broadcast_to(fx_row, (fy_col.shape[0], fx_row.shape[1]))
    r2 = fx * fx + fy * fy
    inv_r2 = jnp.where(r2 > 0, 1.0 / jnp.maximum(r2, 1e-38), 0.0)
    cos2t = jnp.where(r2 > 0, (fx * fx - fy * fy) * inv_r2, 1.0)
    sin2t = 2.0 * fx * fy * inv_r2
    m = k_or - 1
    inv_norm = jnp.float32(4.0**m / (k_or * comb(2 * m, m)))
    out = []
    for k in range(k_or):
        phi2 = 2.0 * np.pi * k / k_or
        c2 = 0.5 * (1.0 + cos2t * jnp.float32(np.cos(phi2))
                    + sin2t * jnp.float32(np.sin(phi2)))
        # c2 = cos^2(theta - phi_k) >= 0 up to fp rounding; clamp the
        # tiny negatives so the odd-m power cannot flip sign.
        c2 = jnp.maximum(c2, 0.0)
        out.append(_pow_static(c2, m) * inv_norm)
    return out


def _iir_filter_delta(delta, lpf, lps, cfg):
    """One step of the streaming IIR band-pass on the delta plane
    (`phase/temporal.py::temporal_apply`, same recurrence):
    lp += r (delta - lp); band = lp_fast - lp_slow."""
    r_hi, r_lo = cfg.temporal.smoothing_factors()
    new_lpf = lpf + jnp.float32(r_hi) * (delta - lpf)
    new_lps = lps + jnp.float32(r_lo) * (delta - lps)
    return new_lpf - new_lps, new_lpf, new_lps


@functools.lru_cache(maxsize=8)
def _static_phase_planes(cfg, h: int, wk: int, full_w: int):
    """Host-precomputed per-bin planes for the chunk/phase kernels:
    pyramid mode with disjoint bands -> (total, m_amp); standard mode ->
    the one w(f) weight plane; None when the config needs the in-kernel
    evaluation (overlapping bands, or a non-pyramid/-standard mode).
    All planes are f32 (h, wk) in the working (bitrev or fourstep)
    kept-lane layout.

    Rationale (r4): in the GROUPED pair stream the planes' blocks are
    fetched once per lane-block per chunk (their index map ignores the
    frame axis), ~1 MB/frame amortized — so the per-bin radial profile
    evaluation (sqrt + smoothsteps + raised-cosine polynomial) leaves the
    kernel entirely.  The r1 'constant-free masks' decision predates the
    grouped layout, where reading planes per FRAME would have cost real
    HBM.  Values are f64-evaluated (the same formulas the oracle uses,
    `pyramid.filters.radial_level_params`) then cast — at least as
    accurate as the in-kernel polynomial path.  Steerable sector weights
    stay in-kernel (they are cheap since the trig-free rewrite and would
    need K planes)."""
    fy = col_freq_axis(h).astype(np.float64)[:, None]
    if full_w is not None and full_w != wk:
        fx = bitrev_freq_axis(full_w)[kept_lane_indices(full_w)]
    else:
        fx = bitrev_freq_axis(wk)
    fx = fx.astype(np.float64)[None, :]
    freq = np.sqrt(fy * fy + fx * fx)
    if cfg.mode == "standard":
        # The standard mode's radial phase-delta weight w(f) is config-
        # static per bin (`_standard_weight_block` math, f64): ONE plane.
        f = np.minimum(freq / 0.707, 1.0)
        if not cfg.apply_bandpass:
            w_pl = np.ones_like(f)  # no sensitivity scale, as in
            #                          `_standard_weight_block`
        else:
            lo = max(float(cfg.low_freq_cutoff), 1e-3)
            hi_div = max(1.0 - float(cfg.high_freq_cutoff), 1e-3)
            steep = float(cfg.filter_steepness)
            w_pl = np.ones_like(f)
            w_pl = np.where(f < cfg.low_freq_cutoff, (f / lo) ** steep,
                            w_pl)
            w_pl = np.where(f > cfg.high_freq_cutoff,
                            ((1.0 - f) / hi_div) ** steep, w_pl)
            w_pl = w_pl * float(cfg.motion_sensitivity)
            edge = (float(cfg.edge_enhancement) if cfg.enhance_edges
                    else 0.0)
            if edge:
                t = (f - cfg.low_freq_cutoff) / (
                    cfg.high_freq_cutoff - cfg.low_freq_cutoff)
                mid = (f > cfg.low_freq_cutoff) & (f < cfg.high_freq_cutoff)
                w_pl = np.where(
                    mid, w_pl * (1.0 + edge * np.sin(
                        np.pi * np.clip(t, 0.0, 1.0))), w_pl)
            w_pl = np.maximum(w_pl, 0.0)
        return (w_pl.astype(np.float32),)
    if cfg.mode != "pyramid":
        return None
    params = _mask_params(cfg)
    if _disjoint_bands(params) is None:
        return None

    def smoothstep(t):
        t = np.clip(t, 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    total = np.zeros_like(freq)
    m_amp = np.zeros_like(freq)
    for kind, lo, hi, amp in params:
        if kind == "zero":
            m = np.zeros_like(freq)
        elif kind == "high":
            m = np.where(freq > hi, 1.0,
                         np.where(freq > lo,
                                  smoothstep((freq - lo) / (hi - lo)), 0.0))
        elif kind == "low":
            m = np.where(freq < lo, 1.0,
                         np.where(freq < hi,
                                  1.0 - smoothstep((freq - lo) / (hi - lo)),
                                  0.0))
        else:
            t = (freq - lo) / (hi - lo)
            m = np.where((freq >= lo) & (freq <= hi),
                         0.5 * (1.0 + np.cos(2.0 * np.pi * (t - 0.5))), 0.0)
        total += m
        if amp:
            m_amp += m  # disjoint: at most one band nonzero per bin
    return total.astype(np.float32), m_amp.astype(np.float32)


def _phase_block(cr, ci, pr, pi_, fy_col, fx_row, cfg, lpf=None, lps=None,
                 static_planes=None):
    """The fused band/phase amplification on one VMEM block (re/im
    parts); dispatches to the standard-mode whole-spectrum pass when
    cfg.mode == "standard".

    Pyramid transcendental budget (they cost ~10x a mul-add on the VPU):
    ONE rsqrt for the unit rotation when phase_scale is a small integer
    (exact square-and-multiply), else the polynomial atan2 + sincos.
    Magnitude gates compare squares (|z|*m >= tau <=> |z|^2*m^2 >= tau^2,
    all factors non-negative) and the raised-cosine band profile uses the
    `_cos_pi` polynomial.

    lpf/lps: the streaming IIR low-pass carry planes when
    cfg.temporal.mode == "iir_bandpass" (the delta is then computed via
    polynomial atan2, band-passed in-kernel, and the rotation uses the
    filtered delta).  Returns (out_re, out_im) or, with IIR,
    (out_re, out_im, new_lpf, new_lps)."""
    iir = cfg.temporal.mode == "iir_bandpass"
    if cfg.mode == "standard" and not iir:
        return _phase_block_standard(
            cr, ci, pr, pi_, fy_col, fx_row, cfg,
            w_plane=(static_planes[0] if static_planes else None))

    r_re = pr * cr + pi_ * ci  # prev * conj(cur)
    r_im = pi_ * cr - pr * ci

    delta_override = None
    if iir:
        delta = _atan2_poly(r_im, r_re)
        delta_override, new_lpf, new_lps = _iir_filter_delta(
            delta, lpf, lps, cfg
        )

    if cfg.mode == "standard":
        if static_planes is not None:
            w = static_planes[0]
        else:
            freq = jnp.sqrt(fy_col * fy_col + fx_row * fx_row)
            w = _standard_weight_block(freq, cfg)
        tau2 = jnp.float32(cfg.magnitude_threshold) ** 2
        gate_pass = ((cr * cr + ci * ci) < tau2) | (
            (pr * pr + pi_ * pi_) < tau2
        )
        rot_re, rot_im = _sincos_any(
            delta_override * w * jnp.float32(cfg.phase_scale)
        )
        out_re = jnp.where(gate_pass, cr, cr * rot_re - ci * rot_im)
        out_im = jnp.where(gate_pass, ci, cr * rot_im + ci * rot_re)
        return out_re, out_im, new_lpf, new_lps

    min_mag2 = jnp.minimum(cr * cr + ci * ci, pr * pr + pi_ * pi_)
    tau2 = jnp.float32(cfg.magnitude_threshold) ** 2

    params = _mask_params(cfg)
    steer = cfg.orientations > 1 and cfg.pyramid_levels >= 3
    sect = (_sector_weights(fy_col, fx_row, cfg.orientations)
            if steer else None)
    bands = _disjoint_bands(params)
    if static_planes is not None:
        # Host-precomputed per-bin (total, m_amp) planes (grouped-stream
        # path): no radial profile evaluation in the kernel at all.
        total, m = static_planes
        if steer:
            amped = jnp.zeros_like(min_mag2)
            for a in sect:
                mk = m * a
                gate = min_mag2 * (mk * mk) >= tau2
                amped = amped + jnp.where(gate, mk, 0.0)
        else:
            gate = min_mag2 * (m * m) >= tau2
            amped = jnp.where(gate, m, 0.0)
    elif bands is not None:
        freq = jnp.sqrt(fy_col * fy_col + fx_row * fx_row)
        # Disjoint-band fast path: at most one amplified band is nonzero
        # per bin, so select its ramp coordinate and evaluate ONE cos
        # polynomial; `m` then equals the sum of all amplified masks.
        total = jnp.zeros_like(freq)
        for kind, lo, hi, amp in params:
            if not amp:
                total = total + _eval_mask(kind, lo, hi, freq)
        t_act = jnp.zeros_like(freq)
        in_any = None
        for lo, hi in bands:
            t = (freq - lo) / jnp.float32(hi - lo)
            sel = (t > 0.0) & (t < 1.0)
            t_act = jnp.where(sel, t, t_act)
            in_any = sel if in_any is None else (in_any | sel)
        band = 0.5 * (1.0 + _cos_pi(2.0 * jnp.pi * (t_act - 0.5)))
        m = jnp.where(in_any, band, 0.0)
        total = total + m
        if steer:
            amped = jnp.zeros_like(min_mag2)
            for a in sect:
                mk = m * a
                gate = min_mag2 * (mk * mk) >= tau2
                amped = amped + jnp.where(gate, mk, 0.0)
        else:
            gate = min_mag2 * (m * m) >= tau2
            amped = jnp.where(gate, m, 0.0)
    else:
        freq = jnp.sqrt(fy_col * fy_col + fx_row * fx_row)
        total = jnp.zeros_like(freq)
        amped = jnp.zeros_like(min_mag2)
        for kind, lo, hi, amp in params:
            m = _eval_mask(kind, lo, hi, freq)
            total = total + m
            if amp and steer:
                # Steerable: each mid band splits into K sector masks
                # m*a_k (partition of unity, so `total` — the all-planes
                # sum — is unchanged); the magnitude gate applies per
                # SECTOR mask, exactly as the per-plane oracle gates
                # each plane.
                for a in sect:
                    mk = m * a
                    gate = min_mag2 * (mk * mk) >= tau2
                    amped = amped + jnp.where(gate, mk, 0.0)
            elif amp:
                gate = min_mag2 * (m * m) >= tau2
                amped = amped + jnp.where(gate, m, 0.0)

    # rotation e^{i s delta}
    s = float(cfg.phase_scale)
    if delta_override is not None:
        rot_re, rot_im = _sincos_any(jnp.float32(s) * delta_override)
    elif s.is_integer() and 0 <= s <= 64:
        m2 = r_re * r_re + r_im * r_im
        inv = jnp.where(m2 > 0, jax.lax.rsqrt(jnp.maximum(m2, 1e-38)), 0.0)
        zr, zi = r_re * inv, r_im * inv
        n = int(s)
        rr, ri = jnp.ones_like(zr), jnp.zeros_like(zi)
        br, bi = zr, zi
        while n > 0:
            if n & 1:
                rr, ri = rr * br - ri * bi, rr * bi + ri * br
            br, bi = br * br - bi * bi, 2.0 * br * bi
            n >>= 1
        rot_re, rot_im = rr, ri
    else:
        # Non-integer scale: polynomial atan2 + range-reduced sincos
        # (jnp.arctan2 has no Mosaic lowering).
        delta = _atan2_poly(r_im, r_re)
        rot_re, rot_im = _sincos_any(jnp.float32(s) * delta)

    p = total - amped
    g_re = p + amped * rot_re
    g_im = amped * rot_im
    out_re = cr * g_re - ci * g_im
    out_im = cr * g_im + ci * g_re
    if iir:
        return out_re, out_im, new_lpf, new_lps
    return out_re, out_im


@functools.partial(jax.jit,
                   static_argnames=("cfg", "out_rows", "full_w", "pair_offset",
                                    "interpret"))
def phase_col_ifft(cur_re, cur_im, prev_re, prev_im, cfg,
                   out_rows=None, full_w=None, fx_values=None,
                   lp_fast=None, lp_slow=None, pair_offset: int = 0,
                   interpret: bool = False):
    """(B, H, W) bitrev spectra pair -> column-axis IFFT of the
    phase-amplified spectrum (one kernel).

    out_rows: optional static (r0, r1) — write back only those *spatial*
    rows of the inverse transform (the crop+blur-halo cover); rows the
    crop discards are computed in VMEM but never touch HBM.

    full_w: when the spectra are in the Hermitian-half kept-lane layout
    (`spectral/hermitian.py`), the true padded width; the per-lane
    frequency values are relabeled to the kept bins (zero runtime cost —
    the kernel is unchanged, only the fx constant differs).

    fx_values: optional TRACED (W,) f32 array of per-lane frequency
    values, overriding the host-derived constant — the spatially-sharded
    engine passes its shard's global-bin slice (which depends on
    `axis_index` inside shard_map and so cannot be a host constant).

    pair_offset: when > 0, the batched scan-free engine's layout:
    cur_re/cur_im hold (B + pair_offset, H, W) planes for a whole chunk
    (plane 0..offset-1 = the carried previous frame's spectrum, then one
    frame per `pair_offset` planes) and prev_re/prev_im must be None.
    Grid step i amplifies plane i+offset against plane i — the SAME
    arrays serve as both operands through shifted index maps, so the
    frame-pair stream costs zero extra copies."""
    paired = pair_offset > 0
    if paired:
        assert prev_re is None and prev_im is None
        bt, h, w = cur_re.shape
        b = bt - pair_offset
    else:
        b, h, w = cur_re.shape
    r0, r1 = out_rows if out_rows is not None else (0, h)
    twr_np, twi_np = _dif_twiddles(h, True)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(h, True)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]
    fy = jnp.asarray(bitrev_freq_axis(h))[:, None]  # (H, 1)
    if fx_values is not None:
        fx = jnp.asarray(fx_values, jnp.float32)[None, :]
    elif full_w is not None and full_w != w:
        fx_np = bitrev_freq_axis(full_w)[kept_lane_indices(full_w)]
        fx = jnp.asarray(fx_np)[None, :]  # (1, W)
    else:
        fx = jnp.asarray(bitrev_freq_axis(w))[None, :]

    block_w = min(_LANE_BLOCK, w)
    grid = (b, pl.cdiv(w, block_w))
    spec = pl.BlockSpec((1, h, block_w), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    fy_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    fx_spec = pl.BlockSpec((1, block_w), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, r1 - r0, block_w), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    iir = cfg.temporal.mode == "iir_bandpass"
    if iir and (lp_fast is None or lp_slow is None):
        raise ValueError("iir_bandpass needs lp_fast/lp_slow carry planes")
    if paired and iir:
        raise ValueError("pair_offset layout is two-frame only (the IIR "
                         "carry is sequential)")
    cur_spec = spec
    if paired:
        # Same arrays, shifted index maps: grid step i reads plane
        # i+offset as "cur" and plane i as "prev".
        cur_spec = pl.BlockSpec(
            (1, h, block_w), lambda i, j: (i + pair_offset, 0, j),
            memory_space=pltpu.VMEM,
        )
        prev_re, prev_im = cur_re, cur_im

    # Host-precomputed per-bin planes for numeric CONSISTENCY with the
    # grouped/whole-chunk kernels (advisor r4): the same config now yields
    # fp-identical per-bin weights regardless of whether the chunk length
    # routed it through the grouped stream or this per-frame kernel.
    # Skipped when the caller overrides fx (sharded engine: the shard's
    # bins are runtime values, so host planes cannot apply).
    planes_np = (_static_phase_planes(cfg, h, w, full_w)
                 if fx_values is None else None)
    n_pl = len(planes_np) if planes_np is not None else 0
    pl_spec = pl.BlockSpec((h, block_w), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)

    def kernel(*refs):
        if iir:
            (cr_ref, ci_ref, pr_ref, pi_ref, lpf_ref, lps_ref) = refs[:6]
            pls = refs[6:6 + n_pl]
            (fy_ref, fx_ref, twr_ref, twi_ref, gr_ref, gi_ref,
             ore, oim, olpf, olps) = refs[6 + n_pl:]
            mr, mi, nlpf, nlps = _phase_block(
                cr_ref[0], ci_ref[0], pr_ref[0], pi_ref[0],
                fy_ref[:], fx_ref[:], cfg,
                lpf=lpf_ref[0], lps=lps_ref[0],
                static_planes=(tuple(p[...] for p in pls) if n_pl
                               else None),
            )
            olpf[0] = nlpf
            olps[0] = nlps
        else:
            (cr_ref, ci_ref, pr_ref, pi_ref) = refs[:4]
            pls = refs[4:4 + n_pl]
            (fy_ref, fx_ref, twr_ref, twi_ref, gr_ref, gi_ref,
             ore, oim) = refs[4 + n_pl:]
            mr, mi = _phase_block(
                cr_ref[0], ci_ref[0], pr_ref[0], pi_ref[0],
                fy_ref[:], fx_ref[:], cfg,
                static_planes=(tuple(p[...] for p in pls) if n_pl
                               else None),
            )
        rr, ii = _fft_stages(mr, mi, h, 0, True, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]))
        ore[0] = rr[r0:r1]
        oim[0] = ii[r0:r1]

    in_specs = [cur_spec, cur_spec, spec, spec]
    inputs = [cur_re, cur_im, prev_re, prev_im]
    out_specs = [out_spec, out_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, r1 - r0, w), jnp.float32),
        jax.ShapeDtypeStruct((b, r1 - r0, w), jnp.float32),
    ]
    if iir:
        in_specs += [spec, spec]
        inputs += [lp_fast, lp_slow]
        out_specs += [spec, spec]  # full-height carry planes
        out_shape += [
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ]
    if n_pl:
        in_specs += [pl_spec] * n_pl
        inputs += [jnp.asarray(pp) for pp in planes_np]
    in_specs += [fy_spec, fx_spec, tw_spec, tw_spec, gm_spec, gm_spec]
    inputs += [fy, fx, twr, twi, gr, gi]

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return res  # (re, im) or (re, im, new_lp_fast, new_lp_slow)


def _rebuild_kept_lanes(xr, xi, j_ref, plan):
    """Kept-lane (Hb, Wk) -> full (Hb, fw) via the static plan.
    Consecutive verbatim-copy tiles merge into single big slices; only
    the conj-reversed tiles go through the J matmul (a permutation
    matrix: exact at any precision that keeps f32 values intact)."""
    jm = j_ref[...].astype(jnp.bfloat16)  # 0/1: exact in bf16
    raw = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )

    def dot(x, _jm):
        # x @ J in 3 one-pass bf16 dots (vs HIGHEST's 6): x = h1 +
        # h2 + h3 with each h_k = bf16 of the running residual
        # (8+8+8 bits covers the f32 mantissa), and J's 0/1 entries
        # make every product and the accumulation exact — each
        # output lane is a single x value.  Exactness bound: the
        # third residual flushes when |x| drops below bf16's normal
        # range (~1e-38), leaving an absolute error ~1e-38 there —
        # vacuous for real spectra (advisor r3).
        h1 = x.astype(jnp.bfloat16)
        r1 = x - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
        return raw(h1, _jm) + raw(h2, _jm) + raw(h3, _jm)

    outs_r, outs_i = [], []
    i = 0
    while i < len(plan):
        kp, rev = plan[i]
        if not rev:
            j = i
            while (j + 1 < len(plan) and not plan[j + 1][1]
                   and plan[j + 1][0] == plan[j][0] + 1):
                j += 1
            lo, hi = plan[i][0] * 128, (plan[j][0] + 1) * 128
            outs_r.append(xr[:, lo:hi])
            outs_i.append(xi[:, lo:hi])
            i = j + 1
        else:
            tr = xr[:, kp * 128:(kp + 1) * 128]
            ti = xi[:, kp * 128:(kp + 1) * 128]
            outs_r.append(dot(tr, jm))
            outs_i.append(-dot(ti, jm))
            i += 1
    return (jnp.concatenate(outs_r, axis=1),
            jnp.concatenate(outs_i, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("magnitude", "pad_h", "full_w",
                                    "interpret"))
def row_ifft_magnitude(re, im, magnitude: bool = True, pad_h: int = 0,
                       full_w=None, interpret: bool = False):
    """(B, Hb, W) -> row-axis IFFT, normalized by 1/(pad_h*W), reduced to
    |z| (or Re z) — only one real plane is written back.  Hb may be a
    row-windowed subset of the padded height; `pad_h` (default Hb) is the
    true transform height for the normalization.

    full_w: when the input is in the Hermitian-half kept-lane layout
    (W = kept width), the true padded width.  The kernel rebuilds the
    missing lane tiles in VMEM — each is conj(lane-reversal(a kept
    tile)); the 128-lane reversal is one MXU matmul with the
    anti-identity J (exact: a 0/1 matrix at HIGHEST precision) — then
    runs the full-width transform.  Output is full width (the crop needs
    all columns); only the input halves."""
    b, h, w = re.shape
    fw = full_w if (full_w is not None and full_w != w) else w
    twr_np, twi_np = _dif_twiddles(fw, True)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    gr_np, gi_np = _intra_group_matrix(fw, True)
    gr, gi = jnp.asarray(gr_np), jnp.asarray(gi_np)
    stages = twr_np.shape[0]
    scale = 1.0 / ((pad_h or h) * fw)
    plan = reconstruction_plan(fw) if fw != w else None
    jmat = jnp.asarray(reversal_matrix()) if fw != w else None

    block_h = min(_ROW_BLOCK, h)
    grid = (b, pl.cdiv(h, block_h))
    spec = pl.BlockSpec((1, block_h, w), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_h, fw), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((stages, fw), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    def kernel(*refs):
        if plan is not None:
            re_ref, im_ref, j_ref, twr_ref, twi_ref, gr_ref, gi_ref, \
                out_ref = refs
            xr, xi = _rebuild_kept_lanes(re_ref[0], im_ref[0], j_ref, plan)
        else:
            re_ref, im_ref, twr_ref, twi_ref, gr_ref, gi_ref, out_ref = refs
            xr, xi = re_ref[0], im_ref[0]
        rr, ii = _fft_stages(xr, xi, fw, 1, True, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]))
        if magnitude:
            out_ref[0] = jnp.sqrt(rr * rr + ii * ii) * scale
        else:
            out_ref[0] = rr * scale

    in_specs = [spec, spec]
    inputs = [re, im]
    if plan is not None:
        in_specs.append(gm_spec)
        inputs.append(jmat)
    in_specs += [tw_spec, tw_spec, gm_spec, gm_spec]
    inputs += [twr, twi, gr, gi]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, fw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "pad_h", "row0", "out_rows",
                                    "full_w", "planes", "interpret"))
def colspec_chunk(rows_re, rows_im, prev_re, prev_im, cfg,
                  pad_h: int, row0: int, lp_fast=None, lp_slow=None,
                  out_rows=None, full_w=None, planes: int = 1,
                  interpret: bool = False):
    """Merged column-FFT + band/phase + column-IFFT, spectrum-resident
    (r5): the whole chunk's column stages run in ONE kernel with the
    frame axis as the INNER grid dim and the previous frame's column
    spectrum carried in VMEM scratch — the 2D spectrum NEVER exists in
    HBM.  Replaces the r4 k2 (`col_fft_zero_padded`) + k3
    (grouped / IIR-chunk / scalar-prefetch phase kernels, since pruned) in
    the batched engines: per frame the old pair wrote 2 spectrum planes and re-read
    ~1.25 (grouped) to 4 (IIR scan) of them (~30-65 MB/frame at 1080p);
    here the kernel reads only k1's content-row spectra and writes only
    the row-windowed inverse — the same two VMEM column sweeps per frame
    (fwd for cur, inv for the result), zero spectrum HBM traffic.

    Covers the full first-class matrix: two-frame AND streaming IIR
    (lp planes ride VMEM scratch across the frame axis),
    y_only AND chroma="rgb" (`planes=3`: the plane axis is the OUTER
    grid dim, so each plane's frame series gets its own scratch carry —
    the per-plane "scratch banks" of the r4 verdict).

    Replaces, at the byte level, the reference's FFT columns pass +
    per-bin phase pass + IFFT columns pass
    (`FFT.compute:235-276` ButterflyByCol,
    `PyramidPhaseDifference.compute:58-101`,
    `MotionMagnificationProcessor.cs:536-604`) — sequenced per frame
    through GPU textures there, fused per lane block here.

    Args:
      rows_re/rows_im: (T*planes, Hc, Wk) k1 output — row-FFT of the
        windowed content rows (plane-minor frame-major for rgb).
      prev_re/prev_im: (planes, Hp, Wk) carried previous-frame 2D
        spectrum (chunk boundary state, same contract as `VideoState`).
      pad_h/row0: zero-embed geometry of the content slab.
      lp_fast/lp_slow: (planes, Hp, Wk) IIR low-pass carries
        (iir_bandpass mode only).
    Returns (rre, rim, new_prev_re, new_prev_im[, new_lpf, new_lps]):
      rre/rim (T*planes, r1-r0, Wk) column-IFFT of the amplified
      spectrum; new_prev the last frame's spectrum planes; new_lp the
      final IIR taps.
    """
    n, hc, w = rows_re.shape
    c = planes
    t = n // c
    assert n == t * c
    h = pad_h
    r0, r1 = out_rows if out_rows is not None else (0, h)
    iir = cfg.temporal.mode == "iir_bandpass"
    if iir and (lp_fast is None or lp_slow is None):
        raise ValueError("iir_bandpass needs lp_fast/lp_slow carry planes")

    pow2_h = _is_pow2(h)
    if pow2_h:
        ftwr_np, ftwi_np = _dif_twiddles(h, False)
        itwr_np, itwi_np = _dif_twiddles(h, True)
        fgr_np, fgi_np = _intra_group_matrix(h, False)
        igr_np, igi_np = _intra_group_matrix(h, True)
        stages = ftwr_np.shape[0]
    else:
        # Tight height H = m*128: four-step column transform (natural ->
        # fourstep layout -> natural; see `_fourstep_col`).
        ftwr_np, ftwi_np = _fourstep_twiddle(h, False)
        itwr_np, itwi_np = _fourstep_twiddle(h, True)
        fgr_np, fgi_np = _dense_dft128(False)
        igr_np, igi_np = _dense_dft128(True)
    fy = jnp.asarray(col_freq_axis(h))[:, None]
    if full_w is not None and full_w != w:
        fx_np = bitrev_freq_axis(full_w)[kept_lane_indices(full_w)]
        fx = jnp.asarray(fx_np)[None, :]
    else:
        fx = jnp.asarray(bitrev_freq_axis(w))[None, :]

    block_w = min(_LANE_BLOCK, w)
    # Plane OUTER (per-plane scratch series), lane block MIDDLE (static
    # planes fetched once per lane block), frame INNER (sequential:
    # the scratch carries prev spectrum + lp taps across it).
    grid = (c, pl.cdiv(w, block_w), t)

    rows_spec = pl.BlockSpec((1, hc, block_w),
                             lambda ci, j, i: (i * c + ci, 0, j),
                             memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, h, block_w), lambda ci, j, i: (ci, 0, j),
                              memory_space=pltpu.VMEM)
    fy_spec = pl.BlockSpec((h, 1), lambda ci, j, i: (0, 0),
                           memory_space=pltpu.VMEM)
    fx_spec = pl.BlockSpec((1, block_w), lambda ci, j, i: (0, j),
                           memory_space=pltpu.VMEM)
    if pow2_h:
        tw_spec = pl.BlockSpec((stages, h), lambda ci, j, i: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        tw_spec = pl.BlockSpec((h, 1), lambda ci, j, i: (0, 0),
                               memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda ci, j, i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, r1 - r0, block_w),
                            lambda ci, j, i: (i * c + ci, 0, j),
                            memory_space=pltpu.VMEM)

    planes_np = _static_phase_planes(cfg, h, w, full_w)
    n_pl = len(planes_np) if planes_np is not None else 0
    pl_spec = pl.BlockSpec((h, block_w), lambda ci, j, i: (0, j),
                           memory_space=pltpu.VMEM)

    def embed(x):
        parts = []
        if row0 > 0:
            parts.append(jnp.zeros((row0, x.shape[1]), jnp.float32))
        parts.append(x)
        if row0 + hc < h:
            parts.append(jnp.zeros((h - row0 - hc, x.shape[1]),
                                   jnp.float32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x

    n_state_in = 4 if iir else 2

    def kernel(*refs):
        rr_ref, ri_ref = refs[:2]
        state_refs = refs[2:2 + n_state_in]
        pls = refs[2 + n_state_in:2 + n_state_in + n_pl]
        (fy_ref, fx_ref, ftwr_ref, ftwi_ref, itwr_ref, itwi_ref,
         fgr_ref, fgi_ref, igr_ref, igi_ref) = \
            refs[2 + n_state_in + n_pl:12 + n_state_in + n_pl]
        outs = refs[12 + n_state_in + n_pl:]
        if iir:
            ore, oim, opr, opi, olpf, olps = outs[:6]
            spr, spi, slpf, slps = outs[6:]
        else:
            ore, oim, opr, opi = outs[:4]
            spr, spi = outs[4:]
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            spr[...] = state_refs[0][0]
            spi[...] = state_refs[1][0]
            if iir:
                slpf[...] = state_refs[2][0]
                slps[...] = state_refs[3][0]

        # Forward column FFT of the current frame (zero-embedded content
        # slab) — for pow-2 heights a bit-identical op sequence to
        # `col_fft_zero_padded`; for tight heights the four-step split.
        if pow2_h:
            cr, ci_ = _fft_stages(embed(rr_ref[0]), embed(ri_ref[0]), h, 0,
                                  False, ftwr_ref, ftwi_ref,
                                  gm=(fgr_ref[...], fgi_ref[...]))
        else:
            cr, ci_ = _fourstep_col(embed(rr_ref[0]), embed(ri_ref[0]), h,
                                    False, ftwr_ref, ftwi_ref,
                                    fgr_ref[...], fgi_ref[...])

        static_planes = (tuple(p[...] for p in pls) if n_pl else None)
        if iir:
            mr, mi, nlpf, nlps = _phase_block(
                cr, ci_, spr[...], spi[...], fy_ref[:], fx_ref[:], cfg,
                lpf=slpf[...], lps=slps[...], static_planes=static_planes,
            )
            slpf[...] = nlpf
            slps[...] = nlps
            olpf[0] = nlpf  # revisited block: final write wins
            olps[0] = nlps
        else:
            mr, mi = _phase_block(
                cr, ci_, spr[...], spi[...], fy_ref[:], fx_ref[:], cfg,
                static_planes=static_planes,
            )
        spr[...] = cr
        spi[...] = ci_
        opr[0] = cr  # revisited block: the chunk's last spectrum leaves
        opi[0] = ci_
        if pow2_h:
            rr, ii = _fft_stages(mr, mi, h, 0, True, itwr_ref, itwi_ref,
                                 gm=(igr_ref[...], igi_ref[...]))
        else:
            rr, ii = _fourstep_col(mr, mi, h, True, itwr_ref, itwi_ref,
                                   igr_ref[...], igi_ref[...])
        ore[0] = rr[r0:r1]
        oim[0] = ii[r0:r1]

    state_inputs = [prev_re, prev_im] + ([lp_fast, lp_slow] if iir else [])
    plane_inputs = ([jnp.asarray(pp) for pp in planes_np]
                    if planes_np is not None else [])
    in_specs = ([rows_spec, rows_spec]
                + [state_spec] * n_state_in
                + [pl_spec] * n_pl
                + [fy_spec, fx_spec, tw_spec, tw_spec, tw_spec, tw_spec,
                   gm_spec, gm_spec, gm_spec, gm_spec])
    inputs = ([rows_re, rows_im] + state_inputs + plane_inputs
              + [fy, fx, jnp.asarray(ftwr_np), jnp.asarray(ftwi_np),
                 jnp.asarray(itwr_np), jnp.asarray(itwi_np),
                 jnp.asarray(fgr_np), jnp.asarray(fgi_np),
                 jnp.asarray(igr_np), jnp.asarray(igi_np)])
    out_specs = [out_spec, out_spec, state_spec, state_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, r1 - r0, w), jnp.float32),
        jax.ShapeDtypeStruct((n, r1 - r0, w), jnp.float32),
        jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        jax.ShapeDtypeStruct((c, h, w), jnp.float32),
    ]
    if iir:
        out_specs += [state_spec, state_spec]
        out_shape += [
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        ]
    scratch = [pltpu.VMEM((h, block_w), jnp.float32)] * (4 if iir else 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)


def make_row_ifft_block(wk: int, full_w: int, pad_h: int,
                        magnitude: bool = True):
    """Factory for embedding the row-axis IFFT (+Hermitian rebuild, +|z|)
    inside ANOTHER Pallas kernel's body (the r4 row-IFFT/post fusion,
    `engine.post_pallas.rowifft_post_fused`).

    Returns (transform, extra_inputs, extra_specs):
      transform(re_block, im_block, extra_refs) -> real (rows, full_w)
        block — the same math as `row_ifft_magnitude`'s kernel body;
      extra_inputs: host-constant arrays (J matrix when the input is the
        kept Hermitian-half layout, twiddle tables, group matrices) the
        caller appends to its pallas_call operands;
      extra_specs: matching grid-constant BlockSpecs for a 2D (i, j) grid.
    """
    fw = full_w
    twr_np, twi_np = _dif_twiddles(fw, True)
    gr_np, gi_np = _intra_group_matrix(fw, True)
    stages = twr_np.shape[0]
    scale = 1.0 / (pad_h * fw)
    plan = reconstruction_plan(fw) if fw != wk else None
    tw_spec = pl.BlockSpec((stages, fw), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    gm_spec = pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    extra_inputs = []
    extra_specs = []
    if plan is not None:
        extra_inputs.append(jnp.asarray(reversal_matrix()))
        extra_specs.append(gm_spec)
    extra_inputs += [jnp.asarray(twr_np), jnp.asarray(twi_np),
                     jnp.asarray(gr_np), jnp.asarray(gi_np)]
    extra_specs += [tw_spec, tw_spec, gm_spec, gm_spec]

    def transform(xr, xi, extra_refs):
        if plan is not None:
            j_ref, twr_ref, twi_ref, gr_ref, gi_ref = extra_refs
            xr, xi = _rebuild_kept_lanes(xr, xi, j_ref, plan)
        else:
            twr_ref, twi_ref, gr_ref, gi_ref = extra_refs
        rr, ii = _fft_stages(xr, xi, fw, 1, True, twr_ref, twi_ref,
                             gm=(gr_ref[...], gi_ref[...]))
        if magnitude:
            return jnp.sqrt(rr * rr + ii * ii) * scale
        return rr * scale

    return transform, extra_inputs, extra_specs


def fused_eligible(cfg) -> bool:
    """Whether the fully-fused spectral path serves this config (opt-in via
    `use_fused_spectral`).

    All first-class modes are served: pyramid (radial banks; integer
    phase scales via the exact trig-free rotation, non-integer via the
    polynomial atan2+sincos), the steerable angular extension
    (orientations > 1: per-band K-sector masks evaluated in-kernel via
    `_sector_weights`, r4), and standard (whole-spectrum weighted
    rotation, always polynomial), with either the two-frame temporal
    model or the streaming IIR band-pass (the low-pass taps ride the
    kernel as carry planes)."""
    return (
        cfg.use_fused_spectral
        and cfg.fft_backend == "pallas"
        and cfg.mode in ("pyramid", "standard")
        and cfg.temporal.mode in ("two_frame", "iir_bandpass")
        and not cfg.apply_magnitude_scale
    )
