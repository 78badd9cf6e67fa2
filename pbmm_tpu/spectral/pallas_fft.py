"""Pallas TPU radix-2 2D FFT — the hand-scheduled spectral core.

The TPU-shaped equivalent of the reference's FFT.compute pipeline
(`ButterflyByRow`/`ButterflyByCol` + bitrev passes,
`MotionMagnificationProcessor.cs:508-620`), but designed for the memory
hierarchy instead of translated:

- XLA's built-in FFT costs ~2 ms per 2048^2 c64 transform on v5e; each
  butterfly pass in HBM would round-trip 67 MB.  Here ALL log2(N) stages of
  one axis run fused in VMEM: one kernel reads a block, runs 11 stages on
  registers/VMEM, writes once — one HBM round trip per axis.
- **No bit-reversal permutation and no transposes.** The forward transform
  is decimation-in-frequency (natural order in -> bit-reversed order out);
  the inverse is decimation-in-time (bit-reversed in -> natural out), so
  the permutations cancel across the fwd -> phase-modify -> inv pipeline.
  The spectral bins sit at bit-reversed frequencies; the procedural
  mask/weight generators simply evaluate at those frequencies
  (`pyramid.filters.freq_axes_jnp(layout="bitrev2d")`) — an index
  relabeling with zero runtime cost.
- The row (lane-axis) kernel butterflies via lane rolls; the column
  (sublane-axis) kernel via sublane rolls.  Twiddle factors are tiny
  per-stage 1D vectors (log2(N) x N f32, ~90 KB at N=2048) precomputed on
  host — not the reference's N/2 twiddle buffer recomputed per transform
  (`FFT.compute:99-110`).

Complex data is carried as separate re/im f32 arrays (Mosaic has no
complex dtype); the (-1)^(x+y) centering chain disappears entirely.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side constants
# ---------------------------------------------------------------------------


def bit_reverse_permutation(n: int) -> np.ndarray:
    """Bit-reversed index table (the reference's `ComputeBitRevIndices`,
    `FFT.compute:79-96`) — used only for frequency relabeling, never as a
    runtime gather."""
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=16)
def _intra_group_matrix(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """The 128x128 complex matrix equal to the product of all radix-2 stages
    with butterfly half-distance d < 128 ("intra-group" stages).

    Key fact: for d <= 64 the stage twiddle W_{2d}^{r mod d} has period
    2d <= 128, so every aligned 128-lane (or 128-sublane) group sees the
    *same* twiddles — the 7 innermost stages of a >=128-point transform are
    one constant linear map per group.  Applying it as a single MXU matmul
    (precision=HIGHEST, ~1e-6 relative error) replaces 7 roll+select VPU
    passes; the remaining log2(n)-7 "inter-group" stages keep the roll
    formulation.  Exactness of the grouping: every butterfly with d < 128
    pairs positions within one aligned 128-block (r and r+d share their
    2d-aligned block), so no cross-group data flow is lost.

    Built by pushing the identity through the same stage recurrence the
    kernel uses (`_fft_stages`), in complex128, then cast to f32.

    Returns (re, im) of A, where out = A @ v for a 128-vector v in layout
    position space (forward: stages d=64..1 in DIF order; inverse: d=1..64
    in DIT order).
    """
    pos = np.arange(128)
    sign = +2.0 if inverse else -2.0
    ds = [d for d in range(1, 128) if d & (d - 1) == 0]  # 1..64
    if not inverse:
        ds = ds[::-1]  # DIF: descending
    a = np.eye(128, dtype=np.complex128)
    for d in ds:
        j = pos % d
        tw = np.exp(sign * 1j * np.pi * j / (2 * d))[:, None]
        top = ((pos & d) == 0)[:, None]
        up = np.roll(a, -d, axis=0)  # row r -> A[r+d]
        dn = np.roll(a, d, axis=0)  # row r -> A[r-d]
        if not inverse:
            # DIF: top = x + u ; bottom = (v - x) * tw
            a = np.where(top, a + up, (dn - a) * tw)
        else:
            # DIT: top = x + u * tw ; bottom = v - x * tw
            a = np.where(top, a + up * tw, dn - a * tw)
    return a.real.astype(np.float32), a.imag.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _dif_twiddles(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-stage twiddle vectors for the roll-formulated butterflies.

    Forward DIF stage with half-distance d (d = n/2, ..., 1):
        top'   (r)   = x[r] + x[r+d]
        bottom'(r+d) = (x[r] - x[r+d]) * W_{2d}^{r mod d}
    expressed positionally as
        x' = where(top, x + roll(x, -d), (roll(x, +d) - x) * tw)
    with tw[r] = W_{2d}^{r mod d} (only bottom lanes consume it).

    Inverse DIT stage (d = 1, ..., n/2) on bit-reversed input:
        x' = where(top, x + roll(x, -d) * tw, roll(x, +d) - x * tw)
    with conjugated twiddles.

    Returns (re, im) arrays of shape (log2(n), n) f32; row order is
    execution order (forward: d descending; inverse: d ascending).
    """
    stages = n.bit_length() - 1
    re = np.empty((stages, n), np.float32)
    im = np.empty((stages, n), np.float32)
    idx = np.arange(n)
    sign = +2.0 if inverse else -2.0
    ds = [n >> (s + 1) for s in range(stages)]  # forward order
    if inverse:
        ds = ds[::-1]
    for row, d in enumerate(ds):
        j = idx % d if d > 0 else idx * 0
        w = np.exp(sign * 1j * np.pi * j / (2 * d))
        re[row] = w.real.astype(np.float32)
        im[row] = w.imag.astype(np.float32)
    return re, im


# ---------------------------------------------------------------------------
# In-kernel 1D FFT along an axis of a VMEM-resident block
# ---------------------------------------------------------------------------


def _roll(x, shift, axis):
    # pltpu.roll requires non-negative shifts; circular-equivalent modulo.
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


# MXU pass strategy for the intra-group matmul.  Mosaic implements only
# DEFAULT (1-pass bf16 — far too lossy for 11 chained FFT stages) and
# HIGHEST (6-pass bf16 = full f32); Precision.HIGH has no Mosaic
# lowering (verified: "Unsupported dot precision: HIGH").  Two levers cut
# MXU time instead:
#   - the 3-multiplication (Karatsuba) complex product (25% fewer dots);
#   - "b3": a manual two-term bf16 split of each operand (x = hi + lo,
#     both bf16; bf16 x bf16 -> f32 products are EXACT) keeping the
#     hi*hi + hi*lo + lo*hi terms — 3 one-pass dots per real product
#     (~2^-16 relative per product from the dropped lo*lo term) vs
#     HIGHEST's 6.
# r4 per-kernel measurement (Hermitian kept-lane kernel set,
# benchmarks/kexp.py on v5e): b3 cuts the fwd row-FFT 0.043 -> 0.023 ms
# (to the pure-copy DMA wall), the fwd col-FFT 0.088 -> 0.048, the
# row-IFFT 0.103 -> 0.073 and the phase+col-IFFT 0.151 -> 0.141 — about
# -0.10 ms on the 0.69 ms frame — while end-to-end oracle parity stays
# >110 dB (vs ~146 at HIGHEST; target is 35).  b3 is therefore the r4
# default; the r3 "+0.1%" observation predated the Hermitian layout
# (whose narrower kernels exposed the MXU passes on the critical path).
# PBMM_GM_PRECISION={b3 (default), highest, default}.
import os as _os

_GM_MODE = _os.environ.get("PBMM_GM_PRECISION", "b3")
_GM_PRECISION = {
    "b3": jax.lax.Precision.DEFAULT,  # passes are built manually
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[_GM_MODE]


_GM_ENV_DEFAULT = _GM_MODE


def set_gm_precision(mode: str) -> None:
    """Apply `cfg.gm_precision` ("" = the process default: the
    PBMM_GM_PRECISION env value, else "b3").  The kernels read
    `_GM_MODE` at TRACE time, and every engine entry point passes the
    config as a static (hashed) jit argument — so calling this before
    tracing makes the choice deterministic per config and survives
    checkpoints, unlike the env var (advisor r4).  "" RESTORES the
    default rather than no-op'ing, so one explicit-precision call
    cannot leak into later default-config traces in the same process."""
    global _GM_MODE, _GM_PRECISION
    _GM_MODE = mode or _GM_ENV_DEFAULT
    _GM_PRECISION = {
        "b3": jax.lax.Precision.DEFAULT,
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[_GM_MODE]


_DOT_DN = (((1,), (1,)), ((), ()))  # contract x's minor dim with A's k dim


def _b3_dot(dot, x, g):
    """f32-in/f32-out dot as 3 exact one-pass bf16 dots (see _GM_MODE)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    gh = g.astype(jnp.bfloat16)
    gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(xh, gh) + dot(xh, gl) + dot(xl, gh)


def _cmul_dots(dot, xr, xi, gr, gi):
    """Complex matmul via the 3-multiplication (Karatsuba) identity:
    yr = t1 - t2, yi = t3 - t1 - t2 with t1 = xr@gr, t2 = xi@gi,
    t3 = (xr+xi)@(gr+gi) — 25% fewer MXU dots than the 4-dot form.
    Error: one extra rounded add per operand (~1 ulp) on top of the
    matmul's own error; measured end-to-end parity stays >140 dB.
    Under _GM_MODE == "b3" each real dot is the 3-pass manual bf16
    split (9 one-pass dots per complex product, vs 18 HIGHEST passes)."""
    d = (lambda a, b: _b3_dot(dot, a, b)) if _GM_MODE == "b3" else dot
    t1 = d(xr, gr)
    t2 = d(xi, gi)
    t3 = d(xr + xi, gr + gi)
    return t1 - t2, t3 - t1 - t2


_GM_AXIS1 = _os.environ.get("PBMM_GM_AXIS1", "slices")


def _apply_intra_group(re, im, gr, gi, axis: int):
    """Multiply each aligned 128-group along `axis` by the complex matrix
    A = gr + i*gi (out = A @ v per group) — one MXU pass replacing the 7
    innermost radix-2 stages.  `im=None` = purely real input (n == 128
    forward edge case)."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=_DOT_DN,
        precision=_GM_PRECISION,
        preferred_element_type=jnp.float32,
    )
    # Under "b3" every dot must go through the manual split — the raw
    # dot at _GM_PRECISION would be a single lossy bf16 pass (cost 80 dB
    # of end-to-end parity when the real-input branch hit it at N=128).
    d1 = (lambda a, b: _b3_dot(dot, a, b)) if _GM_MODE == "b3" else dot
    if axis == 1:
        r, n = re.shape
        if _GM_AXIS1 == "slices" and n > 128:
            # Aligned 128-lane slices are tile-local views; the reshape
            # form below relayouts the whole block twice ((r, n) <->
            # (r*n/128, 128) moves every element across tiles).  Measured
            # on v5e: the slice form cut the row-IFFT kernel ~15%.
            outs_r, outs_i = [], []
            for g in range(n // 128):
                sl = slice(g * 128, (g + 1) * 128)
                xr = re[:, sl]
                xi = None if im is None else im[:, sl]
                if xi is None:
                    yr, yi = d1(xr, gr), d1(xr, gi)
                else:
                    yr, yi = _cmul_dots(dot, xr, xi, gr, gi)
                outs_r.append(yr)
                outs_i.append(yi)
            return (jnp.concatenate(outs_r, axis=1),
                    jnp.concatenate(outs_i, axis=1))
        xr = re.reshape(r * (n // 128), 128)
        xi = None if im is None else im.reshape(r * (n // 128), 128)
        # out[..., m] = sum_k x[..., k] * A[m, k]
        if xi is None:
            yr, yi = d1(xr, gr), d1(xr, gi)
        else:
            yr, yi = _cmul_dots(dot, xr, xi, gr, gi)
        return yr.reshape(r, n), yi.reshape(r, n)
    # axis == 0: per-group left-multiply, statically unrolled over groups.
    n = re.shape[0]
    dotl = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_GM_PRECISION,
        preferred_element_type=jnp.float32,
    )
    outs_r, outs_i = [], []
    for g in range(n // 128):
        sl = slice(g * 128, (g + 1) * 128)
        xr = re[sl]
        xi = None if im is None else im[sl]
        d = (lambda a, b: _b3_dot(dotl, a, b)) if _GM_MODE == "b3" else dotl
        if xi is None:
            yr, yi = d(gr, xr), d(gi, xr)
        else:
            # Same Karatsuba 3-dot form, left-multiplied: A @ x.
            t1 = d(gr, xr)
            t2 = d(gi, xi)
            t3 = d(gr + gi, xr + xi)
            yr, yi = t1 - t2, t3 - t1 - t2
        outs_r.append(yr)
        outs_i.append(yi)
    return jnp.concatenate(outs_r, axis=0), jnp.concatenate(outs_i, axis=0)


def _fft_stages(re, im, n: int, axis: int, inverse: bool, tw_re, tw_im,
                gm=None, apply_gm=True):
    """Run all log2(n) radix-2 stages along `axis` of (re, im).

    tw_re/tw_im: (stages, n) f32 refs-values; broadcast along the other
    axis.  Forward = DIF (natural -> bitrev), inverse = DIT (bitrev ->
    natural, unnormalized).  `im=None` marks a real input: the first
    (forward) stage is specialized to skip all imaginary arithmetic, so the
    caller never materializes a zero plane in HBM.

    gm: optional (gre, gim) 128x128 group-matrix values
    (`_intra_group_matrix`): the 7 intra-group stages (d < 128) run as one
    MXU matmul instead of roll+select VPU passes — last for the forward
    transform, first for the inverse (matching DIF/DIT stage order).
    """
    stages = n.bit_length() - 1
    pos = jax.lax.broadcasted_iota(jnp.int32, re.shape, axis)
    ds = [n >> (s + 1) for s in range(stages)]
    if inverse:
        ds = ds[::-1]
    row_offset = 0
    if gm is not None and n >= 128:
        if inverse:
            # Intra-group stages are rows 0..6 of the (ascending-d) inverse
            # tables; replace them with the matmul, then roll-stage the rest.
            re, im = _apply_intra_group(re, im, gm[0], gm[1], axis)
            ds = [d for d in ds if d >= 128]
            row_offset = stages - len(ds)
        else:
            ds = [d for d in ds if d >= 128]
    for idx, d in enumerate(ds):
        row = idx + row_offset
        top = (pos & d) == 0
        if im is None:
            # Real-input first stage (forward DIF only): x, u, v all real.
            assert not inverse and row == 0
            if axis == 0:
                tw_r = tw_re[row][:, None]
                tw_i = tw_im[row][:, None]
            else:
                tw_r = tw_re[row][None, :]
                tw_i = tw_im[row][None, :]
            u_re = _roll(re, -d, axis)
            v_re = _roll(re, d, axis)
            b_re = v_re - re
            re, im = (
                jnp.where(top, re + u_re, b_re * tw_r),
                jnp.where(top, 0.0, b_re * tw_i),
            )
            continue
        if axis == 0:
            tw_r = tw_re[row][:, None]
            tw_i = tw_im[row][:, None]
        else:
            tw_r = tw_re[row][None, :]
            tw_i = tw_im[row][None, :]
        v_re = _roll(re, d, axis)
        v_im = _roll(im, d, axis)
        if not inverse:
            # DIF: top = x + u ; bottom = (v - x) * tw
            u_re = _roll(re, -d, axis)
            u_im = _roll(im, -d, axis)
            b_re = v_re - re
            b_im = v_im - im
            bt_re = b_re * tw_r - b_im * tw_i
            bt_im = b_re * tw_i + b_im * tw_r
            re, im = (
                jnp.where(top, re + u_re, bt_re),
                jnp.where(top, im + u_im, bt_im),
            )
        else:
            # DIT: top = x + u * tw ; bottom = v - x * tw.  One shared
            # cmul z = x * tw serves both halves: the twiddle table value
            # repeats across each butterfly pair (tw[r] == tw[r+d], both
            # exp(+i pi (r mod d)/(2d))), so ut[r] = u[r]*tw[r] =
            # x[r+d]*tw[r+d] = roll(z, -d)[r] — halving the twiddle
            # multiplies per stage vs the two-cmul form.
            z_re = re * tw_r - im * tw_i
            z_im = re * tw_i + im * tw_r
            uz_re = _roll(z_re, -d, axis)
            uz_im = _roll(z_im, -d, axis)
            re, im = (
                jnp.where(top, re + uz_re, v_re - z_re),
                jnp.where(top, im + uz_im, v_im - z_im),
            )
    if gm is not None and n >= 128 and not inverse and apply_gm:
        # apply_gm=False: the caller applies the (tile-local) intra-group
        # matmul itself — e.g. on the kept Hermitian-half tiles only,
        # after slicing away tiles whose output would be discarded.
        re, im = _apply_intra_group(re, im, gm[0], gm[1], axis)
    return re, im


# ---------------------------------------------------------------------------
# Kernels: one axis per kernel, all stages fused, one HBM round trip
# ---------------------------------------------------------------------------

# Block sizes chosen so ~10 live f32 temporaries per stage fit the scoped
# VMEM budget (the 11 unrolled stages keep u/v/butterfly temps live).
# Env-tunable for on-hardware sweeps (PBMM_LANE_BLOCK / PBMM_ROW_BLOCK).
_LANE_BLOCK = int(_os.environ.get("PBMM_LANE_BLOCK", "128"))
_ROW_BLOCK = int(_os.environ.get("PBMM_ROW_BLOCK", "64"))


@functools.partial(
    jax.jit, static_argnames=("axis", "inverse", "scale", "interpret")
)
def _fft_axis(re, im, axis: int, inverse: bool, scale: float,
              interpret: bool):
    """(B, H, W) re/im -> same shape, FFT'd along `axis` (1=H, 2=W).

    `im=None` = real input (forward only): the zero imaginary plane is
    never materialized in HBM; the first stage is specialized.
    """
    b, h, w = re.shape
    n = h if axis == 1 else w
    twr_np, twi_np = _dif_twiddles(n, inverse)
    twr, twi = jnp.asarray(twr_np), jnp.asarray(twi_np)
    stages = twr_np.shape[0]
    real_input = im is None
    kaxis = 1 if axis == 2 else 0
    use_gm = n >= 128
    if use_gm:
        gr_np, gi_np = _intra_group_matrix(n, inverse)
        gmats = [jnp.asarray(gr_np), jnp.asarray(gi_np)]
    else:
        gmats = []

    if axis == 2:
        block = (1, min(_ROW_BLOCK, h), w)
        grid = (b, pl.cdiv(h, block[1]))
        index = lambda i, j: (i, j, 0)
    else:
        block = (1, h, min(_LANE_BLOCK, w))
        grid = (b, pl.cdiv(w, block[2]))
        index = lambda i, j: (i, 0, j)

    def kernel(*refs):
        k = 1 if real_input else 2
        data_refs = refs[:k]
        twr_ref, twi_ref = refs[k : k + 2]
        gm = (refs[k + 2][...], refs[k + 3][...]) if use_gm else None
        ore_ref, oim_ref = refs[-2:]
        rr, ii = _fft_stages(
            data_refs[0][0],
            None if real_input else data_refs[1][0],
            n, kaxis, inverse, twr_ref, twi_ref, gm=gm,
        )
        if scale != 1.0:
            rr = rr * scale
            ii = ii * scale
        ore_ref[0] = rr
        oim_ref[0] = ii

    spec = pl.BlockSpec(block, index, memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec(
        (stages, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    gm_spec = pl.BlockSpec(
        (128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [spec] + ([] if real_input else [spec]) + [tw_spec, tw_spec]
        + [gm_spec] * len(gmats)
    )
    inputs = [re] + ([] if real_input else [im]) + [twr, twi] + gmats
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return out_re, out_im


# ---------------------------------------------------------------------------
# Public 2D transforms (bitrev x bitrev spectral layout)
# ---------------------------------------------------------------------------


def fft2_bitrev(y: jnp.ndarray, interpret: bool = False):
    """Real (B, H, W) f32 -> (re, im) spectrum with both axes in
    bit-reversed frequency order (the pipeline's working layout)."""
    re = y.astype(jnp.float32)
    re, im = _fft_axis(re, None, 2, False, 1.0, interpret)
    re, im = _fft_axis(re, im, 1, False, 1.0, interpret)
    return re, im


def ifft2_bitrev(re: jnp.ndarray, im: jnp.ndarray, interpret: bool = False):
    """(re, im) bitrev-layout spectrum -> complex spatial result (re, im),
    normalized by 1/(H*W)."""
    b, h, w = re.shape
    re, im = _fft_axis(re, im, 1, True, 1.0, interpret)
    re, im = _fft_axis(re, im, 2, True, 1.0 / (h * w), interpret)
    return re, im


def bitrev_freq_axis(n: int) -> np.ndarray:
    """Centered normalized frequency value of each bit-reversed bin: the
    value the reference's x/N - 0.5 grid assigns to this bin's frequency."""
    rev = bit_reverse_permutation(n)
    k = rev.astype(np.float64) / n
    return np.where(k < 0.5, k, k - 1.0).astype(np.float32)
