"""Kernel experiments: isolate per-variant device time for the row/col
FFT kernels (the VERDICT r3 kernel-efficiency work).  Times one kernel k
times inside a fori_loop dispatch; slope over k cancels the tunnel RPC.

Usage: python benchmarks/kexp.py [names...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, ".")

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.window import geometry_for
from pbmm_tpu.engine.pipeline import blur_row_window
from pbmm_tpu.spectral.fused import (
    aligned_row_window,
    col_fft_zero_padded,
    phase_col_ifft,
    row_ifft_magnitude,
    windowed_row_fft,
)


def _sync(x):
    np.asarray(x).ravel()[:1]


def timed(fn, args, ks=(8, 48, 88)):
    def make(k):
        @jax.jit
        def run(*a):
            def body(_, carry):
                if a[0].dtype == jnp.uint8:
                    # uint8 operands: a data-dependent zero keeps the
                    # loop body un-hoistable without promoting the dtype.
                    a0 = a[0] + (carry * 1e-30).astype(jnp.uint8)
                else:
                    a0 = a[0] + carry * 1e-30
                out = fn(a0, *a[1:])
                leaves = jax.tree_util.tree_leaves(out)
                return carry + sum(
                    l.ravel()[0].astype(jnp.float32) for l in leaves)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    walls = []
    for k in ks:
        run = make(k)
        _sync(run(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(run(*args))
            best = min(best, time.perf_counter() - t0)
        walls.append(best)
    return float(np.polyfit(ks, walls, 1)[0])


def main():
    which = set(sys.argv[1:])
    h, w = 1080, 1920
    cfg = MagnifyConfig().tuned_for_tpu()
    geom = geometry_for(h, w, cfg.pad_mode)
    hp, wp = geom.pad_h, geom.pad_w
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, hp)
    rows = blur_row_window(geom, cfg)
    hc = r1 - r0
    hr = rows[1] - rows[0]
    rng = np.random.default_rng(0)
    slab = jax.device_put(rng.random((1, hc, wp)).astype(np.float32))

    exps = {}

    exps["rowfft_full"] = (
        lambda x: windowed_row_fft(x, pad_h=hp, row0=r0, keep_half=False),
        (slab,))
    exps["rowfft_kept"] = (
        lambda x: windowed_row_fft(x, pad_h=hp, row0=r0, keep_half=True),
        (slab,))

    rek, imk = windowed_row_fft(slab, pad_h=hp, row0=r0, keep_half=True)
    rek, imk = np.asarray(rek), np.asarray(imk)
    rek_d = jax.device_put(rek)
    imk_d = jax.device_put(imk)
    exps["colfft_kept"] = (
        lambda a, b: col_fft_zero_padded(a, b, pad_h=hp, row0=r0),
        (rek_d, imk_d))

    re2, im2 = col_fft_zero_padded(rek_d, imk_d, pad_h=hp, row0=r0)
    pre_, pim = re2 + 1.0, im2 + 1.0
    exps["phase_kept"] = (
        lambda a, b, c, d: phase_col_ifft(a, b, c, d, cfg, out_rows=rows,
                                          full_w=wp),
        (re2, im2, pre_, pim))

    # The production spectrum-resident chunk kernel (r5, 8 frames per
    # call, prev spectrum in VMEM scratch); divide the printed time by 8
    # for per-frame cost.
    from pbmm_tpu.spectral.fused import colspec_chunk

    stream_re = jnp.concatenate([rek_d + 0.1 * k for k in range(8)], axis=0)
    stream_im = jnp.concatenate([imk_d + 0.1 * k for k in range(8)], axis=0)
    # The r5 u8 ingestion kernel: planar uint8 frames straight into the
    # windowed row-FFT (divide the printed time by 1: one frame/call
    # with T=4 frames per call -> divide by 4).
    from pbmm_tpu.core.color import RGB_TO_YIQ
    from pbmm_tpu.spectral.fused import windowed_row_fft_u8planar

    u8_frames = jax.device_put(
        (np.random.default_rng(1).random((4, 3, h, w)) * 255
         ).astype(np.uint8))
    m0 = RGB_TO_YIQ
    exps["rowfft_u8planar4"] = (
        lambda x: windowed_row_fft_u8planar(
            x, (float(m0[0, 0]), float(m0[0, 1]), float(m0[0, 2])),
            pad_h=hp, pad_w=wp, y0=geom.y0, x0=geom.x0, row0=r0,
            keep_half=True),
        (u8_frames,))

    exps["colspec_chunk8"] = (
        lambda a, b: colspec_chunk(a, b, pre_, pim, cfg, pad_h=hp,
                                   row0=r0, out_rows=rows, full_w=wp),
        (stream_re, stream_im))

    # Mode variants of the phase kernel: the pyramid/standard fps gap
    # lives almost entirely here (the other kernels are mode-blind).
    cfg_std = cfg.replace(mode="standard")
    exps["phase_kept_std"] = (
        lambda a, b, c, d: phase_col_ifft(a, b, c, d, cfg_std,
                                          out_rows=rows, full_w=wp),
        (re2, im2, pre_, pim))
    cfg_steer = cfg.replace(orientations=4)
    exps["phase_kept_steer"] = (
        lambda a, b, c, d: phase_col_ifft(a, b, c, d, cfg_steer,
                                          out_rows=rows, full_w=wp),
        (re2, im2, pre_, pim))

    rre, rim = phase_col_ifft(re2, im2, pre_, pim, cfg, out_rows=rows,
                              full_w=wp)
    exps["rowifft_kept"] = (
        lambda a, b: row_ifft_magnitude(a, b, magnitude=True, pad_h=hp,
                                        full_w=wp),
        (rre, rim))

    # full-width inverse for comparison
    rre_f = jax.device_put(rng.random(
        (1, hr, wp)).astype(np.float32))
    rim_f = jax.device_put(rng.random((1, hr, wp)).astype(np.float32))
    exps["rowifft_full"] = (
        lambda a, b: row_ifft_magnitude(a, b, magnitude=True, pad_h=hp),
        (rre_f, rim_f))

    # --- pure-copy probes: identical grid/block structure to the FFT
    # kernels but zero compute — the achievable pipelined-DMA ceiling for
    # each access pattern.  If copy >> fft, the kernels are compute- or
    # overlap-bound; if copy ~ fft, the block pipeline itself is the wall.
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(a_ref, b_ref, oa, ob):
        oa[0] = a_ref[0]
        ob[0] = b_ref[0]

    def make_copy(shape, block, index):
        spec = pl.BlockSpec(block, index, memory_space=pltpu.VMEM)
        grid = (shape[0],
                pl.cdiv(shape[1], block[1]) * pl.cdiv(shape[2], block[2]))
        return partial(
            pl.pallas_call(
                copy_kernel, grid=grid,
                in_specs=[spec, spec], out_specs=(spec, spec),
                out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),) * 2,
            ))

    rb = int(os.environ.get("PBMM_ROW_BLOCK", "64"))
    lb = int(os.environ.get("PBMM_LANE_BLOCK", "128"))
    cr = jax.device_put(rng.random((1, hp, wp)).astype(np.float32))
    ci = jax.device_put(rng.random((1, hp, wp)).astype(np.float32))
    exps["copy_rowblocks"] = (
        make_copy((1, hp, wp), (1, rb, wp), lambda i, j: (i, j, 0)),
        (cr, ci))
    exps["copy_laneblocks"] = (
        make_copy((1, hp, wp), (1, hp, lb), lambda i, j: (i, 0, j)),
        (cr, ci))

    for name, (fn, args) in exps.items():
        if which and name not in which:
            continue
        sec = timed(fn, args)
        print(f"{name:16s} {sec*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
