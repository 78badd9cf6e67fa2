"""Roofline / MFU accounting for the tuned 1080p hot path.

SURVEY.md §5 (tracing/profiling row) promises roofline accounting; this
module provides it: an analytic per-stage model of HBM bytes/frame and
FLOPs/frame for the fused Pallas pipeline, compared against TPU v5e peaks,
plus (when run on hardware) measured per-stage times -> achieved GB/s and
percent-of-HBM-roofline per stage.

The pipeline is HBM-bandwidth-bound everywhere (arithmetic intensity of a
2D FFT at f32 is ~5*log2(N)/12 ≈ 4.6 FLOP/byte vs the v5e ridge point of
~240 FLOP/byte at bf16 peak), so the roofline that matters is the memory
one: stage_time >= stage_bytes / 819 GB/s.

Run:  python benchmarks/roofline.py [--reps 20] [--json]
(`bench.py` also prints the compact version of this table to stderr.)

v5e public peaks (Google Cloud TPU docs): 197 bf16 TFLOP/s per chip,
16 GB HBM2 @ 819 GB/s.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # run as `python benchmarks/roofline.py` from repo root

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0

_F = 4  # f32 bytes


def hot_path_stages(h: int = 1080, w: int = 1920, cfg=None):
    """Analytic per-stage HBM bytes + FLOPs for one frame through the
    tuned fused path (`engine/pipeline.py::video_step`, fused branch).

    Bytes are exact: every Pallas stage streams its operand blocks from HBM
    once and writes its outputs once (block specs cover each array exactly
    once); constants (twiddles, group matrices — a few hundred KB) are
    ignored.  FLOPs use the classical 5*N*log2(N) complex-FFT count (the
    MXU group-matmul evaluates more multiply-adds than that, but they
    replace VPU stage sweeps, not add work the algorithm needs — "useful"
    FLOPs is the honest numerator for MFU).
    """
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.core.window import blur_taps, geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, hermitian_active
    from pbmm_tpu.spectral.fused import aligned_row_window
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    cfg = cfg or MagnifyConfig().tuned_for_tpu()
    geom = geometry_for(h, w, cfg.pad_mode)
    hp, wp = geom.pad_h, geom.pad_w
    # Hermitian-half kept-lane layout: the spectrum arrays between the
    # row-FFT and the row-IFFT carry wk of wp lanes (9/16 at W=2048).
    wk = hermitian_kept_width(wp) if hermitian_active(cfg, geom) else wp
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, hp)
    hc = r1 - r0  # content-row cover (rows with any nonzero pixels)
    b0, b1 = blur_row_window(geom, cfg)
    hr = b1 - b0  # crop + blur-halo cover (rows the output depends on)
    lg_w, lg_h = math.log2(wp), math.log2(hp)
    taps = len(blur_taps(cfg.blur_size))

    # (name, bytes_in, bytes_out, flops).  FLOPs keep the full-width
    # 5*N*log2(N) count for the row transforms (computed full-width in
    # VMEM) and scale the column transforms by the kept lanes.
    #
    # r5 path: the r4 k2/k3 pair (col-FFT write + phase-kernel re-read of
    # the 2D spectrum, ~50-65 MB/frame) merged into ONE spectrum-resident
    # chunk kernel (`colspec_chunk`) — per frame it reads only k1's
    # content-row spectra and writes only the row-windowed inverse; the
    # chunk-boundary state (prev spectrum in/out) is amortized over the
    # chunk (T=16 assumed here).
    t_amort = 16
    return [
        (
            "pre: rgb->yiq + pad slab",
            h * w * 3 * _F,
            (2 * h * w + hc * wp) * _F,  # I/Q planes + padded Y slab
            (9 + 3) * h * w,  # 3x3 matrix + moveaxis/scale
        ),
        (
            "fwd row-FFT (Hann fused)",
            hc * wp * _F,
            2 * hc * wk * _F,
            int(hc * 5 * wp * lg_w + 2 * hc * wp),
        ),
        (
            "colspec: col-FFT + phase + col-IFFT (r5)",
            2 * hc * wk * _F + (4 * hp * wk * _F) // t_amort,
            2 * hr * wk * _F + (4 * hp * wk * _F) // t_amort,
            int(2 * wk * 5 * hp * lg_h + hp * wk * 80),  # fwd+inv cols
            #   + ~80 flop/bin phase chain
        ),
        (
            "row-IFFT + post (merged)",
            (2 * hr * wk + 2 * h * w) * _F,  # phase-out rows + I/Q planes
            3 * h * w * _F,  # R/G/B planes; the reconstruction never
            #                  exists in HBM (rowifft_post_fused)
            int(hr * 5 * wp * lg_w + 4 * hr * wp)
            + (4 * taps + 9 + 10) * h * w,
        ),
    ]


def hot_path_stages_u8(h: int = 1080, w: int = 1920, cfg=None):
    """Analytic per-stage HBM bytes + FLOPs for the u8 planar video
    pipeline (r5): planar uint8 in -> planar u8 out, tight geometry.
    THREE kernels, no XLA pre at all:

      k1 `windowed_row_fft_u8planar`: reads the 3 u8 planes (each input
         block twice — the two-block pad-offset halo), FMA+window+pad in
         VMEM, writes the kept row spectra;
      k2 `colspec_chunk`: unchanged;
      k3 `rowifft_post_fused(rgb_u8=..., out_layout='planar_u8')`: reads
         the phase rows + the u8 planes for chroma, writes u8 planes.
    """
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.core.window import blur_taps, geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window, hermitian_active
    from pbmm_tpu.spectral.fused import aligned_row_window
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    cfg = cfg or MagnifyConfig().tuned_for_tpu().replace(pad_mode="tight")
    geom = geometry_for(h, w, cfg.pad_mode)
    hp, wp = geom.pad_h, geom.pad_w
    wk = hermitian_kept_width(wp) if hermitian_active(cfg, geom) else wp
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, hp)
    hc = r1 - r0
    b0, b1 = blur_row_window(geom, cfg)
    hr = b1 - b0
    lg_w, lg_h = math.log2(wp), math.log2(hp)
    taps = len(blur_taps(cfg.blur_size))
    t_amort = 16
    u8_in = 3 * h * w  # one uint8 read of the 3 planes
    return [
        (
            "k1 u8-ingest + row-FFT (Hann fused)",
            2 * u8_in,  # two-block halo: each input block read twice
            2 * hc * wk * _F,
            int(hc * 5 * wp * lg_w + 8 * h * w),
        ),
        (
            "colspec: col-FFT + phase + col-IFFT",
            2 * hc * wk * _F + (4 * hp * wk * _F) // t_amort,
            2 * hr * wk * _F + (4 * hp * wk * _F) // t_amort,
            int(2 * wk * 5 * hp * lg_h + hp * wk * 80),
        ),
        (
            "row-IFFT + post (u8 chroma, u8 out)",
            2 * hr * wk * _F + u8_in,
            3 * h * w,  # planar uint8 output
            int(hr * 5 * wp * lg_w + 4 * hr * wp)
            + (4 * taps + 9 + 10) * h * w,
        ),
    ]


def _sync(x):
    np.asarray(x).ravel()[:1]  # force through the tunnel


def measure_stages(h: int = 1080, w: int = 1920, cfg=None, reps: int = 20):
    """Run each hot-path stage on real shapes and time pure device
    execution.

    Returns [(name, seconds_per_frame)] aligned with `hot_path_stages`.

    Method: the tunneled dev runtime costs ~17 ms per dispatch RPC — far
    more than any stage — so per-call host timing is useless.  Instead each
    stage runs k times inside ONE dispatch via `lax.fori_loop` (the input is
    perturbed by the loop carry * 1e-30 so XLA cannot hoist the
    loop-invariant stage out), for k and 3k; the difference divided by 2k
    is the pure per-iteration device time, with the dispatch cost cancelled
    exactly.
    """
    import jax
    import jax.numpy as jnp

    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window
    from pbmm_tpu.spectral.fused import (
        aligned_row_window,
        col_fft_zero_padded,
        colspec_chunk,
        windowed_row_fft,
    )

    from pbmm_tpu.engine.pipeline import hermitian_active

    cfg = cfg or MagnifyConfig().tuned_for_tpu()
    geom = geometry_for(h, w, cfg.pad_mode)
    hp, wp = geom.pad_h, geom.pad_w
    keep = hermitian_active(cfg, geom)
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, hp)
    rows = blur_row_window(geom, cfg)

    rng = np.random.default_rng(0)
    frame = jax.device_put(rng.random((h, w, 3)).astype(np.float32))

    from pbmm_tpu.core.color import rgb_to_yiq

    def pre(fr):
        rgb_cf = jnp.moveaxis(fr, -1, -3)
        yiq = rgb_to_yiq(rgb_cf, axis=-3)
        yp = jnp.pad(
            yiq[0:1],
            [(0, 0), (geom.y0 - r0, r1 - geom.y0 - geom.in_h),
             (geom.x0, geom.pad_w - geom.in_w - geom.x0)],
        )
        return yp, yiq

    slab, yiq = jax.jit(pre)(frame)
    re1, im1 = windowed_row_fft(slab, pad_h=hp, row0=r0, keep_half=keep)
    re2, im2 = col_fft_zero_padded(re1, im1, pad_h=hp, row0=r0)
    pre_, pim = re2 + 1.0, im2 + 1.0  # stand-in previous spectrum
    import jax.numpy as _jnp

    # T_M-frame row-spectrum stream for the spectrum-resident chunk
    # kernel; its stage time below is divided by T_M.
    T_M = 8
    stream_re = _jnp.concatenate([re1 + 0.1 * k for k in range(T_M)], axis=0)
    stream_im = _jnp.concatenate([im1 + 0.1 * k for k in range(T_M)], axis=0)
    rre, rim, _, _ = colspec_chunk(
        stream_re[:1], stream_im[:1], pre_, pim, cfg, pad_h=hp, row0=r0,
        out_rows=rows, full_w=wp)
    from pbmm_tpu.core.window import hann2d_region
    from pbmm_tpu.engine.post_pallas import rowifft_post_fused

    i_plane, q_plane = yiq[1:2], yiq[2:3]  # (1, H, W) each
    win = hann2d_region(geom)

    # (name, fn, args, opaque): opaque=True for Pallas stages — XLA cannot
    # dead-code-eliminate inside a pallas_call, so a 1-element carry tap is
    # enough; XLA-built stages (pre/post) need a full reduction over every
    # output, which XLA fuses into the elementwise producer for free.
    stages = [
        ("pre: rgb->yiq + pad slab", pre, (frame,), False),
        ("fwd row-FFT (Hann fused)",
         lambda x: windowed_row_fft(x, pad_h=hp, row0=r0, keep_half=keep),
         (slab,), True),
        # Timed as the production chunk stream (T_M frames per call, the
        # prev spectrum carried in VMEM scratch), divided by T_M below.
        ("colspec: col-FFT + phase + col-IFFT (r5)",
         lambda a, b: colspec_chunk(a, b, pre_, pim, cfg, pad_h=hp,
                                    row0=r0, out_rows=rows, full_w=wp),
         (stream_re, stream_im), True),
        ("row-IFFT + post (merged)",
         lambda a, b: rowifft_post_fused(
             a, b, i_plane, q_plane, win, cfg, rows[0], h, w,
             cfg.pad_mode, full_w=wp),
         (rre, rim), True),
    ]

    def timed(stage_fn, args, k, opaque):
        @jax.jit
        def run(*a):
            def body(_, carry):
                perturbed = (a[0] + carry * 1e-30,) + a[1:]
                out = stage_fn(*perturbed)
                if not opaque:
                    # XLA-built stages: an optimization barrier forces the
                    # full outputs to materialize (no producer+tap fusion, no
                    # DCE), exactly the HBM writes the analytic model counts;
                    # the carry then taps one element.  Pallas outputs are
                    # already opaque — the tap alone suffices.
                    out = jax.lax.optimization_barrier(out)
                leaves = jax.tree_util.tree_leaves(out)
                return carry + sum(l.ravel()[0] for l in leaves)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        r = run(*args)  # compile + warm
        _sync(r)
        best = float("inf")
        for _ in range(6):  # min-of-6 beats tunnel jitter (~1-2 ms)
            t0 = time.perf_counter()
            r = run(*args)
            _sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    # Per-iteration device time = least-squares slope of min-wall vs k;
    # dispatch/RPC cost is the intercept and cancels.  Two k points (an
    # exact two-point slope) halve the remote-compile count vs three —
    # the tunnel's compile service can take minutes per executable.
    ks = [max(8, reps // 2), max(8, reps // 2) + 80]
    results = []
    for name, fn, args, opaque in stages:
        walls = [timed(fn, args, k, opaque) for k in ks]
        slope = np.polyfit(ks, walls, 1)[0]
        if "colspec" in name:
            slope /= float(T_M)  # the chunk call processes T_M frames
        results.append((name, max(slope, 1e-9)))
    return results


def roofline_table(h: int = 1080, w: int = 1920, cfg=None, reps: int = 20,
                   measured=None):
    """-> (rows, summary).  rows: per-stage dicts with analytic bytes,
    roofline ms, measured ms, achieved GB/s, % of HBM roofline."""
    stages = hot_path_stages(h, w, cfg)
    if measured is None:
        measured = measure_stages(h, w, cfg, reps)
    rows = []
    for (name, bi, bo, fl), (_, sec) in zip(stages, measured):
        bts = bi + bo
        roof_ms = bts / (V5E_HBM_GBPS * 1e9) * 1e3
        ms = sec * 1e3
        rows.append({
            "stage": name,
            "hbm_mb": round(bts / 1e6, 1),
            "gflop": round(fl / 1e9, 2),
            "roofline_ms": round(roof_ms, 3),
            "measured_ms": round(ms, 3),
            "achieved_gbps": round(bts / sec / 1e9, 0),
            "pct_of_roofline": round(100.0 * roof_ms / ms, 1),
        })
    tot_bytes = sum(bi + bo for _, bi, bo, _ in stages)
    tot_flops = sum(fl for *_, fl in stages)
    tot_ms = sum(r["measured_ms"] for r in rows)
    bottleneck = max(rows, key=lambda r: r["measured_ms"])
    summary = {
        "total_hbm_mb_per_frame": round(tot_bytes / 1e6, 1),
        "total_gflop_per_frame": round(tot_flops / 1e9, 2),
        "hbm_roofline_ms_per_frame": round(
            tot_bytes / (V5E_HBM_GBPS * 1e9) * 1e3, 3),
        "measured_ms_per_frame_sum": round(tot_ms, 3),
        "pct_of_hbm_roofline": round(
            100.0 * tot_bytes / (V5E_HBM_GBPS * 1e9) * 1e3 / tot_ms, 1),
        "mfu_pct_bf16_peak": round(
            100.0 * tot_flops / (tot_ms / 1e3) / (V5E_BF16_TFLOPS * 1e12), 2),
        "bottleneck_stage": bottleneck["stage"],
        "bottleneck_ms": bottleneck["measured_ms"],
        "bottleneck_pct_of_roofline": bottleneck["pct_of_roofline"],
    }
    return rows, summary


def print_table(rows, summary, file=sys.stderr):
    hdr = (f"{'stage':34s} {'HBM MB':>7s} {'GFLOP':>6s} {'roof ms':>8s} "
           f"{'meas ms':>8s} {'GB/s':>6s} {'%roof':>6s}")
    print(hdr, file=file)
    for r in rows:
        print(f"{r['stage']:34s} {r['hbm_mb']:7.1f} {r['gflop']:6.2f} "
              f"{r['roofline_ms']:8.3f} {r['measured_ms']:8.3f} "
              f"{r['achieved_gbps']:6.0f} {r['pct_of_roofline']:6.1f}",
              file=file)
    print(f"TOTAL {summary['total_hbm_mb_per_frame']} MB/frame, "
          f"{summary['total_gflop_per_frame']} GFLOP/frame; HBM roofline "
          f"{summary['hbm_roofline_ms_per_frame']} ms vs measured "
          f"{summary['measured_ms_per_frame_sum']} ms "
          f"({summary['pct_of_hbm_roofline']}% of roofline, "
          f"MFU {summary['mfu_pct_bf16_peak']}% of bf16 peak); "
          f"bottleneck: {summary['bottleneck_stage']} "
          f"({summary['bottleneck_ms']} ms, "
          f"{summary['bottleneck_pct_of_roofline']}% of its roofline)",
          file=file)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rows, summary = roofline_table(args.height, args.width, reps=args.reps)
    if args.json:
        print(json.dumps({"stages": rows, "summary": summary}))
    else:
        print_table(rows, summary, file=sys.stdout)


if __name__ == "__main__":
    main()
