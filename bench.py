"""Headline benchmark: 1080p magnified frames/s on one TPU chip.

Reference-parity algorithm (pyramid mode, L=5, phase math per
`MotionMagnificationProcessor.cs`) at the r5 production geometry:
pad_mode="tight" (1152x2048 internal — VERDICT r4 ask 2 retired the
reference's 2048^2 pad, which existed only because its FFT driver
shares one pow-2 table between axes, `:531-535`).  The same-run
square_pow2 number (the r1-r4 headline geometry) is printed to stderr
for cross-round comparability.  Flagship streaming engine
(`engine.video.magnify_video`) with the previous frame's spectrum
carried as state across chunk calls — real long-video throughput,
every frame magnified against its true predecessor.

Prints ONE JSON line:
  {"metric": "fps_1080p_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/30}
Baseline: the driver-defined 30 fps/chip real-time target (BASELINE.md —
the reference publishes no numbers).  Extra diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )

    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.engine.video import magnify_video

    log(f"devices: {jax.devices()}")

    h, w, t = 1080, 1920, 16
    reps = 8
    rng = np.random.default_rng(0)
    base = rng.random((h, w, 3)).astype(np.float32)
    # Slightly shifting content so phase deltas are realistic (gates open).
    frames = np.stack(
        [np.roll(base, shift=i, axis=1) * (0.95 + 0.01 * i) for i in range(t)]
    )
    # Reference defaults (pyramid, L=5, scale=10) in the fastest-known TPU
    # configuration (Pallas fused-stage FFT backend, spectrum-resident
    # chunk engine, tight geometry; >100 dB vs the fp64 oracle at this
    # geometry on hardware).
    cfg = MagnifyConfig().tuned_for_tpu().replace(pad_mode="tight")

    frames_dev = jax.device_put(frames)

    def sync(x):
        # On the tunneled dev runtime block_until_ready returns early; a
        # 1-element fetch forces real completion (~30 ms tunnel round-trip,
        # amortized over all queued executions).
        np.asarray(x[0, 0, 0, 0])

    # The flagship streaming engine: scan over frames with the previous
    # frame's spectrum carried as state (one FFT per frame; every frame
    # after frame 0 is magnified against its true predecessor).  State is
    # threaded across chunk calls exactly as the CLI stream driver does,
    # so this measures real long-video throughput, not clip-replay.
    t0 = time.perf_counter()
    out, state = magnify_video(frames_dev, cfg)
    sync(out)
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")

    # Warm the steady-state chunk executable (state != None path).
    out, state = magnify_video(frames_dev, cfg, state)
    sync(out)

    # Two measurements at reps and 2*reps; the headline is the MARGINAL
    # rate (extra frames / extra time), which cancels the ~40 ms constant
    # per-measurement artifact the tunneled runtime adds (first-dispatch
    # RPC latency), and doubles as a dispatch-sync cross-check: the sync
    # is a 1-element fetch (block_until_ready returns early through the
    # tunnel), and if it returned before the queue drained, doubling the
    # queue would not double the wall time.
    clean = []
    for trial in range(5):
        if len(clean) >= 3:
            break  # 3 clean trials are enough; extra rounds only run
            #        when earlier ones failed the cross-check
        t0 = time.perf_counter()
        for _ in range(reps):
            out, state = magnify_video(frames_dev, cfg, state)
        sync(out)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 * reps):
            out, state = magnify_video(frames_dev, cfg, state)
        sync(out)
        dt2 = time.perf_counter() - t0
        ratio = dt2 / dt
        ok = 1.5 <= ratio <= 2.5
        marg = max(dt2 - dt, 1e-9)
        log(f"trial {trial}: {dt:.3f}s/{reps} + {dt2:.3f}s/{2 * reps} "
            f"chunks; 2x-reps ratio {ratio:.2f} "
            f"({'OK' if ok else 'SUSPECT'}); "
            f"marginal {t * reps / marg:.1f} fps")
        # A SUSPECT trial failed its own dispatch-sync cross-check — it
        # must never become the headline (advisor r3).
        if ok:
            clean.append(marg)
    if not clean:
        log("FATAL: all trials failed the 2x-reps cross-check; no "
            "trustworthy measurement")
        return
    # MEDIAN of the clean trials (r5 headline hygiene): the number of
    # record is the typical clean run, not the optimistic tail; the
    # min/max band goes to stderr.
    fps = t * reps / float(np.median(clean))
    band = (t * reps / max(clean), t * reps / min(clean))
    log(f"marginal steady rate (headline, median of {len(clean)} clean "
        f"trials): {fps:.2f} fps ({1e3 / fps:.3f} ms/frame); trial band "
        f"{band[0]:.0f}-{band[1]:.0f} fps")

    # --- single-frame latency (the reference's real contract: an
    # interactive per-frame post-effect, `OnRenderImage`,
    # `MotionMagnificationProcessor.cs:101`).  Batch=1 chunks threaded
    # through the carried state: a strict frame-after-frame dependency
    # chain, timed end-to-end and amortized over the chain (per-dispatch
    # tunnel RPC overlaps device compute in steady state).
    one = frames_dev[:1]
    out1, lstate = magnify_video(one, cfg, state)  # compile T=1 chunk
    sync(out1)
    n_lat = 64
    t0 = time.perf_counter()
    for _ in range(n_lat):
        out1, lstate = magnify_video(one, cfg, lstate)
    sync(out1)
    lat_ms = (time.perf_counter() - t0) / n_lat * 1e3
    log(f"latency: {lat_ms:.3f} ms/frame steady-state at batch=1 "
        f"({1e3 / lat_ms:.1f} fps single-stream)")

    # --- roofline accounting (SURVEY.md §5 tracing row; full measured
    # per-stage table: benchmarks/roofline.py + ROOFLINE.md).  The analytic
    # per-stage model is free; set PBMM_ROOFLINE=1 for the measured table
    # (adds ~12 loop-kernel compiles on a cold cache).
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.roofline import (
            V5E_HBM_GBPS,
            hot_path_stages,
            print_table,
            roofline_table,
        )

        stages = hot_path_stages(h, w, cfg)
        tot_bytes = sum(bi + bo for _, bi, bo, _ in stages)
        roof_ms = tot_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
        meas_ms = 1e3 / fps
        log(f"roofline: {tot_bytes / 1e6:.1f} HBM MB/frame -> "
            f">= {roof_ms:.3f} ms/frame at {V5E_HBM_GBPS:.0f} GB/s; "
            f"measured {meas_ms:.3f} ms/frame = "
            f"{100 * roof_ms / meas_ms:.1f}% of the HBM roofline")
        for name, bi, bo, fl in stages:
            log(f"  {name:34s} {(bi + bo) / 1e6:7.1f} MB  "
                f">= {(bi + bo) / (V5E_HBM_GBPS * 1e9) * 1e3:6.3f} ms")
        if os.environ.get("PBMM_ROOFLINE") == "1":
            rows, summary = roofline_table(h, w, cfg, reps=16)
            print_table(rows, summary, file=sys.stderr)
    except Exception as e:  # roofline must never sink the headline metric
        log(f"roofline accounting skipped: {e!r}")

    # --- secondary bench lines (stderr): standard mode fast path and the
    # rect_pow2 padding trade (VERDICT r2 next-round items 5 and 8).
    if os.environ.get("PBMM_BENCH_EXTRA", "1") == "1":
        try:
            extra_benches(jax, frames_dev, cfg, sync)
        except Exception as e:  # extras must never sink the headline metric
            log(f"extra benches skipped: {e!r}")

    print(
        json.dumps(
            {
                "metric": "fps_1080p_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


def extra_benches(jax, frames_1080, cfg_tuned, sync):
    import numpy as np

    from pbmm_tpu.engine.video import magnify_video
    from pbmm_tpu.utils.metrics import psnr

    def fps_of(frames_dev, cfg, reps=4):
        # Marginal rate (reps vs 2*reps), same method as the headline:
        # cancels the ~30-40 ms constant per-measurement artifact the
        # tunneled runtime adds, which otherwise understates these lines
        # by 1.5-1.8x (r4 fix).  Same cross-check as the headline: a
        # trial whose 2x-reps ratio falls outside [1.5, 2.5] failed its
        # own dispatch-sync validation and is retried (up to 3x).
        out, state = magnify_video(frames_dev, cfg)
        sync(out)
        out, state = magnify_video(frames_dev, cfg, state)
        sync(out)
        n = frames_dev.shape[0] * reps
        clean = []
        for _ in range(4):
            if len(clean) >= 2:
                break
            t0 = time.perf_counter()
            for _ in range(reps):
                out, state = magnify_video(frames_dev, cfg, state)
            sync(out)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2 * reps):
                out, state = magnify_video(frames_dev, cfg, state)
            sync(out)
            dt2 = time.perf_counter() - t0
            if 1.5 <= dt2 / dt <= 2.5:
                clean.append(n / (dt2 - dt))
        if clean:
            # Mean of 2 clean trials: one loaded-tunnel moment cannot
            # print as the line's number (r5: a single clean trial once
            # read 1203 fps on a config whose band is ~2000-2170).
            return float(np.mean(clean))
        return None  # every retry failed the cross-check (advisor r4):
        #               no number beats a misleading one

    def fmt(v):
        return f"{v:.2f} fps 1080p/chip" if v is not None else \
            "SUSPECT: no trial passed the 2x-reps cross-check"

    # Standard mode through the same fused kernels (polynomial
    # atan2/sincos + procedural w(f)); the reference's second first-class
    # mode (`ProcessFrameWithStandardMagnification`).
    std_fps = fps_of(frames_1080, cfg_tuned.replace(mode="standard"))
    log(f"standard-mode (fused): {fmt(std_fps)}")

    # Steerable orientation mode through the fused kernels (r4: in-kernel
    # partition-of-unity sector windows) — BASELINE configs 1-2's angular
    # extension at the full 1080p working set.
    steer_fps = fps_of(frames_1080, cfg_tuned.replace(orientations=4))
    log(f"steerable-4 (fused): {fmt(steer_fps)}")

    # chroma="rgb": all three YIQ planes FFT-bound (3x the spectral work
    # by construction) through the r4 channels-last fast path.
    rgb_fps = fps_of(frames_1080, cfg_tuned.replace(chroma="rgb"))
    log(f"chroma-rgb (fused): {fmt(rgb_fps)}")

    # Streaming IIR temporal mode (BASELINE configs 2-5) — the low-pass
    # taps ride the fused phase kernel as carry planes since r3.
    from pbmm_tpu.config import TemporalConfig

    iir_fps = fps_of(frames_1080, cfg_tuned.replace(
        temporal=TemporalConfig(mode="iir_bandpass")))
    log(f"iir-temporal (fused): {fmt(iir_fps)}")

    # The r1-r4 headline geometry (the reference's square pow-2 pad) for
    # cross-round comparability; the r5 headline runs tight (1152x2048).
    sq1080 = fps_of(frames_1080, cfg_tuned.replace(pad_mode="square_pow2"))
    log(f"square_pow2 reference geometry (2048^2, r1-r4 headline): "
        f"{fmt(sq1080)}")
    # u8 planar video pipeline (planar uint8 in -> planar out; chroma
    # from u8 inside the post kernel): the production-video contract
    # (the reference's own source textures are 8-bit).
    cfg_tight = cfg_tuned
    fr_u8 = np.clip(np.asarray(frames_1080) * 255.0, 0, 255).astype(
        np.uint8)
    planar = jax.device_put(np.moveaxis(fr_u8, -1, 1).copy())
    # ~3000 fps: a 4-rep trial is ~21 ms of device time vs the ~25 ms
    # tunnel RPC constant — the 2x-reps ratio then hovers at the 1.5
    # cutoff; 12 reps keep the cross-check sound.
    u8_fps = fps_of(planar, cfg_tight.replace(output_layout="planar"),
                    reps=12)
    log(f"u8-planar video pipeline (tight, planar f32 out): {fmt(u8_fps)}")
    u8q_fps = fps_of(planar, cfg_tight.replace(output_layout="planar_u8"),
                     reps=12)
    log(f"u8-planar video pipeline (tight, planar u8 out): {fmt(u8q_fps)}")

    # rect_pow2 trade: degenerate at 1080p (next_pow2(1080) = 2048 =
    # square), real at 720p (2048x1024 vs 2048x2048 = 2x fewer pixels).
    rng = np.random.default_rng(1)
    base = rng.random((720, 1280, 3)).astype(np.float32)
    clip = np.stack(
        [np.roll(base, shift=i, axis=1) * (0.95 + 0.01 * i)
         for i in range(16)]
    )
    clip_dev = jax.device_put(clip)
    sq_cfg = cfg_tuned.replace(pad_mode="square_pow2")
    rect_cfg = cfg_tuned.replace(pad_mode="rect_pow2")
    # 720p at ~4000 fps finishes a 4-rep trial in ~16 ms — inside the
    # tunnel's RPC jitter; 12 reps keep the 2x-reps cross-check sound.
    sq_fps = fps_of(clip_dev, sq_cfg, reps=12)
    rect_fps = fps_of(clip_dev, rect_cfg, reps=12)
    tight_720 = fps_of(clip_dev, cfg_tuned.replace(pad_mode="tight"),
                       reps=12)
    t720 = (f"{tight_720:.2f} fps" if tight_720 is not None
            else "SUSPECT: no trial passed the 2x-reps cross-check")
    log(f"720p tight (768x2048 = 6*128 rows): {t720}")
    out_sq, _ = magnify_video(clip_dev, sq_cfg)
    out_rc, _ = magnify_video(clip_dev, rect_cfg)
    p = psnr(np.asarray(out_rc), np.asarray(out_sq))
    if sq_fps is None or rect_fps is None:
        log("720p pad trade: SUSPECT (a trial failed the cross-check); "
            f"square={sq_fps} rect={rect_fps}")
        return
    log(f"720p pad trade: square_pow2 (2048^2) {sq_fps:.2f} fps vs "
        f"rect_pow2 (1024x2048) {rect_fps:.2f} fps "
        f"({rect_fps / sq_fps:.2f}x); rect-vs-square PSNR {p:.1f} dB "
        f"(different windows/geometry -> different vignette, not an "
        f"error metric); at 1080p rect degenerates to square "
        f"(next_pow2(1080) = 2048)")


if __name__ == "__main__":
    main()
