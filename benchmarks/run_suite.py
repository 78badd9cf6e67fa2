"""BASELINE.json benchmark suite — the five driver-defined configs.

Each config prints one JSON line {config, frames_per_s, psnr_vs_oracle, ...}.
Configs 1-3 validate quality against the numpy oracle as well as throughput;
config 4 exercises the sharded batched engine; config 5 measures
scaling efficiency across however many devices exist (8 virtual CPU devices
in CI; a real slice on hardware).

Run:  python benchmarks/run_suite.py [--configs 1,2,3] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    np.asarray(x).ravel()[:1]


def _time_video(frames, cfg, reps=3):
    import jax

    from pbmm_tpu.parallel.sharding import magnify_clip_batched

    fd = jax.device_put(frames)
    out = magnify_clip_batched(fd, cfg)
    _sync(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = magnify_clip_batched(fd, cfg)
    _sync(out[0, 0, 0])
    return len(frames) * reps / (time.perf_counter() - t0), out


def config1(quick):
    """2-scale, 4-orientation steerable pyramid, 128x128 oscillating bar."""
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.oracle.reference import oracle_magnify_video
    from pbmm_tpu.oracle.synthetic import oscillating_bar
    from pbmm_tpu.utils.metrics import psnr, ssim

    frames = oscillating_bar(size=128, frames=16 if quick else 64, bar_width=2)
    # 2 mid scales + high/low pass = 4 levels; 4 angular sectors per scale.
    cfg = _maybe_tuned(
        MagnifyConfig(pyramid_levels=4, orientations=4, phase_scale=10.0))
    fps, out = _time_video(frames, cfg)
    # Quality for the SAME config that is timed: the fp64 oracle carries
    # an independent steerable bank (`oracle.reference.steerable_mask_planes`)
    # since r3, so the angular extension's values are pinned end-to-end.
    oracle = oracle_magnify_video(frames, cfg)
    return {
        "config": 1,
        "desc": "steerable 4-level/4-orient 128px bar",
        "frames_per_s": round(fps, 2),
        "psnr_vs_oracle": round(psnr(np.asarray(out), oracle), 1),
        "ssim_vs_oracle": round(ssim(np.asarray(out), oracle), 4),
    }


def config2(quick):
    """5 levels, 8 orientations, 256x256, IIR temporal + phase-scale sweep."""
    from pbmm_tpu.config import MagnifyConfig, TemporalConfig
    from pbmm_tpu.engine.video import magnify_video
    from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob

    import jax

    frames = jax.device_put(oscillating_gaussian_blob(
        height=256, width=256, frames=8 if quick else 32
    ))  # staged on device: measure compute, not tunnel transfer
    results = {}
    for scale in ([5.0] if quick else [1.0, 5.0, 15.0]):
        cfg = _maybe_tuned(MagnifyConfig(
            pyramid_levels=5,
            orientations=8,
            phase_scale=scale,
            temporal=TemporalConfig(mode="iir_bandpass", low_hz=0.5,
                                    high_hz=6.0, fps=30.0),
        ))
        out, _ = magnify_video(frames, cfg)  # warm-up: compile
        _sync(out[0, 0, 0])
        t0 = time.perf_counter()
        out, _ = magnify_video(frames, cfg)
        _sync(out[0, 0, 0])
        results[f"fps_scale{scale:g}"] = round(
            len(frames) / (time.perf_counter() - t0), 2
        )
    return {"config": 2, "desc": "5L/8K 256px IIR sweep", **results}


def config3(quick):
    """RGB/YIQ 512x512, chroma-preserving, streaming IIR state."""
    from pbmm_tpu.config import MagnifyConfig, TemporalConfig
    from pbmm_tpu.engine.video import magnify_video
    from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob

    import jax

    frames = jax.device_put(oscillating_gaussian_blob(
        height=512, width=512, frames=4 if quick else 16
    ))  # staged on device: measure compute, not tunnel transfer
    cfg = _maybe_tuned(MagnifyConfig(
        temporal=TemporalConfig(mode="iir_bandpass", low_hz=0.4,
                                high_hz=4.0, fps=30.0)
    ))
    # Streamed in 2 chunks with carried state (the streaming contract).
    half = len(frames) // 2
    out1, st = magnify_video(frames[:half], cfg)  # warm-up: compile
    out2, _ = magnify_video(frames[half:], cfg, state=st)
    _sync(out2[0, 0, 0])
    t0 = time.perf_counter()
    out1, st = magnify_video(frames[:half], cfg)
    out2, _ = magnify_video(frames[half:], cfg, state=st)
    _sync(out2[0, 0, 0])
    fps = len(frames) / (time.perf_counter() - t0)
    return {"config": 3, "desc": "512px YIQ streaming IIR",
            "frames_per_s": round(fps, 2)}


def config4(quick):
    """Batched 1080p multi-video, frames sharded across chips —
    DEVICE-RESIDENT (r5: frames staged onto the mesh before timing, so
    the number measures sharded compute, not host->device transfer),
    with the analytic ICI scaling model published alongside (real
    N>=2-chip runs are impossible on this 1-chip box; the model gives
    the reader the projection the missing hardware would test)."""
    import jax

    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.parallel.mesh import make_mesh, mesh_shape_for
    from pbmm_tpu.parallel.sharding import magnify_batch_sharded

    n = jax.device_count()
    h, w = (270, 480) if quick else (1080, 1920)
    shape = mesh_shape_for(n, n_videos=2)
    mesh = make_mesh(shape)
    b, t = shape[0], 2 * shape[1]
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.random((b, t, h, w, 3)).astype(np.float32))
    cfg = MagnifyConfig()
    out = magnify_batch_sharded(frames, cfg, mesh)
    _sync(out[0, 0, 0, 0])
    reps = 2 if quick else 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = magnify_batch_sharded(frames, cfg, mesh)
    _sync(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 * reps):
        out = magnify_batch_sharded(frames, cfg, mesh)
    _sync(out[0, 0, 0, 0])
    dt2 = time.perf_counter() - t0
    fps = b * t * reps / max(dt2 - dt, 1e-9)  # marginal rate
    from pbmm_tpu.parallel.model import scaling_table

    return {"config": 4,
            "desc": f"sharded {h}p batch on {n} devices (device-resident, "
                    "marginal rate)",
            "frames_per_s": round(fps, 2), "devices": n,
            "mesh": list(shape),
            "ici_model": scaling_table(
                h, w, cfg.pad_mode,
                compute_ms_per_frame=round(1e3 / fps, 3))}


def config5(quick):
    """Scaling efficiency: same per-device work on 1 vs all devices."""
    import jax

    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.parallel.mesh import make_mesh
    from pbmm_tpu.parallel.sharding import magnify_batch_sharded

    n = jax.device_count()
    h, w = (135, 240) if quick else (540, 960)
    t_per_dev = 2 if quick else 8  # enough device time for the marginal
    #                                rate to clear tunnel jitter
    cfg = MagnifyConfig()
    rng = np.random.default_rng(0)

    def run(n_dev):
        mesh = make_mesh((1, n_dev), devices=jax.devices()[:n_dev])
        frames = jax.device_put(rng.random(
            (1, t_per_dev * n_dev, h, w, 3)).astype(np.float32))
        out = magnify_batch_sharded(frames, cfg, mesh)
        _sync(out[0, 0, 0, 0])
        reps = 6  # marginal rate: the per-call dispatch constant cancels
        for _ in range(4):  # retry until the 2x-reps cross-check holds
            t0 = time.perf_counter()
            for _ in range(reps):
                out = magnify_batch_sharded(frames, cfg, mesh)
            _sync(out[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(2 * reps):
                out = magnify_batch_sharded(frames, cfg, mesh)
            _sync(out[0, 0, 0, 0])
            dt2 = time.perf_counter() - t0
            if 1.5 <= dt2 / dt <= 2.5:
                return (t_per_dev * n_dev) * reps / (dt2 - dt)
        return (t_per_dev * n_dev) * reps / max(dt2 - dt, 1e-9)

    fps1 = run(1)
    if n == 1:
        # One real chip: fps_ndev would re-run the identical config and
        # the "efficiency" would be pure run-to-run tunnel noise (r4's
        # 1.11, this round's 1.38 draft).  Nothing to scale: report the
        # single-device rate and point at the analytic model.
        from pbmm_tpu.parallel.model import scaling_table

        return {"config": 5, "desc": "frame-shard scaling efficiency",
                "devices": 1, "fps_1dev": round(fps1, 2),
                "fps_ndev": None, "efficiency": None,
                "note": "1 real chip: no scaling to measure; the "
                        "ici_model_1080p rows give the per-axis "
                        "no-overlap bounds a real slice would test",
                "ici_model_1080p": scaling_table(
                    1080, 1920, cfg.pad_mode, compute_ms_per_frame=0.45)}
    fpsn = run(n)
    eff = fpsn / (fps1 * n)
    # The measured efficiency is only meaningful on real multi-chip
    # hardware; on the CI's 8 timeshared virtual CPU devices it is
    # vacuous (all "devices" share the same cores).  The analytic ICI
    # model gives the projection a real slice would test (r5): the
    # frame axis moves ONE spectrum plane pair per shard per chunk, so
    # its no-overlap efficiency bound at 1080p is >0.98.
    from pbmm_tpu.parallel.model import scaling_table

    backend_is_cpu = jax.devices()[0].platform == "cpu"
    return {"config": 5, "desc": "frame-shard scaling efficiency",
            "devices": n, "fps_1dev": round(fps1, 2),
            "fps_ndev": round(fpsn, 2), "efficiency": round(eff, 3),
            "measured_efficiency_meaningful": not backend_is_cpu or n == 1,
            "ici_model_1080p": scaling_table(
                1080, 1920, cfg.pad_mode,
                compute_ms_per_frame=0.45)}


_TUNED = False


def _maybe_tuned(cfg):
    """--tuned: the production TPU configuration (fused Pallas kernel
    set) for the single-device configs 1-3; configs 4-5 exercise the
    sharded engines, which pick their own per-shard kernels."""
    return cfg.tuned_for_tpu() if _TUNED else cfg


def main():
    global _TUNED
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tuned", action="store_true",
                    help="run configs 1-3 in the tuned fused-Pallas TPU "
                         "configuration (the production path on hardware)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-virtual-device CPU platform (this "
                         "box's sitecustomize pins the tunneled TPU; a "
                         "config update after import is required, plain "
                         "env vars are ignored)")
    args = ap.parse_args()
    _TUNED = args.tuned
    if args.cpu:
        import os as _o
        _f = _o.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in _f:
            _o.environ["XLA_FLAGS"] = (
                _f + " --xla_force_host_platform_device_count=8").strip()
        import jax as _j
        _j.config.update("jax_platforms", "cpu")
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
    for c in [int(x) for x in args.configs.split(",")]:
        try:
            print(json.dumps(fns[c](args.quick)), flush=True)
        except Exception as e:  # keep the suite running
            print(json.dumps({"config": c, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
