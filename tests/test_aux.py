"""Auxiliary subsystems: launcher helpers, debug checks."""

import numpy as np
import pytest

from pbmm_tpu.parallel.launcher import (
    global_mesh,
    host_local_batch_slice,
    initialize_distributed,
)
from pbmm_tpu.utils.checks import assert_finite, debug_mode


def test_initialize_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_global_mesh_covers_all_devices():
    import jax

    mesh = global_mesh(n_videos=2)
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "frame")


def test_host_local_batch_slice_single_process():
    assert host_local_batch_slice(5) == (0, 5)


def test_assert_finite():
    assert_finite("ok", np.ones(3))
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite("bad", np.array([1.0, np.nan]))


def test_debug_mode_catches_nan():
    import jax
    import jax.numpy as jnp

    with debug_mode(interpret_pallas=False):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) / x)(jnp.float32(-1.0)).block_until_ready()
    # restored afterwards
    assert not jax.config.jax_debug_nans


def test_debug_mode_runs_pipeline_interpreted():
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.engine.pipeline import magnify_frame_pair
    from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob

    frames = oscillating_gaussian_blob(height=16, width=16, frames=2)
    with debug_mode():
        out = np.asarray(
            magnify_frame_pair(frames[0], frames[1], MagnifyConfig())
        )
    assert np.isfinite(out).all()


def test_parity_tool_passes():
    from pbmm_tpu.tools.parity import run_parity

    results = run_parity(size=64, frames=4,
                         which="pyramid_defaults,standard")
    assert len(results) == 2
    assert all(r["pass_35db"] for r in results)
    assert all(r["psnr_db"] > 55 for r in results)


def test_tuned_for_tpu_config():
    from pbmm_tpu.config import MagnifyConfig

    cfg = MagnifyConfig().tuned_for_tpu()
    assert cfg.fft_backend == "pallas" and not cfg.use_rfft
    # quality-affecting params unchanged
    assert cfg.phase_scale == 10.0 and cfg.pyramid_levels == 5


def test_roofline_analytic_model():
    """The roofline byte model must track the real geometry: stages,
    positive bytes, and the phase stage reading exactly two full complex
    spectra (4 f32 planes) while writing only the row-windowed halo."""
    import sys

    sys.path.insert(0, ".")
    from benchmarks.roofline import hot_path_stages
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import blur_row_window

    cfg = MagnifyConfig().tuned_for_tpu()
    stages = hot_path_stages(1080, 1920, cfg)
    # 4 stages since the r5 spectrum-resident chunk engine (the column
    # spectrum never exists in HBM; the r4 k2/k3 pair is one kernel).
    assert len(stages) == 4
    assert "merged" in stages[3][0]
    assert all(bi > 0 and bo > 0 and fl > 0 for _, bi, bo, fl in stages)

    from pbmm_tpu.spectral.fused import aligned_row_window
    from pbmm_tpu.spectral.hermitian import hermitian_kept_width

    geom = geometry_for(1080, 1920, cfg.pad_mode)
    b0, b1 = blur_row_window(geom, cfg)
    r0, r1 = aligned_row_window(geom.y0, geom.y0 + geom.in_h, geom.pad_h)
    wk = hermitian_kept_width(geom.pad_w)  # tuned config keeps 9/16 lanes
    assert wk == 1152
    name, bi, bo, _ = stages[2]
    assert "colspec" in name
    # Per frame: content-row spectra in, row-windowed inverse out, plus
    # the chunk-boundary prev-spectrum state amortized over T=16.
    amort = (4 * geom.pad_h * wk * 4) // 16
    assert bi == 2 * (r1 - r0) * wk * 4 + amort
    assert bo == 2 * (b1 - b0) * wk * 4 + amort

    # full-width config: the same stage reads full spectra
    full_cfg = cfg.replace(use_hermitian_spectral=False)
    _, bi_f, bo_f, _ = hot_path_stages(1080, 1920, full_cfg)[2]
    amort_f = (4 * geom.pad_h * geom.pad_w * 4) // 16
    assert bi_f == 2 * (r1 - r0) * geom.pad_w * 4 + amort_f
    assert bo_f == 2 * (b1 - b0) * geom.pad_w * 4 + amort_f
