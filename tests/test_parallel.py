"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY.md §4c):
the sharded batched path must equal the unsharded scan path."""

import jax
import numpy as np
import pytest

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.engine.video import magnify_video
from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob
from pbmm_tpu.parallel.mesh import make_mesh, mesh_shape_for
from pbmm_tpu.parallel.sharding import magnify_batch_sharded, magnify_clip_batched
from pbmm_tpu.utils.metrics import psnr


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = MagnifyConfig()
CLIP = oscillating_gaussian_blob(height=48, width=48, frames=8)


def test_mesh_shape_for():
    assert mesh_shape_for(8, n_videos=1) == (1, 8)
    assert mesh_shape_for(8, n_videos=4) == (4, 2)
    assert mesh_shape_for(8, n_videos=64) == (8, 1)
    assert mesh_shape_for(1) == (1, 1)


def test_batched_equals_scan():
    out_scan, _ = magnify_video(CLIP, CFG)
    out_batch = magnify_clip_batched(CLIP, CFG)
    assert out_batch.shape == CLIP.shape
    assert psnr(np.asarray(out_batch), np.asarray(out_scan)) > 70.0


def test_sharded_equals_unsharded():
    batch = np.stack([CLIP, CLIP[:, ::-1]])  # 2 videos
    mesh = make_mesh((2, 4))
    out_sh = np.asarray(magnify_batch_sharded(batch, CFG, mesh))
    out_ref = np.stack(
        [np.asarray(magnify_clip_batched(v, CFG)) for v in batch]
    )
    assert psnr(out_sh, out_ref) > 70.0


def test_sharded_frame_axis_only():
    batch = CLIP[None]  # 1 video, frames over all 8 devices
    mesh = make_mesh((1, 8))
    out = np.asarray(magnify_batch_sharded(batch, CFG, mesh))
    ref, _ = magnify_video(CLIP, CFG)
    assert psnr(out[0], np.asarray(ref)) > 70.0


TUNED = MagnifyConfig(interpret_pallas=True).tuned_for_tpu()


def test_sharded_tuned_config_equals_unsharded():
    """The shipping fast config (fused Pallas spectral path) under the
    ("data", "frame") mesh — the combination VERDICT r1 flagged as never
    pinned.  Interpret mode on CPU; the real-chip leg runs in bench."""
    batch = np.stack([CLIP, CLIP[:, ::-1]])
    mesh = make_mesh((2, 4))
    out_sh = np.asarray(magnify_batch_sharded(batch, TUNED, mesh))
    out_ref = np.stack(
        [np.asarray(magnify_clip_batched(v, TUNED)) for v in batch]
    )
    assert psnr(out_sh, out_ref) > 70.0


def test_sharded_tuned_frame_axis_matches_default_path():
    """Tuned fused path, frames over all 8 devices, vs the default XLA
    path unsharded: cross-backend, cross-sharding agreement."""
    batch = CLIP[None]
    mesh = make_mesh((1, 8))
    out = np.asarray(magnify_batch_sharded(batch, TUNED, mesh))
    ref, _ = magnify_video(CLIP, CFG)
    assert psnr(out[0], np.asarray(ref)) > 70.0


def test_sharded_tuned_hermitian_active():
    """Tuned config with the Hermitian-half kept-lane layout ACTIVE
    (pad >= 512) under the ("data", "frame") mesh — the kept-width
    spectra cross the frame-shard halo."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.engine.pipeline import hermitian_active

    clip = oscillating_gaussian_blob(height=200, width=300, frames=4)
    assert hermitian_active(TUNED, geometry_for(200, 300))
    batch = np.stack([clip, clip[:, ::-1]])
    mesh = make_mesh((2, 4))
    out = np.asarray(magnify_batch_sharded(batch, TUNED, mesh))
    ref = np.asarray(magnify_clip_batched(clip, CFG))
    assert psnr(out[0], ref) > 70.0


def test_batched_rejects_iir_mode():
    from pbmm_tpu.config import TemporalConfig

    cfg = MagnifyConfig(temporal=TemporalConfig(mode="iir_bandpass"))
    with pytest.raises(ValueError, match="two-frame"):
        magnify_clip_batched(CLIP, cfg)


class TestICIModel:
    """Analytic multi-chip scaling model (r5): exact collective byte
    counts per sharding axis and the no-overlap efficiency bound."""

    def test_frame_axis_traffic(self):
        from pbmm_tpu.parallel.model import frame_axis_traffic

        t = frame_axis_traffic(2048, 1152, frames_per_shard=16)
        # one (2048, 1152) f32 re/im pair per 16-frame chunk
        assert t.bytes_per_frame == 2 * 2048 * 1152 * 4 / 16

    def test_rows_axis_traffic(self):
        from pbmm_tpu.parallel.model import rows_axis_traffic

        t = rows_axis_traffic(2048, 2048, n_dev=4, blur_radius=2)
        a2a = 2 * (2048 * 2048 * 2 * 4) * 3 / 4
        halo = 2 * 4 * 2048 * 4
        assert t.bytes_per_frame == a2a + halo

    def test_efficiency_bounds_ordering(self):
        from pbmm_tpu.parallel.model import scaling_table

        rows = scaling_table(1080, 1920, "square_pow2",
                             compute_ms_per_frame=0.45)
        frame_row = rows[0]
        assert frame_row["axis"] == "frame"
        # the 1-frame spectral halo is tiny: >= 98% bound at 1080p
        assert frame_row["efficiency_bound_no_overlap"] >= 0.98
        # rows-axis bounds decrease with devices and sit well below the
        # frame axis (all-to-alls move the whole spectrum)
        effs = [r["efficiency_bound_no_overlap"] for r in rows[1:]]
        assert all(e < frame_row["efficiency_bound_no_overlap"]
                   for e in effs)
        assert effs == sorted(effs, reverse=True)
