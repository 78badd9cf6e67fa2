"""Fused Pallas post kernel (blur -> combine -> YIQ->RGB -> crop) vs the
XLA posttail, interpret mode on CPU — including the quirk switches."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.core.window import geometry_for, hann2d_region
from pbmm_tpu.engine.pipeline import blur_row_window, posttail
from pbmm_tpu.engine.post_pallas import post_fused, post_pallas_ok


def _case(cfg, h=1080, w=1920, t=2, seed=0):
    geom = geometry_for(h, w, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    hr = rows[1] - rows[0]
    assert post_pallas_ok(geom, cfg, rows[0], hr)
    rng = np.random.default_rng(seed)
    rec = rng.random((t, hr, geom.pad_w)).astype(np.float32)
    ip = rng.random((t, h, w)).astype(np.float32)
    qp = rng.random((t, h, w)).astype(np.float32)
    win = hann2d_region(geom)

    rp, gp, bp = post_fused(jnp.asarray(rec), jnp.asarray(ip),
                            jnp.asarray(qp), win, cfg, rows[0], h, w,
                            cfg.pad_mode, interpret=True)
    got = np.stack([np.asarray(rp), np.asarray(gp), np.asarray(bp)],
                   axis=-1)

    yiq3 = jnp.stack([jnp.asarray(ip)] * 2 + [jnp.asarray(qp)], axis=-3)
    want = np.moveaxis(np.asarray(posttail(
        jnp.asarray(rec)[:, None], yiq3, cfg, row0=rows[0])), -3, -1)
    return got, want


def test_post_fused_matches_posttail_1080p():
    got, want = _case(MagnifyConfig().tuned_for_tpu(), t=2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_post_fused_compensate_window():
    cfg = MagnifyConfig().tuned_for_tpu().replace(compensate_window=True)
    got, want = _case(cfg, t=1, seed=1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_post_fused_yiq_gains():
    cfg = MagnifyConfig().tuned_for_tpu().replace(
        apply_yiq_gains=True, yiq_gains=(0.9, 1.2, 0.8))
    got, want = _case(cfg, t=1, seed=2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_post_pallas_rejects_no_halo():
    cfg = MagnifyConfig().tuned_for_tpu()
    geom = geometry_for(1080, 1920, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    # chroma="rgb" is served since r4 (post_fused_rgb).
    assert post_pallas_ok(geom, cfg.replace(chroma="rgb"), rows[0],
                          rows[1] - rows[0])
    # 256x256 input in a 256 pad: zero halo on every side.
    g2 = geometry_for(256, 256, "square_pow2")
    assert not post_pallas_ok(g2, cfg, 0, 256)


def test_merged_rowifft_post_end_to_end_384():
    # The r4 merged row-IFFT+post kernel (`rowifft_post_fused`): the real
    # reconstruction never exists in HBM.  384px is the smallest
    # geometry where the fused post serves (pad 512, full blur halo,
    # in_w % 128 == 0), so this drives the merged tail through
    # magnify_video end-to-end vs the generic XLA pipeline.
    from pbmm_tpu.engine.video import _colspec_ok, magnify_video
    from pbmm_tpu.oracle.synthetic import oscillating_bar
    from pbmm_tpu.utils.metrics import psnr

    cfg = MagnifyConfig(fft_backend="pallas", use_rfft=False,
                        use_fused_spectral=True, use_hermitian_spectral=True,
                        interpret_pallas=True)
    geom = geometry_for(384, 384, cfg.pad_mode)
    rows = blur_row_window(geom, cfg)
    assert post_pallas_ok(geom, cfg, rows[0], rows[1] - rows[0])
    frames = oscillating_bar(size=384, frames=4, bar_width=3)
    assert _colspec_ok(cfg, frames.shape)
    out_t, _ = magnify_video(frames, cfg)
    out_g, _ = magnify_video(frames, MagnifyConfig())
    assert psnr(np.asarray(out_t), np.asarray(out_g)) > 80.0


def test_post_fused_rgb_matches_posttail():
    # The r4 chroma="rgb" post kernel: all three planes blurred/cropped
    # in one pass vs the XLA posttail rgb branch.
    from pbmm_tpu.engine.post_pallas import post_fused_rgb

    for kw in ({}, {"compensate_window": True},
               {"apply_yiq_gains": True, "yiq_gains": (0.9, 1.2, 0.8)}):
        cfg = MagnifyConfig(chroma="rgb", **kw).tuned_for_tpu()
        h, w, t = 1080, 1920, 2
        geom = geometry_for(h, w, cfg.pad_mode)
        rows = blur_row_window(geom, cfg)
        hr = rows[1] - rows[0]
        assert post_pallas_ok(geom, cfg, rows[0], hr)
        rng = np.random.default_rng(3)
        rec3 = rng.random((3 * t, hr, geom.pad_w)).astype(np.float32)
        win = hann2d_region(geom)
        rp, gp, bp = post_fused_rgb(jnp.asarray(rec3), win, cfg, rows[0],
                                    h, w, cfg.pad_mode, interpret=True)
        got = np.stack([np.asarray(rp), np.asarray(gp), np.asarray(bp)],
                       axis=-1)
        chans = jnp.asarray(rec3).reshape(t, 3, hr, geom.pad_w)
        want = np.moveaxis(np.asarray(posttail(
            chans, jnp.zeros((t, 3, h, w), jnp.float32), cfg,
            row0=rows[0])), -3, -1)
        np.testing.assert_allclose(got, want, atol=2e-4), kw
