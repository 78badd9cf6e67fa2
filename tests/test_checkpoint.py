"""Checkpoint/resume: a host restart mid-stream must reproduce the
uninterrupted run exactly (SURVEY.md §5)."""

import numpy as np

from pbmm_tpu.config import MagnifyConfig, TemporalConfig
from pbmm_tpu.engine.state import load_state, save_state
from pbmm_tpu.engine.video import magnify_video
from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob


def _roundtrip(cfg, tmp_path):
    clip = oscillating_gaussian_blob(height=32, width=32, frames=10)
    whole, _ = magnify_video(clip, cfg)

    first, st = magnify_video(clip[:5], cfg)
    save_state(st, str(tmp_path / "ckpt.npz"))
    st2 = load_state(str(tmp_path / "ckpt.npz"))
    assert int(st2.frame_idx) == int(st.frame_idx)
    rest, _ = magnify_video(clip[5:], cfg, state=st2)

    resumed = np.concatenate([np.asarray(first), np.asarray(rest)])
    np.testing.assert_allclose(resumed, np.asarray(whole), atol=1e-5)


def test_resume_two_frame(tmp_path):
    _roundtrip(MagnifyConfig(), tmp_path)


def test_resume_iir(tmp_path):
    _roundtrip(
        MagnifyConfig(
            temporal=TemporalConfig(mode="iir_bandpass", low_hz=0.5,
                                    high_hz=4.0, fps=30.0)
        ),
        tmp_path,
    )


def test_resume_nocache_mode(tmp_path):
    _roundtrip(MagnifyConfig(cache_prev_spectrum=False), tmp_path)
