"""Pure-numpy YUV4MPEG2 reader/writer."""

import numpy as np
import pytest

from pbmm_tpu.io.video import load_video, save_video
from pbmm_tpu.io.y4m import load_y4m, save_y4m


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_roundtrip_444(tmp_path, rng):
    frames = rng.random((3, 24, 32, 3)).astype(np.float32)
    p = str(tmp_path / "clip.y4m")
    save_y4m(p, frames, colorspace="444")
    back = load_y4m(p)
    assert back.shape == frames.shape
    # 8-bit + limited-range quantization: ~1/219 per channel worst case.
    assert np.abs(back - np.clip(frames, 0, 1)).max() < 0.02


def test_roundtrip_420_luma_preserved(tmp_path, rng):
    # Smooth chroma (real-video-like): per-pixel random chroma would clip
    # out of gamut after subsampling and shift the recomputed luma.
    gy, gx = np.mgrid[0:16, 0:16] / 16.0
    frame = np.stack([gy, gx, 0.5 * (gx + gy)], axis=-1).astype(np.float32)
    frames = np.stack([frame, 0.95 * frame])  # no sharp chroma edges
    p = str(tmp_path / "clip420.y4m")
    save_y4m(p, frames, colorspace="420jpeg")
    back = load_y4m(p)
    # Chroma is subsampled; luma must survive to 8-bit accuracy.
    w = np.array([0.299, 0.587, 0.114])
    y_in = np.clip(frames, 0, 1) @ w
    y_out = back @ w
    assert np.abs(y_in - y_out).max() < 0.02


def test_dispatch_by_extension(tmp_path, rng):
    frames = rng.random((2, 8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "v.y4m")
    save_video(p, frames)
    back = load_video(p)
    assert back.shape == frames.shape and back.dtype == np.float32


def test_header_fps_and_rejects_non_y4m(tmp_path, rng):
    p = str(tmp_path / "v.y4m")
    save_y4m(p, rng.random((1, 8, 8, 3)), fps=(24, 1))
    with open(p, "rb") as f:
        head = f.readline().decode()
    assert "F24:1" in head and head.startswith("YUV4MPEG2")
    bad = str(tmp_path / "bad.y4m")
    with open(bad, "wb") as f:
        f.write(b"not a stream")
    with pytest.raises(ValueError):
        load_y4m(bad)
