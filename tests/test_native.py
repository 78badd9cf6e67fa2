"""Native frame loader: build, parse, prefetch, convert — vs numpy."""

import numpy as np
import pytest

from pbmm_tpu.native import (
    NativeFrameLoader,
    convert_u8_frames,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no native toolchain"
)


@needs_native
def test_loader_f32_roundtrip(tmp_path, rng):
    frames = rng.random((10, 6, 8, 3)).astype(np.float32)
    p = tmp_path / "v.npy"
    np.save(p, frames)
    with NativeFrameLoader(str(p), chunk_frames=4) as ld:
        assert ld.num_frames == 10
        assert ld.shape == (6, 8, 3)
        got = np.concatenate(list(ld))
    np.testing.assert_array_equal(got, frames)


@needs_native
def test_loader_u8_normalizes(tmp_path, rng):
    frames = (rng.random((5, 4, 4, 3)) * 255).astype(np.uint8)
    p = tmp_path / "v8.npy"
    np.save(p, frames)
    with NativeFrameLoader(str(p), chunk_frames=2) as ld:
        got = np.concatenate(list(ld))
    np.testing.assert_allclose(got, frames.astype(np.float32) / 255.0,
                               atol=1e-7)


@needs_native
def test_loader_rejects_bad_file(tmp_path):
    p = tmp_path / "bad.npy"
    np.save(p, np.zeros((4, 4)))  # wrong rank
    with pytest.raises(ValueError):
        NativeFrameLoader(str(p))


@needs_native
def test_convert_u8(rng):
    x = (rng.random((3, 5, 5, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(
        convert_u8_frames(x), x.astype(np.float32) / 255.0, atol=1e-7
    )


@needs_native
def test_stream_magnify_equals_whole(tmp_path):
    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.engine.video import magnify_video
    from pbmm_tpu.io.stream import stream_magnify
    from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob

    clip = oscillating_gaussian_blob(height=32, width=32, frames=9)
    p = tmp_path / "clip.npy"
    np.save(p, clip)
    cfg = MagnifyConfig()
    streamed = np.concatenate(list(stream_magnify(str(p), cfg,
                                                  chunk_frames=4)))
    whole, _ = magnify_video(clip, cfg)
    np.testing.assert_allclose(streamed, np.asarray(whole), atol=1e-5)
