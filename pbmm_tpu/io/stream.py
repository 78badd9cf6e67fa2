"""Streaming magnification driver: native prefetch reader + chunked scan.

Overlaps host-side IO/decode (the native frame loader's prefetch thread)
with device compute, threading `VideoState` across chunks so per-device
memory stays flat for arbitrarily long videos (SURVEY.md §5 long-context
row).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from pbmm_tpu.config import MagnifyConfig
from pbmm_tpu.engine.video import VideoState, magnify_video


def _chunks_numpy(path: str, chunk_frames: int) -> Iterator[np.ndarray]:
    from pbmm_tpu.io.video import load_video

    frames = load_video(path)
    for i in range(0, len(frames), chunk_frames):
        yield frames[i : i + chunk_frames]


def stream_magnify(
    path: str,
    cfg: MagnifyConfig,
    chunk_frames: int = 8,
    state: Optional[VideoState] = None,
) -> Iterator[np.ndarray]:
    """Yield magnified chunks of (n, H, W, 3) f32.

    Uses the native double-buffered loader when available (uint8 .npy
    streams convert to f32 off the main thread); otherwise falls back to a
    whole-file numpy read.
    """
    try:
        from pbmm_tpu.native import NativeFrameLoader

        loader = NativeFrameLoader(path, chunk_frames)
        chunk_iter = iter(loader)
    except (RuntimeError, ValueError):
        loader = None
        chunk_iter = _chunks_numpy(path, chunk_frames)

    try:
        for chunk in chunk_iter:
            out, state = magnify_video(chunk, cfg, state=state)
            yield np.asarray(out)
    finally:
        if loader is not None:
            loader.close()
