"""Streaming magnification driver: native prefetch reader + chunked scan.

Overlaps host-side IO/decode (the native frame loader's prefetch thread)
with device compute, threading `VideoState` across chunks so per-device
memory stays flat for arbitrarily long videos (SURVEY.md §5 long-context
row).

`stream_magnify_resumable` adds the driver-level failure-recovery loop the
reference cannot have (its only cross-frame state is one texture rebuilt
every run, `MotionMagnificationProcessor.cs:56-57,142`; SURVEY.md §5
failure row): output frames land incrementally in a preallocated .npy and
the `VideoState` checkpoint is written atomically after every chunk, so a
killed host restarts with the same command line and resumes from the last
completed chunk, bit-identically to an uninterrupted run.
"""

from __future__ import annotations

import os
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


def stream_magnify_resumable(
    input_path: str,
    output_path: str,
    cfg: MagnifyConfig,
    chunk_frames: int = 8,
    checkpoint: str = "",
    max_chunks: Optional[int] = None,
) -> int:
    """Stream `input_path` -> magnified `output_path` (.npy), checkpointing
    after every chunk so a killed run resumes exactly where it stopped.

    Protocol per chunk: write the magnified frames into the preallocated
    output memmap, flush, then atomically replace the checkpoint (state +
    frame_idx).  A crash between those two steps only re-runs one chunk on
    resume — frames are rewritten with identical values, never skipped or
    duplicated.  Resume requires the same `chunk_frames` (checkpoints land
    on chunk boundaries).

    `max_chunks` is the fault-injection hook: stop (as a kill would) after
    that many chunks.  Returns the number of frames completed in total.
    """
    from pbmm_tpu.engine.state import load_state, save_state
    from pbmm_tpu.io.video import video_shape

    if not output_path.endswith(".npy"):
        raise ValueError("resumable streaming writes incremental .npy "
                         f"output, got {output_path!r}")
    t, h, w, c = video_shape(input_path)

    start = 0
    state: Optional[VideoState] = None
    if checkpoint and os.path.exists(checkpoint):
        state = load_state(checkpoint)
        start = int(np.asarray(state.frame_idx))
        if start % chunk_frames != 0 and start < t:
            raise ValueError(
                f"checkpoint frame_idx={start} is not a multiple of "
                f"chunk_frames={chunk_frames}; resume with the original "
                "chunk size"
            )

    if os.path.exists(output_path) and start > 0:
        out_mm = np.lib.format.open_memmap(output_path, mode="r+")
        if out_mm.shape != (t, h, w, c) or out_mm.dtype != np.float32:
            raise ValueError(
                f"existing output {output_path!r} has "
                f"{out_mm.dtype}{out_mm.shape}, expected "
                f"float32({t}, {h}, {w}, {c})"
            )
    else:
        out_mm = np.lib.format.open_memmap(
            output_path, mode="w+", dtype=np.float32, shape=(t, h, w, c)
        )
        start = 0
        state = None

    pos = start
    done_chunks = 0
    for chunk_out, state in _resume_chunks(
        input_path, cfg, chunk_frames, start, state
    ):
        n = chunk_out.shape[0]
        out_mm[pos:pos + n] = chunk_out
        out_mm.flush()
        pos += n
        if checkpoint:
            save_state(state, checkpoint)
        done_chunks += 1
        if max_chunks is not None and done_chunks >= max_chunks:
            break
    return pos


def _resume_chunks(
    input_path: str,
    cfg: MagnifyConfig,
    chunk_frames: int,
    skip_frames: int,
    state: Optional[VideoState],
) -> Iterator[tuple]:
    """Yield (magnified_chunk, new_state) starting at frame `skip_frames`.

    The native prefetch loader has no seek, so already-completed chunks are
    read and discarded (cheap: decode only, no device work); the numpy
    fallback slices directly.
    """
    try:
        from pbmm_tpu.native import NativeFrameLoader

        loader = NativeFrameLoader(input_path, chunk_frames)
        chunk_iter = iter(loader)
    except (RuntimeError, ValueError):
        loader = None
        chunk_iter = _chunks_numpy(input_path, chunk_frames)

    seen = 0
    try:
        for chunk in chunk_iter:
            n = chunk.shape[0]
            if seen + n <= skip_frames:
                seen += n
                continue
            seen += n
            out, state = magnify_video(chunk, cfg, state=state)
            yield np.asarray(out), state
    finally:
        if loader is not None:
            loader.close()
