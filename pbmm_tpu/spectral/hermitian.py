"""Hermitian-half lane layout for the bitrev spectral pipeline.

The padded Y plane is real, so its row-FFT is conjugate-symmetric across
lanes: bin k pairs with bin -k.  In the pipeline's bit-reversed lane
layout that pairing has a *dyadic block* structure (position p holds bin
rev(p); the partner bin -rev(p) sits at the within-block reversal of p
inside p's dyadic block [2^j, 2^(j+1))), so a 128-lane-aligned set of
"kept" tiles can represent the whole spectrum:

  - tiles 0..1 (lanes < 256): partners stay inside these tiles -> keep
    both, fully self-contained;
  - every larger dyadic block of tiles [b, 2b), b >= 2 tiles: the block
    reversal maps its first half onto its second half -> keep the first
    half only.

For W = 2048 that keeps 9 of 16 tiles (1152 lanes, 56%): the forward
column FFT, the phase pass, and the column IFFT all run on 9/16 of the
lanes and carry 9/16 of the spectrum bytes through HBM — the Hermitian-
half path VERDICT r2 asked for, with every array still a whole number of
128-lane tiles (no alignment break, no odd W/2+1 widths).

Exactness: the phase amplification preserves the symmetry bin-by-bin
(radial masks even in (ky,kx) -> (-ky,-kx); magnitude gates even; the
wrapped phase delta odd, so the rotation conjugates) — proven the same
way the rfft path is (`config.py::use_rfft`).  After the column IFFT the
rows are again lane-Hermitian, and the row-IFFT kernel reconstructs each
missing tile in VMEM as conj(lane-reversal(source tile)); the lane
reversal is one MXU matmul with the 128x128 anti-identity (exact: a 0/1
matrix at HIGHEST precision permutes f32 values bit-identically).

This file holds the host-side tile bookkeeping; the kernels live in
`spectral/fused.py`.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

_LANE = 128


def kept_tiles(w: int, lane: int = _LANE) -> List[int]:
    """Indices of the 128-lane tiles a Hermitian-half spectrum keeps.

    For w < 4 tiles there is nothing to save (every dyadic block of
    tiles is self-paired) and the full tile range is returned.
    """
    t = w // lane
    if w % lane or t < 4:
        return list(range(max(t, 1)))
    out = [0, 1]
    b = 2
    while b < t:
        out.extend(range(b, b + b // 2))
        b *= 2
    return out


def missing_tile_sources(w: int, lane: int = _LANE) -> Dict[int, int]:
    """missing tile index -> kept tile index whose conj-lane-reversal
    reconstructs it (the within-dyadic-block reversal partner)."""
    t = w // lane
    src: Dict[int, int] = {}
    b = 2
    while b < t:
        for m in range(b + b // 2, 2 * b):
            src[m] = 3 * b - 1 - m
        b *= 2
    return src


def hermitian_kept_width(w: int, lane: int = _LANE) -> int:
    """Lane count of the kept half-spectrum (= w when there is no saving)."""
    return len(kept_tiles(w, lane)) * min(lane, w)


def hermitian_saves(w: int, lane: int = _LANE) -> bool:
    """True iff the kept layout is strictly narrower than the full one."""
    return hermitian_kept_width(w, lane) < w


@functools.lru_cache(maxsize=16)
def kept_lane_indices(w: int, lane: int = _LANE) -> np.ndarray:
    """Absolute lane positions (into the full bitrev layout) of the kept
    tiles, in kept-array order."""
    return np.concatenate(
        [np.arange(t * lane, (t + 1) * lane) for t in kept_tiles(w, lane)]
    )


@functools.lru_cache(maxsize=16)
def reconstruction_plan(
    w: int, lane: int = _LANE
) -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """Static plan to rebuild the full lane layout from the kept array.

    Returns, per full tile t (in order), a tag tuple:
      (kept_position, 0)  -> copy kept tile at that position verbatim
      (kept_position, 1)  -> conj(lane-reversal(kept tile at position))
    where kept_position indexes tiles of the *kept* (compact) array.
    """
    kt = kept_tiles(w, lane)
    kpos = {t: i for i, t in enumerate(kt)}
    src = missing_tile_sources(w, lane)
    plan = []
    for t in range(w // lane if w >= lane else 1):
        if t in kpos:
            plan.append((kpos[t], 0))
        else:
            plan.append((kpos[src[t]], 1))
    return tuple(plan)


@functools.lru_cache(maxsize=2)
def reversal_matrix(lane: int = _LANE) -> np.ndarray:
    """The anti-identity J (lane x lane) f32: x @ J reverses lanes."""
    return np.eye(lane, dtype=np.float32)[:, ::-1].copy()


@functools.lru_cache(maxsize=16)
def kept_segments(w: int, lane: int = _LANE) -> Tuple[Tuple[int, int], ...]:
    """The kept tiles merged into maximal contiguous (start_tile, end_tile)
    runs — 3 runs at W=2048 ([0,3), [4,6), [8,12)) — so in-kernel
    slicing/concatenation touches 3 big lane blocks, not 9 tile-sized
    ones (fewer Mosaic copies)."""
    kt = kept_tiles(w, lane)
    runs = []
    start = prev = kt[0]
    for t in kt[1:]:
        if t != prev + 1:
            runs.append((start, prev + 1))
            start = t
        prev = t
    runs.append((start, prev + 1))
    return tuple(runs)
