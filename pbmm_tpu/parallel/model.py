"""Analytic multi-chip scaling model (r5, VERDICT r4 ask 5).

Real N>=2-chip hardware is not available in this environment (one
tunneled v5e chip), so the multi-chip story is split honestly into
three pieces the reader can combine:

  1. correctness: every sharded engine is bit/psnr-tested on the
     8-virtual-device CPU mesh (tests/test_parallel.py, test_spatial.py)
     and dry-run-compiled by the driver (`__graft_entry__.py`);
  2. measured single-chip compute: bench.py / SUITE configs 1-3;
  3. THIS MODULE: exact per-frame collective traffic for each sharding
     axis at a given geometry, and the no-overlap efficiency bound it
     implies against the v5e ICI bandwidth.

The collectives per axis (see `parallel/sharding.py`, `parallel/
spatial.py`):

  frame axis ("sp"): the two-frame pairing needs each shard's FIRST
    frame to receive its left neighbor's LAST spectrum — ONE
    collective-permute of one (Hp, Wk) re/im plane pair per shard per
    chunk, amortized over the shard's frames.  (IIR is sequential across
    frames and never frame-sharded.)
  rows axis ("tp"): the distributed FFT's two all-to-alls per frame
    (forward and inverse transpose of the shard axis — each moves
    (p-1)/p of the full complex spectrum) plus the blur's 2r-row halo
    exchange.
  data axis ("dp"): zero steady-state collectives (videos are
    independent; only metric psums).

v5e public figure: 1600 Gbps = 200 GB/s aggregate ICI per chip (4
links); the model reports the no-overlap bound t_comm = bytes / 200 GB/s
serialized after compute — XLA overlaps collectives with compute in
practice, so real efficiency lands between this bound and 1.0.
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_ICI_GBPS = 200.0  # 1600 Gbps aggregate per chip (Google Cloud docs)
_F = 4  # f32 bytes


@dataclass
class AxisTraffic:
    axis: str
    bytes_per_frame: float  # collective bytes crossing ICI per frame
    note: str


def frame_axis_traffic(pad_h: int, kept_w: int,
                       frames_per_shard: int) -> AxisTraffic:
    """One (Hp, Wk) f32 re/im spectrum-plane pair ppermuted per shard
    per chunk (the 1-frame temporal halo), amortized per frame."""
    per_chunk = 2 * pad_h * kept_w * _F
    return AxisTraffic(
        "frame", per_chunk / max(frames_per_shard, 1),
        f"1 spectrum plane pair ({per_chunk / 1e6:.1f} MB) per shard per "
        f"{frames_per_shard}-frame chunk",
    )


def rows_axis_traffic(pad_h: int, pad_w: int, n_dev: int,
                      blur_radius: int = 2) -> AxisTraffic:
    """Two all-to-alls of the full complex spectrum (each moves
    (p-1)/p of it across ICI) + the blur halo (2r rows in each
    direction), per frame."""
    p = max(n_dev, 1)
    a2a = 2 * (pad_h * pad_w * 2 * _F) * (p - 1) / p
    halo = 2 * (2 * blur_radius) * pad_w * _F
    return AxisTraffic(
        "rows", a2a + halo,
        f"2 all-to-alls x {(pad_h * pad_w * 2 * _F) / 1e6:.1f} MB x "
        f"(p-1)/p + {halo / 1e6:.2f} MB blur halo",
    )


def efficiency_bound(compute_ms_per_frame: float, traffic: AxisTraffic,
                     ici_gbps: float = V5E_ICI_GBPS) -> dict:
    """No-overlap scaling-efficiency bound: each chip keeps its full
    per-frame compute and additionally serializes its collective bytes
    through ICI.  eff = t_compute / (t_compute + t_comm)."""
    t_comm_ms = traffic.bytes_per_frame / (ici_gbps * 1e9) * 1e3
    eff = compute_ms_per_frame / (compute_ms_per_frame + t_comm_ms)
    return {
        "axis": traffic.axis,
        "collective_mb_per_frame": round(traffic.bytes_per_frame / 1e6, 3),
        "t_comm_ms_per_frame": round(t_comm_ms, 4),
        "compute_ms_per_frame": round(compute_ms_per_frame, 3),
        "efficiency_bound_no_overlap": round(eff, 3),
        "note": traffic.note,
        "ici_gbps_assumed": ici_gbps,
    }


def scaling_table(h: int, w: int, pad_mode: str,
                  compute_ms_per_frame: float,
                  frames_per_shard: int = 16,
                  devices=(2, 4, 8)) -> list:
    """Per-axis projected efficiency bounds at the given geometry for a
    range of slice sizes — the numbers SUITE config 4/5 publish."""
    from pbmm_tpu.core.window import geometry_for
    from pbmm_tpu.spectral.hermitian import (
        hermitian_kept_width,
        hermitian_saves,
    )

    geom = geometry_for(h, w, pad_mode)
    wk = (hermitian_kept_width(geom.pad_w)
          if hermitian_saves(geom.pad_w) else geom.pad_w)
    rows = []
    ft = frame_axis_traffic(geom.pad_h, wk, frames_per_shard)
    rows.append({"devices": "any", **efficiency_bound(
        compute_ms_per_frame, ft)})
    for n in devices:
        rt = rows_axis_traffic(geom.pad_h, geom.pad_w, n)
        rows.append({"devices": n, **efficiency_bound(
            compute_ms_per_frame, rt)})
    return rows
