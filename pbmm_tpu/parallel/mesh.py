"""Device-mesh construction.

The reference has no multi-device capability of any kind (SURVEY.md §2.5) —
this layer is green-field, specified by BASELINE.json: a 2D
("data", "frame") mesh where independent videos shard over "data" and the
frame axis of each video shards over "frame" with a 1-frame halo exchange
for the two-frame temporal dependency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, n_videos: int = 1) -> Tuple[int, int]:
    """Pick (data, frame) mesh dims: give the data axis as many devices as
    there are videos to spread (capped at n_devices), the rest to frames."""
    data = 1
    d = n_devices
    while data * 2 <= min(n_videos, n_devices) and d % 2 == 0:
        data *= 2
        d //= 2
    return data, n_devices // data


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "frame"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = mesh_shape_for(n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
