from pbmm_tpu.parallel.mesh import make_mesh, mesh_shape_for
from pbmm_tpu.parallel.sharding import (
    magnify_clip_batched,
    magnify_batch_sharded,
    batch_shardings,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "magnify_clip_batched",
    "magnify_batch_sharded",
    "batch_shardings",
]
