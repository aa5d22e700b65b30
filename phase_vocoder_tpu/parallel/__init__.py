"""Parallelism layer: device meshes, data-parallel batches, sequence-parallel
chunked processing with halo exchange and collective phase-state carry."""

from .mesh import make_mesh, make_mesh_2d  # noqa: F401
from .batch import (  # noqa: F401
    batch_time_stretch,
    batch_time_stretch_ragged,
    batch_time_stretch_varied,
)
from .chunked import chunked_time_stretch  # noqa: F401
