"""Parallelism: device mesh, launch grids, sharded ensembles, checkpoint,
multi-host scale-out."""

from . import checkpoint, distributed, ensemble, mesh
from .ensemble import LaunchSpec, build_launch, ensemble_stats, make_ensemble_tracer, pad_batch
from .mesh import make_ray_mesh, ray_sharding, shard_batch

__all__ = [
    "distributed",
    "LaunchSpec",
    "build_launch",
    "checkpoint",
    "ensemble",
    "ensemble_stats",
    "make_ensemble_tracer",
    "make_ray_mesh",
    "mesh",
    "pad_batch",
    "ray_sharding",
    "shard_batch",
]
