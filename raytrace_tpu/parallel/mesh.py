"""Device mesh and sharding helpers for ray ensembles.

The reference has no parallelism of any kind (single-threaded Julia; the
author's own TODO "2. Vectorize!" at RayMain.jl:104 was never done). The
embarrassingly parallel axis is the ray batch, so the TPU-native design is
a 1-D mesh over axis 'rays': vmap within a chip, NamedSharding over ICI
across chips (SURVEY.md section 2, parallelism inventory). The environment
is a replicated pytree of scalars; no communication exists in the hot loop
and the only collectives are terminal reductions for ensemble statistics,
which XLA inserts automatically from the sharded jit.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_ray_mesh(devices=None):
    """1-D mesh over all (or the given) devices, axis name 'rays'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh):
    """Shard the leading (ray) axis; replicate everything else."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_rays(n, mesh, multiple=8):
    """Padded batch size: divisible by mesh size and the given multiple
    (TPU lanes want the batch a multiple of 8 x 128 once tiled; 8 is the
    practical floor for small tests)."""
    k = mesh.devices.size * multiple
    return -(-n // k) * k


def shard_batch(pytree, mesh):
    """Device_put a batch pytree with the ray axis sharded over the mesh."""
    return jax.device_put(pytree, ray_sharding(mesh))
