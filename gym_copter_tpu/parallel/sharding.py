"""Device-mesh sharding for batched environments and learners.

The reference has no parallelism of any kind (one env object, one process —
SURVEY.md §2.3); this module is the new build's scaling layer.  Environments
are embarrassingly parallel, so the design is pure data parallelism over a
1-D `env` mesh axis:

  * every (…, B) leaf of the env state is sharded along its batch (lane)
    axis; the jitted step partitions with zero communication;
  * learner parameters are replicated; the only collectives are the
    all-reduce of gradients (inserted automatically by the SPMD
    partitioner when a replicated output is computed from sharded inputs),
    riding ICI within a slice and DCN across hosts;
  * per-env randomness is keyed by *global* env id (envs/base.py), so any
    sharding layout reproduces the single-device trajectories bit-exactly.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes' devices and `env_id_offset` gives each
host's shard its global id range.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = 'env'


def make_mesh(devices: Optional[Sequence] = None, axis: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (local or global) devices for env-batch sharding."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = ENV_AXIS) -> NamedSharding:
    """Sharding for a (B,) per-env leaf."""
    return NamedSharding(mesh, P(axis))


def batched_sharding(mesh: Mesh, ndim: int, axis: str = ENV_AXIS) -> NamedSharding:
    """Sharding for a (..., B) leaf: batch is always the LAST axis in the
    struct-of-arrays layout, everything else replicated."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis])))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(tree, mesh: Mesh, axis: str = ENV_AXIS):
    """Place an EnvState / TimeStep / any (…, B)-leaf pytree on the mesh,
    sharded along the trailing batch axis."""
    return jax.device_put(
        tree,
        jax.tree.map(lambda x: batched_sharding(mesh, np.ndim(x), axis), tree),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree (e.g. learner params) replicated on every device."""
    return jax.device_put(tree, jax.tree.map(lambda _: replicated(mesh), tree))
