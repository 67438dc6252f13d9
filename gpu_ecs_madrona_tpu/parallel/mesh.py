"""World sharding across TPU chips/hosts.

The reference is strictly single-GPU (SURVEY.md §2.8: no distributed
anything); its scale axis is worlds-per-device.  The TPU-native design adds
the missing axis: every SimState leaf carries a leading ``num_worlds`` dim,
so the entire simulation shards by annotating that one axis over a device
mesh and letting pjit/XLA partition the step function.  No collectives are
needed inside a step (worlds are independent by construction — the same
property the reference's thread-per-world megakernel exploits); ICI traffic
appears only when a learner reduces across worlds.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLD_AXIS = "worlds"


def make_world_mesh(devices: Optional[Sequence] = None, axis_name: str = WORLD_AXIS) -> Mesh:
    """A 1-D mesh over all (or given) devices, worlds axis sharded."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def world_sharding(mesh: Mesh, axis_name: str = WORLD_AXIS) -> NamedSharding:
    """Sharding that splits the leading worlds axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_state(state, mesh: Mesh, axis_name: str = WORLD_AXIS):
    """Place every SimState leaf with its worlds axis split over the mesh."""
    sh = world_sharding(mesh, axis_name)
    return jax.device_put(state, jax.tree_util.tree_map(lambda _: sh, state))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed).  The TPU-native analog of a
    launcher — the reference has no equivalent.  No-op when single-process
    args are absent."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
