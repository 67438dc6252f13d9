"""Base components shared by engine systems.

Mirrors reference include/madrona/components.hpp:9-29 (Position, Rotation,
Scale, ObjectID) plus the WorldID concept — which on TPU is implicit: the
leading axis of every array *is* the world id, so no per-row WorldID column
exists (reference needs one for its world-keyed radix sort; we don't).
"""

import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import component
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry

# Position: Vector3 (components.hpp:11)
Position = component("Position", ((3,), jnp.float32))
# Rotation: Quat, stored (w, x, y, z) (components.hpp:15)
Rotation = component("Rotation", ((4,), jnp.float32))
# Scale: Diag3x3 (components.hpp:19)
Scale = component("Scale", ((3,), jnp.float32))
# ObjectID: index into physics/render asset tables (components.hpp:23-25)
ObjectID = component("ObjectID", ((), jnp.int32))


def register_types(registry: ECSRegistry):
    """reference src/core/base.cpp:10-17 (base::registerTypes)."""
    registry.register_component(Position)
    registry.register_component(Rotation)
    registry.register_component(Scale)
    registry.register_component(ObjectID)
