"""gpu_ecs_madrona_tpu — a TPU-native batched-ECS simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Madrona
(shacklettbp/gpu-ecs-madrona): thousands of independent simulation worlds
stepped in lockstep by a single jit-compiled step function (the TPU analog
of the reference's CUDA megakernel, see reference
src/mw/device/megakernel_impl.inl), an archetype-based entity-component
store held as SoA jax arrays with a leading worlds axis (reference
src/common/table.cpp, src/core/state.cpp), masked slot allocation for
entity create/destroy so world divergence never breaks static shapes
(reference include/madrona/impl/id_map.hpp), a batched physics pipeline
(reference src/physics/), observation export as zero-copy device arrays
(reference src/python/bindings.cpp), and world sharding across TPU chips
and hosts via jax.sharding (no reference equivalent — the reference is
single-GPU).

Top-level convenience re-exports mirror the reference's public headers
under include/madrona/.
"""

from gpu_ecs_madrona_tpu.core.component import (
    Component,
    component,
    singleton_component,
    Entity,
    NULL_ENTITY,
    Archetype,
)
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.state import StateManager, SimState
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraph, TaskGraphBuilder, NodeID
from gpu_ecs_madrona_tpu.core.executor import TaskGraphExecutor, ExecutorConfig
from gpu_ecs_madrona_tpu.core.world import World, system
from gpu_ecs_madrona_tpu.core import base

__version__ = "0.1.0"

__all__ = [
    "Component",
    "component",
    "singleton_component",
    "Entity",
    "NULL_ENTITY",
    "Archetype",
    "ECSRegistry",
    "StateManager",
    "SimState",
    "Context",
    "TaskGraph",
    "TaskGraphBuilder",
    "NodeID",
    "TaskGraphExecutor",
    "ExecutorConfig",
    "base",
]
