"""simple_taskgraph example — TPU build of reference examples/simple_taskgraph/.

The reference's flagship taskgraph example (simple.cpp): a clamp system,
the full rigid-body physics pipeline, and the rendering system, registered
as one static graph (simple.cpp setupTasks:49-66); worlds hold 100 random
spheres plus one agent with an active camera view (simple.cpp:68-114);
exports Agent Position/Rotation at slots 0/1 (simple.cpp:45-46).

Here the spheres are full dynamic rigid bodies (sphere primitives) over the
physics pipeline (the reference snapshot's Sphere archetype lacks Velocity,
so its solver systems match nothing — a quirk of the mid-migration tree;
we give the example live physics as clearly intended).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core import base
from gpu_ecs_madrona_tpu.core.component import Archetype
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.executor import ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraphBuilder
from gpu_ecs_madrona_tpu.physics import (
    BODY_COMPONENTS,
    RigidBodyPhysicsSystem,
    assets,
)
from gpu_ecs_madrona_tpu.physics.components import (
    ResponseType,
    RESPONSE_DYNAMIC,
    RESPONSE_STATIC,
)
from gpu_ecs_madrona_tpu.render.interop import ActiveView, RenderingSystem

# Archetypes (reference simple.hpp:42-57): spheres + one agent with a view.
Sphere = Archetype("StgSphere", BODY_COMPONENTS)
Agent = Archetype("StgAgent", BODY_COMPONENTS + [ActiveView])

OBJ_SPHERE = 0
OBJ_PLANE = 1

BOUNDS_LO = (-10.0, -10.0, 0.0)
BOUNDS_HI = (10.0, 10.0, 10.0)


def _object_manager():
    loader = assets.PhysicsLoader()
    loader.load_objects([
        assets.make_sphere(1.0, inv_mass=1.0),
        assets.make_plane(),
    ])
    return loader.get_object_manager()


OBJMGR = _object_manager()


def _sphere_mesh(radius: float, n_lat: int = 6, n_lon: int = 8):
    """Lat-long triangle tessellation of a sphere (2 * n_lon * (n_lat - 1)
    triangles) for the render_mesh workload."""
    import numpy as np
    verts = [(0.0, 0.0, radius)]
    for i in range(1, n_lat):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append((radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)))
    verts.append((0.0, 0.0, -radius))
    bot = len(verts) - 1
    tris = []
    for j in range(n_lon):
        tris.append((0, 1 + j, 1 + (j + 1) % n_lon))
    for i in range(n_lat - 2):
        r0 = 1 + i * n_lon
        r1 = r0 + n_lon
        for j in range(n_lon):
            j1 = (j + 1) % n_lon
            tris.append((r0 + j, r1 + j, r1 + j1))
            tris.append((r0 + j, r1 + j1, r0 + j1))
    r0 = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        tris.append((r0 + j, bot, r0 + (j + 1) % n_lon))
    return (np.asarray(verts, np.float32), np.asarray(tris, np.int32))


@dataclasses.dataclass
class SimpleTaskgraphConfig:
    num_worlds: int = 64
    num_objects: int = 100   # reference init.cpp:34 num_init_objs
    num_substeps: int = 4
    delta_t: float = 1.0 / 60.0
    seed: int = 0
    # enable RGB/depth observation rendering (reference BatchRenderer)
    render: bool = False
    render_width: int = 64
    render_height: int = 64
    render_backend: str = "auto"   # xla | pallas | auto (RendererConfig)
    render_tile: int = 0           # tile frustum culling (RendererConfig.tile_size)
    render_tile_cap: int = 32      # max instances per tile
    # attach a triangle RENDER mesh (lat-long sphere tessellation) to the
    # sphere object: rays trace real triangles (Moeller-Trumbore) instead
    # of the analytic sphere — the reference's per-mesh BLAS ray-query
    # workload shape (vk/scene.cpp:446-463)
    render_mesh: bool = False


class SimpleTaskgraphWorld:
    config: SimpleTaskgraphConfig = SimpleTaskgraphConfig()

    @classmethod
    def with_config(cls, cfg: SimpleTaskgraphConfig):
        return type("SimpleTaskgraphWorld", (cls,), {"config": cfg})

    @classmethod
    def register_types(cls, registry: ECSRegistry):
        cfg = cls.config
        # reference simple.cpp registerTypes:37-47
        RigidBodyPhysicsSystem.register_types(
            registry, max_candidates=cfg.num_objects * 10,
            max_contacts=cfg.num_objects * 10)
        RenderingSystem.register_types(registry)
        registry.register_archetype(Sphere, capacity=cfg.num_objects + 4)
        registry.register_archetype(Agent, capacity=1)
        if cfg.render:
            # build the renderer eagerly: constructing jnp constants inside
            # the traced world-init would leak tracers out of the jit
            cls._renderer()
        registry.export_column(Agent, base.Position, 0)
        registry.export_column(Agent, base.Rotation, 1)
        registry.export_column(Sphere, base.Position, 2)

    @classmethod
    def init(cls, ctx: Context, init_data=None):
        cfg = cls.config
        W = ctx.num_worlds
        n = cfg.num_objects
        lo = jnp.array(BOUNDS_LO)
        hi = jnp.array(BOUNDS_HI)
        ctx.data = {"bounds_lo": jnp.broadcast_to(lo, (W, 3)),
                    "bounds_hi": jnp.broadcast_to(hi, (W, 3))}
        RigidBodyPhysicsSystem.init(
            ctx, delta_t=cfg.delta_t, num_substeps=cfg.num_substeps)
        RenderingSystem.init(ctx, renderable_archetypes=[Sphere],
                             view_archetype=Agent)
        if cfg.render:
            cls._renderer().init_buffers(ctx)

        # spheres: random positions/rotations (reference init.cpp:20-53)
        kpos, kang = ctx.rng_one(), ctx.rng_one()
        pos = jax.vmap(lambda k: jax.random.uniform(k, (n, 3), minval=lo,
                                                    maxval=hi))(kpos)
        from gpu_ecs_madrona_tpu.utils import math as m
        ang = jax.vmap(lambda k: jax.random.uniform(k, (n,), maxval=jnp.pi))(kang)
        rot = m.quat_from_angle_axis(ang, jnp.array([0.0, 1.0, 0.0]))
        ctx.make_entities(
            Sphere, counts=n, max_new=n,
            values={
                base.Position: pos,
                base.Rotation: rot,
                base.Scale: jnp.ones((W, n, 3)),
                base.ObjectID: jnp.full((W, n), OBJ_SPHERE, jnp.int32),
                ResponseType: jnp.full((W, n), RESPONSE_DYNAMIC, jnp.int32),
            },
        )
        # agent at origin with a 90-degree view (reference simple.cpp:101-107)
        ctx.make_entities(
            Agent, counts=1, max_new=1,
            values={
                base.Position: jnp.zeros((W, 1, 3)),
                base.Rotation: jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, 1, 4)),
                base.Scale: jnp.ones((W, 1, 3)),
                base.ObjectID: jnp.full((W, 1), OBJ_SPHERE, jnp.int32),
                ResponseType: jnp.full((W, 1), RESPONSE_STATIC, jnp.int32),
                ActiveView: RenderingSystem.setup_view(ctx, 90.0),
            },
        )

    @classmethod
    def _renderer(cls):
        from gpu_ecs_madrona_tpu.render.renderer import BatchRenderer, RendererConfig
        if not hasattr(cls, "_renderer_obj"):
            cfg = cls.config
            cls._renderer_obj = BatchRenderer(
                RendererConfig(width=cfg.render_width,
                               height=cfg.render_height, max_views=1,
                               backend=cfg.render_backend,
                               tile_size=cfg.render_tile,
                               max_instances_per_tile=cfg.render_tile_cap),
                OBJMGR,
                render_meshes=({OBJ_SPHERE: _sphere_mesh(0.5)}
                               if cfg.render_mesh else None))
        return cls._renderer_obj

    @classmethod
    def setup_tasks(cls, builder: TaskGraphBuilder):
        cfg = cls.config

        # clamp system (reference simple.cpp:22-35)
        def clamp_system(rowctx, pos):
            return jnp.clip(pos, rowctx.data["bounds_lo"], rowctx.data["bounds_hi"])

        n_clamp = builder.parallel_for_node(
            clamp_system, [base.Position],
            archetypes=[Sphere], name="clamp")

        # physics (reference simple.cpp:52-57)
        bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
            builder, [n_clamp], Sphere, OBJMGR)
        ss = RigidBodyPhysicsSystem.setup_substep_tasks(
            builder, [bp], cfg.num_substeps, Sphere, OBJMGR, relaxation=0.7)
        cl = RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

        # render packing (reference simple.cpp:59-62)
        pack = RenderingSystem.setup_tasks(builder, [cl], [Sphere], Agent)
        if cfg.render:
            cls._renderer().setup_tasks(builder, [pack], [Sphere])


def make_executor(cfg: SimpleTaskgraphConfig = SimpleTaskgraphConfig(),
                  **exec_kwargs):
    world = SimpleTaskgraphWorld.with_config(cfg)
    return TaskGraphExecutor(
        world,
        ExecutorConfig(num_worlds=cfg.num_worlds,
                       max_entities_per_world=cfg.num_objects + 8,
                       seed=cfg.seed, **exec_kwargs),
    )
