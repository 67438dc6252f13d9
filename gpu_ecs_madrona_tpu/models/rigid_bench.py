"""Rigid-body pile benchmark — the FULL physics pipeline at scale.

The collisions example exercises the reference's legacy job-system toy
solver; this world exercises the complete RigidBodyPhysicsSystem
(broadphase -> SAT narrowphase -> XPBD substeps, SURVEY.md §3.4) the way
the reference's physics-heavy users do: per world, a ground plane plus a
pile of boxes and spheres dropped from random poses, settling under
gravity and friction.

Default configuration targets 8192 worlds x 64 bodies on one chip with the
compacted-pairs contact mode (setup_substep_tasks contact_mode="pairs"),
which keeps SAT work O(candidates) instead of O(n^2) — the scaling design
SURVEY.md §7.3 calls the capacity-compacted contract.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.executor import ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraphBuilder
from gpu_ecs_madrona_tpu.core import base
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
from gpu_ecs_madrona_tpu.utils import math as m

Body = Archetype("RigidBenchBody", BODY_COMPONENTS)

OBJ_BOX = 0
OBJ_SPHERE = 1
OBJ_PLANE = 2


def default_object_manager():
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([
        assets.make_box((0.5, 0.5, 0.5), inv_mass=1.0, mu_s=0.6, mu_d=0.4),
        assets.make_sphere(0.5, inv_mass=1.0, mu_s=0.6, mu_d=0.4),
        assets.make_plane(mu_s=0.8, mu_d=0.6),
    ])
    return loader.get_object_manager()


@dataclasses.dataclass
class RigidBenchConfig:
    num_worlds: int = 8192
    num_bodies: int = 64          # dynamic bodies per world (plus 1 plane)
    num_substeps: int = 4
    delta_t: float = 1 / 60
    max_candidates: int = 0       # 0 = 4 * num_bodies
    contact_mode: str = "pairs"
    broadphase_mode: str = "auto"  # dense | sap | fused | auto
    sap_window: int = 0            # 0 = auto (min(n - 1, 64))
    # dense-broadphase rank-compaction degree cap (0 = exact top_k).
    # 12 covers the pile workload with rare accounted drops (~4 pairs per
    # 819K world-steps measured at 8192x64)
    dense_degree: int = 12
    # once-per-step narrowphase + per-substep manifold refresh in the
    # fused Pallas kernel (documented deviation from the reference's
    # per-substep narrowphase; see ops/substep_kernel.py)
    contact_refresh: bool = False
    # world-level sleeping (fused pallas only; see setup_substep_tasks):
    # freeze worlds whose bodies stay below this speed for sleep_frames
    # steps and pl.when-skip their kernel blocks.  0 = off.  Combined-norm
    # convention: |v|^2 + |w|^2 (m/s and rad/s summed) vs one threshold —
    # calibrated for unit-scale bodies; see setup_substep_tasks docstring.
    sleep_threshold: float = 0.0
    sleep_frames: int = 10
    # cross-step persistent manifolds (fused broadphase + refresh only):
    # worlds whose bodies have moved < persist_margin/2 since their
    # manifold cache was built skip broadphase + SAT narrowphase and
    # refresh the cached manifold by transform (see setup_substep_tasks).
    manifold_persist: bool = False
    persist_margin: float = 0.05
    # "alternate" (default): boxes and spheres interleaved — the
    # always-moving workload (rolling spheres have no contact slip, so
    # dynamic friction never stops them and piles never quiesce).
    # "boxes": boxes only — sliding friction brings worlds to rest, the
    # quasi-static regime the persistent-manifold skip targets.
    body_mix: str = "alternate"
    # "uniform" (default): i.i.d. uniform spawn — bodies interpenetrate at
    # t=0 and the positional solver ejects them ballistically (tens of
    # m/s, minutes of sim time to quiesce).  "grid": jittered cubic grid
    # with >= 1 body-diameter spacing — no initial overlap, piles settle
    # in O(100) ticks.
    spawn: str = "uniform"
    substep_wt: int = None        # Pallas world-block override (None = auto)
    relaxation: float = 0.7
    # spawn region half-extent in x/y; bodies drop from z in [1, spawn_h]
    spawn_xy: float = 8.0
    spawn_h: float = 12.0
    seed: int = 0

    def resolved_broadphase(self) -> str:
        return self.broadphase_mode

    def candidates(self) -> int:
        if self.max_candidates:
            return self.max_candidates
        # exec-config artifact first (tooling/autotuner.tune_physics_capacity
        # — overflow-validated tighter contracts; capacity drives every
        # kernel axis, measured 1.6x at 8192x64 for 4n -> 2n).  Capacity
        # entries only apply at an EXACT body-count match: unlike mode
        # choices, a capacity does not extrapolate across workload density.
        from gpu_ecs_madrona_tpu.tooling import autotuner
        tuned = autotuner.lookup("physics_capacity",
                                 num_worlds=self.num_worlds,
                                 bodies=self.num_bodies)
        if tuned and tuned.get("for_bodies") == self.num_bodies:
            return int(tuned["max_candidates"])
        # a settled pile averages ~3 overlap pairs per body; 4x covers the
        # in-flight transient (overflow drops excess candidates gracefully)
        return 4 * self.num_bodies


class RigidBenchWorld:
    config: RigidBenchConfig = RigidBenchConfig()
    objmgr = default_object_manager()

    @classmethod
    def with_config(cls, cfg: RigidBenchConfig):
        return type("RigidBenchWorld", (cls,), {"config": cfg,
                                                "objmgr": cls.objmgr})

    @classmethod
    def register_types(cls, registry: ECSRegistry):
        cfg = cls.config
        RigidBodyPhysicsSystem.register_types(
            registry, max_candidates=cfg.candidates(),
            max_contacts=cfg.candidates(), max_joints=0)
        registry.register_archetype(Body, capacity=cfg.num_bodies + 1)
        if cfg.manifold_persist:
            RigidBodyPhysicsSystem.register_persistent_manifolds(
                registry, Body, cfg.candidates())
        registry.export_column(Body, base.Position, 0)
        registry.export_column(Body, base.Rotation, 1)

    @classmethod
    def init(cls, ctx: Context, init_data=None):
        cfg = cls.config
        W = ctx.num_worlds
        n = cfg.num_bodies
        ctx.data = {"_": jnp.zeros((W, 1))}
        RigidBodyPhysicsSystem.init(ctx, delta_t=cfg.delta_t,
                                    num_substeps=cfg.num_substeps)
        kpos, kang, kax = ctx.rng_one(), ctx.rng_one(), ctx.rng_one()
        lo = jnp.array([-cfg.spawn_xy, -cfg.spawn_xy, 1.0])
        hi = jnp.array([cfg.spawn_xy, cfg.spawn_xy, cfg.spawn_h])
        if cfg.spawn == "grid":
            # single jittered layer at 1.5 spacing, dropped from just
            # above the ground: zero initial interpenetration and gentle
            # (sub-m/s) landings, so no solver ejections — bodies settle
            # onto the plane in O(100) ticks with their neighbors'
            # velocity-expanded AABBs still overlapping (full broadphase
            # + narrowphase load, ~2 candidate pairs per body at rest)
            side = 1
            while side * side < n:
                side += 1
            # 1.85 > max AABB reach of two unit boxes (2 * (sqrt(3)/2 +
            # persist inflation)): neighbors' rest AABBs do NOT overlap,
            # so the settled candidate set (~1 plane pair per body, plus
            # transient neighbor pairs while settling) stays in the same
            # capacity regime as the default pile workload
            spacing = 1.85
            idx = jnp.arange(n, dtype=jnp.int32)
            gx = (idx % side).astype(jnp.float32)
            gy = (idx // side).astype(jnp.float32)
            center = (side - 1) * 0.5
            gpos = jnp.stack([(gx - center) * spacing,
                              (gy - center) * spacing,
                              jnp.full((n,), 1.2)], axis=-1)   # [n, 3]
            pos = gpos[None] + jax.vmap(
                lambda k: jax.random.uniform(
                    k, (n, 3), minval=-0.15, maxval=0.15))(kpos)
        else:
            pos = jax.vmap(
                lambda k: jax.random.uniform(k, (n, 3), minval=lo, maxval=hi)
            )(kpos)
        ang = jax.vmap(
            lambda k: jax.random.uniform(k, (n,), minval=0.0, maxval=jnp.pi)
        )(kang)
        axis = jax.vmap(
            lambda k: jax.random.normal(k, (n, 3))
        )(kax)
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        rot = m.quat_from_angle_axis(ang, axis)
        if cfg.body_mix == "boxes":
            objs = jnp.zeros((W, n), jnp.int32)
        else:
            # alternate boxes and spheres
            objs = jnp.broadcast_to(
                (jnp.arange(n, dtype=jnp.int32) % 2), (W, n))
        # plane first (row 0), then the dynamic pile
        all_pos = jnp.concatenate([jnp.zeros((W, 1, 3)), pos], axis=1)
        ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, 1, 4))
        all_rot = jnp.concatenate([ident, rot], axis=1)
        all_obj = jnp.concatenate(
            [jnp.full((W, 1), OBJ_PLANE, jnp.int32), objs], axis=1)
        all_resp = jnp.concatenate(
            [jnp.full((W, 1), RESPONSE_STATIC, jnp.int32),
             jnp.full((W, n), RESPONSE_DYNAMIC, jnp.int32)], axis=1)
        ctx.make_entities(
            Body, counts=n + 1, max_new=n + 1,
            values={
                base.Position: all_pos,
                base.Rotation: all_rot,
                base.Scale: jnp.ones((W, n + 1, 3)),
                base.ObjectID: all_obj,
                ResponseType: all_resp,
            })

    @classmethod
    def setup_tasks(cls, builder: TaskGraphBuilder):
        cfg = cls.config
        objmgr = cls.objmgr
        bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
            builder, [], Body, objmgr, mode=cfg.resolved_broadphase(),
            sap_window=cfg.sap_window, dense_degree=cfg.dense_degree)
        ss = RigidBodyPhysicsSystem.setup_substep_tasks(
            builder, [bp], cfg.num_substeps, Body, objmgr,
            relaxation=cfg.relaxation, contact_mode=cfg.contact_mode,
            substep_wt=cfg.substep_wt,
            contact_refresh=cfg.contact_refresh,
            sleep_threshold=cfg.sleep_threshold,
            sleep_frames=cfg.sleep_frames,
            manifold_persist=cfg.manifold_persist,
            persist_margin=cfg.persist_margin)
        RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])


def make_executor(cfg: RigidBenchConfig = RigidBenchConfig(), **exec_kwargs):
    world = RigidBenchWorld.with_config(cfg)
    return TaskGraphExecutor(
        world,
        ExecutorConfig(
            num_worlds=cfg.num_worlds,
            max_entities_per_world=cfg.num_bodies + 8,
            seed=cfg.seed,
            **exec_kwargs,
        ),
    )
