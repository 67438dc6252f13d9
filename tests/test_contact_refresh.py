"""Once-per-step narrowphase with per-substep manifold refresh
(contact_refresh=True in the fused Pallas kernel): quality gates for the
documented deviation from the reference's per-substep narrowphase."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from gpu_ecs_madrona_tpu.models import rigid_bench as rb


def run(refresh, ticks=50):
    sim = rb.make_executor(
        rb.RigidBenchConfig(num_worlds=4, num_bodies=10, seed=5,
                            contact_mode="pallas", broadphase_mode="dense",
                            contact_refresh=refresh),
        donate=False)
    sim.run(ticks)
    pos, mask = sim.get_exported(0)
    return np.asarray(pos), np.asarray(mask)


def test_refresh_settles_like_full_narrowphase():
    pF, mk = run(False)
    pR, _ = run(True)
    assert np.isfinite(pR[mk]).all()
    # same qualitative outcome: no tunneling through the ground plane and
    # matching pile envelope (chaotic pile -> positions diverge, physics
    # must not)
    zF, zR = pF[mk][:, 2], pR[mk][:, 2]
    assert zR.min() > -0.6, zR.min()          # nothing fell through
    assert abs(zR.max() - zF.max()) < 2.0
    assert abs(np.median(zR) - np.median(zF)) < 1.0
    # bounded trajectory divergence over 50 ticks of a chaotic pile
    assert np.abs(pF - pR)[mk].max() < 2.5


def test_refresh_resting_contact_stable():
    """A single cube resting on the plane: refresh mode must hold it at
    rest exactly like the full path (single persistent manifold — the
    cache is exact here)."""
    import jax.numpy as jnp
    from gpu_ecs_madrona_tpu import Archetype, ExecutorConfig, TaskGraphExecutor, base
    from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                             RigidBodyPhysicsSystem, assets)
    from gpu_ecs_madrona_tpu.physics.components import (
        ResponseType, RESPONSE_DYNAMIC, RESPONSE_STATIC, Velocity)

    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_plane(),
                         assets.make_box((0.5, 0.5, 0.5))])
    mgr = loader.get_object_manager()
    Body = Archetype("RefreshBody", BODY_COMPONENTS)

    def world(refresh):
        class Wld:
            @staticmethod
            def register_types(r):
                RigidBodyPhysicsSystem.register_types(
                    r, max_candidates=16, max_contacts=16, max_joints=0)
                r.register_archetype(Body, capacity=4)
                r.export_column(Body, base.Position, 0)

            @staticmethod
            def init(ctx, init_data=None):
                Wn = ctx.num_worlds
                ctx.data = {"_": jnp.zeros((Wn, 1))}
                RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60,
                                            num_substeps=4)
                ctx.make_entities(Body, counts=2, max_new=2, values={
                    base.Position: jnp.broadcast_to(
                        jnp.array([[0.0, 0, 0], [0.0, 0, 0.499]]),
                        (Wn, 2, 3)),
                    base.Rotation: jnp.broadcast_to(
                        jnp.array([1.0, 0, 0, 0]), (Wn, 2, 4)),
                    base.Scale: jnp.ones((Wn, 2, 3)),
                    base.ObjectID: jnp.broadcast_to(
                        jnp.array([0, 1], jnp.int32), (Wn, 2)),
                    ResponseType: jnp.broadcast_to(
                        jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC],
                                  jnp.int32), (Wn, 2)),
                })

            @staticmethod
            def setup_tasks(builder):
                bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                    builder, [], Body, mgr)
                ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                    builder, [bp], 4, Body, mgr, contact_mode="pallas",
                    contact_refresh=refresh)
                RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])
        return Wld

    outs = []
    for refresh in (False, True):
        sim = TaskGraphExecutor(world(refresh),
                                ExecutorConfig(num_worlds=2,
                                               max_entities_per_world=8,
                                               seed=0, donate=False))
        sim.run(60)
        pos = np.asarray(sim.get_exported(0)[0])
        outs.append(pos[:, 1, 2])             # cube height
    zF, zR = outs
    assert np.abs(zF - 0.5).max() < 0.02      # full path rests at 0.5
    assert np.abs(zR - zF).max() < 0.02       # refresh matches


def test_hinge_pendulum_stable():
    """Hinge-joint pendulum: 180 ticks of swinging must hold the anchor
    distance and stay finite.  The REFERENCE's hinge solve cannot be
    golden-gated: run through tools/ref_golden it diverges to NaN within
    14 ticks (exponential blowup from applyJointAxisConstraint +
    handleJointConstraint, physics.cpp:507-648 — WIP code with a leftover
    debug printf at physics.cpp:515); this framework's Jacobi hinge
    (solver.solve_joints) is stable on the same scenario."""
    import math

    import jax.numpy as jnp
    from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig,
                                     TaskGraphExecutor, base)
    from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                             RigidBodyPhysicsSystem, assets,
                                             make_hinge_joint)
    from gpu_ecs_madrona_tpu.physics.components import (
        ResponseType, RESPONSE_DYNAMIC, RESPONSE_STATIC)

    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_plane(), assets.make_box((0.5, 0.5, 0.5))])
    mgr = loader.get_object_manager()
    Body = Archetype("HingePendBody", BODY_COMPONENTS)
    ang = 0.2

    class Wld:
        @staticmethod
        def register_types(r):
            RigidBodyPhysicsSystem.register_types(
                r, max_candidates=16, max_contacts=16, max_joints=4)
            r.register_archetype(Body, capacity=4)
            r.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((Wn, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            hinge = np.array([0, 0, 5.4], np.float32)
            down = np.array([math.sin(ang), 0, -math.cos(ang)], np.float32)
            rotb = np.array([math.cos(ang / 2), 0, math.sin(ang / 2), 0],
                            np.float32)
            pos = np.stack([[0, 0, 6.0], hinge + 0.6 * down])[None]\
                .repeat(Wn, 0).astype(np.float32)
            rot = np.stack([[1, 0, 0, 0], rotb])[None].repeat(Wn, 0)\
                .astype(np.float32)
            resp = np.array([RESPONSE_STATIC, RESPONSE_DYNAMIC],
                            np.int32)[None].repeat(Wn, 0)
            ents = ctx.make_entities(Body, counts=2, max_new=2, values={
                base.Position: jnp.asarray(pos),
                base.Rotation: jnp.asarray(rot),
                base.Scale: jnp.ones((Wn, 2, 3)),
                base.ObjectID: jnp.ones((Wn, 2), jnp.int32),
                ResponseType: jnp.asarray(resp)})
            yax = jnp.broadcast_to(jnp.array([0.0, 1, 0]), (Wn, 1, 3))
            xax = jnp.broadcast_to(jnp.array([1.0, 0, 0]), (Wn, 1, 3))
            make_hinge_joint(
                ctx, ents[:, 0:1], ents[:, 1:2], yax, yax, xax, xax,
                jnp.broadcast_to(jnp.array([0.0, 0, -0.6]), (Wn, 1, 3)),
                jnp.broadcast_to(jnp.array([0.0, 0, 0.6]), (Wn, 1, 3)))

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, mgr, contact_mode="pairs")
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    sim = TaskGraphExecutor(Wld, ExecutorConfig(num_worlds=2,
                                                max_entities_per_world=8,
                                                seed=0, donate=False))
    hinge = np.array([0, 0, 5.4])
    sim.run(180)
    p = np.asarray(sim.get_exported(0)[0])
    assert np.isfinite(p).all()
    d = np.linalg.norm(p[:, 1, :3] - hinge, axis=-1)
    assert np.abs(d - 0.6).max() < 0.01, d
