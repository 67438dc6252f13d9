"""Physics pipeline tests: integration, contacts, XPBD settle behavior.

The reference has no physics unit tests (SURVEY.md §4 — only debug energy
accounting, physics.cpp:52-77); these golden-behavior tests are the pyramid
it lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_ecs_madrona_tpu import (
    Archetype,
    ECSRegistry,
    ExecutorConfig,
    TaskGraphExecutor,
    base,
)
from gpu_ecs_madrona_tpu.physics import (
    BODY_COMPONENTS,
    RigidBodyPhysicsSystem,
    assets,
)
from gpu_ecs_madrona_tpu.physics.components import (
    ResponseType,
    RESPONSE_DYNAMIC,
    RESPONSE_STATIC,
    Velocity,
)

Body = Archetype("PhysBody", BODY_COMPONENTS)

OBJ_BOX = 0
OBJ_SPHERE = 1
OBJ_PLANE = 2

loader = assets.PhysicsLoader()
loader.load_objects([
    assets.make_box((1.0, 1.0, 1.0), inv_mass=1.0),
    assets.make_sphere(1.0, inv_mass=1.0),
    assets.make_plane(),
])
OBJMGR = loader.get_object_manager()


def make_world(num_worlds, bodies, num_substeps=4, dt=1 / 60,
               contact_mode="auto"):
    """bodies: list of (obj_id, pos, response_type)."""

    class PhysWorld:
        @staticmethod
        def register_types(registry):
            RigidBodyPhysicsSystem.register_types(registry, max_candidates=64,
                                                  max_contacts=64)
            registry.register_archetype(Body, capacity=16)
            registry.export_column(Body, base.Position, 0)
            registry.export_column(Body, base.Rotation, 1)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((W, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=dt,
                                        num_substeps=num_substeps)
            nb = len(bodies)
            pos = jnp.broadcast_to(
                jnp.array([b[1] for b in bodies], jnp.float32), (W, nb, 3))
            objs = jnp.broadcast_to(
                jnp.array([b[0] for b in bodies], jnp.int32), (W, nb))
            resp = jnp.broadcast_to(
                jnp.array([b[2] for b in bodies], jnp.int32), (W, nb))
            rot = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, nb, 4))
            scale = jnp.ones((W, nb, 3))
            ctx.make_entities(
                Body, counts=nb, max_new=nb,
                values={
                    base.Position: pos,
                    base.Rotation: rot,
                    base.Scale: scale,
                    base.ObjectID: objs,
                    ResponseType: resp,
                },
            )

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, OBJMGR)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], num_substeps, Body, OBJMGR, relaxation=0.7,
                contact_mode=contact_mode)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    return TaskGraphExecutor(
        PhysWorld, ExecutorConfig(num_worlds=num_worlds,
                                  max_entities_per_world=32, seed=0))


def test_free_fall():
    """A body with no contacts accelerates downward at g."""
    sim = make_world(2, [(OBJ_BOX, (0, 0, 50.0), RESPONSE_DYNAMIC)])
    sim.run(30)  # 0.5 s
    pos, mask = sim.get_exported(0)
    z = np.asarray(pos)[0, 0, 2]
    # z = 50 - 0.5*g*t^2 ~ 50 - 1.225 (semi-implicit slightly lower)
    assert 48.0 < z < 49.0, z


def test_box_settles_on_plane():
    """A unit box dropped from low height settles on the ground plane with
    its bottom at z ~ 0 (center z ~ 1)."""
    sim = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.5), RESPONSE_DYNAMIC),
    ])
    sim.run(120)  # 2 s
    pos, _ = sim.get_exported(0)
    z = np.asarray(pos)[:, 1, 2]
    assert (np.abs(z - 1.0) < 0.15).all(), z


def test_sphere_settles_on_plane():
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_SPHERE, (0.0, 0.0, 2.0), RESPONSE_DYNAMIC),
    ])
    sim.run(150)
    pos, _ = sim.get_exported(0)
    z = np.asarray(pos)[0, 1, 2]
    assert abs(z - 1.0) < 0.15, z


def test_sphere_sphere_collision():
    """Two spheres dropped overlapping separate to >= sum of radii-ish."""
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_SPHERE, (0.0, 0.0, 1.0), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.5, 0.0, 1.2), RESPONSE_DYNAMIC),
    ])
    sim.run(120)
    pos, _ = sim.get_exported(0)
    p = np.asarray(pos)[0]
    d = np.linalg.norm(p[1] - p[2])
    assert d > 1.6, (p, d)
    assert np.isfinite(p).all()


def test_static_bodies_never_move():
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 0.5), RESPONSE_DYNAMIC),  # overlapping the plane
    ])
    sim.run(60)
    pos, _ = sim.get_exported(0)
    np.testing.assert_allclose(np.asarray(pos)[0, 0], [0, 0, 0], atol=1e-6)


def test_determinism():
    a = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 2.0), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 4.0), RESPONSE_DYNAMIC),
    ])
    b = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 2.0), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 4.0), RESPONSE_DYNAMIC),
    ])
    a.run(50)
    b.run(50)
    pa, _ = a.get_exported(0)
    pb, _ = b.get_exported(0)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_box_box_stack():
    """A box dropped on a resting box stays stacked (SAT hull-hull +
    friction); centers end ~2 apart vertically."""
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.0), RESPONSE_DYNAMIC),
        (OBJ_BOX, (0.1, 0.0, 3.2), RESPONSE_DYNAMIC),
    ])
    sim.run(180)
    pos, _ = sim.get_exported(0)
    p = np.asarray(pos)[0]
    assert np.isfinite(p).all()
    assert abs(p[1, 2] - 1.0) < 0.3, p
    assert 2.5 < p[2, 2] < 3.6, p


def test_fixed_joint_holds_bodies():
    """Two boxes joined by a Fixed joint: the hanging box must stay at its
    attachment separation instead of free-falling (reference
    handleJointConstraint Fixed path)."""
    import gpu_ecs_madrona_tpu.physics as phys

    class JointWorld:
        @staticmethod
        def register_types(registry):
            RigidBodyPhysicsSystem.register_types(registry, max_candidates=16,
                                                  max_contacts=16, max_joints=4)
            registry.register_archetype(Body, capacity=8)
            registry.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((W, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            # anchor: static box at z=5; hanging dynamic box below it
            pos = jnp.broadcast_to(
                jnp.array([[0.0, 0, 5.0], [0.0, 0, 3.0]]), (W, 2, 3))
            ents = ctx.make_entities(Body, counts=2, max_new=2, values={
                base.Position: pos,
                base.Rotation: jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, 2, 4)),
                base.Scale: jnp.ones((W, 2, 3)),
                base.ObjectID: jnp.zeros((W, 2), jnp.int32),
                ResponseType: jnp.broadcast_to(
                    jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC]), (W, 2)
                ).astype(jnp.int32),
            })
            ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, 1, 4))
            # attach: r1 at anchor bottom, r2 at hanging top, separation 0
            phys.make_fixed_joint(
                ctx, ents[:, 0:1], ents[:, 1:2], ident, ident,
                r1=jnp.broadcast_to(jnp.array([0.0, 0, -1.0]), (W, 1, 3)),
                r2=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (W, 1, 3)),
                separation=jnp.zeros((W, 1)))

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, OBJMGR)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, OBJMGR, relaxation=0.7)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    from gpu_ecs_madrona_tpu import ExecutorConfig, TaskGraphExecutor
    sim = TaskGraphExecutor(JointWorld, ExecutorConfig(num_worlds=2,
                                                       max_entities_per_world=16,
                                                       seed=0))
    sim.run(120)
    pos, _ = sim.get_exported(0)
    p = np.asarray(pos)
    # anchored at attachment: hanging box center stays near z = 3 (5-1-1)
    assert np.isfinite(p).all()
    assert (np.abs(p[:, 1, 2] - 3.0) < 0.3).all(), p[:, 1]
    # anchor static
    np.testing.assert_allclose(p[:, 0], np.tile([0, 0, 5.0], (2, 1)), atol=1e-6)


def test_raycast():
    """Batched ray cast (reference BVH::traceRay analog)."""
    import gpu_ecs_madrona_tpu.physics as phys

    sim = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_SPHERE, (0.0, 0.0, 5.0), RESPONSE_DYNAMIC),
    ])
    mgr = sim.mgr
    st = sim.state
    pos = mgr.column(st, Body, base.Position)
    rot = mgr.column(st, Body, base.Rotation)
    scale = mgr.column(st, Body, base.Scale)
    obj = mgr.column(st, Body, base.ObjectID)
    mask = mgr.row_mask(st, Body)
    origins = jnp.broadcast_to(jnp.array([[0.0, 0.0, 10.0],
                                          [5.0, 5.0, 10.0]]), (2, 2, 3))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (2, 2, 3))
    row, t = phys.raycast(pos, rot, scale, obj, mask, OBJMGR, origins, dirs)
    row, t = np.asarray(row), np.asarray(t)
    # ray 0 straight down from above the sphere -> hits sphere (row 1) at t=4
    assert (row[:, 0] == 1).all()
    np.testing.assert_allclose(t[:, 0], 4.0, atol=1e-4)
    # ray 1 offset -> hits the ground plane (row 0) at t=10
    assert (row[:, 1] == 0).all()
    np.testing.assert_allclose(t[:, 1], 10.0, atol=1e-4)


# ---------------------------------------------------------------------------
# Compacted-pairs contact mode (physics at scale: setup_substep_tasks
# contact_mode="pairs") — same golden behaviors as the dense grid, plus a
# dense-vs-pairs trajectory consistency check.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_pairs_box_settles_on_plane():
    sim = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.5), RESPONSE_DYNAMIC),
    ], contact_mode="pairs")
    sim.run(120)
    pos, _ = sim.get_exported(0)
    z = np.asarray(pos)[:, 1, 2]
    assert (np.abs(z - 1.0) < 0.15).all(), z


@pytest.mark.slow
def test_pairs_box_box_stack():
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.0), RESPONSE_DYNAMIC),
        (OBJ_BOX, (0.1, 0.0, 3.2), RESPONSE_DYNAMIC),
    ], contact_mode="pairs")
    sim.run(180)
    pos, _ = sim.get_exported(0)
    p = np.asarray(pos)[0]
    assert np.isfinite(p).all()
    assert abs(p[1, 2] - 1.0) < 0.3, p
    assert 2.5 < p[2, 2] < 3.6, p


@pytest.mark.slow
def test_pairs_matches_dense_trajectory():
    """Dense grid and compacted pairs run the same contact math; with
    candidate capacity >= all overlapping pairs the trajectories must agree
    to fp-reassociation tolerance."""
    bodies = [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.4), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 3.0), RESPONSE_DYNAMIC),
        (OBJ_BOX, (-0.5, 0.2, 5.0), RESPONSE_DYNAMIC),
    ]
    a = make_world(2, bodies, contact_mode="dense")
    b = make_world(2, bodies, contact_mode="pairs")
    a.run(60)
    b.run(60)
    pa, _ = a.get_exported(0)
    pb, _ = b.get_exported(0)
    # restitution makes impacts chaotic amplifiers: the two formulations
    # differ in fp op order, so post-bounce slide positions diverge at the
    # 1e-2 scale over 60 steps (same math, different reassociation)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-4, atol=8e-2)


@pytest.mark.slow
def test_pairs_determinism():
    a = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 2.0), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 4.0), RESPONSE_DYNAMIC),
    ], contact_mode="pairs")
    b = make_world(2, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 2.0), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 4.0), RESPONSE_DYNAMIC),
    ], contact_mode="pairs")
    a.run(50)
    b.run(50)
    pa, _ = a.get_exported(0)
    pb, _ = b.get_exported(0)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.slow
def test_pallas_matches_pairs_trajectory():
    """The Pallas substep megakernel (interpret mode on CPU) runs the same
    pair-major contact math as contact_mode="pairs"; trajectories must agree
    to fp-reassociation tolerance."""
    bodies = [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_BOX, (0, 0, 1.4), RESPONSE_DYNAMIC),
        (OBJ_SPHERE, (0.4, 0.3, 3.0), RESPONSE_DYNAMIC),
        (OBJ_BOX, (-0.5, 0.2, 5.0), RESPONSE_DYNAMIC),
    ]
    a = make_world(2, bodies, contact_mode="pairs")
    b = make_world(2, bodies, contact_mode="pallas")
    a.run(40)
    b.run(40)
    pa, _ = a.get_exported(0)
    pb, _ = b.get_exported(0)
    assert np.isfinite(np.asarray(pb)).all()
    # see test_pairs_matches_dense_trajectory on the post-bounce tolerance
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-4, atol=8e-2)


def _bullet_world(contact_mode, speculative):
    """A 1440 m/s bullet sphere aimed at a static sphere: 6 units of
    travel per substep hop OVER the 4-unit contact window (samples at
    -9, -3, +3 ...) — it tunnels without CCD."""

    class BulletWorld:
        @staticmethod
        def register_types(registry):
            RigidBodyPhysicsSystem.register_types(registry, max_candidates=16,
                                                  max_contacts=16)
            registry.register_archetype(Body, capacity=4)
            registry.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((W, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            ctx.make_entities(Body, counts=2, max_new=2, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([[0.0, 0, 0.0], [-9.0, 0, 0.0]]), (W, 2, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 2, 4)),
                base.Scale: jnp.ones((W, 2, 3)),
                base.ObjectID: jnp.full((W, 2), OBJ_SPHERE, jnp.int32),
                ResponseType: jnp.broadcast_to(
                    jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC]),
                    (W, 2)).astype(jnp.int32),
            })
            ents = ctx.entity_column(Body)
            vel = ctx.column(Body, Velocity)
            ctx.set_column(Body, Velocity, {
                "linear": vel["linear"].at[:, 1, 0].set(1440.0),
                "angular": vel["angular"],
            })

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, OBJMGR)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, OBJMGR, relaxation=0.7,
                contact_mode=contact_mode,
                speculative_margin=speculative)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    return TaskGraphExecutor(BulletWorld, ExecutorConfig(
        num_worlds=1, max_entities_per_world=8, seed=0))


@pytest.mark.slow
@pytest.mark.parametrize("contact_mode", ["dense", "pairs", "pallas"])
def test_speculative_contacts_stop_tunneling(contact_mode):
    """Speculative-contact CCD (the BASELINE north star's TOI item): a
    1440 m/s bullet (6 units/substep, samples hopping over the 4-unit
    contact window) tunnels straight through without the margin and is
    stopped by it."""
    sim = _bullet_world(contact_mode, speculative=0.0)
    sim.run(2)
    pos, _ = sim.get_exported(0)
    x_free = float(np.asarray(pos)[0, 1, 0])
    assert x_free > 2.0, f"expected tunneling without CCD, x={x_free}"

    sim = _bullet_world(contact_mode, speculative=3.0)
    xs = []
    for _ in range(6):
        sim.run(1)
        pos, _ = sim.get_exported(0)
        xs.append(float(np.asarray(pos)[0, 1, 0]))
    # the bullet must never pass the wall (contact at x = -2)
    assert max(xs) < -1.8, xs
    assert np.isfinite(np.asarray(pos)).all()


def _bounce_apex(contact_mode, drop_z=3.0, steps=90):
    """Drop a radius-1 sphere from center drop_z onto the plane; return
    (apex z after first bounce, trajectory)."""
    sim = make_world(1, [
        (OBJ_PLANE, (0, 0, 0.0), RESPONSE_STATIC),
        (OBJ_SPHERE, (0.0, 0.0, drop_z), RESPONSE_DYNAMIC),
    ], contact_mode=contact_mode)
    traj = []
    for _ in range(steps):
        sim.run(1)
        pos, _ = sim.get_exported(0)
        traj.append(float(np.asarray(pos)[0, 1, 2]))
    traj = np.array(traj)
    # first bounce: first local minimum below 1.05, apex = max after it
    low = np.argmax(traj < 1.05)
    assert traj[low] < 1.05, traj
    return float(traj[low:].max()), traj


# the "pairs" param runs the same pair-major math as "pallas" (which stays
# in the quick tier); it moves to the slow tier for quick-tier headroom
# (measured ~20 s of the 8-min budget)
@pytest.mark.parametrize("contact_mode", [
    "dense",
    pytest.param("pairs", marks=pytest.mark.slow),
    "pallas"])
def test_restitution_bounce(contact_mode):
    """A dropped ball must BOUNCE: reference applies e=0.3 above the
    2*|g|*h threshold (physics.cpp:842-845).  Fall height h0=2 (center 3,
    radius 1) -> rebound apex ~ e^2*h0 = 0.18 above rest.  Covers all
    three solver paths (VERDICT round-1 missing #1)."""
    apex, traj = _bounce_apex(contact_mode)
    h0 = 2.0
    e2h = 0.3 * 0.3 * h0  # analytic apex height above rest (z=1)
    rebound = apex - 1.0
    # Jacobi + substep discretization smear the impact; generous envelope
    # but strictly > 0 (the e=0 bug made this exactly ~0) and < h0
    assert 0.4 * e2h < rebound < 2.5 * e2h, (apex, rebound, e2h, traj)


def test_zero_restitution_no_bounce():
    """With e=0 materials the ball must NOT bounce (old default)."""
    dead_loader = assets.PhysicsLoader()
    dead_loader.load_objects([
        assets.make_box((1.0, 1.0, 1.0), inv_mass=1.0, restitution=0.0),
        assets.make_sphere(1.0, inv_mass=1.0, restitution=0.0),
        assets.make_plane(restitution=0.0),
    ])
    dead_mgr = dead_loader.get_object_manager()

    class DeadWorld:
        @staticmethod
        def register_types(registry):
            RigidBodyPhysicsSystem.register_types(registry, max_candidates=64,
                                                  max_contacts=64)
            registry.register_archetype(Body, capacity=16)
            registry.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((W, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            ctx.make_entities(Body, counts=2, max_new=2, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([[0.0, 0, 0.0], [0.0, 0, 3.0]]), (W, 2, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 2, 4)),
                base.Scale: jnp.ones((W, 2, 3)),
                base.ObjectID: jnp.broadcast_to(
                    jnp.array([OBJ_PLANE, OBJ_SPHERE], jnp.int32), (W, 2)),
                ResponseType: jnp.broadcast_to(
                    jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC]),
                    (W, 2)).astype(jnp.int32),
            })

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, dead_mgr)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, dead_mgr, relaxation=0.7)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    sim = TaskGraphExecutor(DeadWorld, ExecutorConfig(
        num_worlds=1, max_entities_per_world=32, seed=0))
    zs = []
    for _ in range(90):
        sim.run(1)
        pos, _ = sim.get_exported(0)
        zs.append(float(np.asarray(pos)[0, 1, 2]))
    zs = np.array(zs)
    low = np.argmax(zs < 1.05)
    assert zs[low] < 1.05, zs
    assert zs[low:].max() < 1.08, zs  # no rebound above rest + slop


def test_edge_edge_contact_point():
    """Two boxes crossed like an X meet edge-on-edge: the contact must sit
    at the closest point between the supporting edges (x=y=0), not at an
    edge endpoint (reference narrowphase edge-contact path)."""
    import math
    from gpu_ecs_madrona_tpu.physics import narrowphase as nph
    from gpu_ecs_madrona_tpu.physics import pairs as pk

    s2 = math.sqrt(0.5)
    root2 = math.sqrt(2.0)
    delta = 0.1
    # A rotated 45 deg about x (top edge along x at z=sqrt(2));
    # B rotated 45 deg about y above it (bottom edge along y)
    posA = np.array([0.0, 0.0, 0.0], np.float32)
    posB = np.array([0.0, 0.0, 2 * root2 - delta], np.float32)
    qA = np.array([s2, s2, 0.0, 0.0], np.float32)   # 90?? no: 45 deg about x
    qA = np.array([math.cos(math.pi / 8), math.sin(math.pi / 8), 0, 0],
                  np.float32)
    qB = np.array([math.cos(math.pi / 8), 0, math.sin(math.pi / 8), 0],
                  np.float32)

    objmgr = {k: jnp.asarray(v) for k, v in OBJMGR.items()}

    # ---- dense core ----
    pos = jnp.asarray(np.stack([posA, posB])[None])          # [1,2,3]
    rot = jnp.asarray(np.stack([qA, qB])[None])
    obj = jnp.zeros((1, 2), jnp.int32)                       # OBJ_BOX
    mask = jnp.ones((1, 2), bool)
    c = nph.narrowphase_dense(pos, rot, obj, mask, objmgr)
    ok = np.asarray(c["ok"])[0, 0, 1]
    assert ok
    pt = np.asarray(c["points"])[0, 0, 1, 0]
    dep = np.asarray(c["depth"])[0, 0, 1, 0]
    nrm = np.asarray(c["normal"])[0, 0, 1]
    assert abs(pt[0]) < 1e-4 and abs(pt[1]) < 1e-4, pt
    np.testing.assert_allclose(pt[2], root2 - delta / 2, atol=0.02)
    np.testing.assert_allclose(dep, delta, atol=1e-4)
    np.testing.assert_allclose(abs(nrm[2]), 1.0, atol=1e-5)
    assert int(np.asarray(c["num_points"])[0, 0, 1]) == 1

    # ---- pair-major core ----
    tables = pk.ObjTables(OBJMGR)
    mk = lambda v: tuple(jnp.full((1, 1), float(x)) for x in v)
    FA = pk.body_fields(mk(posA), tuple(jnp.full((1, 1), float(x)) for x in qA),
                        jnp.zeros((1, 1), jnp.int32), tables)
    FB = pk.body_fields(mk(posB), tuple(jnp.full((1, 1), float(x)) for x in qB),
                        jnp.zeros((1, 1), jnp.int32), tables)
    ck = pk.pair_contacts(FA, FB, jnp.ones((1, 1), bool))
    assert bool(np.asarray(ck["ok"])[0, 0])
    ptk = np.array([np.asarray(comp)[0, 0, 0] for comp in ck["points"]])
    assert abs(ptk[0]) < 1e-4 and abs(ptk[1]) < 1e-4, ptk
    np.testing.assert_allclose(ptk[2], root2 - delta / 2, atol=0.02)
    np.testing.assert_allclose(np.asarray(ck["depth"])[0, 0, 0], delta,
                               atol=1e-4)


@pytest.mark.slow
def test_pallas_kernel_beyond_128_bodies():
    """>128 bodies pad to the next power-of-two lane count (the kernel's
    batched one-hot build needs a power-of-two lane mask; regression for
    the n=129 -> 136-lane assert)."""
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    cfg = rb.RigidBenchConfig(num_worlds=2, num_bodies=130, seed=0,
                              contact_mode="pallas", broadphase_mode="sap",
                              max_candidates=512)
    sim = rb.make_executor(cfg, donate=False)
    sim.run(3)
    pos, mask = sim.get_exported(0)
    assert np.isfinite(np.asarray(pos)[np.asarray(mask)]).all()


@pytest.mark.slow
def test_fused_broadphase_matches_dense():
    """broadphase_mode='fused' runs velocity-expanded AABBs + dense rank
    compaction INSIDE the fused substep kernel
    (ops/substep_kernel._inkernel_broadphase) and must be bit-exact
    against the XLA dense rank path (same formulas, same candidate slot
    ordering); AABB columns and overflow accounting stay observable."""
    import numpy as np
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    outs = {}
    for mode in ("dense", "fused"):
        sim = rb.make_executor(rb.RigidBenchConfig(
            num_worlds=4, num_bodies=24, contact_mode="pallas",
            broadphase_mode=mode, max_candidates=128, dense_degree=12,
            contact_refresh=True, seed=0), donate=False)
        sim.run(5)
        outs[mode] = {
            "pos": np.asarray(sim.get_exported(0)[0]).copy(),
            "aabb": np.asarray(sim.mgr.column(
                sim.state, rb.Body,
                __import__("gpu_ecs_madrona_tpu.physics.components",
                           fromlist=["CollisionAABB"]).CollisionAABB)["lo"]),
            "overflow": int(sum(np.asarray(v).sum()
                                for v in sim.overflow_counters().values())),
        }
    np.testing.assert_array_equal(outs["dense"]["pos"], outs["fused"]["pos"])
    np.testing.assert_allclose(outs["dense"]["aabb"], outs["fused"]["aabb"],
                               atol=1e-5)
    assert outs["dense"]["overflow"] == 0 and outs["fused"]["overflow"] == 0


@pytest.mark.slow
def test_fused_broadphase_non_multiple_of_128_capacity():
    """Regression (round-5 ADVICE): broadphase_mode='fused' with a
    candidate capacity that is NOT a multiple of 128 (the default
    4*num_bodies gives 96 at 24 bodies).  The kernel rounds its pair axis
    up to x128 lanes; the emit path must slice back to the archetype
    capacity instead of raising a trace-time broadcast error."""
    import numpy as np
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    outs = {}
    for mode in ("dense", "fused"):
        sim = rb.make_executor(rb.RigidBenchConfig(
            num_worlds=4, num_bodies=24, contact_mode="pallas",
            broadphase_mode=mode, max_candidates=96, dense_degree=12,
            seed=0), donate=False)
        sim.run(5)
        outs[mode] = {
            "pos": np.asarray(sim.get_exported(0)[0]).copy(),
            "overflow": int(sum(np.asarray(v).sum()
                                for v in sim.overflow_counters().values())),
        }
    np.testing.assert_array_equal(outs["dense"]["pos"], outs["fused"]["pos"])
    assert outs["dense"]["overflow"] == 0 and outs["fused"]["overflow"] == 0


@pytest.mark.slow
def test_chunked_kernel_matches_unchunked():
    """K-slab chunked fused kernel (K > 128 routes to
    _make_fused_kernel_chunked; dead slabs pl.when-skipped): trajectories
    must match the unchunked kernel to segment-sum reassociation
    tolerance.  Subprocess A/B because the chunk toggle
    (GEM_TPU_SUBSTEP_CHUNKED) is read at trace time."""
    import subprocess
    import sys
    code = '''
import numpy as np
from gpu_ecs_madrona_tpu.models import rigid_bench as rb
sim = rb.make_executor(rb.RigidBenchConfig(
    num_worlds=2, num_bodies=20, contact_mode="pallas",
    broadphase_mode="dense", max_candidates=256, dense_degree=10,
    seed=0, spawn_xy=3.0, spawn_h=4.0), donate=False)
sim.run(8)
p, m = sim.get_exported(0)
assert np.isfinite(np.asarray(p)[np.asarray(m)]).all()
np.save("{out}", np.asarray(p))
'''
    import os
    outs = {}
    for tag, flag in (("c", "1"), ("u", "0")):
        out = f"/tmp/gem_chunk_ab_{tag}_{os.getpid()}.npy"
        env = dict(os.environ)
        env["GEM_TPU_SUBSTEP_CHUNKED"] = flag
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, "-c", code.format(out=out)], env=env,
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = np.load(out)
    np.testing.assert_allclose(outs["c"], outs["u"], atol=2e-3)
