"""Cross-step persistent manifolds (manifold_persist in
setup_substep_tasks).

Beyond the reference (which re-runs broadphase + narrowphase every step,
physics.cpp:1149-1199): a world whose bodies have moved less than
persist_margin/2 since its manifold cache was built skips candidate
construction and the SAT + clip narrowphase, refreshing the cached
manifold by transform — the sleep machinery generalized from frozen
worlds to quasi-static ones.  These tests run the kernel interpreted on
CPU (same code path as the TPU Mosaic build).
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig,
                                 TaskGraphExecutor, base)
from gpu_ecs_madrona_tpu.models import rigid_bench as rb
from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                         RigidBodyPhysicsSystem, assets)
from gpu_ecs_madrona_tpu.physics.components import (
    ResponseType, RESPONSE_DYNAMIC, RESPONSE_STATIC, Velocity)

Body = Archetype("PersistBody", BODY_COMPONENTS)


def _world(persist, num_worlds=2, margin=0.05):
    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_plane(),
                         assets.make_box((0.5, 0.5, 0.5))])
    mgr = loader.get_object_manager()

    class Wld:
        @staticmethod
        def register_types(r):
            RigidBodyPhysicsSystem.register_types(
                r, max_candidates=16, max_contacts=16, max_joints=0)
            r.register_archetype(Body, capacity=4)
            if persist:
                RigidBodyPhysicsSystem.register_persistent_manifolds(
                    r, Body, 16)
            r.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((Wn, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            # both boxes end up resting directly on the plane (box-on-box
            # stacks keep micro-jittering — the documented rocking-manifold
            # limitation — and never pass the stability predicate)
            ctx.make_entities(Body, counts=3, max_new=3, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([[0.0, 0, 0], [0.0, 0, 0.499],
                               [2.5, 0.2, 1.2]]), (Wn, 3, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (Wn, 3, 4)),
                base.Scale: jnp.ones((Wn, 3, 3)),
                base.ObjectID: jnp.broadcast_to(
                    jnp.array([0, 1, 1], jnp.int32), (Wn, 3)),
                ResponseType: jnp.broadcast_to(
                    jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC,
                               RESPONSE_DYNAMIC], jnp.int32), (Wn, 3)),
            })

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr, mode="fused", dense_degree=8)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, mgr, contact_mode="pallas",
                contact_refresh=True, manifold_persist=persist,
                persist_margin=margin)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    return TaskGraphExecutor(
        Wld, ExecutorConfig(num_worlds=num_worlds, max_entities_per_world=8,
                            seed=0, donate=False)), mgr


def _anchors(sim):
    mp = sim.mgr.get_singleton(
        sim.state, sim.mgr.registry.singletons["ManifoldPersist"])
    return np.asarray(mp["apos"]).copy(), np.asarray(mp["valid"]).copy()


def test_persist_matches_baseline_while_falling():
    """During the falling/settling phase every world rebuilds every step;
    trajectories must match the plain fused-refresh path (the only
    difference is substep-0 contacts arriving through a same-pose cache
    refresh — fp noise, not semantics; impacts amplify it chaotically, so
    the tolerance is the repo's post-impact convention, cf.
    test_pairs_matches_dense_trajectory)."""
    outs = {}
    for persist in (False, True):
        sim, _ = _world(persist)
        sim.run(30)
        outs[persist] = np.asarray(sim.get_exported(0)[0]).copy()
        assert np.isfinite(outs[persist]).all()
    np.testing.assert_allclose(outs[True], outs[False], atol=8e-2)


def test_persist_skip_engages_when_settled():
    """Once the stack rests, the stability predicate holds and the cache
    stops rebuilding: anchors must stay IDENTICAL across later steps
    (rebuilds re-anchor, so unchanged anchors prove the skip path ran)
    while the bodies stay put."""
    sim, _ = _world(True)
    sim.run(120)                       # settle the 2-box stack
    apos0, valid0 = _anchors(sim)
    assert (valid0 == 1).all()
    p0 = np.asarray(sim.get_exported(0)[0]).copy()
    sim.run(15)
    apos1, _ = _anchors(sim)
    p1 = np.asarray(sim.get_exported(0)[0])
    np.testing.assert_array_equal(apos0, apos1)   # no rebuild happened
    np.testing.assert_allclose(p0, p1, atol=5e-3)  # still resting


def test_persist_rebuilds_on_disturbance_and_recontacts():
    """Kicking a resting body must break the stability predicate (anchors
    move = rebuild) and the world must keep resolving contacts correctly:
    the kicked box lands back on the stack/plane instead of tunneling."""
    sim, _ = _world(True)
    sim.run(120)
    apos0, _ = _anchors(sim)
    vel = sim.mgr.column(sim.state, Body, Velocity)
    kicked = {
        "linear": vel["linear"].at[:, 2].set(
            jnp.asarray([1.5, 0.5, 3.0])),
        "angular": vel["angular"],
    }
    sim._state = sim.mgr.set_column(sim.state, Body, Velocity, kicked)
    # the velocity-carry term must break stability THE SAME step as the
    # kick (round-5 review: a predicate on pre-step poses alone would
    # reuse stale candidates for one step and let the kicked body travel
    # v*dt unchecked — the rebuild may not arrive a step late)
    sim.run(1)
    apos_kick, _ = _anchors(sim)
    assert not np.array_equal(apos0, apos_kick), \
        "kicked world did not rebuild on the kick step"
    sim.run(89)
    apos1, _ = _anchors(sim)
    pos, mask = sim.get_exported(0)
    pos, mask = np.asarray(pos), np.asarray(mask)
    assert not np.array_equal(apos0, apos1)       # rebuild happened
    assert np.isfinite(pos[mask]).all()
    # every LIVE dynamic box rests at or above the plane (no tunneling);
    # rows 1.. are the boxes (row 0 = plane), dead capacity rows excluded
    live_boxes = mask.copy()
    live_boxes[:, 0] = False
    assert (pos[live_boxes][:, 2] > 0.3).all(), pos[:, :, 2]


def _world_sleep(num_worlds=2, margin=0.05, thr=0.02, frames=3):
    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_plane(),
                         assets.make_box((0.5, 0.5, 0.5))])
    mgr = loader.get_object_manager()

    class Wld2:
        @staticmethod
        def register_types(r):
            RigidBodyPhysicsSystem.register_types(
                r, max_candidates=16, max_contacts=16, max_joints=0)
            r.register_archetype(Body, capacity=4)
            RigidBodyPhysicsSystem.register_persistent_manifolds(r, Body, 16)
            r.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((Wn, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
            ctx.make_entities(Body, counts=3, max_new=3, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([[0.0, 0, 0], [0.0, 0, 0.499],
                               [2.5, 0.2, 1.2]]), (Wn, 3, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (Wn, 3, 4)),
                base.Scale: jnp.ones((Wn, 3, 3)),
                base.ObjectID: jnp.broadcast_to(
                    jnp.array([0, 1, 1], jnp.int32), (Wn, 3)),
                ResponseType: jnp.broadcast_to(
                    jnp.array([RESPONSE_STATIC, RESPONSE_DYNAMIC,
                               RESPONSE_DYNAMIC], jnp.int32), (Wn, 3)),
            })

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr, mode="fused", dense_degree=8)
            ss = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 4, Body, mgr, contact_mode="pallas",
                contact_refresh=True, manifold_persist=True,
                persist_margin=margin, sleep_threshold=thr,
                sleep_frames=frames)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    return TaskGraphExecutor(
        Wld2, ExecutorConfig(num_worlds=num_worlds,
                             max_entities_per_world=8,
                             seed=0, donate=False))


def test_sleep_composes_with_persist_and_freezes_bitexactly():
    """sleep_threshold layered on manifold_persist (the settled-pile
    bench's fastest tier): once quiescent, the world freezes BIT-EXACTLY
    — positions identical across further steps — and the persistent
    cache surface (anchors) stops changing too."""
    from gpu_ecs_madrona_tpu.physics.components import SleepState
    sim = _world_sleep()
    sim.run(140)
    sl = sim.mgr.get_singleton(sim.state, SleepState)
    assert (np.asarray(sl["asleep"]) == 1).all(), np.asarray(sl)
    p0 = np.asarray(sim.get_exported(0)[0]).copy()
    apos0, _ = _anchors(sim)
    sim.run(25)
    p1 = np.asarray(sim.get_exported(0)[0])
    apos1, _ = _anchors(sim)
    np.testing.assert_array_equal(p0, p1)       # bit-exact freeze
    np.testing.assert_array_equal(apos0, apos1)
