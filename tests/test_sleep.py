"""World-level sleeping (sleep_threshold in setup_substep_tasks).

Beyond the reference (no sleeping anywhere in physics.cpp): a world whose
dynamic bodies stay below the velocity threshold for sleep_frames
consecutive steps freezes bit-exactly, and the fused Pallas kernel skips
whole world blocks of sleepers via pl.when.  These tests run the kernel
interpreted on CPU (same code path as the TPU Mosaic build).
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
    ResponseType, RESPONSE_DYNAMIC, RESPONSE_STATIC, SleepState, Velocity)


def _resting_world(sleep_threshold, sleep_frames=3, num_worlds=2):
    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_plane(),
                         assets.make_box((0.5, 0.5, 0.5))])
    mgr = loader.get_object_manager()
    Body = Archetype("SleepBody", BODY_COMPONENTS)

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
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=4)
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
                sleep_threshold=sleep_threshold, sleep_frames=sleep_frames)
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [ss])

    return TaskGraphExecutor(
        Wld, ExecutorConfig(num_worlds=num_worlds, max_entities_per_world=8,
                            seed=0, donate=False)), Body


def test_resting_world_falls_asleep_and_freezes():
    sim, Body = _resting_world(sleep_threshold=0.02, sleep_frames=3)
    # settle (the cube starts 1mm deep; a few steps of micro-correction)
    sim.run(20)
    sl = sim.mgr.get_singleton(sim.state, SleepState)
    assert (np.asarray(sl["asleep"]) == 1).all(), np.asarray(sl)
    p_frozen = np.asarray(sim.get_exported(0)[0]).copy()
    sim.run(30)
    p_later = np.asarray(sim.get_exported(0)[0])
    # frozen BIT-EXACTLY while asleep
    np.testing.assert_array_equal(p_frozen, p_later)


def test_sleep_off_matches_sleep_on_while_active():
    """While every world is active, sleeping-enabled and -disabled
    trajectories are identical (settling takes > sleep_frames steps, so
    no world sleeps within the first few steps)."""
    outs = []
    for thr in (0.0, 0.02):
        sim, Body = _resting_world(sleep_threshold=thr, sleep_frames=6)
        # drop the cube from above the plane: active for several steps
        st = sim.state
        pos = jnp.asarray(sim.mgr.column(st, Body, base.Position))
        pos = pos.at[:, 1, 2].set(1.5)
        sim.state = sim.mgr.set_column(st, Body, base.Position, pos)
        sim.run(5)  # still falling — speeds above threshold
        outs.append(np.asarray(sim.get_exported(0)[0]).copy())
    np.testing.assert_array_equal(outs[0], outs[1])


def test_woken_by_external_velocity():
    sim, Body = _resting_world(sleep_threshold=0.02, sleep_frames=3)
    sim.run(20)
    sl = sim.mgr.get_singleton(sim.state, SleepState)
    assert (np.asarray(sl["asleep"]) == 1).all()
    # poke world 0: set an upward velocity on the cube
    st = sim.state
    vel = sim.mgr.column(st, Body, Velocity)
    vlin = jnp.asarray(vel["linear"])
    vlin = vlin.at[0, 1, 2].set(3.0)
    sim.state = sim.mgr.set_column(st, Body, Velocity, {
        "linear": vlin, "angular": jnp.asarray(vel["angular"])})
    p_before = np.asarray(sim.get_exported(0)[0]).copy()
    sim.run(3)
    sl2 = sim.mgr.get_singleton(sim.state, SleepState)
    asleep = np.asarray(sl2["asleep"])
    assert asleep[0] == 0          # poked world woke up
    assert asleep[1] == 1          # untouched world stays asleep
    p_after = np.asarray(sim.get_exported(0)[0])
    assert not np.array_equal(p_before[0], p_after[0])   # world 0 moved
    np.testing.assert_array_equal(p_before[1], p_after[1])  # world 1 frozen


def test_sleep_rejected_off_fused_path():
    import pytest

    with pytest.raises(ValueError, match="sleep_threshold"):
        sim = rb.make_executor(
            rb.RigidBenchConfig(num_worlds=2, num_bodies=8,
                                contact_mode="pairs",
                                sleep_threshold=0.01),
            donate=False)
        sim.run(1)
