"""Golden parity vs the REFERENCE ENGINE BINARY.

tests/goldens/*.bin are trajectories produced by tools/ref_golden/golden_gen,
which compiles the reference engine sources VERBATIM (state.cpp,
taskgraph.cpp, physics.cpp, broadphase.cpp, narrowphase.cpp, geometry.cpp
from /root/reference/src) and runs cube-hull + ground-plane scenarios
through the reference's own BVH broadphase -> SAT narrowphase -> XPBD
solver (reference src/physics/physics.cpp:1149-1199).  Regenerate with:

    cd tools/ref_golden && make && \
      ./golden_gen cubes_fall 4 60 1 ../../tests/goldens/cubes_fall_ss1.bin

Gates (measured divergence, see docs/GOLDEN_PARITY.md):
  * pre-contact free flight: EXACT agreement (<=1e-5) — integrator
    semantics (semi-implicit + gyroscopic term, physics.cpp:79-164) match
    the reference bit-for-bit up to accumulation noise.
  * early contact (first 10 ticks after first contact): <= 0.06 max
    position error — the contact constraint math agrees; residual
    divergence is the documented solver-scheme difference (reference
    resolves contacts Gauss-Seidel sequentially, physics.cpp:281-461;
    this framework solves them Jacobi-batched, physics/solver.py) which
    compounds per-tick.
  * full 60-tick horizon: bounded error (<= 1.2) and matching rest state:
    every cube settles on the plane (z ~ half extent) in both engines.
"""

import os
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_ecs_madrona_tpu import Archetype, ExecutorConfig, TaskGraphExecutor, base
from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                         RigidBodyPhysicsSystem, assets)
from gpu_ecs_madrona_tpu.physics.components import (
    ResponseType, RESPONSE_DYNAMIC, RESPONSE_STATIC, Velocity)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name):
    path = os.path.join(GOLDEN_DIR, name + ".bin")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    d = open(path, "rb").read()
    assert d[:4] == b"GLD1"
    T1, W, K, ss = struct.unpack("<4i", d[4:20])
    dt = struct.unpack("<f", d[20:24])[0]
    arr = np.frombuffer(d[24:], np.float32).reshape(T1, W, K, 13).copy()
    return arr, W, K, ss, dt


def run_equivalent(golden, W, K, substeps, dt, ticks, joint=False):
    """Build the same scenario in this framework, initial state taken from
    the golden file's tick 0 (so C++/numpy RNG differences cannot leak in).
    joint=True recreates the cube_chain Fixed joint (reference
    setupFixed(a, b, id, id, (0,0,-0.6), (0,0,0.6), 0))."""
    loader = assets.PhysicsLoader()
    loader.load_objects([
        assets.make_plane(mu_s=0.5, mu_d=0.5),
        # golden metadata: unit cube, invMass=1, invInertia=6, mu=0.5
        assets.make_box((0.5, 0.5, 0.5), inv_mass=1.0, mu_s=0.5, mu_d=0.5),
    ])
    mgr = loader.get_object_manager()
    Body = Archetype("GoldenBody", BODY_COMPONENTS)

    init0 = golden[0]

    class Wld:
        @staticmethod
        def register_types(r):
            RigidBodyPhysicsSystem.register_types(
                r, max_candidates=64, max_contacts=64,
                max_joints=4 if joint else 0)
            r.register_archetype(Body, capacity=K + 1)
            r.export_column(Body, base.Position, 0)
            r.export_column(Body, base.Rotation, 1)
            r.export_column(Body, Velocity, 2)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((Wn, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=dt,
                                        num_substeps=substeps)
            pos = np.zeros((Wn, K + 1, 3), np.float32)
            rot = np.zeros((Wn, K + 1, 4), np.float32)
            rot[..., 0] = 1.0
            vel = np.zeros((Wn, K + 1, 3), np.float32)
            omega = np.zeros((Wn, K + 1, 3), np.float32)
            oid = np.zeros((Wn, K + 1), np.int32)
            resp = np.full((Wn, K + 1), RESPONSE_STATIC, np.int32)
            pos[:, 1:] = init0[:, :, 0:3]
            rot[:, 1:] = init0[:, :, 3:7]
            vel[:, 1:] = init0[:, :, 7:10]
            omega[:, 1:] = init0[:, :, 10:13]
            oid[:, 1:] = 1
            resp[:, 1:] = RESPONSE_DYNAMIC
            ents = ctx.make_entities(Body, counts=K + 1, max_new=K + 1,
                                     values={
                base.Position: jnp.asarray(pos),
                base.Rotation: jnp.asarray(rot),
                base.Scale: jnp.ones((Wn, K + 1, 3)),
                base.ObjectID: jnp.asarray(oid),
                Velocity: {"linear": jnp.asarray(vel),
                           "angular": jnp.asarray(omega)},
                ResponseType: jnp.asarray(resp),
            })
            if joint:
                from gpu_ecs_madrona_tpu.physics import make_fixed_joint
                ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]),
                                         (Wn, 1, 4))
                make_fixed_joint(
                    ctx, ents[:, 1:2], ents[:, 2:3], ident, ident,
                    jnp.broadcast_to(jnp.array([0.0, 0, -0.6]), (Wn, 1, 3)),
                    jnp.broadcast_to(jnp.array([0.0, 0, 0.6]), (Wn, 1, 3)),
                    jnp.zeros((Wn, 1)))

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr)
            sub = RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], substeps, Body, mgr, contact_mode="pairs")
            RigidBodyPhysicsSystem.setup_cleanup_tasks(builder, [sub])

    sim = TaskGraphExecutor(Wld, ExecutorConfig(num_worlds=W,
                                                max_entities_per_world=K + 8,
                                                seed=0, donate=False))
    out = np.zeros((ticks + 1, W, K, 13), np.float32)
    out[0] = init0
    for t in range(1, ticks + 1):
        sim.run(1)
        pos = np.asarray(sim.get_exported(0)[0])[:, 1:K + 1]
        rot = np.asarray(sim.get_exported(1)[0])[:, 1:K + 1]
        vel = sim.get_exported(2)[0]
        lin = np.asarray(vel["linear"])[:, 1:K + 1]
        ang = np.asarray(vel["angular"])[:, 1:K + 1]
        out[t] = np.concatenate([pos, rot, lin, ang], axis=-1)
    return out


def first_contact_tick(golden):
    """First tick at which any cube's AABB could touch the plane or
    another cube (conservatively: min z below 0.52 — cubes start well
    separated in xy except cube_pair/stack which touch immediately)."""
    zmin = golden[..., 2].min(axis=(1, 2))
    hit = zmin < 0.52
    return int(np.argmax(hit)) if hit.any() else golden.shape[0]


CASES = ["cubes_fall_ss1", "cubes_fall_ss4", "cube_pair_ss1",
         "cube_pair_ss4", "cube_stack_ss1", "cube_stack_ss4",
         "cube_bounce_ss1", "cube_bounce_ss4"]


def test_golden_fixed_joint_chain():
    """Fixed-joint parity vs the reference binary (setupFixed +
    handleJointConstraint, physics.cpp:560-648): a 2-cube chain swings,
    falls, and lands; the joint must hold the 1.2 anchor separation in
    both engines and the early trajectory must agree."""
    golden, W, K, ss, dt = load_golden("cube_chain_ss4")
    T = golden.shape[0] - 1
    mine = run_equivalent(golden, W, K, ss, dt, T, joint=True)
    perr = np.abs(mine[..., 0:3] - golden[..., 0:3]).max(axis=(1, 2, 3))
    # free fall + joint, no contacts yet: tight agreement
    assert perr[:10].max() <= 0.02, perr[:10].max()
    # bounded over the whole swing-and-land horizon
    assert perr.max() <= 1.5, perr.max()
    # joint separation held in BOTH engines at every 10th tick
    for t in range(0, T + 1, 10):
        sep_m = np.linalg.norm(mine[t, :, 0, :3] - mine[t, :, 1, :3],
                               axis=-1)
        sep_g = np.linalg.norm(golden[t, :, 0, :3] - golden[t, :, 1, :3],
                               axis=-1)
        assert np.abs(sep_m - 1.2).max() < 0.15, (t, sep_m)
        assert np.abs(sep_g - 1.2).max() < 0.15, (t, sep_g)
    # both come to rest near the plane (an upright chain rests with its
    # upper cube at ~0.5 + 1.2 = 1.7)
    assert (mine[-1, :, :, 2] < 2.0).all() and (golden[-1, :, :, 2] < 2.0).all()


@pytest.mark.parametrize("name", CASES)
def test_golden_trajectory(name):
    golden, W, K, ss, dt = load_golden(name)
    T = golden.shape[0] - 1
    mine = run_equivalent(golden, W, K, ss, dt, T)

    perr = np.abs(mine[..., 0:3] - golden[..., 0:3]).max(axis=(1, 2, 3))

    # 1. pre-contact free flight: exact
    fc = first_contact_tick(golden)
    if fc > 1:
        assert perr[:fc].max() <= 1e-5, \
            f"free-flight diverges from reference binary: {perr[:fc].max()}"

    # 2. early contact window: contact math agrees
    ec_end = min(fc + 10, T)
    assert perr[:ec_end].max() <= 0.06, \
        f"early-contact divergence too large: {perr[:ec_end].max()}"

    # 3. full horizon bounded.  cube_stack is chaotic: the offset stack
    # topples, and the toppling direction amplifies solver-scheme noise —
    # both engines agree it falls over (rest-state gate below), the exact
    # scatter direction differs.
    horizon = 2.5 if name.startswith("cube_stack") else 1.2
    assert perr.max() <= horizon, f"trajectory diverged: {perr.max()}"
    assert np.isfinite(mine).all()

    # 4b. cube_bounce: the restitution bounce peak must match (reference
    # hardcodes e=0.3, solveVelocities physics.cpp:842; peak ~ e^2 * h)
    if name.startswith("cube_bounce"):
        fc2 = first_contact_tick(golden)
        g_peak = golden[fc2:, ..., 2].max(axis=0)
        m_peak = mine[fc2:, ..., 2].max(axis=0)
        assert np.abs(g_peak - m_peak).max() <= 0.08, (g_peak, m_peak)

    # 4. matching rest state: all cubes settle onto the plane in both
    if name.startswith("cubes_fall"):
        g_final = golden[-1, ..., 2]
        m_final = mine[-1, ..., 2]
        # resting cube center sits near half-extent above the plane unless
        # it landed on another cube (stacks: ~1.5)
        assert (m_final > 0.3).all() and (m_final < 4.0).all()
        assert np.abs(np.sort(m_final, axis=None) -
                      np.sort(g_final, axis=None)).max() <= 0.6


def test_golden_free_fall_bitexact():
    """Integration semantics (no contacts): EXACT match with the reference
    solver's substepRigidBodies (physics.cpp:79-164) over 19 pre-contact
    ticks, including the gyroscopic omega update."""
    golden, W, K, ss, dt = load_golden("cubes_fall_ss1")
    fc = first_contact_tick(golden)
    assert fc >= 15  # scenario sanity: cubes start well above the plane
    mine = run_equivalent(golden, W, K, ss, dt, fc - 1)
    err = np.abs(mine[:fc - 1] - golden[:fc - 1]).max()
    assert err <= 1e-5, err
