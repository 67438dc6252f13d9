"""Owner-major broadphase + kernel pair layout (dense_owner mode).

The Pallas substep kernel's owner-major layout (ops/substep_kernel.py
_mk_pair_io owner mode) makes the pair's higher row the "owner": slot
d*128 + o holds owner o's d-th partner, so the owner side of every
gather/segment-sum is static.  The dense_owner broadphase emits that
layout with a per-owner top-D compaction instead of the global top_k.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from gpu_ecs_madrona_tpu.models import rigid_bench as rb


def run(cfg, ticks=25):
    sim = rb.make_executor(cfg, donate=False)
    sim.run(ticks)
    pos, mask = sim.get_exported(0)
    return sim, np.asarray(pos), np.asarray(mask)


def test_owner_matches_pairs_mode():
    """Same seed, same trajectory (within fp accumulation noise) between
    the reference-shaped pairs path and the owner-major Pallas path."""
    base = dict(num_worlds=4, num_bodies=12, seed=3)
    _, pA, mA = run(rb.RigidBenchConfig(contact_mode="pairs",
                                        broadphase_mode="dense", **base))
    cfgB = rb.RigidBenchConfig(contact_mode="pallas",
                               broadphase_mode="dense_owner", **base)
    _, pB, mB = run(cfgB)
    assert np.array_equal(mA, mB)
    assert np.isfinite(pB[mB]).all()
    assert np.abs(pA - pB)[mA].max() < 2e-3


def test_owner_degree_overflow_accounted():
    """More simultaneous partners than owner_degree: dropped pairs land in
    the CandidateRowsTemporary overflow counter (no silent clipping)."""
    from gpu_ecs_madrona_tpu.physics import CandidateRowsTemporary

    # 8 bodies stacked at one spot: the top body overlaps far more than
    # D=1 lower partners
    cfg = rb.RigidBenchConfig(num_worlds=2, num_bodies=8, seed=0,
                              contact_mode="pallas",
                              broadphase_mode="dense_owner", owner_degree=1,
                              max_candidates=128, spawn_xy=0.01, spawn_h=3.0)
    sim = rb.make_executor(cfg, donate=False)
    sim.run(12)
    ov = sim.overflow_counters()[CandidateRowsTemporary.name]
    assert int(np.asarray(ov).sum()) > 0


def test_owner_requires_pallas():
    cfg = rb.RigidBenchConfig(num_worlds=2, num_bodies=8,
                              contact_mode="pairs",
                              broadphase_mode="dense_owner")
    with pytest.raises(ValueError, match="pallas"):
        rb.make_executor(cfg, donate=False)


def test_owner_capacity_validation():
    from gpu_ecs_madrona_tpu import Archetype, ExecutorConfig, TaskGraphExecutor, base
    from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                             RigidBodyPhysicsSystem, assets)

    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_sphere(1.0)])
    mgr = loader.get_object_manager()
    Body = Archetype("OwnerCapBody", BODY_COMPONENTS)

    class W:
        @staticmethod
        def register_types(r):
            # WRONG capacity for dense_owner(D=4): needs 512
            RigidBodyPhysicsSystem.register_types(r, max_candidates=64,
                                                  max_contacts=64)
            r.register_archetype(Body, capacity=8)
            r.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            ctx.data = {"_": jnp.zeros((ctx.num_worlds, 1))}

        @staticmethod
        def setup_tasks(builder):
            RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr, mode="dense_owner", owner_degree=4)

    with pytest.raises(ValueError, match="max_candidates=512"):
        TaskGraphExecutor(W, ExecutorConfig(num_worlds=2,
                                            max_entities_per_world=16,
                                            seed=0))


def test_pallas_kernel_beyond_128_bodies():
    """>128 bodies pad to the next power-of-two lane count (the kernel's
    batched one-hot build needs a power-of-two lane mask; regression for
    the n=129 -> 136-lane assert)."""
    cfg = rb.RigidBenchConfig(num_worlds=2, num_bodies=130, seed=0,
                              contact_mode="pallas", broadphase_mode="sap",
                              max_candidates=512)
    sim = rb.make_executor(cfg, donate=False)
    sim.run(3)
    pos, mask = sim.get_exported(0)
    assert np.isfinite(np.asarray(pos)[np.asarray(mask)]).all()
