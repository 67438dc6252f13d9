"""On-chip Mosaic regression subset (VERDICT round-2 item #7).

Run with:  GEM_TPU_TESTS=1 python -m pytest tests -m tpu -q

Exercises every Pallas TPU kernel (fused collisions, physics substep
megakernel incl. contact refresh, pixel-tile renderer) plus the SAP
broadphase on the REAL chip at small shapes, so Mosaic lowering breakage
is caught by tests rather than benches.  All other tests pin the CPU
backend (conftest.py); this module skips itself there."""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    os.environ.get("GEM_TPU_TESTS") != "1"
    or jax.default_backend() not in ("tpu", "axon"),
    reason="needs GEM_TPU_TESTS=1 and a real TPU backend")


@requires_tpu
def test_fused_collisions_kernel_on_chip():
    from gpu_ecs_madrona_tpu.models import collisions as col
    sim = col.make_executor(col.CollisionsConfig(num_worlds=64, seed=0,
                                                 fused=True))
    sim.run(10)
    pos, mask = sim.get_exported(0)
    pos = np.asarray(pos)
    assert np.isfinite(pos[np.asarray(mask)]).all()
    # determinism on chip
    sim2 = col.make_executor(col.CollisionsConfig(num_worlds=64, seed=0,
                                                  fused=True))
    sim2.run(10)
    assert np.array_equal(pos, np.asarray(sim2.get_exported(0)[0]))


@requires_tpu
@pytest.mark.parametrize("refresh", [False, True])
def test_substep_megakernel_on_chip(refresh):
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    sim = rb.make_executor(rb.RigidBenchConfig(
        num_worlds=64, num_bodies=16, contact_mode="pallas",
        broadphase_mode="dense", contact_refresh=refresh, seed=0))
    sim.run(10)
    pos, mask = sim.get_exported(0)
    pos = np.asarray(pos)[np.asarray(mask)]
    assert np.isfinite(pos).all()
    assert pos[:, 2].min() > -0.6           # nothing fell through the plane


@requires_tpu
def test_sap_broadphase_on_chip():
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    sim = rb.make_executor(rb.RigidBenchConfig(
        num_worlds=32, num_bodies=24, contact_mode="pairs",
        broadphase_mode="sap", seed=0))
    sim.run(10)
    pos, mask = sim.get_exported(0)
    assert np.isfinite(np.asarray(pos)[np.asarray(mask)]).all()


@requires_tpu
def test_sleep_early_exit_on_chip():
    """Uninterpreted Mosaic build of the data-dependent pl.when sleep
    early-exit (ADVICE r3: the scalar predicate reduced from a VMEM vector
    with both branches writing out_ref is otherwise only ever exercised in
    interpret mode)."""
    from test_sleep import _resting_world
    sim, Body = _resting_world(sleep_threshold=0.02, sleep_frames=3)
    sim.run(20)
    from gpu_ecs_madrona_tpu.physics.components import SleepState
    sl = sim.mgr.get_singleton(sim.state, SleepState)
    assert (np.asarray(sl["asleep"]) == 1).all()
    p_frozen = np.asarray(sim.get_exported(0)[0]).copy()
    sim.run(10)
    np.testing.assert_array_equal(
        p_frozen, np.asarray(sim.get_exported(0)[0]))


@requires_tpu
def test_fused_simple_jobs_on_chip():
    """Uninterpreted Mosaic build of the whole-tick simple_jobs kernel
    (rank compaction + pl.when dead-chunk skip; ops/simple_jobs_kernel).
    Exercises the coincident-clamp guard too (regression: a 1/4096 world
    blew up to +-2^31 at tick 3 before round 4's d2 > 1e-12 gate)."""
    from gpu_ecs_madrona_tpu.models import simple_jobs as sj
    sims = {}
    for fused in (False, True):
        sims[fused] = sj.make_executor(
            sj.SimpleJobsConfig(num_worlds=64, seed=0, fused=fused),
            donate=False)
        sims[fused].run(2)
    a = {k: np.asarray(v) for k, v in sims[False].state["user"].items()}
    b = {k: np.asarray(v) for k, v in sims[True].state["user"].items()}
    np.testing.assert_array_equal(a["candidates"], b["candidates"])
    assert np.abs(a["translation"] - b["translation"]).max() < 5e-3
    sims[True].run(30)
    t = np.asarray(sims[True].state["user"]["translation"])
    assert np.isfinite(t).all() and np.abs(t).max() < 50


@requires_tpu
def test_render_pallas_meshes_on_chip():
    """Uninterpreted Mosaic build of the kernel's triangle-mesh loop
    (folded-constant Moeller-Trumbore; VERDICT r3 #7)."""
    from test_render_tiles import build_sim_mesh
    rgb_x, depth_x = build_sim_mesh(tile_size=0, max_per_tile=0, res=32)
    rgb_p, depth_p = build_sim_mesh(tile_size=0, max_per_tile=0, res=32,
                                    backend="pallas")
    finite = np.isfinite(depth_x)
    assert finite.any() and (rgb_x[..., 3] > 0).any()
    assert np.array_equal(finite, np.isfinite(depth_p))
    assert np.allclose(depth_p[finite], depth_x[finite], rtol=1e-4,
                       atol=1e-3)
    assert np.abs(rgb_p.astype(np.int32) - rgb_x.astype(np.int32)).max() <= 2


@requires_tpu
def test_render_pallas_kernel_on_chip():
    from gpu_ecs_madrona_tpu.models import simple_taskgraph as stg
    sim = stg.make_executor(stg.SimpleTaskgraphConfig(
        num_worlds=16, num_objects=12, seed=0, render=True,
        render_width=64, render_height=64, render_backend="pallas"))
    sim.run(3)
    out = sim.state["user"]["render_out"]
    rgb = np.asarray(out["rgb"])
    depth = np.asarray(out["depth"])
    assert rgb.shape[-1] == 4 and rgb.dtype == np.uint8
    assert (rgb[..., 3] > 0).any()          # something rendered
    assert np.isfinite(depth[depth < np.inf]).any()


@requires_tpu
def test_persist_sleep_pipeline_on_chip():
    """Round-5 quasi-static skip tiers on the REAL chip: persistent
    manifolds + layered sleep (in-kernel broadphase, pl.when block skips,
    mc scratch/IO).  A settled single-layer grid must quiesce, engage the
    skip (anchors stop changing), and freeze bit-exactly."""
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb
    sim = rb.make_executor(rb.RigidBenchConfig(
        num_worlds=16, num_bodies=16, contact_mode="pallas",
        broadphase_mode="fused", contact_refresh=True,
        manifold_persist=True, persist_margin=0.05,
        sleep_threshold=0.02, sleep_frames=5,
        body_mix="boxes", spawn="grid", seed=0), donate=False)
    sim.run(150)
    mpc = sim.mgr.registry.singletons["ManifoldPersist"]
    mp0 = sim.mgr.get_singleton(sim.state, mpc)
    apos0 = np.asarray(mp0["apos"]).copy()
    p0 = np.asarray(sim.get_exported(0)[0]).copy()
    from gpu_ecs_madrona_tpu.physics.components import SleepState
    asleep = np.asarray(
        sim.mgr.get_singleton(sim.state, SleepState)["asleep"])
    assert asleep.mean() > 0.5, f"only {asleep.mean():.2f} asleep at t=150"
    sim.run(20)
    mp1 = sim.mgr.get_singleton(sim.state, mpc)
    p1 = np.asarray(sim.get_exported(0)[0])
    # asleep worlds froze bit-exactly; their anchors did not rebuild
    frozen = asleep > 0
    np.testing.assert_array_equal(p0[frozen], p1[frozen])
    np.testing.assert_array_equal(apos0[frozen],
                                  np.asarray(mp1["apos"])[frozen])
