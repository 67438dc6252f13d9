"""fantasy_vs behavioral tests vs reference examples/fantasy_vs/fvs.cpp."""

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.models import fantasy_vs as fvs


def small_cfg(**kw):
    d = dict(num_worlds=4, num_dragons=5, num_knights=12, seed=7)
    d.update(kw)
    return fvs.FantasyVsConfig(**d)


def test_init_counts_and_values():
    sim = fvs.make_executor(small_cfg())
    mgr = sim.mgr
    assert (np.asarray(mgr.num_rows(sim.state, fvs.Dragon)) == 5).all()
    assert (np.asarray(mgr.num_rows(sim.state, fvs.Knight)) == 12).all()
    d_hp = np.asarray(mgr.column(sim.state, fvs.Dragon, fvs.Health)["hp"])
    k_hp = np.asarray(mgr.column(sim.state, fvs.Knight, fvs.Health)["hp"])
    assert (d_hp[np.asarray(mgr.row_mask(sim.state, fvs.Dragon))] == 1000).all()
    assert (k_hp[np.asarray(mgr.row_mask(sim.state, fvs.Knight))] == 100).all()
    arrows = np.asarray(mgr.column(sim.state, fvs.Knight, fvs.Quiver)["arrows"])
    live = np.asarray(mgr.row_mask(sim.state, fvs.Knight))
    assert (arrows[live] >= 20).all() and (arrows[live] <= 40).all()


def test_combat_damages_dragons():
    """Knights shoot every idle tick; dragon HP must fall over time."""
    sim = fvs.make_executor(small_cfg())
    mgr = sim.mgr
    hp0 = np.asarray(mgr.column(sim.state, fvs.Dragon, fvs.Health)["hp"]).copy()
    sim.run(30)
    hp1 = np.asarray(mgr.column(sim.state, fvs.Dragon, fvs.Health)["hp"])
    live = np.asarray(mgr.row_mask(sim.state, fvs.Dragon))
    # some dragon somewhere took arrow damage
    assert (hp1[live] < 1000).any()
    assert np.isfinite(hp1).all()


def test_cleanup_destroys_dead():
    """Entities at hp <= 0 are destroyed by the cleanup node (reference
    cleanup job, fvs.cpp:212-227): inject dead dragons, step, verify
    destruction and handle invalidation."""
    sim = fvs.make_executor(small_cfg(num_dragons=8, num_knights=30))
    mgr = sim.mgr
    hp = mgr.column(sim.state, fvs.Dragon, fvs.Health)["hp"]
    # kill dragons in rows 0..2 in every world
    hp = hp.at[:, :3].set(0.0)
    sim.state = mgr.set_column(sim.state, fvs.Dragon, fvs.Health, {"hp": hp})
    dead_handles = mgr.entity_column(sim.state, fvs.Dragon)[:, :3]
    sim.step()
    nd = np.asarray(mgr.num_rows(sim.state, fvs.Dragon))
    assert (nd == 5).all()
    _, _, live = mgr.lookup(sim.state, dead_handles)
    assert not np.asarray(live).any()
    # tracker always cleared by end of step
    assert (np.asarray(mgr.num_rows(sim.state, fvs.CleanupTracker)) == 0).all()
    hp1 = np.asarray(mgr.column(sim.state, fvs.Dragon, fvs.Health)["hp"])
    mask1 = np.asarray(mgr.row_mask(sim.state, fvs.Dragon))
    # no live entity has hp <= 0 after cleanup
    assert (hp1[mask1] > 0).all()
    # long-run churn stays stable
    sim.run(200)
    assert (np.asarray(mgr.num_rows(sim.state, fvs.CleanupTracker)) == 0).all()


def test_benchmark_mode_no_cleanup():
    sim = fvs.make_executor(small_cfg(cleanup=False))
    mgr = sim.mgr
    sim.run(50)
    # without cleanup dead entities persist (counts never shrink)
    assert (np.asarray(mgr.num_rows(sim.state, fvs.Dragon)) == 5).all()


def test_determinism():
    a = fvs.make_executor(small_cfg())
    b = fvs.make_executor(small_cfg())
    a.run(25)
    b.run(25)
    pa, _ = a.get_exported(0)
    pb, _ = b.get_exported(0)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_action_countdown():
    """Busy agents count down by deltaT and do not move (fvs.cpp:115-118)."""
    sim = fvs.make_executor(small_cfg())
    mgr = sim.mgr
    act = mgr.column(sim.state, fvs.Knight, fvs.Action)["remaining"]
    act = act.at[:, :].set(10.0)
    sim.state = mgr.set_column(sim.state, fvs.Knight, fvs.Action, {"remaining": act})
    pos0 = np.asarray(mgr.column(sim.state, fvs.Knight, fvs.Position))
    sim.step()
    act1 = np.asarray(mgr.column(sim.state, fvs.Knight, fvs.Action)["remaining"])
    live = np.asarray(mgr.row_mask(sim.state, fvs.Knight))
    np.testing.assert_allclose(act1[live], 10.0 - fvs.DELTA_T, rtol=1e-6)
    pos1 = np.asarray(mgr.column(sim.state, fvs.Knight, fvs.Position))
    np.testing.assert_allclose(pos1[live], pos0[live])
