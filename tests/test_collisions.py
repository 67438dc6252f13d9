"""Collisions example: behavioral parity checks vs the reference semantics
(examples/collisions/collisions.cpp) — overlap counting, push symmetry,
candidate/contact lifecycle, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.models import collisions as col


def small_cfg(**kw):
    d = dict(num_worlds=4, num_objects=16, max_pairs=256, seed=3)
    d.update(kw)
    return col.CollisionsConfig(**d)


def test_init_matches_reference_shape():
    sim = col.make_executor(small_cfg())
    pos, mask = sim.get_exported(0)
    assert (np.asarray(mask).sum(axis=1) == 16).all()
    p = np.asarray(pos)[np.asarray(mask)]
    assert (p[:, 0] >= -10).all() and (p[:, 0] <= 10).all()
    assert (p[:, 2] >= 0).all() and (p[:, 2] <= 10).all()


def test_step_pushes_overlapping_apart():
    """Two overlapping cubes must be pushed apart along their center line;
    isolated cubes must not move (reference solver semantics)."""
    cfg = small_cfg(num_worlds=2, num_objects=3)
    sim = col.make_executor(cfg)
    mgr = sim.mgr
    # Place: cubes 0,1 overlapping (dist 1 on x), cube 2 far away.
    pos = mgr.column(sim.state, col.CubeObject, col.Translation)
    pos = pos.at[:, :3].set(
        jnp.array([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0], [8.0, 8.0, 9.0]])
    )
    state = mgr.set_column(sim.state, col.CubeObject, col.Translation, pos)
    rot = mgr.column(state, col.CubeObject, col.Rotation)
    rot = rot.at[:, :3].set(jnp.array([1.0, 0, 0, 0]))
    state = mgr.set_column(state, col.CubeObject, col.Rotation, rot)
    sim.state = state
    sim.step()
    new_pos = np.asarray(mgr.column(sim.state, col.CubeObject, col.Translation))
    # pair (0,1) and (1,0) both fire: 0 gets -(+x)-(−x→+... ) net push −x twice
    assert new_pos[0, 0, 0] < 0.0 - 1.0  # pushed −x by 2 (two symmetric contacts)
    assert new_pos[0, 1, 0] > 1.0 + 1.0
    np.testing.assert_allclose(new_pos[0, 2], [8.0, 8.0, 9.0], atol=1e-6)
    # temporaries cleared after step
    assert (np.asarray(mgr.num_rows(sim.state, col.CollisionCandidate)) == 0).all()
    assert (np.asarray(mgr.num_rows(sim.state, col.Contact)) == 0).all()


def test_push_magnitude_matches_reference():
    """Each ordered pair contributes one unit push (reference creates both
    (a,b) and (b,a) candidates): separation grows by exactly 4 per step for
    an isolated overlapping pair."""
    cfg = small_cfg(num_worlds=1, num_objects=2)
    sim = col.make_executor(cfg)
    mgr = sim.mgr
    pos = mgr.column(sim.state, col.CubeObject, col.Translation)
    pos = pos.at[:, :2].set(jnp.array([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0]]))
    state = mgr.set_column(sim.state, col.CubeObject, col.Translation, pos)
    rot = mgr.column(state, col.CubeObject, col.Rotation)
    rot = rot.at[:, :2].set(jnp.array([1.0, 0, 0, 0]))
    state = mgr.set_column(state, col.CubeObject, col.Rotation, rot)
    sim.state = state
    sim.step()
    new_pos = np.asarray(mgr.column(sim.state, col.CubeObject, col.Translation))
    # a gets -normal(+x) from (a,b) and +normal(-x) from (b,a): net -2x
    np.testing.assert_allclose(new_pos[0, 0], [-2.0, 0.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(new_pos[0, 1], [3.0, 0.0, 5.0], atol=1e-5)


def test_determinism_and_divergence():
    sim1 = col.make_executor(small_cfg())
    sim2 = col.make_executor(small_cfg())
    sim1.run(10)
    sim2.run(10)
    p1, _ = sim1.get_exported(0)
    p2, _ = sim2.get_exported(0)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    # different worlds get different random init -> different trajectories
    assert not np.allclose(np.asarray(p1)[0], np.asarray(p1)[1])


def test_multi_step_runs():
    sim = col.make_executor(small_cfg())
    sim.run(20)
    pos, mask = sim.get_exported(0)
    assert np.isfinite(np.asarray(pos)[np.asarray(mask)]).all()
    assert (np.asarray(mask).sum(axis=1) == 16).all()
