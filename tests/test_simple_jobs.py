"""simple_jobs behavioral tests vs reference examples/simple_jobs/simple.cpp."""

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.models import simple_jobs as sj


def small_cfg(**kw):
    d = dict(num_worlds=4, num_objects=12, max_pairs=256, seed=5)
    d.update(kw)
    return sj.SimpleJobsConfig(**d)


def test_clamp_and_aabb():
    sim = sj.make_executor(small_cfg())
    sim.step()
    d = sim.state["user"]
    pos = np.asarray(d["translation"])
    assert (pos >= np.array(sj.BOUNDS_LO) - 2.1).all()  # pushes can exceed briefly
    alo, ahi = np.asarray(d["aabb_lo"]), np.asarray(d["aabb_hi"])
    assert (ahi >= alo).all()
    # rotated unit cube AABB half-extent is within [1, sqrt(3)] per axis
    half = (ahi - alo) / 2
    assert (half >= 1.0 - 1e-5).all() and (half <= np.sqrt(3) + 1e-5).all()


def test_counters_reset_each_tick():
    sim = sj.make_executor(small_cfg())
    sim.run(3)
    d = sim.state["user"]
    assert (np.asarray(d["num_candidates"]) == 0).all()
    assert (np.asarray(d["num_contacts"]) == 0).all()


def test_overlap_pushes_apart():
    sim = sj.make_executor(small_cfg(num_worlds=1, num_objects=2))
    d = dict(sim.state["user"])
    d["translation"] = jnp.array([[[0.0, 0.0, 5.0], [1.0, 0.0, 5.0]]])
    d["rotation"] = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (1, 2, 4)).copy()
    st = dict(sim.state)
    st["user"] = d
    sim.state = st
    sim.step()
    pos = np.asarray(sim.state["user"]["translation"])
    np.testing.assert_allclose(pos[0, 0], [-2.0, 0.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(pos[0, 1], [3.0, 0.0, 5.0], atol=1e-5)


def test_determinism():
    a = sj.make_executor(small_cfg())
    b = sj.make_executor(small_cfg())
    a.run(10)
    b.run(10)
    assert np.array_equal(
        np.asarray(a.state["user"]["translation"]),
        np.asarray(b.state["user"]["translation"]),
    )


def test_parity_with_collisions_example():
    """simple_jobs and collisions implement the same physics on different
    state layouts (user buffers vs ECS archetypes); with identical inits
    their trajectories must match — the cross-layout consistency check the
    reference cannot do (its two examples use different RNG streams)."""
    from gpu_ecs_madrona_tpu.models import collisions as col

    cfg_j = small_cfg(num_worlds=2, num_objects=8)
    cfg_c = col.CollisionsConfig(num_worlds=2, num_objects=8, max_pairs=256, seed=5)
    sj_sim = sj.make_executor(cfg_j)
    col_sim = col.make_executor(cfg_c)

    # copy collisions' init into simple_jobs user buffers
    pos = col_sim.mgr.column(col_sim.state, col.CubeObject, col.Translation)[:, :8]
    rot = col_sim.mgr.column(col_sim.state, col.CubeObject, col.Rotation)[:, :8]
    d = dict(sj_sim.state["user"])
    d["translation"] = jnp.asarray(pos)
    d["rotation"] = jnp.asarray(rot)
    st = dict(sj_sim.state)
    st["user"] = d
    sj_sim.state = st

    # One step: init is in-bounds so simple_jobs' pre-step clamp is a no-op
    # and the two pipelines compute identical pushes.
    sj_sim.run(1)
    col_sim.run(1)
    p_j = np.asarray(sj_sim.state["user"]["translation"])
    p_c = np.asarray(
        col_sim.mgr.column(col_sim.state, col.CubeObject, col.Translation)
    )[:, :8]
    np.testing.assert_allclose(p_j, p_c, atol=1e-5)


def test_compaction_modes_agree(monkeypatch):
    """All GEM_SJ_COMPACT modes must produce identical valid-prefix
    candidate lists (ascending pair-index order) and identical
    trajectories.  Tail entries past the count are unspecified (topk
    leaves non-overlapping pair indices there; the others zero them)."""
    results = {}
    for mode in ("topk", "sortkey", "twostage", "rank"):
        monkeypatch.setenv("GEM_SJ_COMPACT", mode)
        sim = sj.make_executor(small_cfg(num_objects=24, max_pairs=128))
        sim.run(2)
        mid = np.asarray(sim.state["user"]["translation"]).copy()
        sim.run(1)
        results[mode] = (mid, np.asarray(sim.state["user"]["translation"]))
    base = results["topk"]
    for mode, out in results.items():
        np.testing.assert_array_equal(base[0], out[0], err_msg=mode)
        np.testing.assert_array_equal(base[1], out[1], err_msg=mode)


def test_rank_mode_prefix_matches_twostage(monkeypatch):
    """Direct valid-prefix equality of the emitted contact list."""
    import jax

    outs = {}
    for mode in ("twostage", "rank"):
        monkeypatch.setenv("GEM_SJ_COMPACT", mode)
        sim = sj.make_executor(small_cfg(num_objects=24, max_pairs=128))
        # run preprocess..narrowphase only: step the full graph but read
        # contacts_ab/num_contacts, which narrowphase sets and solver
        # does not modify (it only resets the scalar count after use).
        sim.run(1)
        d = {k: np.asarray(v) for k, v in sim.state["user"].items()}
        # num_contacts was reset by solver; recompute counts from the
        # candidate buffer convention: valid entries are the leading
        # non-(0,0) rows plus a possible true (0,1)/(1,0)-style pair at
        # row 0 — instead compare the full buffer where both modes zero
        # the tail, which they do (both write zeros past the count).
        outs[mode] = (d["contacts_ab"], d["contacts_normal"])
    np.testing.assert_array_equal(outs["twostage"][0], outs["rank"][0])
    np.testing.assert_array_equal(outs["twostage"][1], outs["rank"][1])


def test_fused_kernel_matches_xla_path():
    """The fused pallas tick (ops/simple_jobs_kernel.py, interpret mode on
    CPU) reproduces the XLA rank path: candidate/contact buffers EXACT
    (same integer slots), trajectories to fp-reassociation tolerance
    (the solver uses the subtract-first distance form)."""
    outs = {}
    for fused in (False, True):
        sim = sj.make_executor(small_cfg(num_objects=24, max_pairs=128,
                                         degree_cap=8, fused=fused))
        sim.run(4)
        d = sim.state["user"]
        outs[fused] = {k: np.asarray(v) for k, v in d.items()}
    a, b = outs[False], outs[True]
    np.testing.assert_array_equal(a["candidates"], b["candidates"])
    np.testing.assert_array_equal(a["contacts_ab"], b["contacts_ab"])
    assert np.abs(a["contacts_normal"] - b["contacts_normal"]).max() < 1e-5
    assert np.abs(a["translation"] - b["translation"]).max() < 1e-3
    assert (a["num_candidates"] == 0).all() and (b["num_candidates"] == 0).all()


def test_fused_kernel_coincident_objects_no_blowup():
    """Two objects clamped into the same bounds corner are EXACTLY
    coincident: the push direction is undefined (the reference's
    normalize(0) is NaN, simple.cpp:233) and is excluded from the solve
    in both paths.  Regression for the on-chip +-2^31 blow-up a 1/4096
    world hit at tick 3 (rsqrt(0) through the push matmul)."""
    import jax.numpy as jnp

    for fused in (False, True):
        sim = sj.make_executor(small_cfg(num_worlds=1, num_objects=3,
                                         fused=fused), donate=False)
        d = dict(sim.state["user"])
        # two objects far outside the same corner -> clamp to identical
        # positions; third nearby for a live normal pair
        d["translation"] = jnp.array([[[-99.0, -99.0, -5.0],
                                       [-88.0, -77.0, -9.0],
                                       [-9.5, -9.5, 0.5]]])
        d["rotation"] = jnp.broadcast_to(
            jnp.array([1.0, 0, 0, 0]), (1, 3, 4)).copy()
        st = dict(sim.state)
        st["user"] = d
        sim.state = st
        sim.run(3)
        pos = np.asarray(sim.state["user"]["translation"])
        assert np.isfinite(pos).all()
        assert np.abs(pos).max() < 50, pos
