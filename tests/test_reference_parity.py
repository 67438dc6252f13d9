"""Reference-semantics parity: a serial numpy oracle implementing the
reference examples' per-tick math exactly as written (C++ loop order,
examples/collisions/collisions.cpp and simple_jobs/simple.cpp), compared
against the batched TPU engine.  This is the BASELINE.json correctness
gate realized on observable exports (SURVEY.md §7.3: define parity on
exports, not internal row order)."""

import numpy as np
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.models import collisions as col
from gpu_ecs_madrona_tpu.utils import math as m


def oracle_collisions_tick(pos, rot):
    """One tick of reference collisions.cpp, serial, per the C++ loops.

    pos [n,3], rot [n,4] -> new pos [n,3] (float64 for a tight tolerance).
    """
    n = pos.shape[0]
    # 1. AABB preprocess (collisions.cpp:96-122)
    corners = np.asarray(m.UNIT_CUBE_CORNERS, np.float64)
    lo = np.empty((n, 3))
    hi = np.empty((n, 3))
    for i in range(n):
        w, x, y, z = rot[i]
        # quat rotate (w,x,y,z) applied to each corner + translate
        u = np.array([x, y, z])
        pts = (corners
               + 2.0 * w * np.cross(u, corners)
               + 2.0 * np.cross(u, np.cross(u, corners))) + pos[i]
        lo[i] = pts.min(axis=0)
        hi[i] = pts.max(axis=0)
    # 2. broadphase: ordered pairs (a != b) with AABB overlap
    #    (collisions.cpp:125-145, a-major loop order)
    candidates = []
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            if np.all(lo[a] <= hi[b]) and np.all(lo[b] <= hi[a]):
                candidates.append((a, b))
    # 3. narrowphase: normal = normalize(b - a) at PRE-push positions
    #    (collisions.cpp:148-173)
    contacts = []
    for a, b in candidates:
        d = pos[b] - pos[a]
        nrm = d / np.linalg.norm(d)
        contacts.append((a, b, nrm))
    # 4. solver: serial pushes (collisions.cpp:179-200)
    new_pos = pos.copy()
    for a, b, nrm in contacts:
        new_pos[a] -= nrm
        new_pos[b] += nrm
    return new_pos


def test_collisions_matches_serial_oracle():
    """Multi-tick trajectory parity vs the serial C++-order oracle."""
    cfg = col.CollisionsConfig(num_worlds=3, num_objects=14, max_pairs=256,
                               seed=13)
    sim = col.make_executor(cfg)
    mgr = sim.mgr

    pos0 = np.asarray(mgr.column(sim.state, col.CubeObject, col.Translation),
                      np.float64)
    rot0 = np.asarray(mgr.column(sim.state, col.CubeObject, col.Rotation),
                      np.float64)
    mask = np.asarray(mgr.row_mask(sim.state, col.CubeObject))

    # engine: 5 ticks
    sim.run(5)
    engine_pos = np.asarray(
        mgr.column(sim.state, col.CubeObject, col.Translation))

    # oracle: 5 ticks per world, serial
    for w in range(cfg.num_worlds):
        live = mask[w]
        p = pos0[w][live]
        r = rot0[w][live]
        for _ in range(5):
            p = oracle_collisions_tick(p, r)
        np.testing.assert_allclose(
            engine_pos[w][live], p, atol=5e-4,
            err_msg=f"world {w} diverged from the serial reference oracle")


def test_simple_jobs_matches_oracle_with_clamp():
    """simple_jobs adds a pre-tick clamp (simple.cpp:155-167); verify the
    full clamp+push tick against the serial oracle."""
    from gpu_ecs_madrona_tpu.models import simple_jobs as sj

    cfg = sj.SimpleJobsConfig(num_worlds=2, num_objects=10, max_pairs=256,
                              seed=21)
    sim = sj.make_executor(cfg)
    d = sim.state["user"]
    pos0 = np.asarray(d["translation"], np.float64)
    rot0 = np.asarray(d["rotation"], np.float64)

    sim.run(3)
    engine_pos = np.asarray(sim.state["user"]["translation"])

    blo = np.array(sj.BOUNDS_LO)
    bhi = np.array(sj.BOUNDS_HI)
    for w in range(cfg.num_worlds):
        p = pos0[w]
        r = rot0[w]
        for _ in range(3):
            p = np.clip(p, blo, bhi)
            p = oracle_collisions_tick(p, r)
        np.testing.assert_allclose(engine_pos[w], p, atol=5e-4)


def test_collisions_far_from_origin():
    """Gram-formulation cancellation guard: trajectories must stay accurate
    when worlds live far from the origin (|x| ~ 1000)."""
    cfg = col.CollisionsConfig(num_worlds=1, num_objects=10, max_pairs=128,
                               seed=2)
    sim = col.make_executor(cfg)
    mgr = sim.mgr
    pos = mgr.column(sim.state, col.CubeObject, col.Translation) + 1000.0
    sim.state = mgr.set_column(sim.state, col.CubeObject, col.Translation, pos)
    p0 = np.asarray(pos, np.float64)
    r0 = np.asarray(mgr.column(sim.state, col.CubeObject, col.Rotation),
                    np.float64)
    mask = np.asarray(mgr.row_mask(sim.state, col.CubeObject))
    sim.run(3)
    engine = np.asarray(mgr.column(sim.state, col.CubeObject, col.Translation))
    p = p0[0][mask[0]]
    for _ in range(3):
        p = oracle_collisions_tick(p, r0[0][mask[0]])
    np.testing.assert_allclose(engine[0][mask[0]], p, atol=5e-3)
