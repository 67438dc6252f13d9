"""Exact incident-face clip manifold (pairs._clip_face_manifold).

Checks the hull-hull contact patch against hand-computed polygon
intersections for the canonical configurations the old AABB-clamp
stand-in got wrong or only accidentally right:

  * aligned equal boxes          -> 4 corner contacts, no duplicates
  * 45-degree rotated top box    -> octagonal patch corners
  * small-under-large (region inside polygon) -> reference-vert set
  * partial overlap              -> intersection-rectangle corners
  * analytic box path vs general table path agree exactly

Reference: narrowphase.cpp hull-hull manifold = incident face clipped
against reference face side planes (SURVEY.md 2.4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpu_ecs_madrona_tpu.physics import assets, pairs as pk

IDENT = (1.0, 0.0, 0.0, 0.0)


def _tables(halves, all_box=True):
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([assets.make_box(h, inv_mass=1.0) for h in halves])
    om = loader.get_object_manager()
    if not all_box:
        om = dict(om)
        om["hull_is_box"] = np.zeros_like(om["hull_is_box"])
    return pk.ObjTables(om)


def _contact(tables, posA, posB, rotA=IDENT, rotB=IDENT, objA=0, objB=0):
    """Single-pair contact, W=1, K=1."""
    def v(x, n):
        return tuple(jnp.full((1, 1), float(x[c]), jnp.float32)
                     for c in range(n))
    A = pk.body_fields(v(posA, 3), v(rotA, 4),
                       jnp.full((1, 1), objA, jnp.int32), tables)
    B = pk.body_fields(v(posB, 3), v(rotB, 4),
                       jnp.full((1, 1), objB, jnp.int32), tables)
    out = pk.pair_contacts(A, B, jnp.ones((1, 1), bool))
    pts = np.stack([np.asarray(c)[0, :, 0] for c in out["points"]], axis=-1)
    dep = np.asarray(out["depth"])[0, :, 0]
    nrm = np.array([float(np.asarray(c)[0, 0]) for c in out["normal"]])
    return (bool(np.asarray(out["ok"])[0, 0]), nrm, pts, dep,
            int(np.asarray(out["num_points"])[0, 0]))


def _live(pts, dep):
    order = np.argsort(-dep)
    pts, dep = pts[order], dep[order]
    m = dep > 0
    return pts[m], dep[m]


def _assert_patch(pts, expect_xy, tol=1e-4):
    """Contact xy positions match the expected corner set (any order)."""
    got = sorted(map(tuple, np.round(pts[:, :2], 4)))
    want = sorted(map(tuple, np.round(np.asarray(expect_xy, np.float64), 4)))
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert abs(g[0] - w[0]) < tol and abs(g[1] - w[1]) < tol, (got, want)


@pytest.mark.parametrize("all_box", [True, False])
def test_aligned_equal_boxes(all_box):
    # unit cubes, top box overlapping by 0.1: contacts at the 4 shared
    # corners, each emitted exactly once (vert set wins ties over the
    # projected ref-vert set)
    t = _tables([(0.5, 0.5, 0.5)], all_box)
    ok, nrm, pts, dep, num = _contact(t, (0, 0, 0), (0, 0, 0.9))
    assert ok and num == 4
    assert abs(abs(nrm[2]) - 1.0) < 1e-5
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.5, 0.5), (0.5, -0.5), (-0.5, 0.5), (-0.5, -0.5)])


@pytest.mark.parametrize("all_box", [True, False])
def test_rotated_45_box(all_box):
    # top unit cube rotated 45 degrees about z: the patch is an octagon;
    # the manifold keeps 4 of its corners, all strictly inside both
    # footprints (the AABB clamp placed them on the reference AABB)
    t = _tables([(0.5, 0.5, 0.5)], all_box)
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    ok, nrm, pts, dep, num = _contact(t, (0, 0, 0), (0, 0, 0.9),
                                      rotB=(c, 0, 0, s))
    assert ok and num == 4
    live, d = _live(pts, dep)
    assert len(live) == 4
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    r2 = np.sqrt(2.0)
    for x, y, _ in live:
        assert abs(x) <= 0.5 + 1e-4 and abs(y) <= 0.5 + 1e-4
        assert abs(x) + abs(y) <= 0.5 * r2 + 1e-4, (x, y)


@pytest.mark.parametrize("all_box", [True, False])
def test_small_face_inside_large(all_box):
    # large box resting on a small box: no incident (large) vert is inside
    # the reference region and no incident edge crosses it — the manifold
    # must come from the reference-vert set (small top corners projected
    # onto the large bottom face)
    t = _tables([(0.2, 0.2, 0.5), (1.0, 1.0, 0.5)], all_box)
    ok, nrm, pts, dep, num = _contact(t, (0, 0, 0), (0, 0, 0.9),
                                      objA=0, objB=1)
    assert ok and num == 4
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.2, 0.2), (0.2, -0.2), (-0.2, 0.2), (-0.2, -0.2)])
    # points lie on the incident (large-box bottom) face: z = 0.9 - 0.5
    np.testing.assert_allclose(live[:, 2], 0.4, atol=1e-5)


@pytest.mark.parametrize("all_box", [True, False])
def test_partial_overlap_rectangle(all_box):
    # equal cubes offset by half a width in x: patch = the intersection
    # rectangle; 2 corners from incident verts, 2 from edge crossings
    t = _tables([(0.5, 0.5, 0.5)], all_box)
    ok, nrm, pts, dep, num = _contact(t, (0, 0, 0), (0.5, 0, 0.9))
    assert ok and num == 4
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.0, 0.5), (0.0, -0.5), (0.5, 0.5), (0.5, -0.5)])


def _contact_dense(halves, posA, posB, rotA=IDENT, rotB=IDENT,
                   objA=0, objB=0):
    """Same single-pair scenarios through the dense-grid narrowphase."""
    from gpu_ecs_madrona_tpu.physics import narrowphase as nph
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([assets.make_box(h, inv_mass=1.0) for h in halves])
    om = {k: jnp.asarray(v) for k, v in loader.get_object_manager().items()}
    pos = jnp.asarray(np.stack([posA, posB])[None], jnp.float32)
    rot = jnp.asarray(np.stack([rotA, rotB])[None], jnp.float32)
    obj = jnp.asarray([[objA, objB]], jnp.int32)
    out = nph.narrowphase_dense(pos, rot, obj, jnp.ones((1, 2), bool), om)
    pts = np.asarray(out["points"])[0, 0, 1]
    dep = np.asarray(out["depth"])[0, 0, 1]
    nrm = np.asarray(out["normal"])[0, 0, 1]
    return (bool(np.asarray(out["ok"])[0, 0, 1]), nrm, pts, dep,
            int(np.asarray(out["num_points"])[0, 0, 1]))


def test_dense_path_clips_exactly():
    # the dense-grid narrowphase shares the clip semantics: rotated-45 and
    # small-under-large patches match the pair-major path's
    ok, nrm, pts, dep, num = _contact_dense(
        [(0.5, 0.5, 0.5)], (0, 0, 0), (0.5, 0, 0.9))
    assert ok and num == 4
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.0, 0.5), (0.0, -0.5), (0.5, 0.5), (0.5, -0.5)])

    ok, nrm, pts, dep, num = _contact_dense(
        [(0.2, 0.2, 0.5), (1.0, 1.0, 0.5)], (0, 0, 0), (0, 0, 0.9),
        objA=0, objB=1)
    assert ok and num == 4
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.2, 0.2), (0.2, -0.2), (-0.2, 0.2), (-0.2, -0.2)])


def test_merge_coplanar_triangulated_cube():
    # a triangulated cube (12 tris) must merge back to 6 quad faces, so
    # incident-face clipping sees the full face patch, not half of it
    box = assets.make_box((0.5, 0.5, 0.5))
    tris = []
    for loop in box.faces:
        tris.append(np.asarray([loop[0], loop[1], loop[2]]))
        tris.append(np.asarray([loop[0], loop[2], loop[3]]))
    merged = assets.merge_coplanar_faces(box.verts, tris)
    assert len(merged) == 6
    assert all(len(f) == 4 for f in merged)

    # and the full pipeline produces the same 4-corner patch as make_box
    tri_obj = assets.convex_hull_from_mesh(box.verts, tris)
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([tri_obj])
    om = loader.get_object_manager()
    assert int(om["num_faces"][0]) == 6
    t = pk.ObjTables(om)
    ok, nrm, pts, dep, num = _contact(t, (0, 0, 0), (0, 0, 0.9))
    assert ok and num == 4
    live, d = _live(pts, dep)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)
    _assert_patch(live, [(0.5, 0.5), (0.5, -0.5), (-0.5, 0.5), (-0.5, -0.5)])


def test_box_analytic_matches_general_tables():
    # the analytic box clip and the table-driven general clip must produce
    # the same contact patch for random box poses
    rng = np.random.default_rng(7)
    ta = _tables([(0.5, 0.4, 0.3), (0.6, 0.6, 0.6)], True)
    tb = _tables([(0.5, 0.4, 0.3), (0.6, 0.6, 0.6)], False)
    checked = 0
    for _ in range(40):
        pa = rng.uniform(-0.3, 0.3, 3)
        pb = pa + rng.uniform(-0.8, 0.8, 3)
        ax = rng.standard_normal(3)
        ax /= np.linalg.norm(ax)
        ang = rng.uniform(0, np.pi)
        rb = (np.cos(ang / 2), *(np.sin(ang / 2) * ax))
        oa, ob_ = int(rng.integers(0, 2)), int(rng.integers(0, 2))
        ra = _contact(ta, pa, pb, rotB=rb, objA=oa, objB=ob_)
        rb_ = _contact(tb, pa, pb, rotB=rb, objA=oa, objB=ob_)
        if not (ra[0] and rb_[0]):
            continue
        if abs(np.dot(ra[1], rb_[1]) - 1.0) > 1e-3:
            continue  # SAT winner tie: different but valid axes
        la, da = _live(ra[2], ra[3])
        lb, db = _live(rb_[2], rb_[3])
        assert len(la) == len(lb), (la, lb)
        ia = np.lexsort((la[:, 2], la[:, 1], la[:, 0]))
        ib = np.lexsort((lb[:, 2], lb[:, 1], lb[:, 0]))
        np.testing.assert_allclose(la[ia], lb[ib], atol=2e-3)
        np.testing.assert_allclose(np.sort(da), np.sort(db), atol=2e-3)
        checked += 1
    assert checked >= 10, checked
