"""OBB analytic SAT (pairs._obb_sat) vs the general vertex-support SAT.

For box hulls the two formulations must agree: same contact decision,
same penetration depth, same (oriented) normal.  Runs both through
pair_contacts by toggling the hull_is_box table.
"""
import numpy as np
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.physics import assets, pairs as pk


def _tables(all_box):
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([
        assets.make_box((0.5, 0.4, 0.3), inv_mass=1.0),
        assets.make_box((0.6, 0.6, 0.6), inv_mass=1.0),
    ])
    om = loader.get_object_manager()
    if not all_box:
        om = dict(om)
        om["hull_is_box"] = np.zeros_like(om["hull_is_box"])
    return pk.ObjTables(om)


def _contacts(tables, pos, rot, obj):
    W, K = obj.shape[0], obj.shape[1] // 2
    p = tuple(jnp.asarray(pos[..., c]) for c in range(3))
    q = tuple(jnp.asarray(rot[..., c]) for c in range(4))
    o = jnp.asarray(obj)
    A = pk.body_fields(tuple(c[:, :K] for c in p),
                       tuple(c[:, :K] for c in q), o[:, :K], tables)
    B = pk.body_fields(tuple(c[:, K:] for c in p),
                       tuple(c[:, K:] for c in q), o[:, K:], tables)
    live = jnp.ones((W, K), bool)
    return pk.pair_contacts(A, B, live)


def test_obb_matches_general_sat():
    rng = np.random.default_rng(3)
    W, K = 4, 64
    # random poses with guaranteed mix of separated/overlapping
    pos = rng.uniform(-1.2, 1.2, (W, 2 * K, 3)).astype(np.float32)
    ax = rng.standard_normal((W, 2 * K, 3)).astype(np.float32)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    ang = rng.uniform(0, np.pi, (W, 2 * K, 1)).astype(np.float32)
    rot = np.concatenate([np.cos(ang / 2), np.sin(ang / 2) * ax], axis=-1)
    obj = rng.integers(0, 2, (W, 2 * K)).astype(np.int32)

    ca = _contacts(_tables(True), pos, rot, obj)
    cb = _contacts(_tables(False), pos, rot, obj)

    ok_a = np.asarray(ca["ok"])
    ok_b = np.asarray(cb["ok"])
    # contact decision: allow disagreement only in a thin shell where the
    # penetration is within the OBB eps inflation
    pen_a = np.asarray(ca["depth"]).max(axis=1)
    disagree = ok_a != ok_b
    assert (np.abs(pen_a[disagree]) < 1e-3).all(), (
        int(disagree.sum()), pen_a[disagree])

    both = ok_a & ok_b
    na = np.stack([np.asarray(c) for c in ca["normal"]], -1)[both]
    nb = np.stack([np.asarray(c) for c in cb["normal"]], -1)[both]
    # normals agree (same axis, same orientation) except where the SAT
    # winner is ambiguous (near-tied axes); require 98% exact agreement
    dots = np.sum(na * nb, axis=-1)
    assert (dots > 0.999).mean() > 0.98, dots.min()

    da = np.asarray(ca["depth"]).max(axis=1)[both]
    db = np.asarray(cb["depth"]).max(axis=1)[both]
    close = np.abs(da - db) < 5e-3
    assert close.mean() > 0.98, np.abs(da - db).max()
