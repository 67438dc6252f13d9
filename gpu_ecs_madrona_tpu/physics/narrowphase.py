"""Narrowphase contact generation — batched SAT over a generic pair axis.

TPU redesign of reference src/physics/narrowphase.cpp: the reference
dispatches per candidate pair on primitive-type bitmasks
(narrowphase.cpp:98-108) and runs divergent SAT control flow per pair
(doSAT, narrowphase.cpp:663-727).  Here every pair evaluates all
primitive-pair kinds with masked selects — the restructuring SURVEY.md §7.3
calls for: fixed iteration face/edge loops with masked min-reductions
instead of branches.

The core (``pair_contacts``) is leading-shape generic.  Two drivers use it:
  * ``narrowphase_dense``: pairs = the full [worlds, n, n] grid (A-side
    fields broadcast along axis 2, B-side along axis 1).  Zero gathers;
    right for small body counts.
  * compacted-pairs mode (physics/__init__.py): pairs = [worlds, K]
    broadphase candidates; body data is gathered per pair.  Right at scale,
    where n^2 SAT work would dominate (the TPU analog of the reference
    running narrowphase only on broadphase candidates).

Supported pair kinds (reference narrowphase.cpp Type bitmask):
  sphere-sphere, sphere-plane, sphere-hull, hull-plane, hull-hull (SAT over
  face normals of both hulls + edge-direction cross axes), with up-to-4-
  point face manifolds and single-point edge-edge contacts.

Everything is written as elementwise ops + masked reductions so XLA's
reduction fusion streams the per-pair virtual tensors through the VPU
without materializing them.

Output: contact dict with leading pair shape L (i = ref body A, j = other
body B):
  ok [L] bool, normal [L,3] (ref -> other),
  points [L,4,3], depth [L,4], num_points [L]
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE
from gpu_ecs_madrona_tpu.physics.pairs import CLIP_EPS, CLIP_STRICT, CLIP_T_EPS
from gpu_ecs_madrona_tpu.utils import math as m

NEG_BIG = -1e9
BIG = 1e9


# -- gather-free selection helpers -------------------------------------------
# XLA lowers gathers (take_along_axis / fancy indexing) to a sequential
# custom-call on TPU inside large fused programs — measured ~1s per dense
# substep at a mere [256, 36, 36] pair grid.  Every row selection here is
# therefore a one-hot masked reduction (VPU) or one-hot matmul (MXU), the
# same discipline physics/pairs.py uses (extreme_onehot / pick_rows).


def _sel_vec(table, idx):
    """table [..., R, D] select row ``idx`` [...] -> [..., D]."""
    R = table.shape[-2]
    oh = idx[..., None] == jnp.arange(R)
    return jnp.sum(jnp.where(oh[..., None], table, 0.0), axis=-2)


def _sel_scalar(table, idx):
    """table [..., R] select ``idx`` [...] -> [...]."""
    R = table.shape[-1]
    oh = idx[..., None] == jnp.arange(R)
    return jnp.sum(jnp.where(oh, table, 0.0), axis=-1)


def _gather_rows(tab, idx):
    """Global-table row gather tab [G, D...] by idx [...] -> [..., D...]
    as a one-hot matmul (exact: sums one f32 term per row; int tables
    round-trip exactly below 2^24)."""
    G = tab.shape[0]
    oh = (idx[..., None] == jnp.arange(G)).astype(jnp.float32)
    flat = tab.reshape(G, -1).astype(jnp.float32)
    out = jnp.einsum("...g,gd->...d", oh, flat, precision=m.EXACT)
    out = out.reshape(idx.shape + tab.shape[1:])
    if jnp.issubdtype(tab.dtype, jnp.integer):
        out = jnp.round(out).astype(tab.dtype)
    elif tab.dtype == jnp.bool_:
        out = out > 0.5
    return out


def _top4(dep, pts):
    """Top-4 depths + their points, sort/gather-free: 4 rounds of masked
    max with first-occurrence one-hot (matches lax.top_k's lower-index
    tie-break).  dep [..., K], pts [..., K, 3] -> ([..., 4, 3], [..., 4])."""
    outs_p, outs_d = [], []
    cur = dep
    for _ in range(4):
        mx = jnp.max(cur, axis=-1)
        oh = cur == mx[..., None]
        first = oh & (jnp.cumsum(oh.astype(jnp.int32), axis=-1) == 1)
        outs_p.append(jnp.sum(jnp.where(first[..., None], pts, 0.0), axis=-2))
        outs_d.append(mx)
        cur = jnp.where(first, -BIG, cur)
    return jnp.stack(outs_p, axis=-2), jnp.stack(outs_d, axis=-1)


def _clip_manifold_aos(objmgr, A, B, use_faceB, nrm_inc, L, bc):
    """Exact incident-face clip manifold, dense/AoS layout.

    Same order-free Sutherland-Hodgman candidate construction as
    pairs._clip_face_manifold (see its docstring for the three candidate
    sets); here face polygon / side-plane tables are gathered by flat
    (object, face) index — the dense path is the small-n regime where
    gathers are fine.  Returns (pts [*L,4,3], dep [*L,4])."""
    Fm = A["fnorm_w"].shape[-2]
    O = objmgr["face_verts"].shape[0]
    FVe = objmgr["face_verts"].shape[2]
    sB1 = use_faceB[..., None]
    sB2 = use_faceB[..., None, None]

    pos_ref = jnp.where(sB1, B["pos"], A["pos"])
    pos_inc = jnp.where(sB1, A["pos"], B["pos"])
    rot_ref = jnp.where(sB1, B["rot"], A["rot"])
    rot_inc = jnp.where(sB1, A["rot"], B["rot"])
    obj_ref = jnp.where(use_faceB, B["obj_id"], A["obj_id"])
    obj_inc = jnp.where(use_faceB, A["obj_id"], B["obj_id"])
    fnR = jnp.where(sB2, bc(B["fnorm_w"], 2), bc(A["fnorm_w"], 2))
    fnI = jnp.where(sB2, bc(A["fnorm_w"], 2), bc(B["fnorm_w"], 2))
    fdR = jnp.where(sB1, bc(B["face_dw"], 1), bc(A["face_dw"], 1))
    fdI = jnp.where(sB1, bc(A["face_dw"], 1), bc(B["face_dw"], 1))
    fmR = jnp.where(sB1, bc(B["fmask"], 1), bc(A["fmask"], 1))
    fmI = jnp.where(sB1, bc(A["fmask"], 1), bc(B["fmask"], 1))

    # reference face: most aligned with the contact axis; incident face:
    # most anti-aligned
    scR = jnp.where(fmR, jnp.sum(fnR * nrm_inc[..., None, :], -1), NEG_BIG)
    idxR = jnp.argmax(scR, axis=-1)
    scI = jnp.where(fmI, jnp.sum(fnI * nrm_inc[..., None, :], -1), BIG)
    idxI = jnp.argmin(scI, axis=-1)
    n_reff = _sel_vec(fnR, idxR)
    d_reff = _sel_scalar(fdR, idxR)
    n_incf = _sel_vec(fnI, idxI)
    d_incf = _sel_scalar(fdI, idxI)

    fvert = objmgr["face_verts"].reshape(O * Fm, FVe, 3)
    fnext = objmgr["face_verts_next"].reshape(O * Fm, FVe, 3)
    fsn = objmgr["face_side_n"].reshape(O * Fm, FVe, 3)
    fsd = objmgr["face_side_d"].reshape(O * Fm, FVe)
    fsv = objmgr["face_slot_valid"].reshape(O * Fm, FVe)
    gR = obj_ref * Fm + idxR
    gI = obj_inc * Fm + idxI

    rotI_e = rot_inc[..., None, :]
    rotR_e = rot_ref[..., None, :]
    posI_e = pos_inc[..., None, :]
    posR_e = pos_ref[..., None, :]
    polyI = m.quat_rotate(rotI_e, _gather_rows(fvert, gI)) + posI_e
    polyIn = m.quat_rotate(rotI_e, _gather_rows(fnext, gI)) + posI_e
    polyR = m.quat_rotate(rotR_e, _gather_rows(fvert, gR)) + posR_e
    svalI = _gather_rows(fsv, gI) > 0.5
    svalR = _gather_rows(fsv, gR) > 0.5
    snR = m.quat_rotate(rotR_e, _gather_rows(fsn, gR))
    sdR = _gather_rows(fsd, gR) + jnp.sum(snR * posR_e, -1)
    snI = m.quat_rotate(rotI_e, _gather_rows(fsn, gI))
    sdI = _gather_rows(fsd, gI) + jnp.sum(snI * posI_e, -1)

    # Plane-distance einsums are EXACT: these feed clip t-parameters via
    # near-zero differences at contact; one bf16 pass (TPU default) puts
    # ~4e-3 noise on O(1e-2) distances (utils/math.py EXACT note).
    # set 1: incident edges interval-clipped against the reference side
    # planes ([*L, v, p]) — the clipped-segment START covers verts-inside
    # (t_lo = 0) and entering crossings; END emitted only when strictly
    # clipped (see pairs._clip_face_manifold)
    dI0 = jnp.einsum("...vc,...pc->...vp", polyI, snR, precision=m.EXACT) - sdR[..., None, :]
    dI1 = jnp.einsum("...vc,...pc->...vp", polyIn, snR, precision=m.EXACT) - sdR[..., None, :]
    pvalR = svalR[..., None, :]
    denom = dI0 - dI1
    crossing = jnp.abs(denom) > 1e-12
    tc = dI0 / jnp.where(crossing, denom, 1.0)
    ent = pvalR & crossing & (dI0 > 0) & (dI1 <= 0)
    ext = pvalR & crossing & (dI0 <= 0) & (dI1 > 0)
    t_lo = jnp.max(jnp.where(ent, tc, 0.0), axis=-1)
    t_hi = jnp.min(jnp.where(ext, tc, 1.0), axis=-1)
    empty = jnp.any(pvalR & (dI0 > CLIP_EPS) & (dI1 > CLIP_EPS), axis=-1)
    edge_ok = svalI & ~empty & (t_lo <= t_hi + 1e-9)
    seg = polyIn - polyI
    pt_lo = polyI + t_lo[..., None] * seg
    pt_hi = polyI + t_hi[..., None] * seg
    dep_lo = d_reff[..., None] - jnp.sum(pt_lo * n_reff[..., None, :], -1)
    dep_hi = d_reff[..., None] - jnp.sum(pt_hi * n_reff[..., None, :], -1)
    dep_lo = jnp.where(edge_ok, dep_lo, -BIG)
    dep_hi = jnp.where(edge_ok & (t_hi < 1.0 - CLIP_T_EPS), dep_hi, -BIG)

    # set 2: reference verts strictly inside the incident side planes,
    # projected onto the incident face along the contact axis
    dRp = jnp.einsum("...vc,...pc->...vp", polyR, snI, precision=m.EXACT) - sdI[..., None, :]
    inside3 = jnp.all((dRp <= -CLIP_STRICT) | ~svalI[..., None, :],
                      axis=-1) & svalR
    den = jnp.sum(n_incf * nrm_inc, -1)
    den_ok = jnp.abs(den) > 0.1
    s = ((d_incf[..., None]
          - jnp.sum(polyR * n_incf[..., None, :], -1))
         / jnp.where(den_ok, den, 1.0)[..., None])
    q = polyR + s[..., None] * nrm_inc[..., None, :]
    dep3 = d_reff[..., None] - jnp.sum(q * n_reff[..., None, :], -1)
    dep3 = jnp.where(inside3 & den_ok[..., None], dep3, -BIG)

    pts = jnp.concatenate([pt_lo, pt_hi, q], axis=-2)
    dep = jnp.concatenate([dep_lo, dep_hi, dep3], axis=-1)
    pts4, top_pen = _top4(dep, pts)
    return pts4, top_pen


def body_fields(pos, rot, obj_id, objmgr) -> Dict[str, Any]:
    """Per-body world-space collision fields.

    pos [*L,3], rot [*L,4] (w,x,y,z), obj_id [*L] int32; objmgr: padded
    asset dict (jnp arrays).  Returns a dict of arrays with leading *L —
    the data a reference CollisionPrimitive carries (physics.hpp:245-264)
    pushed to world space once per body.
    """
    ptype = _gather_rows(objmgr["prim_type"], obj_id)
    radius = _gather_rows(objmgr["sphere_radius"], obj_id)
    verts_l = _gather_rows(objmgr["verts"], obj_id)          # [*L,Vm,3]
    nverts = _gather_rows(objmgr["num_verts"], obj_id)
    fnorm_l = _gather_rows(objmgr["face_normals"], obj_id)   # [*L,Fm,3]
    face_d = _gather_rows(objmgr["face_d"], obj_id)
    nfaces = _gather_rows(objmgr["num_faces"], obj_id)
    edir_l = _gather_rows(objmgr["edge_dirs"], obj_id)       # [*L,Em,3]
    nedges = _gather_rows(objmgr["num_edges"], obj_id)

    Vm = verts_l.shape[-2]
    Fm = fnorm_l.shape[-2]
    Em = edir_l.shape[-2]
    vmask = jnp.arange(Vm) < nverts[..., None]
    fmask = jnp.arange(Fm) < nfaces[..., None]
    emask = jnp.arange(Em) < nedges[..., None]

    rot_e = rot[..., None, :]
    pos_e = pos[..., None, :]
    verts_w = m.quat_rotate(rot_e, verts_l) + pos_e
    fnorm_w = m.quat_rotate(rot_e, fnorm_l)
    # rotated+translated face plane: d_w = face_d + n_w . pos
    face_dw = face_d + jnp.sum(fnorm_w * pos_e, axis=-1)
    edir_w = m.quat_rotate(rot_e, edir_l)
    # plane primitives: world normal/offset of the z=0 object plane
    plane_n = m.quat_rotate(rot, jnp.array([0.0, 0.0, 1.0]))
    plane_d = jnp.sum(plane_n * pos, axis=-1)

    # full-edge endpoints (supporting-edge lookup for edge-edge contacts);
    # DCE'd when unused
    ep0_l = _gather_rows(objmgr["edge_p0"], obj_id)  # [*L,Ef,3]
    ep1_l = _gather_rows(objmgr["edge_p1"], obj_id)
    nef = _gather_rows(objmgr["num_full_edges"], obj_id)
    efmask = jnp.arange(ep0_l.shape[-2]) < nef[..., None]

    fields = {
        "pos": pos, "rot": rot,
        "ptype": ptype, "radius": radius,
        "verts_w": verts_w, "vmask": vmask,
        "fnorm_w": fnorm_w, "face_dw": face_dw, "fmask": fmask,
        "edir_w": edir_w, "emask": emask,
        "edge_p0_w": m.quat_rotate(rot_e, ep0_l) + pos_e, "efmask": efmask,
        "edge_p1_w": m.quat_rotate(rot_e, ep1_l) + pos_e,
        "plane_n": plane_n, "plane_d": plane_d,
        "lo_l": _gather_rows(objmgr["local_aabb_lo"], obj_id),
        "hi_l": _gather_rows(objmgr["local_aabb_hi"], obj_id),
        "obj_id": obj_id,
    }
    if "hull_is_box" in objmgr:
        fields["is_box"] = _gather_rows(objmgr["hull_is_box"], obj_id) > 0
        fields["box_half"] = _gather_rows(objmgr["box_half"], obj_id)
    else:
        fields["is_box"] = jnp.zeros_like(obj_id, bool)
        fields["box_half"] = jnp.zeros(obj_id.shape + (3,), jnp.float32)
    return fields


def _expand(fields: Dict[str, Any], axis: int) -> Dict[str, Any]:
    """Insert a broadcast pair axis into every per-body field (dense grid)."""
    return {k: jnp.expand_dims(v, axis) for k, v in fields.items()}


def pair_contacts(A: Dict[str, Any], B: Dict[str, Any],
                  pair_live: jax.Array, objmgr=None,
                  speculative: float = 0.0) -> Dict[str, Any]:
    """Contacts for body pairs (A = ref, B = other).

    A/B: ``body_fields`` dicts whose leading shapes broadcast to
    ``pair_live.shape`` (= L).  Returns the contact dict (see module doc).
    speculative: near-miss margin for speculative-CCD contacts (see
    pairs.pair_contacts).
    """
    L = pair_live.shape
    Vm = A["verts_w"].shape[-2]
    Em = A["edir_w"].shape[-2]

    def bc(x, trailing: int):
        return jnp.broadcast_to(x, L + x.shape[x.ndim - trailing:])

    is_sphereA = A["ptype"] == PRIM_SPHERE
    is_sphereB = B["ptype"] == PRIM_SPHERE
    is_hullA = A["ptype"] == PRIM_HULL
    is_hullB = B["ptype"] == PRIM_HULL
    is_planeA = A["ptype"] == PRIM_PLANE
    is_planeB = B["ptype"] == PRIM_PLANE

    out_normal = jnp.zeros(L + (3,))
    out_points = jnp.zeros(L + (4, 3))
    out_depth = jnp.full(L + (4,), -BIG)
    out_np = jnp.zeros(L, jnp.int32)
    out_ok = jnp.zeros(L, bool)

    def merge(sel, ok, normal, points, depth, num_points):
        nonlocal out_normal, out_points, out_depth, out_np, out_ok
        sel = sel & pair_live
        okk = sel & ok
        out_ok = jnp.where(sel, okk, out_ok)
        out_normal = jnp.where(sel[..., None], normal, out_normal)
        out_points = jnp.where(sel[..., None, None], points, out_points)
        out_depth = jnp.where(sel[..., None], depth, out_depth)
        out_np = jnp.where(sel, num_points, out_np)

    posA, posB = A["pos"], B["pos"]
    radA, radB = A["radius"], B["radius"]

    def one_point(pt, pen):
        pts = jnp.zeros(L + (4, 3)).at[..., 0, :].set(jnp.broadcast_to(pt, L + (3,)))
        dep = jnp.full(L + (4,), -BIG).at[..., 0].set(jnp.broadcast_to(pen, L))
        return pts, dep

    ones_np = jnp.ones(L, jnp.int32)

    # ---------------- sphere - sphere (narrowphase.cpp sphere path) -------
    d = posB - posA
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    nrm = d / dist[..., None]
    pen = (radA + radB) - dist
    mid = posA + nrm * (radA - 0.5 * pen)[..., None]
    pts, dep = one_point(mid, pen)
    merge(is_sphereA & is_sphereB, pen > -speculative, nrm, pts, dep,
          ones_np)

    # ---------------- sphere - plane (either order) -----------------------
    def sphere_plane(s_pos, s_rad, p_n, p_d, flip):
        # distance of center to plane minus radius
        c_dist = jnp.sum(s_pos * p_n, axis=-1) - p_d
        pen = s_rad - c_dist
        contact = s_pos - p_n * c_dist[..., None]
        nrm_sp = p_n if flip else -p_n  # ref -> other
        nrm_sp = jnp.broadcast_to(nrm_sp, L + (3,))
        pts, dep = one_point(contact, pen)
        return pen > -speculative, nrm_sp, pts, dep

    ok_sp, n_sp, p_sp, d_sp = sphere_plane(posA, radA, B["plane_n"], B["plane_d"], flip=False)
    merge(is_sphereA & is_planeB, ok_sp, n_sp, p_sp, d_sp, ones_np)
    ok_ps, n_ps, p_ps, d_ps = sphere_plane(posB, radB, A["plane_n"], A["plane_d"], flip=True)
    merge(is_planeA & is_sphereB, ok_ps, n_ps, p_ps, d_ps, ones_np)

    # ---------------- hull - plane (either order) -------------------------
    def hull_plane(h_verts_w, h_vmask, p_n, p_d, flip):
        # vertex distances to plane [*L,Vm]
        vd = jnp.sum(h_verts_w * p_n[..., None, :], axis=-1) - p_d[..., None]
        vd = jnp.where(h_vmask, vd, BIG)
        pen_v = -vd  # positive = below plane
        pts, top_pen = _top4(bc(pen_v, 1),
                             jnp.broadcast_to(bc(h_verts_w, 2),
                                              L + h_verts_w.shape[-2:]))
        num_pts = jnp.sum((top_pen > -speculative).astype(jnp.int32), axis=-1)
        nrm_hp = p_n if flip else -p_n  # ref(hull) -> other(plane): -p_n
        nrm_hp = jnp.broadcast_to(nrm_hp, L + (3,))
        return num_pts > 0, nrm_hp, pts, top_pen, num_pts

    ok_hp, n_hp, p_hp, d_hp2, np_hp = hull_plane(
        A["verts_w"], A["vmask"], B["plane_n"], B["plane_d"], flip=False)
    merge(is_hullA & is_planeB, ok_hp, n_hp, p_hp, d_hp2, np_hp)
    ok_ph, n_ph, p_ph, d_ph, np_ph = hull_plane(
        B["verts_w"], B["vmask"], A["plane_n"], A["plane_d"], flip=True)
    merge(is_planeA & is_hullB, ok_ph, n_ph, p_ph, d_ph, np_ph)

    # ---------------- sphere - hull (either order) ------------------------
    # center vs hull face planes: closest face gives normal + depth
    def sphere_hull(s_pos, s_rad, h_fn_w, h_fd_w, h_fmask, flip):
        # signed distance of center to each face plane [*L,Fm]
        cd = jnp.sum(s_pos[..., None, :] * h_fn_w, axis=-1) - h_fd_w
        cd = jnp.where(h_fmask, cd, NEG_BIG)
        # center's max face distance = signed distance to hull surface
        # (exact when center is outside near a face, approximate at edges)
        fdist = jnp.max(cd, axis=-1)                    # [*L]
        fidx = jnp.argmax(cd, axis=-1)
        fn = _sel_vec(jnp.broadcast_to(bc(h_fn_w, 2),
                                       L + h_fn_w.shape[-2:]), fidx)
        pen = s_rad - fdist
        contact = s_pos - fn * fdist[..., None]
        nrm_sh = fn if flip else -fn
        pts, dep = one_point(contact, pen)
        return pen > -speculative, nrm_sh, pts, dep

    def sphere_box(s_pos, s_rad, b_pos, b_rot, b_half, flip):
        """Analytic sphere-box: clamp center into the box frame — exact on
        faces, edges and corners (matches pairs._obb path's sphere_box)."""
        d_l = m.quat_inv_rotate(b_rot, s_pos - b_pos)       # [*L,3]
        q = jnp.clip(d_l, -b_half, b_half)
        inside = jnp.all(jnp.abs(d_l) < b_half, axis=-1)
        closest_w = m.quat_rotate(b_rot, q) + b_pos
        delta = s_pos - closest_w
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-18)
        n_out = delta / dist[..., None]
        fdist = b_half - jnp.abs(d_l)                       # [*L,3]
        oh = jax.nn.one_hot(jnp.argmin(fdist, axis=-1), 3)
        n_in_l = oh * jnp.where(d_l >= 0, 1.0, -1.0)
        n_in = m.quat_rotate(b_rot, n_in_l)
        pen_in = s_rad + jnp.min(fdist, axis=-1)
        nrm_bs = jnp.where(inside[..., None], n_in, n_out)  # box -> sphere
        pen = jnp.where(inside, pen_in, s_rad - dist)
        nrm = nrm_bs if flip else -nrm_bs
        pts, dep = one_point(jnp.broadcast_to(closest_w, L + (3,)), pen)
        return pen > -speculative, nrm, pts, dep

    def sphere_hull_or_box(s_pos, s_rad, H, flip):
        ok_f, n_f, p_f, d_f = sphere_hull(
            s_pos, s_rad, H["fnorm_w"], H["face_dw"], H["fmask"], flip)
        ok_b, n_b, p_b, d_b = sphere_box(
            s_pos, s_rad, H["pos"], H["rot"], H["box_half"], flip)
        isb = jnp.broadcast_to(H["is_box"], L)
        return (jnp.where(isb, ok_b, ok_f),
                jnp.where(isb[..., None], bc(n_b, 1), bc(n_f, 1)),
                jnp.where(isb[..., None, None], p_b, p_f),
                jnp.where(isb[..., None], d_b, d_f))

    ok_sh, n_sh, p_sh, d_sh = sphere_hull_or_box(posA, radA, B, flip=False)
    merge(is_sphereA & is_hullB, ok_sh, n_sh, p_sh, d_sh, ones_np)
    ok_hs, n_hs, p_hs, d_hs = sphere_hull_or_box(posB, radB, A, flip=True)
    merge(is_hullA & is_sphereB, ok_hs, n_hs, p_hs, d_hs, ones_np)

    # ---------------- hull - hull: SAT (narrowphase.cpp doSAT) ------------
    both_hull = is_hullA & is_hullB & pair_live

    # When both sides' fields are full pair shape (compacted-pairs mode),
    # project supports with dot_general: XLA materializes the elementwise
    # [*L, axes, Vm, 3] product tensors of the broadcast formulation
    # (measured 7 GB of temps at 512 worlds x 512 pairs), while the batched
    # dot contracts the 3-axis on the MXU with only the [*L, axes, Vm]
    # output ever in HBM.  In dense-grid mode the sides are broadcast views
    # along the two pair axes, so the elementwise form streams instead.
    nb = len(L)
    full_pairs = (A["verts_w"].shape[:nb] == L and
                  B["verts_w"].shape[:nb] == L)

    def _proj(axes_w, verts_w):
        """[*L,K,3] x [*L,Vm,3] -> [*L,K,Vm] support projections."""
        if full_pairs and axes_w.shape[:nb] == L:
            batch = tuple(range(nb))
            return jax.lax.dot_general(
                axes_w, verts_w,
                (((axes_w.ndim - 1,), (verts_w.ndim - 1,)), (batch, batch)),
                preferred_element_type=jnp.float32)
        return jnp.sum(axes_w[..., None, :] * verts_w[..., None, :, :],
                       axis=-1)

    def axis_penetration(axes_w, axes_valid):
        """Penetration depth of the pair along candidate world axes.
        axes_w [*L,K,3] unit; returns penetration per axis [*L,K] (+BIG for
        invalid).  Supports are max/min projections of world verts — the
        masked-min-reduction restructuring of the reference's support fns."""
        projA = _proj(axes_w, A["verts_w"])               # [*L,K,Vm]
        projB = _proj(axes_w, B["verts_w"])
        vmA = A["vmask"][..., None, :]
        vmB = B["vmask"][..., None, :]
        maxA = jnp.max(jnp.where(vmA, projA, NEG_BIG), axis=-1)
        minA = jnp.min(jnp.where(vmA, projA, BIG), axis=-1)
        maxB = jnp.max(jnp.where(vmB, projB, NEG_BIG), axis=-1)
        minB = jnp.min(jnp.where(vmB, projB, BIG), axis=-1)
        # overlap along axis (positive = penetrating)
        pen = jnp.minimum(maxA - minB, maxB - minA)
        return jnp.where(axes_valid, pen, BIG)

    # candidate axes: A's faces, B's faces, cross(edgeA, edgeB)
    axesA = A["fnorm_w"]
    axesB = B["fnorm_w"]
    cross = jnp.cross(A["edir_w"][..., :, None, :], B["edir_w"][..., None, :, :])
    cross = cross.reshape(L + (Em * Em, 3))
    clen = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    cvalid = (clen[..., 0] > 1e-6) & (
        A["emask"][..., :, None] & B["emask"][..., None, :]
    ).reshape(L + (Em * Em,))
    cross = cross / jnp.maximum(clen, 1e-12)

    penA = axis_penetration(axesA, A["fmask"])
    penB = axis_penetration(axesB, B["fmask"])
    penE = axis_penetration(cross, cvalid)

    minA_, idxA_ = jnp.min(penA, -1), jnp.argmin(penA, -1)
    minB_, idxB_ = jnp.min(penB, -1), jnp.argmin(penB, -1)
    minE_, idxE_ = jnp.min(penE, -1), jnp.argmin(penE, -1)

    minA_ = jnp.broadcast_to(minA_, L)
    minB_ = jnp.broadcast_to(minB_, L)

    sat_pen = jnp.minimum(jnp.minimum(minA_, minB_), minE_)
    hit = both_hull & (sat_pen > -speculative) & (sat_pen < BIG * 0.5)

    # small bias toward face axes for manifold stability (standard SAT
    # practice; reference biases via its axis ordering)
    FACE_BIAS = 1.001
    use_faceA = minA_ <= jnp.minimum(minB_, minE_) * FACE_BIAS + 1e-6
    use_faceB = (~use_faceA) & (minB_ <= minE_ * FACE_BIAS + 1e-6)
    use_edge = ~(use_faceA | use_faceB)

    # reference face normal (world, oriented ref(A) -> other(B))
    def take_axis(axes, idx):
        return _sel_vec(jnp.broadcast_to(bc(axes, 2), L + axes.shape[-2:]),
                        idx)

    fA = take_axis(axesA, jnp.broadcast_to(idxA_, L))
    fB = take_axis(axesB, jnp.broadcast_to(idxB_, L))
    fE = take_axis(cross, idxE_)
    ab = posB - posA
    sgn = lambda v: jnp.where(jnp.sum(v * ab, axis=-1, keepdims=True) >= 0, 1.0, -1.0)
    sat_normal = jnp.where(
        use_faceA[..., None], fA * sgn(fA),
        jnp.where(use_faceB[..., None], fB * sgn(fB), fE * sgn(fE)),
    )

    # manifold: exact incident-face clip against the reference face's side
    # planes (narrowphase.cpp manifold generation) when the object manager
    # carries the clip tables; otherwise the legacy deepest-verts + AABB
    # clamp stand-in.
    nrm_inc = jnp.where(use_faceB[..., None], -sat_normal, sat_normal)
    if objmgr is not None and "face_side_n" in objmgr:
        pts_sat, depth_sat = _clip_manifold_aos(
            objmgr, A, B, jnp.broadcast_to(use_faceB, L), nrm_inc, L, bc)
    else:
        def clip_to_ref(pts4, ref_pos, ref_rot, ref_lo, ref_hi):
            """Clamp contact points into the reference hull's local AABB —
            the cheap stand-in for incident-face clipping: without it,
            manifold points overhanging the reference face apply spurious
            torque."""
            local = m.quat_inv_rotate(ref_rot[..., None, :],
                                      pts4 - ref_pos[..., None, :])
            local = jnp.clip(local, ref_lo[..., None, :], ref_hi[..., None, :])
            return (m.quat_rotate(ref_rot[..., None, :], local)
                    + ref_pos[..., None, :])

        def deepest_pts(incident_w, inc_mask, nrm_to_inc):
            # depth of incident verts along -nrm (penetration into ref
            # hull): project onto the SAT axis; depth relative to the
            # deepest ref-hull support point.
            proj = jnp.sum(incident_w * nrm_to_inc[..., None, :], axis=-1)
            proj = jnp.where(inc_mask, proj, BIG)
            pts, top_pen = _top4(
                bc(proj, 1) * -1.0,
                jnp.broadcast_to(bc(incident_w, 2),
                                 L + incident_w.shape[-2:]))
            return pts, top_pen

        ptsB, prB = deepest_pts(B["verts_w"], B["vmask"], sat_normal)
        ptsA, prA = deepest_pts(A["verts_w"], A["vmask"], -sat_normal)
        ptsB = clip_to_ref(ptsB, jnp.broadcast_to(posA, L + (3,)),
                           jnp.broadcast_to(A["rot"], L + (4,)),
                           jnp.broadcast_to(A["lo_l"], L + (3,)),
                           jnp.broadcast_to(A["hi_l"], L + (3,)))
        ptsA = clip_to_ref(ptsA, jnp.broadcast_to(posB, L + (3,)),
                           jnp.broadcast_to(B["rot"], L + (4,)),
                           jnp.broadcast_to(B["lo_l"], L + (3,)),
                           jnp.broadcast_to(B["hi_l"], L + (3,)))
        pts_sat = jnp.where(use_faceB[..., None, None], ptsA, ptsB)
        pen_rel = jnp.where(use_faceB[..., None], prA, prB)
        # deepest point has depth sat_pen; shallower manifold points offset
        # by projection delta.
        depth_sat = sat_pen[..., None] - (pen_rel[..., 0:1] - pen_rel)

    # edge-edge: single contact at the closest point between the supporting
    # edges (reference narrowphase edge contact path) — supporting edge =
    # the full edge whose least-projecting endpoint is maximal along the
    # support direction.
    def support_edge(F, n_dir):
        p0, p1 = F["edge_p0_w"], F["edge_p1_w"]
        s0 = jnp.sum(p0 * n_dir[..., None, :], axis=-1)      # [*L,Ef]
        s1 = jnp.sum(p1 * n_dir[..., None, :], axis=-1)
        score = jnp.where(F["efmask"], jnp.minimum(s0, s1), NEG_BIG)
        idx = jnp.argmax(score, axis=-1)
        oh = (jnp.arange(score.shape[-1]) == idx[..., None])[..., None]
        pick = lambda v: jnp.sum(jnp.where(oh, v, 0.0), axis=-2)
        return pick(bc(p0, 2)), pick(bc(p1, 2))

    a0, a1 = support_edge(A, sat_normal)
    b0, b1 = support_edge(B, -sat_normal)
    d1v, d2v, rv = a1 - a0, b1 - b0, a0 - b0
    a_ = jnp.sum(d1v * d1v, -1)
    e_ = jnp.sum(d2v * d2v, -1)
    f_ = jnp.sum(d2v * rv, -1)
    c_ = jnp.sum(d1v * rv, -1)
    b_ = jnp.sum(d1v * d2v, -1)
    denom = a_ * e_ - b_ * b_
    s_ = jnp.clip(jnp.where(jnp.abs(denom) > 1e-12,
                            (b_ * f_ - c_ * e_)
                            / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                            0.0), 0.0, 1.0)
    t_ = jnp.clip((b_ * s_ + f_) / jnp.maximum(e_, 1e-12), 0.0, 1.0)
    s_ = jnp.clip((b_ * t_ - c_) / jnp.maximum(a_, 1e-12), 0.0, 1.0)
    edge_pt = 0.5 * ((a0 + d1v * s_[..., None]) + (b0 + d2v * t_[..., None]))

    ue = use_edge[..., None]
    slot0 = jnp.arange(4) == 0
    depth_sat = jnp.where(ue, jnp.where(slot0, sat_pen[..., None], -BIG),
                          depth_sat)
    pts_sat = jnp.where(ue[..., None],
                        jnp.where(slot0[..., None], edge_pt[..., None, :], 0.0),
                        pts_sat)
    num_sat = jnp.sum((depth_sat > -speculative).astype(jnp.int32), axis=-1)

    merge(both_hull, hit, sat_normal, pts_sat, depth_sat, num_sat)

    return {
        "ok": out_ok,
        "normal": out_normal,
        "points": out_points,
        "depth": out_depth,
        "num_points": out_np,
    }


def narrowphase_dense(pos, rot, obj_id, row_mask, objmgr,
                      speculative: float = 0.0) -> Dict[str, Any]:
    """Dense [W, n, n] all-pairs narrowphase (i = ref body, j = other; only
    i < j entries valid).  pos [W,n,3], rot [W,n,4], obj_id [W,n] int32,
    row_mask [W,n] bool.  speculative: near-miss margin (see
    pairs.pair_contacts)."""
    W, n = obj_id.shape
    F = body_fields(pos, rot, obj_id, objmgr)
    A = _expand(F, 2)
    B = _expand(F, 1)
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)[None]
    pair_live = row_mask[:, :, None] & row_mask[:, None, :] & upper
    return pair_contacts(A, B, pair_live, objmgr, speculative=speculative)
