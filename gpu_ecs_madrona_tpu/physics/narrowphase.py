"""Narrowphase contact generation — dense batched SAT.

TPU redesign of reference src/physics/narrowphase.cpp: the reference
dispatches per candidate pair on primitive-type bitmasks
(narrowphase.cpp:98-108) and runs divergent SAT control flow per pair
(doSAT, narrowphase.cpp:663-727).  Here every unordered body pair (i < j)
of the dense [worlds, n, n] grid evaluates all primitive-pair kinds with
masked selects — the restructuring SURVEY.md §7.3 calls for: fixed
iteration face/edge loops with masked min-reductions instead of branches.

Supported pair kinds (reference narrowphase.cpp Type bitmask):
  sphere-sphere, sphere-plane, sphere-hull, hull-plane, hull-hull (SAT over
  face normals of both hulls + edge-direction cross axes), with up-to-4-
  point face manifolds (deepest incident vertices; the reference clips the
  incident face — a refinement tracked for a later round) and single-point
  edge-edge contacts approximated at the deepest incident vertex.

Everything is written as elementwise ops + masked reductions (never
einsum/dot) so XLA's reduction fusion streams the [W, n, n, axes, verts]
virtual tensors through the VPU without materializing them.

Output: dense contact grid dict with leading [W, n, n] (i = ref body,
j = other body; only i < j entries are valid):
  ok [W,n,n] bool, normal [W,n,n,3] (ref -> other),
  points [W,n,n,4,3], depth [W,n,n,4], num_points [W,n,n]
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE
from gpu_ecs_madrona_tpu.utils import math as m

NEG_BIG = -1e9
BIG = 1e9


def _support(axis_local, verts, vmask):
    """max over hull verts of (axis . v).  axis_local [..., 3] in the hull's
    local frame; verts [..., Vm, 3]; vmask [..., Vm] bool.
    Returns [...] max projection (masked)."""
    proj = jnp.sum(axis_local[..., None, :] * verts, axis=-1)
    return jnp.max(jnp.where(vmask, proj, NEG_BIG), axis=-1)


def narrowphase_dense(pos, rot, obj_id, row_mask, objmgr) -> Dict[str, Any]:
    """pos [W,n,3], rot [W,n,4] (w,x,y,z), obj_id [W,n] int32,
    row_mask [W,n] bool, objmgr: padded asset dict (jnp arrays)."""
    W, n = obj_id.shape
    Vm = objmgr["verts"].shape[1]
    Fm = objmgr["face_normals"].shape[1]
    Em = objmgr["edge_dirs"].shape[1]

    # Per-body asset data (gather over the small object-type axis)
    ptype = objmgr["prim_type"][obj_id]              # [W,n]
    radius = objmgr["sphere_radius"][obj_id]         # [W,n]
    verts_l = objmgr["verts"][obj_id]                # [W,n,Vm,3] local
    nverts = objmgr["num_verts"][obj_id]             # [W,n]
    fnorm_l = objmgr["face_normals"][obj_id]         # [W,n,Fm,3]
    face_d = objmgr["face_d"][obj_id]                # [W,n,Fm]
    nfaces = objmgr["num_faces"][obj_id]
    edir_l = objmgr["edge_dirs"][obj_id]             # [W,n,Em,3]
    nedges = objmgr["num_edges"][obj_id]

    vmask = jnp.arange(Vm)[None, None, :] < nverts[..., None]       # [W,n,Vm]
    fmask = jnp.arange(Fm)[None, None, :] < nfaces[..., None]
    emask = jnp.arange(Em)[None, None, :] < nedges[..., None]

    is_sphere = ptype == PRIM_SPHERE
    is_hull = ptype == PRIM_HULL
    is_plane = ptype == PRIM_PLANE

    # world-space hull verts and face normals (per body, computed once)
    verts_w = m.quat_rotate(rot[:, :, None, :], verts_l) + pos[:, :, None, :]
    fnorm_w = m.quat_rotate(rot[:, :, None, :], fnorm_l)            # [W,n,Fm,3]
    # world face plane offset: n_w . x = face_d + n_w . pos_rotated... for a
    # rotated+translated plane: d_w = face_d + n_w . pos
    face_dw = face_d + jnp.sum(fnorm_w * pos[:, :, None, :], axis=-1)
    # plane primitives: world normal/offset of the z=0 object plane
    plane_n = m.quat_rotate(rot, jnp.array([0.0, 0.0, 1.0]))        # [W,n,3]
    plane_d = jnp.sum(plane_n * pos, axis=-1)                       # [W,n]

    # pair masks [W, n, n] — unordered pairs i < j, both live, not two
    # non-dynamic... (static-static pairs are filtered by the solver's
    # inverse masses; keep all here like the reference)
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)[None]
    pair_live = row_mask[:, :, None] & row_mask[:, None, :] & upper

    def A(x):  # broadcast body-i data over grid
        return x[:, :, None]

    def B(x):  # broadcast body-j data over grid
        return x[:, None, :]

    out_normal = jnp.zeros((W, n, n, 3))
    out_points = jnp.zeros((W, n, n, 4, 3))
    out_depth = jnp.full((W, n, n, 4), -BIG)
    out_np = jnp.zeros((W, n, n), jnp.int32)
    out_ok = jnp.zeros((W, n, n), bool)

    def merge(sel, ok, normal, points, depth, num_points):
        nonlocal out_normal, out_points, out_depth, out_np, out_ok
        sel = sel & pair_live
        okk = sel & ok
        out_ok = jnp.where(sel, okk, out_ok)
        out_normal = jnp.where(sel[..., None], normal, out_normal)
        out_points = jnp.where(sel[..., None, None], points, out_points)
        out_depth = jnp.where(sel[..., None], depth, out_depth)
        out_np = jnp.where(sel, num_points, out_np)

    posA, posB = A(pos), B(pos)
    radA, radB = A(radius), B(radius)

    # ---------------- sphere - sphere (narrowphase.cpp sphere path) -------
    d = posB - posA
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    nrm = d / dist[..., None]
    pen = (radA + radB) - dist
    mid = posA + nrm * (radA - 0.5 * pen)[..., None]
    pts = jnp.zeros((W, n, n, 4, 3)).at[..., 0, :].set(mid)
    dep = jnp.full((W, n, n, 4), -BIG).at[..., 0].set(pen)
    merge(A(is_sphere) & B(is_sphere), pen > 0, nrm, pts,
          dep, jnp.ones((W, n, n), jnp.int32))

    # ---------------- sphere - plane (either order) -----------------------
    def sphere_plane(s_pos, s_rad, p_n, p_d, flip):
        # distance of center to plane minus radius
        c_dist = jnp.sum(s_pos * p_n, axis=-1) - p_d
        pen = s_rad - c_dist
        contact = s_pos - p_n * c_dist[..., None]
        nrm_sp = -p_n if not flip else p_n  # ref -> other
        pts = jnp.zeros((W, n, n, 4, 3)).at[..., 0, :].set(contact)
        dep = jnp.full((W, n, n, 4), -BIG).at[..., 0].set(pen)
        return pen > 0, nrm_sp, pts, dep

    ok_sp, n_sp, p_sp, d_sp = sphere_plane(posA, radA, B(plane_n), B(plane_d), flip=False)
    merge(A(is_sphere) & B(is_plane), ok_sp, n_sp, p_sp, d_sp,
          jnp.ones((W, n, n), jnp.int32))
    ok_ps, n_ps, p_ps, d_ps = sphere_plane(posB, radB, A(plane_n), A(plane_d), flip=True)
    merge(A(is_plane) & B(is_sphere), ok_ps, n_ps, p_ps, d_ps,
          jnp.ones((W, n, n), jnp.int32))

    # ---------------- hull - plane (either order) -------------------------
    def hull_plane(h_verts_w, h_vmask, p_n, p_d, flip):
        # vertex distances to plane [W,n,n,Vm]
        vd = jnp.sum(h_verts_w * p_n[..., None, :], axis=-1) - p_d[..., None]
        vd = jnp.where(h_vmask, vd, BIG)
        pen_v = -vd  # positive = below plane
        top_pen, top_idx = jax.lax.top_k(pen_v, 4)      # deepest 4 verts
        pts = jnp.take_along_axis(
            h_verts_w, top_idx[..., None].repeat(3, -1), axis=-2
        )  # [W,n,n,4,3]
        num_pts = jnp.sum((top_pen > 0).astype(jnp.int32), axis=-1)
        nrm_hp = p_n if flip else -p_n  # ref(hull) -> other(plane): -p_n
        return num_pts > 0, nrm_hp, pts, top_pen, num_pts

    hvwA = verts_w[:, :, None]   # [W,n,1,Vm,3] -> broadcasts over j
    hvwB = verts_w[:, None, :]
    vmA, vmB = vmask[:, :, None], vmask[:, None, :]

    ok_hp, n_hp, p_hp, d_hp2, np_hp = hull_plane(
        jnp.broadcast_to(hvwA, (W, n, n, Vm, 3)), vmA, B(plane_n), B(plane_d), flip=False)
    merge(A(is_hull) & B(is_plane), ok_hp, n_hp, p_hp, d_hp2, np_hp)
    ok_ph, n_ph, p_ph, d_ph, np_ph = hull_plane(
        jnp.broadcast_to(hvwB, (W, n, n, Vm, 3)), vmB, A(plane_n), A(plane_d), flip=True)
    merge(A(is_plane) & B(is_hull), ok_ph, n_ph, p_ph, d_ph, np_ph)

    # ---------------- sphere - hull (either order) ------------------------
    # center vs hull face planes: closest face gives normal + depth
    def sphere_hull(s_pos, s_rad, h_fn_w, h_fd_w, h_fmask, flip):
        # signed distance of center to each face plane [W,n,n,Fm]
        cd = jnp.sum(s_pos[..., None, :] * h_fn_w, axis=-1) - h_fd_w
        cd = jnp.where(h_fmask, cd, NEG_BIG)
        # center's max face distance = signed distance to hull surface
        # (exact when center is outside near a face, approximate at edges)
        fdist = jnp.max(cd, axis=-1)                    # [W,n,n]
        fidx = jnp.argmax(cd, axis=-1)
        fn = jnp.take_along_axis(h_fn_w, fidx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
        pen = s_rad - fdist
        contact = s_pos - fn * fdist[..., None]
        nrm_sh = -fn if not flip else fn
        pts = jnp.zeros((W, n, n, 4, 3)).at[..., 0, :].set(contact)
        dep = jnp.full((W, n, n, 4), -BIG).at[..., 0].set(pen)
        return pen > 0, nrm_sh, pts, dep

    fnwA, fdwA, fmA = fnorm_w[:, :, None], face_dw[:, :, None], fmask[:, :, None]
    fnwB, fdwB, fmB = fnorm_w[:, None, :], face_dw[:, None, :], fmask[:, None, :]
    ok_sh, n_sh, p_sh, d_sh = sphere_hull(
        posA, radA, jnp.broadcast_to(fnwB, (W, n, n, Fm, 3)),
        jnp.broadcast_to(fdwB, (W, n, n, Fm)), fmB, flip=False)
    merge(A(is_sphere) & B(is_hull), ok_sh, n_sh, p_sh, d_sh,
          jnp.ones((W, n, n), jnp.int32))
    ok_hs, n_hs, p_hs, d_hs = sphere_hull(
        posB, radB, jnp.broadcast_to(fnwA, (W, n, n, Fm, 3)),
        jnp.broadcast_to(fdwA, (W, n, n, Fm)), fmA, flip=True)
    merge(A(is_hull) & B(is_sphere), ok_hs, n_hs, p_hs, d_hs,
          jnp.ones((W, n, n), jnp.int32))

    # ---------------- hull - hull: SAT (narrowphase.cpp doSAT) ------------
    both_hull = A(is_hull) & B(is_hull) & pair_live
    rotA4, rotB4 = rot[:, :, None, :], rot[:, None, :, :]

    def axis_penetration(axes_w, axes_valid):
        """Penetration depth of the pair along candidate world axes.
        axes_w [W,n,n,K,3] unit (ref -> other orientation fixed below);
        returns penetration per axis [W,n,n,K] (+inf for invalid)."""
        # support of A along +axis and -axis, B likewise, via local frames
        ax_a = m.quat_inv_rotate(rotA4[:, :, :, None, :], axes_w)
        ax_b = m.quat_inv_rotate(rotB4[:, :, :, None, :], axes_w)
        vA = verts_l[:, :, None, None]    # [W,n,1,1,Vm,3]
        vB = verts_l[:, None, :, None]
        vmA5 = vmask[:, :, None, None]
        vmB5 = vmask[:, None, :, None]
        projA = jnp.sum(ax_a[..., None, :] * vA, axis=-1)   # [W,n,n,K,Vm]
        projB = jnp.sum(ax_b[..., None, :] * vB, axis=-1)
        maxA = jnp.max(jnp.where(vmA5, projA, NEG_BIG), axis=-1)
        minA = jnp.min(jnp.where(vmA5, projA, BIG), axis=-1)
        maxB = jnp.max(jnp.where(vmB5, projB, NEG_BIG), axis=-1)
        minB = jnp.min(jnp.where(vmB5, projB, BIG), axis=-1)
        # world offsets
        offA = jnp.sum(axes_w * posA[..., None, :], axis=-1)
        offB = jnp.sum(axes_w * posB[..., None, :], axis=-1)
        maxA, minA = maxA + offA, minA + offA
        maxB, minB = maxB + offB, minB + offB
        # overlap along axis (positive = penetrating)
        pen = jnp.minimum(maxA - minB, maxB - minA)
        return jnp.where(axes_valid, pen, BIG)

    # candidate axes: A's faces, B's faces, cross(edgeA, edgeB)
    axesA = jnp.broadcast_to(fnwA, (W, n, n, Fm, 3))
    axesB = jnp.broadcast_to(fnwB, (W, n, n, Fm, 3))
    edA_w = m.quat_rotate(rotA4[:, :, :, None, :],
                          jnp.broadcast_to(edir_l[:, :, None], (W, n, n, Em, 3)))
    edB_w = m.quat_rotate(rotB4[:, :, :, None, :],
                          jnp.broadcast_to(edir_l[:, None, :], (W, n, n, Em, 3)))
    cross = jnp.cross(edA_w[:, :, :, :, None, :], edB_w[:, :, :, None, :, :])
    cross = cross.reshape(W, n, n, Em * Em, 3)
    clen = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    cvalid = (clen[..., 0] > 1e-6) & (
        emask[:, :, None, :, None] & emask[:, None, :, None, :]
    ).reshape(W, n, n, Em * Em)
    cross = cross / jnp.maximum(clen, 1e-12)

    penA = axis_penetration(axesA, jnp.broadcast_to(fmA, (W, n, n, Fm)))
    penB = axis_penetration(axesB, jnp.broadcast_to(fmB, (W, n, n, Fm)))
    penE = axis_penetration(cross, cvalid)

    minA_, idxA_ = jnp.min(penA, -1), jnp.argmin(penA, -1)
    minB_, idxB_ = jnp.min(penB, -1), jnp.argmin(penB, -1)
    minE_, idxE_ = jnp.min(penE, -1), jnp.argmin(penE, -1)

    sat_pen = jnp.minimum(jnp.minimum(minA_, minB_), minE_)
    hit = both_hull & (sat_pen > 0) & (sat_pen < BIG * 0.5)

    # small bias toward face axes for manifold stability (standard SAT
    # practice; reference biases via its axis ordering)
    FACE_BIAS = 1.001
    use_faceA = minA_ <= jnp.minimum(minB_, minE_) * FACE_BIAS + 1e-6
    use_faceB = (~use_faceA) & (minB_ <= minE_ * FACE_BIAS + 1e-6)
    use_edge = ~(use_faceA | use_faceB)

    # reference face normal (world, oriented ref(A) -> other(B))
    fA = jnp.take_along_axis(axesA, idxA_[..., None, None].repeat(3, -1), -2)[..., 0, :]
    fB = jnp.take_along_axis(axesB, idxB_[..., None, None].repeat(3, -1), -2)[..., 0, :]
    fE = jnp.take_along_axis(cross, idxE_[..., None, None].repeat(3, -1), -2)[..., 0, :]
    ab = posB - posA
    sgn = lambda v: jnp.where(jnp.sum(v * ab, axis=-1, keepdims=True) >= 0, 1.0, -1.0)
    sat_normal = jnp.where(
        use_faceA[..., None], fA * sgn(fA),
        jnp.where(use_faceB[..., None], fB * sgn(fB), fE * sgn(fE)),
    )

    # manifold: deepest incident-hull verts against the separating plane.
    # face-of-A wins -> incident hull is B (verts measured against A's
    # plane); face-of-B wins -> incident is A; edge -> single deepest B vert.
    # reference-hull local AABBs for point clipping
    lo_l = objmgr["local_aabb_lo"][obj_id]          # [W,n,3]
    hi_l = objmgr["local_aabb_hi"][obj_id]

    def clip_to_ref(pts4, ref_pos, ref_rot, ref_lo, ref_hi):
        """Clamp contact points into the reference hull's local AABB —
        the cheap stand-in for the reference's incident-face clipping
        (narrowphase.cpp manifold clip): without it, manifold points
        overhanging the reference face apply spurious torque.  Exact for
        boxes; conservative for general hulls."""
        local = m.quat_inv_rotate(ref_rot[..., None, :], pts4 - ref_pos[..., None, :])
        local = jnp.clip(local, ref_lo[..., None, :], ref_hi[..., None, :])
        return m.quat_rotate(ref_rot[..., None, :], local) + ref_pos[..., None, :]

    def deepest_pts(incident_w, inc_mask, nrm_to_inc):
        # depth of incident verts along -nrm (penetration into ref hull):
        # project onto the SAT axis; depth relative to the deepest
        # ref-hull support point.
        proj = jnp.sum(incident_w * nrm_to_inc[..., None, :], axis=-1)
        proj = jnp.where(inc_mask, proj, BIG)
        top_pen, top_idx = jax.lax.top_k(-proj, 4)  # smallest projections
        pts = jnp.take_along_axis(incident_w, top_idx[..., None].repeat(3, -1), -2)
        return pts, top_pen

    ptsB, prB = deepest_pts(jnp.broadcast_to(hvwB, (W, n, n, Vm, 3)), vmB, sat_normal)
    ptsA, prA = deepest_pts(jnp.broadcast_to(hvwA, (W, n, n, Vm, 3)), vmA, -sat_normal)
    # clip incident points into the reference hull (ref=A when A's face is
    # the separating plane, ref=B otherwise)
    ptsB = clip_to_ref(ptsB, jnp.broadcast_to(posA, (W, n, n, 3)),
                       jnp.broadcast_to(rotA4, (W, n, n, 4)),
                       jnp.broadcast_to(lo_l[:, :, None], (W, n, n, 3)),
                       jnp.broadcast_to(hi_l[:, :, None], (W, n, n, 3)))
    ptsA = clip_to_ref(ptsA, jnp.broadcast_to(posB, (W, n, n, 3)),
                       jnp.broadcast_to(rotB4, (W, n, n, 4)),
                       jnp.broadcast_to(lo_l[:, None, :], (W, n, n, 3)),
                       jnp.broadcast_to(hi_l[:, None, :], (W, n, n, 3)))
    pts_sat = jnp.where(use_faceB[..., None, None], ptsA, ptsB)
    pen_rel = jnp.where(use_faceB[..., None], prA, prB)
    # convert relative projections to true depths: deepest point has depth
    # sat_pen; shallower manifold points offset by projection delta.
    depth_sat = sat_pen[..., None] - (pen_rel[..., 0:1] - pen_rel)
    num_sat = jnp.sum((depth_sat > 0).astype(jnp.int32), axis=-1)
    num_sat = jnp.where(use_edge, jnp.minimum(num_sat, 1), num_sat)
    depth_sat = jnp.where(
        use_edge[..., None] & (jnp.arange(4)[None, None, None] > 0),
        -BIG, depth_sat)

    merge(both_hull, hit, sat_normal, pts_sat, depth_sat, num_sat)

    return {
        "ok": out_ok,
        "normal": out_normal,
        "points": out_points,
        "depth": out_depth,
        "num_points": out_np,
    }
