"""Pallas pixel-tile batch-render kernel: the at-scale renderer path.

The XLA renderer (render/renderer.py) materializes per-(pixel, instance)
intermediates; XLA fuses most of them into the min-reduction, but at large
H x W the [W, V, H, Wpx, N] working set still bounds fusion and HBM
traffic.  This kernel tiles pixels into VMEM blocks and STREAMS instances
through a static loop — per (world-block, pixel-tile) program, every
intersection test runs register/VMEM-resident and only the final
rgb/depth tile is written to HBM.  The TPU analog of the reference's
ray-query compute shader dispatch at (ceil(w/32), ceil(h/8), numViews)
(/root/reference/src/mw/render/vk/batch_renderer.cpp:465-683 +
shaders/basic.comp), with the TLAS traversal replaced by the instance
stream (no pointer-chasing acceleration structure).

Differences from the XLA path (by design):
  * normals are tracked per winning instance INSIDE the instance loop
    (no second winner-gather pass);
  * triangle render-meshes are not streamed — worlds with mesh-carrying
    objects use the XLA path (renderer picks automatically);
  * per-object constants (radius, face planes, albedo) fold in via
    unrolled (obj == o) select chains — the ObjTables pattern
    (physics/pairs.py) — so the kernel closes over Python floats only.

Layout per program (grid = (W // Wt, P // Pt), both parallel):
    rays  [Wt, 6, Pt]   ro3 + rd3, pixel-major lanes (P = V*H*Wpx padded)
    inst  [Wt, 12, N]   pos3 rot4 scale3 obj mask, channel-major
    out   [Wt, 5, Pt]   r g b hit depth (f32; quantization happens in XLA)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_ecs_madrona_tpu.physics import pairs as pk
from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE

BIG = 1e9
EPS = 1e-9

# instance channels (channel-major [W, C_INST, N])
I_POS = 0     # 0:3
I_ROT = 3     # 3:7 (w,x,y,z)
I_SCALE = 7   # 7:10
I_OBJ = 10
I_MASK = 11
C_INST = 12

# output channels
O_R, O_G, O_B, O_HIT, O_DEPTH = range(5)
C_OUT = 5


class RenderTables:
    """Python-scalar snapshot of the object manager + albedo (+ optional
    triangle render meshes) for in-kernel constant folding (no captured
    jnp arrays — Mosaic rejects non-scalar closure constants)."""

    def __init__(self, objmgr, albedo, mesh_tables=None):
        om = {k: np.asarray(v) for k, v in objmgr.items()}
        self.O = int(om["prim_type"].shape[0])
        self.prim_type = [int(x) for x in om["prim_type"]]
        self.radius = [float(x) for x in om["sphere_radius"]]
        self.Fm = int(om["face_normals"].shape[1])
        self.face_n = om["face_normals"].astype(np.float64)   # [O, F, 3]
        self.face_d = om["face_d"].astype(np.float64)         # [O, F]
        self.num_faces = [int(x) for x in om["num_faces"]]
        self.albedo = np.asarray(albedo, np.float64)          # [O, 3]
        # static: max faces actually used by any hull object
        used = [self.num_faces[o] for o in range(self.O)
                if self.prim_type[o] == PRIM_HULL]
        self.F_used = max(used) if used else 0
        # per-object bounding radius for tile-frustum culling (planes are
        # infinite: excluded from culling via is_plane)
        if "local_aabb_lo" in om:
            self.r_bound = [float(np.linalg.norm(np.maximum(
                np.abs(om["local_aabb_lo"][o]),
                np.abs(om["local_aabb_hi"][o]))))
                for o in range(self.O)]
        else:
            self.r_bound = [max(2.0, self.radius[o]) for o in range(self.O)]
        # triangle render meshes (renderer.BatchRenderer tri tables):
        # objects with has_mesh trace REAL triangles (Moeller-Trumbore,
        # the reference BLAS ray-query analog) instead of their physics
        # primitive — same override the XLA path applies
        if mesh_tables is not None and np.asarray(
                mesh_tables["has_mesh"]).any():
            self.has_mesh = [bool(x) for x in mesh_tables["has_mesh"]]
            self.tri_a = np.asarray(mesh_tables["tri_a"], np.float64)
            self.tri_e1 = np.asarray(mesh_tables["tri_e1"], np.float64)
            self.tri_e2 = np.asarray(mesh_tables["tri_e2"], np.float64)
            tm = np.asarray(mesh_tables["tri_mask"], bool)
            self.tri_mask = tm
            self.tri_n = np.cross(self.tri_e1, self.tri_e2)   # [O, T, 3]
            self.T_used = int(tm.sum(axis=1).max())
        else:
            self.has_mesh = [False] * self.O
            self.tri_a = self.tri_e1 = self.tri_e2 = self.tri_n = \
                np.zeros((self.O, 0, 3))
            self.tri_mask = np.zeros((self.O, 0), bool)
            self.T_used = 0
        # widen bound radii to cover render meshes that exceed the physics
        # hull (r_bound drives culling for every primitive type)
        for o in range(self.O):
            if self.has_mesh[o] and self.tri_mask[o].any():
                tm = self.tri_mask[o]
                corners = np.concatenate([
                    self.tri_a[o][tm],
                    self.tri_a[o][tm] + self.tri_e1[o][tm],
                    self.tri_a[o][tm] + self.tri_e2[o][tm]], axis=0)
                self.r_bound[o] = max(self.r_bound[o],
                                      float(np.linalg.norm(corners,
                                                           axis=1).max()))

    def key(self):
        return (self.O, tuple(self.prim_type), tuple(self.radius),
                self.Fm, self.face_n.tobytes(), self.face_d.tobytes(),
                tuple(self.num_faces), self.albedo.tobytes(), self.F_used,
                tuple(self.has_mesh), self.tri_a.tobytes(),
                self.tri_e1.tobytes(), self.tri_e2.tobytes(),
                self.tri_mask.tobytes(), self.T_used,
                tuple(self.r_bound))

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, RenderTables) and self.key() == other.key()


def _fold(obj_i, vals):
    """Sum_o (obj == o) * vals[o] for per-world scalar obj_i [Wt, 1]."""
    acc = None
    for o, v in enumerate(vals):
        v = float(v)
        if v == 0.0:
            continue
        term = jnp.where(obj_i == float(o), v, 0.0)
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(obj_i)
    return acc


def _fold_mask(obj_i, flags):
    """Boolean per-world select: any o with flags[o] and obj == o."""
    acc = None
    for o, f in enumerate(flags):
        if not f:
            continue
        term = obj_i == float(o)
        acc = term if acc is None else acc | term
    if acc is None:
        return jnp.zeros_like(obj_i) > 1.0
    return acc


def _make_kernel(tables: RenderTables, Wt: int, Pt: int, N: int, N0: int,
                 light_dir, ambient: float, cull: bool = True,
                 group: int = 8):
    T = tables
    lx, ly, lz = light_dir  # pre-normalized, pointing TOWARD the light

    def kernel(rays_ref, inst_ref, out_ref, best_s):
        rays = rays_ref[:]                       # [Wt, 6, Pt]
        inst = inst_ref[:]                       # [Wt, C_INST, N]
        ro = (rays[:, 0], rays[:, 1], rays[:, 2])
        rd = (rays[:, 3], rays[:, 4], rays[:, 5])

        # ---- per-tile survivor list (reference: the TLAS prunes the
        # instance set per ray; here a bounding cone over the TILE's rays
        # prunes it per pixel tile, then the survivors compact to a dense
        # prefix so the instance loop runs only ceil(max_survivors/G)
        # pl.when groups instead of all N instances) ----------------------
        live_lane = inst[:, I_MASK] > 0.5                  # [Wt, N]
        obj_lane = inst[:, I_OBJ]
        if cull:
            # tile ray cone: axis = mean direction, cos_max = min dot;
            # padded rays (rd == 0) excluded from the min
            pad_ray = (rd[0] * rd[0] + rd[1] * rd[1] + rd[2] * rd[2]) < 0.5
            ax = tuple(jnp.sum(jnp.where(pad_ray, 0.0, c), axis=1,
                               keepdims=True) for c in rd)     # [Wt, 1]
            inv_ax = jax.lax.rsqrt(jnp.maximum(
                ax[0] * ax[0] + ax[1] * ax[1] + ax[2] * ax[2], EPS))
            ax = tuple(c * inv_ax for c in ax)
            cos_d = rd[0] * ax[0] + rd[1] * ax[1] + rd[2] * ax[2]
            cos_m = jnp.min(jnp.where(pad_ray, 1.0, cos_d), axis=1,
                            keepdims=True)                     # [Wt, 1]
            cos_m = jnp.clip(cos_m, -1.0, 1.0)
            sin_m = jnp.sqrt(jnp.maximum(1.0 - cos_m * cos_m, 0.0))
            # origin bounds (pinhole: one origin per view; the spread term
            # keeps the test conservative if a tile spans views)
            ro_mean = tuple(jnp.sum(jnp.where(pad_ray, 0.0, c), axis=1,
                                    keepdims=True)
                            / jnp.maximum(jnp.sum(
                                jnp.where(pad_ray, 0.0, 1.0), axis=1,
                                keepdims=True), 1.0) for c in ro)
            spread2 = jnp.max(jnp.where(
                pad_ray, 0.0,
                sum((c - m) ** 2 for c, m in zip(ro, ro_mean))),
                axis=1, keepdims=True)
            spread = jnp.sqrt(spread2)
            # instance bounding spheres vs the expanded cone
            rb = None
            for o in range(T.O):
                term = jnp.where(obj_lane == float(o), float(T.r_bound[o]),
                                 0.0)
                rb = term if rb is None else rb + term
            smax = jnp.maximum(jnp.maximum(inst[:, I_SCALE],
                                           inst[:, I_SCALE + 1]),
                               inst[:, I_SCALE + 2])
            r_eff = rb * smax + spread
            is_plane_l = None
            for o in range(T.O):
                if T.prim_type[o] != PRIM_PLANE:
                    continue
                term = obj_lane == float(o)
                is_plane_l = term if is_plane_l is None \
                    else is_plane_l | term
            d = tuple(inst[:, I_POS + c] - ro_mean[c] for c in range(3))
            dist = jnp.sqrt(jnp.maximum(
                d[0] * d[0] + d[1] * d[1] + d[2] * d[2], EPS))
            cos_ad = (d[0] * ax[0] + d[1] * ax[1] + d[2] * ax[2]) / dist
            sin_b = jnp.clip(r_eff / dist, 0.0, 1.0)
            cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
            # keep if angle(d, axis) <= cone_half_angle + asin(r/dist);
            # the cosine comparison only encodes that containment while
            # theta_m + beta <= pi — once the expanded cone wraps past a
            # half-space (theta_m >= pi - beta, i.e. cos_m <= -cos_b,
            # e.g. a tile spanning opposing views) it covers every
            # direction and everything must be kept
            wrapped = cos_m <= -cos_b
            keep = wrapped \
                | (cos_ad >= cos_m * cos_b - sin_m * sin_b) \
                | (dist <= r_eff)
            if is_plane_l is not None:
                keep = keep | is_plane_l
            surv_mask = live_lane & keep
        else:
            surv_mask = live_lane

        # order-preserving compaction (rank via one triangular matmul per
        # world; slot s's instance = the one whose inclusive rank == s+1)
        tri_incl = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                    <= jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
                    ).astype(jnp.float32)
        n_iota_c = jax.lax.broadcasted_iota(
            jnp.int32, (N, 1), 0).astype(jnp.float32)
        s_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, N), 1).astype(jnp.float32)
        surv_rows = []
        counts = []
        for wi in range(Wt):
            m_row = surv_mask[wi][None].astype(jnp.float32)  # [1, N]
            rank_row = jax.lax.dot_general(
                m_row, tri_incl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [1, N] incl
            nw = rank_row[0, N - 1]
            counts.append(nw)
            sel = ((jnp.transpose(rank_row) == (s_iota + 1.0))
                   & (jnp.transpose(m_row) > 0.5)).astype(jnp.float32)
            idx_row = jnp.sum(sel * n_iota_c, axis=0,
                              keepdims=True)                 # [1, N]
            idxb = jnp.broadcast_to(idx_row.astype(jnp.int32),
                                    (C_INST, N))
            g_w = jnp.take_along_axis(inst[wi], idxb, axis=1)
            # dead tail slots gathered instance 0 — kill their mask
            g_w = jnp.concatenate([
                g_w[:I_MASK],
                g_w[I_MASK:I_MASK + 1] * (s_iota < nw).astype(jnp.float32),
            ], axis=0)
            surv_rows.append(g_w)
        surv = jnp.stack(surv_rows, axis=0)                  # [Wt,C_INST,N]
        max_surv = counts[0]
        for c in counts[1:]:
            max_surv = jnp.maximum(max_surv, c)

        best_s[:] = jnp.concatenate(
            [jnp.full((Wt, 1, Pt), BIG),                     # t
             jnp.zeros((Wt, 6, Pt))], axis=1)                # n3 alb3

        def do_instance(i):
            pos_i = tuple(surv[:, I_POS + c, i][:, None] for c in range(3))
            rot_i = tuple(surv[:, I_ROT + c, i][:, None] for c in range(4))
            scl_i = tuple(surv[:, I_SCALE + c, i][:, None] for c in range(3))
            obj_i = surv[:, I_OBJ, i][:, None]          # [Wt, 1]
            msk_i = surv[:, I_MASK, i][:, None] > 0.5
            # guard padded rows: identity quat so qrot math stays finite
            rot_i = (jnp.where(msk_i, rot_i[0], 1.0),) + rot_i[1:]

            is_sph = _fold_mask(obj_i, [pt == PRIM_SPHERE
                                        for pt in T.prim_type])
            is_hull = _fold_mask(obj_i, [pt == PRIM_HULL
                                         for pt in T.prim_type])

            # ---- sphere --------------------------------------------------
            rad = _fold(obj_i, [T.radius[o] * 1.0 for o in range(T.O)])
            rad = rad * scl_i[0]
            oc = pk.v3sub(ro, pos_i)
            b = pk.dot3(oc, rd)
            c = pk.dot3(oc, oc) - rad * rad
            disc = b * b - c
            t_sph = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            hit_sph = (disc >= 0) & (t_sph > 1e-4)
            t_sph = jnp.where(hit_sph, t_sph, BIG)

            # ---- convex hull: slab over face planes ----------------------
            inv_s = tuple(1.0 / jnp.maximum(s, EPS) for s in scl_i)
            ro_l = tuple(a * b2 for a, b2 in
                         zip(pk.qrot_inv(rot_i, pk.v3sub(ro, pos_i)), inv_s))
            rd_l = tuple(a * b2 for a, b2 in
                         zip(pk.qrot_inv(rot_i, rd), inv_s))
            t_enter = jnp.full((Wt, Pt), -BIG)
            t_exit = jnp.full((Wt, Pt), BIG)
            par_out = jnp.zeros((Wt, Pt)) > 1.0
            n_l = (jnp.zeros((Wt, Pt)), jnp.zeros((Wt, Pt)),
                   jnp.zeros((Wt, Pt)))
            for f in range(T.F_used):
                nf = tuple(
                    _fold(obj_i, [T.face_n[o, f, c] if f < T.num_faces[o]
                                  else 0.0 for o in range(T.O)])
                    for c in range(3))
                d_f = _fold(obj_i, [T.face_d[o, f] if f < T.num_faces[o]
                                    else 0.0 for o in range(T.O)])
                fval = _fold_mask(obj_i, [f < T.num_faces[o]
                                          for o in range(T.O)])
                denom = pk.dot3(nf, rd_l)
                dist = d_f - pk.dot3(nf, ro_l)
                small = jnp.abs(denom) < EPS
                safe = jnp.where(small,
                                 jnp.where(denom >= 0, EPS, -EPS), denom)
                t_f = dist / safe
                entering = (denom < 0) & fval
                upd = entering & (t_f > t_enter)
                t_enter = jnp.where(upd, t_f, t_enter)
                n_l = tuple(jnp.where(upd, nc, cur)
                            for nc, cur in zip(nf, n_l))
                exiting = (~(denom < 0)) & fval
                t_exit = jnp.where(exiting, jnp.minimum(t_exit, t_f), t_exit)
                par_out = par_out | (fval & small & (dist < 0))
            hit_h = (t_enter <= t_exit) & (t_exit > 1e-4) & ~par_out
            t_hull = jnp.where(t_enter > 1e-4, t_enter, t_exit)
            t_hull = jnp.where(hit_h & is_hull, t_hull, BIG)
            if T.F_used == 0:
                t_hull = jnp.full((Wt, Pt), BIG)

            # ---- triangle render mesh: Moeller-Trumbore over the folded
            # per-object triangle table (reference per-mesh BLAS ray
            # query, vk/scene.cpp:446-463 + basic.comp rayQuery loop).
            # Overrides the physics primitive for has_mesh objects, like
            # the XLA path's t_all override. ------------------------------
            if T.T_used:
                is_mesh = _fold_mask(obj_i, T.has_mesh)
                t_msh = jnp.full((Wt, Pt), BIG)
                n_ml = (jnp.zeros((Wt, Pt)), jnp.zeros((Wt, Pt)),
                        jnp.zeros((Wt, Pt)))
                for tt in range(T.T_used):
                    def tfold(tab, c):
                        return _fold(obj_i, [
                            tab[o, tt, c] if (T.has_mesh[o]
                                              and tt < T.tri_mask.shape[1]
                                              and T.tri_mask[o, tt])
                            else 0.0 for o in range(T.O)])
                    a_t = tuple(tfold(T.tri_a, c) for c in range(3))
                    e1_t = tuple(tfold(T.tri_e1, c) for c in range(3))
                    e2_t = tuple(tfold(T.tri_e2, c) for c in range(3))
                    live_t = _fold_mask(obj_i, [
                        T.has_mesh[o] and tt < T.tri_mask.shape[1]
                        and bool(T.tri_mask[o, tt]) for o in range(T.O)])
                    pvec = pk.cross3(rd_l, e2_t)
                    det = pk.dot3(e1_t, pvec)
                    inv_det = 1.0 / jnp.where(
                        jnp.abs(det) < EPS,
                        jnp.where(det >= 0, EPS, -EPS), det)
                    tvec = pk.v3sub(ro_l, a_t)
                    u = pk.dot3(tvec, pvec) * inv_det
                    qvec = pk.cross3(tvec, e1_t)
                    v = pk.dot3(rd_l, qvec) * inv_det
                    t_t = pk.dot3(e2_t, qvec) * inv_det
                    hit_t = (live_t & (jnp.abs(det) > EPS)
                             & (u >= -1e-6) & (v >= -1e-6)
                             & (u + v <= 1 + 1e-6) & (t_t > 1e-4))
                    t_t = jnp.where(hit_t, t_t, BIG)
                    upd_t = t_t < t_msh
                    t_msh = jnp.where(upd_t, t_t, t_msh)
                    n_t = tuple(tfold(T.tri_n, c) for c in range(3))
                    n_ml = tuple(jnp.where(upd_t, nc, cur)
                                 for nc, cur in zip(n_t, n_ml))
                # world normal (inverse-transpose scale), flipped toward
                # the ray origin — two-sided like basic.comp
                n_mw = pk.qrot(rot_i, tuple(a * b2 for a, b2 in
                                            zip(n_ml, inv_s)))
                flip = pk.dot3(n_mw, rd) > 0
                n_mw = tuple(jnp.where(flip, -c, c) for c in n_mw)
            else:
                is_mesh = None

            # ---- plane (local +z) ----------------------------------------
            n_p = pk.qrot(rot_i, (jnp.zeros((Wt, 1)), jnp.zeros((Wt, 1)),
                                  jnp.ones((Wt, 1))))
            denom_p = pk.dot3(rd, n_p)
            safe_p = jnp.where(jnp.abs(denom_p) < EPS,
                               jnp.where(denom_p >= 0, EPS, -EPS), denom_p)
            t_pl = pk.dot3(pk.v3sub(pos_i, ro), n_p) / safe_p
            hit_p = (t_pl > 1e-4) & (jnp.abs(denom_p) > 1e-6)
            t_pl = jnp.where(hit_p, t_pl, BIG)

            # ---- combine + track winner ----------------------------------
            t_i = jnp.where(is_sph, t_sph, jnp.where(is_hull, t_hull, t_pl))
            if is_mesh is not None:
                t_i = jnp.where(is_mesh, t_msh, t_i)
            t_i = jnp.where(msk_i, t_i, BIG)
            cur = best_s[:]
            best_t = cur[:, 0]
            better = t_i < best_t

            # normal for THIS instance at its own t — tracked UNNORMALIZED
            # (one normalize after the loop; saves 2 sqrt + div per
            # instance per pixel)
            hp = pk.v3add(ro, pk.v3scale(rd, t_i))
            ns = pk.v3sub(hp, pos_i)
            # hull normal: inverse-transpose = n / scale
            nh = pk.qrot(rot_i, tuple(a * b2 for a, b2 in zip(n_l, inv_s)))
            n_i = tuple(jnp.where(is_sph, a, jnp.where(is_hull, b2, c2))
                        for a, b2, c2 in zip(ns, nh, n_p))
            if is_mesh is not None:
                n_i = tuple(jnp.where(is_mesh, mw, cur)
                            for mw, cur in zip(n_mw, n_i))

            alb = tuple(_fold(obj_i, [T.albedo[o, c] for o in range(T.O)])
                        for c in range(3))
            upd = [jnp.where(better, t_i, best_t)]
            upd.extend(jnp.where(better, a, cur[:, 1 + c])
                       for c, a in enumerate(n_i))
            upd.extend(jnp.where(better, a + jnp.zeros((Wt, Pt)),
                                 cur[:, 4 + c])
                       for c, a in enumerate(alb))
            best_s[:] = jnp.stack(upd, axis=1)

        # instance loop in pl.when groups: groups past the block's
        # survivor count only cost the branch test
        for g0 in range(0, N0, group):
            @pl.when(jnp.float32(g0) < max_surv)
            def _(g0=g0):
                for i in range(g0, min(g0 + group, N0)):
                    do_instance(i)

        # ---- shade (basic.comp Lambertian analog) ------------------------
        bs = best_s[:]
        best_t = bs[:, 0]
        best_n = (bs[:, 1], bs[:, 2], bs[:, 3])
        best_alb = (bs[:, 4], bs[:, 5], bs[:, 6])
        hit = best_t < BIG * 0.5
        inv_len = jax.lax.rsqrt(jnp.maximum(pk.dot3(best_n, best_n), EPS))
        best_n = pk.v3scale(best_n, inv_len)
        lam = jnp.maximum(best_n[0] * lx + best_n[1] * ly + best_n[2] * lz,
                          0.0)
        shade = ambient + (1.0 - ambient) * lam
        hitf = jnp.where(hit, 1.0, 0.0)
        out = [best_alb[c] * shade * hitf for c in range(3)]
        out.append(hitf)
        out.append(jnp.where(hit, best_t, BIG))
        out_ref[:] = jnp.stack(out, axis=1)      # [Wt, C_OUT, Pt]

    return kernel


def _pick_tiles(W: int, P: int, wt=None, pt=None, mesh=False):
    # triangle-mesh scenes keep ~T_used x instance-fold intermediates
    # live per (world, pixel) — Wt=8 blows the 128M VMEM budget (measured
    # 220M at 64^2 x 1024 worlds); Wt=2 fits with margin
    wt = int(wt or os.environ.get("GEM_TPU_RENDER_WT", 0)) \
        or (2 if mesh else 8)
    while wt > 1 and W % wt != 0:
        wt -= 1
    pt = int(pt or os.environ.get("GEM_TPU_RENDER_PT", 0)) or 512
    pt = min(pt, P)
    while pt > 128 and P % pt != 0:
        pt -= 128
    if P % pt != 0:
        pt = 128
    return wt, pt


@functools.partial(jax.jit, static_argnames=(
    "tables", "light_dir", "ambient", "interpret", "wt", "pt", "n0",
    "cull"))
def _run(rays, inst, *, tables, light_dir, ambient, interpret,
         wt=None, pt=None, n0=None, cull=True):
    W, _, P = rays.shape
    N = inst.shape[2]
    Wt, Pt = _pick_tiles(W, P, wt, pt, mesh=tables.T_used > 0)
    kernel = _make_kernel(tables, Wt, Pt, N, n0 or N, light_dir, ambient,
                          cull=cull)
    return pl.pallas_call(
        kernel,
        grid=(W // Wt, P // Pt),
        out_shape=jax.ShapeDtypeStruct((W, C_OUT, P), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((Wt, 6, Pt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wt, C_INST, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Wt, C_OUT, Pt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Wt, 7, Pt), jnp.float32)],
    )(rays, inst)


class PallasRenderKernel:
    """Driver: pack rays/instances channel-major, run, unpack.

    Call with flattened pixel rays (ro/rd [W, P, 3]) and instance arrays
    ([W, N, ...]); returns (rgb [W, P, 3] f32 in [0,1], hit [W, P] bool,
    depth [W, P] f32 with BIG at misses).
    """

    def __init__(self, object_manager, object_albedo, light_dir,
                 ambient: float, interpret: bool = False, wt=None, pt=None,
                 mesh_tables=None):
        self.tables = RenderTables(object_manager, object_albedo,
                                   mesh_tables)
        ld = np.asarray(light_dir, np.float64)
        ld = -ld / np.linalg.norm(ld)
        self.light = (float(ld[0]), float(ld[1]), float(ld[2]))
        self.ambient = float(ambient)
        self.interpret = bool(interpret)
        self.wt = wt
        self.pt = pt

    def __call__(self, ro, rd, pos, rot, scale, obj, mask):
        W, P0, _ = ro.shape
        N0 = pos.shape[1]
        P = max(128, -(-P0 // 128) * 128)
        # instances pad to a full lane tile: the survivor compaction
        # gathers instance channels with take_along_axis (128-lane tiles);
        # the intersection loop still runs only ceil(N0/G) groups
        N = max(128, -(-N0 // 128) * 128)

        def padP(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, P - P0)))

        def padN(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, N - N0)))

        rays = padP(jnp.concatenate(
            [jnp.swapaxes(ro, 1, 2), jnp.swapaxes(rd, 1, 2)], axis=1))
        inst = padN(jnp.concatenate([
            jnp.swapaxes(pos, 1, 2),
            jnp.swapaxes(rot, 1, 2),
            jnp.swapaxes(scale, 1, 2),
            obj.astype(jnp.float32)[:, None, :],
            mask.astype(jnp.float32)[:, None, :],
        ], axis=1))
        out = _run(rays, inst, tables=self.tables, light_dir=self.light,
                   ambient=self.ambient, interpret=self.interpret,
                   wt=self.wt, pt=self.pt, n0=N0,
                   cull=os.environ.get("GEM_TPU_RENDER_CULL", "1") != "0",
                   )[:, :, :P0]                          # [W, C_OUT, P0]
        rgb = jnp.stack([out[:, O_R], out[:, O_G], out[:, O_B]], axis=-1)
        hit = out[:, O_HIT] > 0.5
        depth = out[:, O_DEPTH]
        return rgb, hit, depth
