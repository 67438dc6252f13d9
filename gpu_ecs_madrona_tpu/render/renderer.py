"""BatchRenderer — RGB + depth observation rendering for all worlds.

TPU redesign of the reference's Vulkan ray-query batch renderer
(src/mw/render/vk/batch_renderer.cpp + shaders/basic.comp): the reference
rebuilds a TLAS per world per frame and dispatches a ray-query compute
shader at (ceil(w/32), ceil(h/8), numViews) writing RGBA8 + float depth
buffers (vk/batch_renderer.cpp:465-683, shader_common.h:7-9).

On TPU, acceleration structures are pointer-chasing and anti-idiomatic
(SURVEY.md §7.1): instead each pixel's camera ray analytically intersects
every instance (sphere / convex hull via exact face-plane slab test /
ground plane — the same primitive set the physics assets define), a dense
[pixels x instances] reduction that vectorizes perfectly at the O(100)
instances/world the reference's examples use.  Shading is Lambertian with a per-object albedo, matching the
reference shader's simple output.  Rendering is a taskgraph node, so it
fuses into the jit step and observations are zero-copy exports
(rgb [W, views, H, Wpx, 4] uint8, depth [W, views, H, Wpx] f32 — the
reference's rgbPtr/depthPtr layout batched over worlds).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.taskgraph import NodeID, TaskGraphBuilder
from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE
from gpu_ecs_madrona_tpu.utils import math as m

BIG = 1e9


@dataclasses.dataclass
class RendererConfig:
    """reference BatchRenderer::Config (mw_render.hpp / batch_renderer.hpp):
    render width/height, max views; input mode is implicit (device arrays)."""

    width: int = 64
    height: int = 64
    max_views: int = 1
    # simple directional light
    light_dir: tuple = (0.3, 0.3, -1.0)
    ambient: float = 0.2
    # exact convex-hull intersection (slab test over face planes) — the
    # ray-query-accurate path.  False falls back to the cheaper OBB proxy
    # (exact for boxes only); cost scales with max_faces.
    exact_hulls: bool = True
    # max triangles per render mesh (padded table width)
    max_tris: int = 128
    # "xla" (fused into the step, handles meshes), "pallas" (pixel-tile
    # streaming kernel, ops/render_kernel.py — the at-scale path for large
    # H x W; analytic primitives only), or "auto" (pallas on TPU for big
    # pixel x instance working sets when no render meshes are present)
    backend: str = "auto"
    # Tile frustum culling (the TPU-native stand-in for the reference's
    # per-world TLAS, vk/batch_renderer.cpp:491-514): when tile_size > 0
    # the image is split into tile_size^2-pixel tiles, each tile culls
    # instances against its view cone (sphere-vs-cone test on instance
    # bounding spheres) and ray-tests only its nearest
    # max_instances_per_tile survivors — O(N) per TILE instead of per
    # PIXEL.  Composes with triangle render meshes (culled by the mesh's
    # own bounding sphere, traced by Möller–Trumbore on the survivors);
    # requires width/height divisible by tile_size.
    tile_size: int = 0
    max_instances_per_tile: int = 32


class BatchRenderer:
    """Builds a render taskgraph node over packed instance/view buffers
    (from render.interop.RenderingSystem.setup_tasks).

    ``render_meshes`` maps object id -> triangle mesh (either a
    utils.importer.SourceMesh or a (verts [V,3], tris [T,3]) tuple).
    Objects with a render mesh ray-trace the ACTUAL triangles
    (Möller–Trumbore over a padded per-object triangle table — the analog
    of the reference's per-mesh BLAS ray query, vk/scene.cpp:446-463 +
    basic.comp), so arbitrary non-convex imported geometry renders
    correctly; objects without one use the analytic primitive paths.
    """

    def __init__(self, cfg: RendererConfig, object_manager: Dict[str, Any],
                 object_albedo=None, render_meshes: Dict[int, Any] = None):
        import numpy as np

        if cfg.backend not in ("xla", "pallas", "auto"):
            raise ValueError(f"unknown renderer backend {cfg.backend!r}; "
                             "expected 'xla', 'pallas', or 'auto'")
        self.cfg = cfg
        self.objmgr = {k: jnp.asarray(v) for k, v in object_manager.items()}
        num_objs = self.objmgr["prim_type"].shape[0]
        if object_albedo is None:
            # deterministic distinct colors per object type
            hues = (jnp.arange(num_objs, dtype=jnp.float32) * 0.37) % 1.0
            object_albedo = jnp.stack([
                0.5 + 0.5 * jnp.cos(2 * jnp.pi * (hues + s))
                for s in (0.0, 0.33, 0.67)
            ], axis=-1)
        self.albedo = jnp.asarray(object_albedo, jnp.float32)

        # padded per-object triangle tables (reference AssetManager mesh
        # packing, vk/batch_renderer.cpp:446-463)
        Tm = cfg.max_tris
        tri_a = np.zeros((num_objs, Tm, 3), np.float32)
        tri_e1 = np.zeros((num_objs, Tm, 3), np.float32)
        tri_e2 = np.zeros((num_objs, Tm, 3), np.float32)
        tri_mask = np.zeros((num_objs, Tm), bool)
        has_mesh = np.zeros(num_objs, bool)
        if render_meshes:
            for oid, mesh in render_meshes.items():
                if hasattr(mesh, "vertices"):  # SourceMesh: triangulate fans
                    from gpu_ecs_madrona_tpu.utils.importer import index_mesh
                    verts, _, _, tris = index_mesh(mesh)
                else:
                    verts, tris = mesh
                    verts = np.asarray(verts, np.float32)
                    tris = np.asarray(tris, np.int32)
                if len(tris) > Tm:
                    raise ValueError(
                        f"render mesh for object {oid} has {len(tris)} "
                        f"triangles > max_tris={Tm}")
                a = verts[tris[:, 0]]
                tri_a[oid, :len(tris)] = a
                tri_e1[oid, :len(tris)] = verts[tris[:, 1]] - a
                tri_e2[oid, :len(tris)] = verts[tris[:, 2]] - a
                tri_mask[oid, :len(tris)] = True
                has_mesh[oid] = True
        # conservative bounding-sphere radius of the RENDER mesh (may
        # exceed the physics hull's local AABB) for tile culling
        mesh_radius = np.zeros(num_objs, np.float32)
        for oid in range(num_objs):
            if has_mesh[oid]:
                tm = tri_mask[oid]
                vs = np.concatenate([
                    tri_a[oid][tm],
                    tri_a[oid][tm] + tri_e1[oid][tm],
                    tri_a[oid][tm] + tri_e2[oid][tm]], axis=0)
                if len(vs):
                    mesh_radius[oid] = float(
                        np.linalg.norm(vs, axis=1).max())
        self.mesh_radius = jnp.asarray(mesh_radius)
        self.tri_a = jnp.asarray(tri_a)
        self.tri_e1 = jnp.asarray(tri_e1)
        self.tri_e2 = jnp.asarray(tri_e2)
        self.tri_mask = jnp.asarray(tri_mask)
        self.has_mesh = jnp.asarray(has_mesh)
        self.any_mesh = bool(has_mesh.any())

        # pixel-tile streaming kernel.  Constructed eagerly so trace-time
        # use inside the jit step closes over Python constants only.
        # Triangle render meshes stream through the kernel's folded
        # per-object triangle tables (round-4; previously meshes forced
        # the XLA path).  The kernel always uses the exact-hull slab
        # test, so it is only eligible when exact_hulls is on (parity
        # contract with the XLA path, which would use the OBB proxy
        # otherwise); an EXPLICIT pallas request that cannot be honored
        # is an error, not a silent fallback with different hull
        # semantics
        if cfg.backend == "pallas" and not cfg.exact_hulls:
            raise ValueError(
                "backend='pallas' unavailable: exact_hulls=False (the "
                "pixel-tile kernel implements the exact-hull slab test "
                "only); use backend='auto' or 'xla'")
        self._pallas = None
        if cfg.backend in ("pallas", "auto") and cfg.exact_hulls:
            from gpu_ecs_madrona_tpu.ops.render_kernel import PallasRenderKernel
            from gpu_ecs_madrona_tpu.utils.platform import pallas_interpret
            mesh_tables = None
            if self.any_mesh:
                mesh_tables = {
                    "has_mesh": np.asarray(self.has_mesh),
                    "tri_a": np.asarray(self.tri_a),
                    "tri_e1": np.asarray(self.tri_e1),
                    "tri_e2": np.asarray(self.tri_e2),
                    "tri_mask": np.asarray(self.tri_mask),
                }
            self._pallas = PallasRenderKernel(
                object_manager, np.asarray(self.albedo), cfg.light_dir,
                cfg.ambient, interpret=pallas_interpret(),
                mesh_tables=mesh_tables)

    def _use_pallas(self, num_pixels: int, num_instances: int) -> bool:
        if self._pallas is None:
            return False
        if self.cfg.backend == "pallas":
            return True
        # auto: the streaming kernel wins once the per-world pixel x
        # instance working set is large enough that the XLA path's fusion
        # breaks into HBM round-trips (measured 12x at 128x128 x 36
        # instances on v5e); interpret mode is debug-speed, never auto
        from gpu_ecs_madrona_tpu.utils.platform import is_tpu
        return is_tpu() and num_pixels * num_instances >= (1 << 19)

    def init_buffers(self, ctx: Context):
        """Pre-create output buffers in ctx.data (stable pytree)."""
        cfg = self.cfg
        W = ctx.num_worlds
        user = dict(ctx.data)
        user["render_out"] = {
            "rgb": jnp.zeros((W, cfg.max_views, cfg.height, cfg.width, 4),
                             jnp.uint8),
            "depth": jnp.full((W, cfg.max_views, cfg.height, cfg.width),
                              jnp.inf, jnp.float32),
        }
        ctx.data = user

    # -- ray-primitive intersections (basic.comp analogs) ------------------

    @staticmethod
    def _ray_sphere(ro, rd, center, radius):
        """ro/rd [..., 3] broadcast vs center [..., 3], radius [...]."""
        oc = ro - center
        b = jnp.sum(oc * rd, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0) & (t > 1e-4)
        t = jnp.where(hit, t, BIG)
        normal = (ro + rd * t[..., None]) - center
        normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
        return t, normal

    @staticmethod
    def _ray_obb(ro, rd, center, rot, half):
        """Oriented-box slab test in the box's local frame."""
        ro_l = m.quat_inv_rotate(rot, ro - center)
        rd_l = m.quat_inv_rotate(rot, rd)
        inv = 1.0 / jnp.where(jnp.abs(rd_l) < 1e-9,
                              jnp.where(rd_l >= 0, 1e-9, -1e-9), rd_l)
        t0 = (-half - ro_l) * inv
        t1 = (half - ro_l) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 1e-4))
        t = jnp.where(hit, jnp.where(tmin > 1e-4, tmin, tmax), BIG)
        # local normal: axis of the entry face
        p_l = ro_l + rd_l * t[..., None]
        an = jnp.abs(p_l / jnp.maximum(half, 1e-9))
        axis = jnp.argmax(an, axis=-1)
        n_l = jax.nn.one_hot(axis, 3, dtype=ro.dtype) * jnp.sign(p_l)
        normal = m.quat_rotate(rot, n_l)
        return t, normal

    @staticmethod
    def _ray_plane(ro, rd, center, rot):
        n = m.quat_rotate(rot, jnp.zeros_like(center).at[..., 2].set(1.0))
        denom = jnp.sum(rd * n, axis=-1)
        t = jnp.sum((center - ro) * n, axis=-1) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit = (t > 1e-4) & (jnp.abs(denom) > 1e-6)
        return jnp.where(hit, t, BIG), jnp.broadcast_to(n, rd.shape)

    # -- exact convex hull: slab test over face planes ----------------------
    # (the ray-query analog of the reference BLAS hit, exact for any convex
    # mesh; the OBB variant below remains as the cheap proxy path)

    @staticmethod
    def _ray_convex_core(ro, rd, center, rot, scale, fnorm_l, face_d, fmask):
        """Shared slab math.  fnorm_l [..., F, 3] local face normals,
        face_d [..., F], fmask [..., F]; nonuniform scale supported by
        unscaling the ray (t is preserved: scaling is linear)."""
        ro_l = m.quat_inv_rotate(rot, ro - center) / scale
        rd_l = m.quat_inv_rotate(rot, rd) / scale
        denom = jnp.sum(fnorm_l * rd_l[..., None, :], axis=-1)    # [..., F]
        dist = face_d - jnp.sum(fnorm_l * ro_l[..., None, :], axis=-1)
        safe = jnp.where(jnp.abs(denom) < 1e-9,
                         jnp.where(denom >= 0, 1e-9, -1e-9), denom)
        t_f = dist / safe
        entering = denom < 0
        t_enter = jnp.max(jnp.where(entering & fmask, t_f, -BIG), axis=-1)
        t_exit = jnp.min(jnp.where((~entering) & fmask, t_f, BIG), axis=-1)
        # ray parallel to a face plane and outside it: no intersection
        parallel_out = jnp.any(
            fmask & (jnp.abs(denom) < 1e-9) & (dist < 0), axis=-1)
        hit = (t_enter <= t_exit) & (t_exit > 1e-4) & ~parallel_out
        t = jnp.where(t_enter > 1e-4, t_enter, t_exit)
        return jnp.where(hit, t, BIG), t_f, entering

    @staticmethod
    def _ray_convex_t(ro, rd, center, rot, scale, fnorm_l, face_d, fmask):
        t, _, _ = BatchRenderer._ray_convex_core(
            ro, rd, center, rot, scale, fnorm_l, face_d, fmask)
        return t

    @staticmethod
    def _ray_convex(ro, rd, center, rot, scale, fnorm_l, face_d, fmask):
        """t + world-space normal of the entry face (one-hot select)."""
        t, t_f, entering = BatchRenderer._ray_convex_core(
            ro, rd, center, rot, scale, fnorm_l, face_d, fmask)
        score = jnp.where(entering & fmask, t_f, -BIG)
        fidx = jnp.argmax(score, axis=-1)
        F = fmask.shape[-1]
        oh = fidx[..., None] == jnp.arange(F)
        n_l = jnp.sum(jnp.where(oh[..., None], fnorm_l, 0.0), axis=-2)
        # normals transform by the inverse-transpose: n / scale, renormalized
        n_w = m.quat_rotate(rot, n_l / scale)
        n_w = n_w / jnp.maximum(jnp.linalg.norm(n_w, axis=-1, keepdims=True),
                                1e-9)
        return t, n_w

    # -- triangle mesh: Möller–Trumbore over the padded tri table ----------
    # (the BLAS ray-query analog for arbitrary, incl. non-convex, meshes)

    @staticmethod
    def _ray_mesh_core(ro, rd, center, rot, scale, tri_a, e1, e2, tmask):
        """ro/rd [..., 3]; tri tables [..., T, 3] local space; returns
        (t_tri [..., T] with misses at BIG).  Scale handled by unscaling
        the ray (t preserved: direction not renormalized)."""
        ro_l = (m.quat_inv_rotate(rot, ro - center) / scale)[..., None, :]
        rd_l = (m.quat_inv_rotate(rot, rd) / scale)[..., None, :]
        pvec = jnp.cross(rd_l, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-9,
                                  jnp.where(det >= 0, 1e-9, -1e-9), det)
        tvec = ro_l - tri_a
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(rd_l * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        hit = (tmask & (jnp.abs(det) > 1e-9) & (u >= -1e-6) & (v >= -1e-6)
               & (u + v <= 1 + 1e-6) & (t > 1e-4))
        return jnp.where(hit, t, BIG)

    @staticmethod
    def _ray_mesh_t(ro, rd, center, rot, scale, tri_a, e1, e2, tmask):
        t_tri = BatchRenderer._ray_mesh_core(
            ro, rd, center, rot, scale, tri_a, e1, e2, tmask)
        return jnp.min(t_tri, axis=-1)

    @staticmethod
    def _ray_mesh(ro, rd, center, rot, scale, tri_a, e1, e2, tmask):
        """t + world normal of the nearest triangle (flipped toward the
        ray origin — two-sided shading like basic.comp)."""
        t_tri = BatchRenderer._ray_mesh_core(
            ro, rd, center, rot, scale, tri_a, e1, e2, tmask)
        t = jnp.min(t_tri, axis=-1)
        ti = jnp.argmin(t_tri, axis=-1)
        T = tmask.shape[-1]
        oh = (ti[..., None] == jnp.arange(T))[..., None]
        n_l = jnp.cross(jnp.sum(jnp.where(oh, e1, 0.0), axis=-2),
                        jnp.sum(jnp.where(oh, e2, 0.0), axis=-2))
        n_w = m.quat_rotate(rot, n_l / scale)
        n_w = n_w / jnp.maximum(
            jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
        n_w = jnp.where(jnp.sum(n_w * rd, axis=-1, keepdims=True) > 0,
                        -n_w, n_w)
        return t, n_w

    # t-only variants for the all-instances pass (no normal computation)

    @staticmethod
    def _ray_sphere_t(ro, rd, center, radius):
        oc = ro - center
        b = jnp.sum(oc * rd, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        return jnp.where((disc >= 0) & (t > 1e-4), t, BIG)

    @staticmethod
    def _ray_obb_t(ro, rd, center, rot, half):
        ro_l = m.quat_inv_rotate(rot, ro - center)
        rd_l = m.quat_inv_rotate(rot, rd)
        inv = 1.0 / jnp.where(jnp.abs(rd_l) < 1e-9,
                              jnp.where(rd_l >= 0, 1e-9, -1e-9), rd_l)
        t0 = (-half - ro_l) * inv
        t1 = (half - ro_l) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = tmax >= jnp.maximum(tmin, 1e-4)
        return jnp.where(hit, jnp.where(tmin > 1e-4, tmin, tmax), BIG)

    @staticmethod
    def _ray_plane_t(ro, rd, center, rot):
        n = m.quat_rotate(rot, jnp.zeros_like(center).at[..., 2].set(1.0))
        denom = jnp.sum(rd * n, axis=-1)
        t = jnp.sum((center - ro) * n, axis=-1) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom)
        return jnp.where((t > 1e-4) & (jnp.abs(denom) > 1e-6), t, BIG)

    def _pass1_tiled(self, d, eye, pos, rot, scale, obj, imask,
                     ptype, radius):
        """Tile-culled primary-ray pass (RendererConfig.tile_size).

        The TPU-native analog of the reference's TLAS traversal pruning
        (vk/batch_renderer.cpp:491-514): tiles play the role of the
        acceleration structure — each tile_size^2-pixel tile culls
        instances against its view cone once (sphere-vs-cone), keeps the
        nearest max_instances_per_tile survivors, and its pixels ray-test
        only those.  Per-pixel cost drops from O(N) to O(M).

        Returns (best_t, best_i) in [W, V, H, W] image layout with
        best_i a GLOBAL instance index (pass 2 is shared with the dense
        path)."""
        cfg, objmgr = self.cfg, self.objmgr
        tsz, M = cfg.tile_size, cfg.max_instances_per_tile
        W, V, Hh, Ww = d.shape[:4]
        N = pos.shape[1]
        M = min(M, N)
        Th, Tw = Hh // tsz, Ww // tsz
        T, p = Th * Tw, tsz * tsz

        d_t = d.reshape(W, V, Th, tsz, Tw, tsz, 3)\
               .transpose(0, 1, 2, 4, 3, 5, 6).reshape(W, V, T, p, 3)
        # tile view cone: mean direction + min cosine over the tile's rays
        d_sum = jnp.sum(d_t, axis=3)
        d_c = d_sum / jnp.linalg.norm(d_sum, axis=-1, keepdims=True)
        cos_t = jnp.min(jnp.sum(d_t * d_c[:, :, :, None, :], axis=-1),
                        axis=3)
        cos_t = jnp.clip(cos_t, 1e-3, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

        # instance bounding spheres vs tile cones (exact infinite-cone
        # sphere test: radial distance to axis vs cone boundary)
        half = (objmgr["local_aabb_hi"][obj]
                - objmgr["local_aabb_lo"][obj]) * 0.5 * scale
        r_i = jnp.linalg.norm(half, axis=-1)
        r_i = jnp.where(ptype == PRIM_SPHERE, radius, r_i)   # [W, N]
        if self.any_mesh:
            # render meshes may extend past the physics hull's AABB:
            # cull with the mesh's own bounding sphere (conservative
            # per-axis scale bound)
            r_mesh = self.mesh_radius[obj] * jnp.max(scale, axis=-1)
            r_i = jnp.where(self.has_mesh[obj], r_mesh, r_i)
        c = pos[:, None] - eye[:, :, None]                   # [W, V, N, 3]
        a_ax = jnp.einsum("wvnc,wvtc->wvtn", c, d_c)         # [W, V, T, N]
        cc = jnp.sum(c * c, axis=-1)[:, :, None, :]
        qq = jnp.sqrt(jnp.maximum(cc - a_ax * a_ax, 0.0))
        r4 = r_i[:, None, None, :]
        hit = ((qq * cos_t[..., None] - a_ax * sin_t[..., None] <= r4)
               & (a_ax >= -r4))
        hit = hit | (ptype == PRIM_PLANE)[:, None, None, :]  # planes: always
        hit = hit & imask[:, None, None, :]
        # nearest-first: distant overflow drops are the documented
        # tile-capacity contract (raise max_instances_per_tile).  Planes
        # are infinite — their center distance says nothing about their
        # nearest hit — so they always outrank sphere-bounded instances
        # (a ground plane must never be evicted from a tile)
        is_plane4 = (ptype == PRIM_PLANE)[:, None, None, :]
        score = jnp.where(hit, jnp.where(is_plane4, BIG, -a_ax), -BIG)
        vals, tidx = jax.lax.top_k(score, M)                 # [W, V, T, M]
        tvalid = vals > -BIG * 0.5

        from gpu_ecs_madrona_tpu.core.state import batched_gather
        flat_idx = tidx.reshape(W, V * T * M)

        def g(x):
            return batched_gather(x, flat_idx).reshape(
                (W, V, T, M) + x.shape[2:])

        pos_t, rot_t, scale_t = g(pos), g(rot), g(scale)
        obj_t, rad_t, ptype_t = g(obj), g(radius), g(ptype)

        ro6 = jnp.broadcast_to(eye[:, :, None, None, None, :],
                               (W, V, T, p, 1, 3))
        d6 = d_t[:, :, :, :, None, :]

        def i6(x):
            return x[:, :, :, None]

        ts_ = self._ray_sphere_t(ro6, d6, i6(pos_t), i6(rad_t))
        if cfg.exact_hulls:
            fnorm = objmgr["face_normals"][obj_t]
            fd = objmgr["face_d"][obj_t]
            fm = (jnp.arange(fd.shape[-1])
                  < objmgr["num_faces"][obj_t][..., None])
            tb = self._ray_convex_t(ro6, d6, i6(pos_t), i6(rot_t),
                                    i6(scale_t), i6(fnorm), i6(fd), i6(fm))
        else:
            half_t = (objmgr["local_aabb_hi"][obj_t]
                      - objmgr["local_aabb_lo"][obj_t]) * 0.5 * scale_t
            tb = self._ray_obb_t(ro6, d6, i6(pos_t), i6(rot_t), i6(half_t))
        tp_ = self._ray_plane_t(ro6, d6, i6(pos_t), i6(rot_t))
        pt6 = i6(ptype_t)
        t_all = jnp.where(pt6 == PRIM_SPHERE, ts_,
                          jnp.where(pt6 == PRIM_HULL, tb, tp_))
        if self.any_mesh:
            # real triangle geometry on the tile's surviving instances
            # (Möller–Trumbore over the padded tri table, same override
            # as the dense pass — tiles + meshes compose)
            tm6 = self._ray_mesh_t(
                ro6, d6, i6(pos_t), i6(rot_t), i6(scale_t),
                i6(self.tri_a[obj_t]), i6(self.tri_e1[obj_t]),
                i6(self.tri_e2[obj_t]), i6(self.tri_mask[obj_t]))
            t_all = jnp.where(i6(self.has_mesh[obj_t]), tm6, t_all)
        t_all = jnp.where(i6(tvalid), t_all, BIG)            # [W,V,T,p,M]
        best_t = jnp.min(t_all, axis=-1)
        best_m = jnp.argmin(t_all, axis=-1)
        best_i = jnp.take_along_axis(
            jnp.broadcast_to(tidx[:, :, :, None, :], (W, V, T, p, M)),
            best_m[..., None], axis=-1)[..., 0]

        def untile(x):
            return x.reshape(W, V, Th, Tw, tsz, tsz)\
                    .transpose(0, 1, 2, 4, 3, 5).reshape(W, V, Hh, Ww)

        return untile(best_t), untile(best_i)

    # -- node ---------------------------------------------------------------

    def setup_tasks(self, builder: TaskGraphBuilder,
                    deps: Sequence[NodeID],
                    instance_archetypes: Sequence[Archetype]) -> NodeID:
        """Append the render node (the analog of BatchRenderer::render being
        called per step, cuda_exec.cpp:1787-1793 — but fused into the jit
        step instead of a separate queue submission)."""
        cfg = self.cfg
        objmgr = self.objmgr
        albedo = self.albedo

        def render(ctx: Context):
            user = dict(ctx.data)
            render_in = user["render"]
            views = render_in["__views__"]
            W = ctx.num_worlds
            V = cfg.max_views
            Hh, Ww = cfg.height, cfg.width

            # camera rays: pinhole, looking down -y in camera space with +z
            # up (reference shader convention simplified), rotated by view
            # rot.  NDC in [-1, 1].
            ys = (jnp.arange(Hh, dtype=jnp.float32) + 0.5) / Hh * 2 - 1
            xs = (jnp.arange(Ww, dtype=jnp.float32) + 0.5) / Ww * 2 - 1
            px, py = jnp.meshgrid(xs, -ys)          # [H, W]
            eye = views["eye"][:, :V]               # [W, V, 3]
            vrot = views["rot"][:, :V]              # [W, V, 4]
            tanf = views["tan_fov"][:, :V]          # [W, V]
            vmask = views["mask"][:, :V]
            d_cam = jnp.stack([
                jnp.broadcast_to(px, (W, V, Hh, Ww)) * tanf[..., None, None],
                jnp.ones((W, V, Hh, Ww)),
                jnp.broadcast_to(py, (W, V, Hh, Ww)) * tanf[..., None, None],
            ], axis=-1)
            d = m.quat_rotate(vrot[:, :, None, None, :], d_cam)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            ro = jnp.broadcast_to(eye[:, :, None, None, :], d.shape)

            # gather all instances across archetypes into one flat list
            all_pos, all_rot, all_scale, all_obj, all_mask = [], [], [], [], []
            for arch in instance_archetypes:
                inst = render_in[arch.name]
                all_pos.append(inst["pos"])
                all_rot.append(inst["rot"])
                all_scale.append(inst["scale"])
                all_obj.append(inst["obj_id"])
                all_mask.append(inst["mask"])
            pos = jnp.concatenate(all_pos, axis=1)        # [W, N, 3]
            rot = jnp.concatenate(all_rot, axis=1)
            scale = jnp.concatenate(all_scale, axis=1)
            obj = jnp.concatenate(all_obj, axis=1)
            imask = jnp.concatenate(all_mask, axis=1)
            N = pos.shape[1]

            if self._use_pallas(V * Hh * Ww, N):
                P = V * Hh * Ww
                rgb_f, hit_f, depth_f = self._pallas(
                    ro.reshape(W, P, 3), d.reshape(W, P, 3),
                    pos, rot, scale, obj, imask)
                rgb = rgb_f.reshape(W, V, Hh, Ww, 3)
                hit = hit_f.reshape(W, V, Hh, Ww)
                rgba = jnp.concatenate(
                    [rgb, jnp.where(hit[..., None], 1.0, 0.0)], axis=-1)
                rgba8 = (jnp.clip(rgba, 0, 1) * 255).astype(jnp.uint8)
                depth = jnp.where(hit, depth_f.reshape(W, V, Hh, Ww),
                                  jnp.inf)
                alive = vmask[:, :, None, None]
                rgba8 = jnp.where(alive[..., None], rgba8, 0)
                depth = jnp.where(alive, depth, jnp.inf)
                user["render_out"] = {"rgb": rgba8, "depth": depth}
                ctx.data = user
                return

            ptype = objmgr["prim_type"][obj]              # [W, N]
            radius = objmgr["sphere_radius"][obj] * scale[..., 0]
            half = (objmgr["local_aabb_hi"][obj]
                    - objmgr["local_aabb_lo"][obj]) * 0.5 * scale
            alb = albedo[obj]                             # [W, N, 3]

            use_tiles = (cfg.tile_size > 0
                         and Hh % cfg.tile_size == 0
                         and Ww % cfg.tile_size == 0)
            if use_tiles:
                # Pass 1 (tiled): per-tile cone culling, O(M) per pixel
                best_t, best_i = self._pass1_tiled(
                    d, eye, pos, rot, scale, obj, imask, ptype, radius)
            else:
                # Pass 1 (dense) — t for every (pixel, instance): rays
                # [W,V,H,Ww,1,3] vs instances [W,1,1,1,N,...] ->
                # [W,V,H,Ww,N]; normals are NOT computed here (that would
                # be a [pixels, N, 3] tensor).
                ro5 = ro[..., None, :]
                d5 = d[..., None, :]

                def inst5(x):
                    return x[:, None, None, None]

                ts = self._ray_sphere_t(ro5, d5, inst5(pos), inst5(radius))
                if cfg.exact_hulls:
                    fnorm_i = objmgr["face_normals"][obj]  # [W, N, F, 3]
                    fd_i = objmgr["face_d"][obj]           # [W, N, F]
                    fm_i = (jnp.arange(fd_i.shape[-1])[None, None]
                            < objmgr["num_faces"][obj][..., None])
                    tb = self._ray_convex_t(
                        ro5, d5, inst5(pos), inst5(rot), inst5(scale),
                        inst5(fnorm_i), inst5(fd_i), inst5(fm_i))
                else:
                    tb = self._ray_obb_t(ro5, d5, inst5(pos), inst5(rot),
                                         inst5(half))
                tp = self._ray_plane_t(ro5, d5, inst5(pos), inst5(rot))
                pt5 = inst5(ptype)
                t_all = jnp.where(pt5 == PRIM_SPHERE, ts,
                                  jnp.where(pt5 == PRIM_HULL, tb, tp))
                if self.any_mesh:
                    # real triangle geometry overrides the analytic
                    # primitive for mesh-carrying objects (XLA fuses the
                    # [.., N, T] elementwise MT math into the
                    # min-reduction)
                    tm = self._ray_mesh_t(
                        ro5, d5, inst5(pos), inst5(rot), inst5(scale),
                        inst5(self.tri_a[obj]), inst5(self.tri_e1[obj]),
                        inst5(self.tri_e2[obj]), inst5(self.tri_mask[obj]))
                    t_all = jnp.where(inst5(self.has_mesh[obj]), tm, t_all)
                t_all = jnp.where(inst5(imask), t_all, BIG)
                best_t = jnp.min(t_all, axis=-1)          # [W,V,H,Ww]
                best_i = jnp.argmin(t_all, axis=-1)

            # Pass 2 — winner-only shading data: gather the winning
            # instance's params per pixel and recompute its normal.
            from gpu_ecs_madrona_tpu.core.state import batched_gather
            P = V * Hh * Ww
            flat_i = best_i.reshape(W, P)

            def gw(x):
                return batched_gather(x, flat_i).reshape((W, V, Hh, Ww) + x.shape[2:])

            wpos, wrot = gw(pos), gw(rot)
            wrad, whalf = gw(radius), gw(half)
            wtype = gw(ptype)
            best_alb = gw(alb)
            _, n_s = self._ray_sphere(ro, d, wpos, wrad)
            if cfg.exact_hulls:
                wobj = gw(obj)
                wfn = objmgr["face_normals"][wobj]         # [W,V,H,Wpx,F,3]
                wfd = objmgr["face_d"][wobj]
                wfm = (jnp.arange(wfd.shape[-1])
                       < objmgr["num_faces"][wobj][..., None])
                _, n_b = self._ray_convex(ro, d, wpos, wrot, gw(scale),
                                          wfn, wfd, wfm)
            else:
                _, n_b = self._ray_obb(ro, d, wpos, wrot, whalf)
            _, n_p = self._ray_plane(ro, d, wpos, wrot)
            best_n = jnp.where((wtype == PRIM_SPHERE)[..., None], n_s,
                               jnp.where((wtype == PRIM_HULL)[..., None], n_b, n_p))
            if self.any_mesh:
                wobj_m = gw(obj)
                _, n_m = self._ray_mesh(
                    ro, d, wpos, wrot, gw(scale),
                    self.tri_a[wobj_m], self.tri_e1[wobj_m],
                    self.tri_e2[wobj_m], self.tri_mask[wobj_m])
                best_n = jnp.where(self.has_mesh[wobj_m][..., None],
                                   n_m, best_n)

            hit = best_t < BIG * 0.5
            light = jnp.asarray(cfg.light_dir, jnp.float32)
            light = -light / jnp.linalg.norm(light)
            lambert = jnp.maximum(jnp.sum(best_n * light, axis=-1), 0.0)
            shade = cfg.ambient + (1 - cfg.ambient) * lambert
            rgb = jnp.where(hit[..., None], best_alb * shade[..., None], 0.0)
            rgba = jnp.concatenate(
                [rgb, jnp.where(hit[..., None], 1.0, 0.0)], axis=-1)
            rgba8 = (jnp.clip(rgba, 0, 1) * 255).astype(jnp.uint8)
            depth = jnp.where(hit, best_t, jnp.inf)
            # dead views render black / inf
            alive = vmask[:, :, None, None]
            rgba8 = jnp.where(alive[..., None], rgba8, 0)
            depth = jnp.where(alive, depth, jnp.inf)

            user["render_out"] = {"rgb": rgba8, "depth": depth}
            ctx.data = user

        return builder.add_node(render, deps, name="batch_render")
