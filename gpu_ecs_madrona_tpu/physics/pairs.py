"""Pair-major, component-scalarized physics pipeline for compacted pairs.

THE layout module for physics at scale.  Two TPU facts shape everything:

1. Arrays tile the last two dims to (8 sublanes, 128 lanes).  Any
   materialized tensor with a size-3 component axis in the last two dims
   pads 3 -> 8 or 3 -> 128 (2.7x..42x HBM waste) — measured 7 GB of
   temporaries at 512 worlds x 512 pairs for the component-minor (AoS)
   narrowphase.
2. jnp.stack/slice on a component axis compiles to concatenates and
   strided slices that break XLA elementwise fusion — measured 9 ms for a
   single quat-rotate on [8192, 8, 3, 256] with a stacked component axis.

So there is NO component axis at all here: every vec3/quat is a Python
tuple of scalar-field arrays shaped [..., K] (pair axis minor, always a
full 128-lane dimension).  All math is plain elementwise ops that XLA
fuses into long chains; per-object asset constants are folded in with
unrolled (obj == o) select chains (O is small) instead of gathers.  This
is the XLA-level analog of the reference's warp-cooperative narrowphase
(narrowphase.cpp:1730-1781, 32 threads per candidate): lanes = pairs,
components live in "registers" (separate arrays).

Body-row gather/scatter is the only matmul surface: one-hot row matrices
[W, n, K] feed dot_generals (gather = [W,D,n] @ [W,n,K], segment-sum =
[W,n,K] x [W,C,K] -> [W,n,C]) — the MXU replacement for TPU-hostile
scatters (core/state.py notes).

Manifolds keep ALL hull vertices as candidate contact points with depth
masks (P = Vm) instead of selecting the deepest 4: selection (top_k /
take_along_axis) forces padded materialization, the solver is linear in
points, and the masked all-verts form is discontinuity-free.

Reference mapping: narrowphase src/physics/narrowphase.cpp (doSAT
:663-727, type dispatch :98-108), solver src/physics/physics.cpp
(solvePositions :166-461, solveVelocities :716-1009).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE
from gpu_ecs_madrona_tpu.utils.math import DEFAULT_P, EXACT

NEG_BIG = -1e9
BIG = 1e9
# SAT winner tie margin (see extreme_onehot docstring): absolute, in
# world units — well above cross-backend rounding noise (~1e-7 for
# unit-scale boxes), well below any physically meaningful pen difference
SAT_TIE_EPS = 1e-5
# manifold cap (reference clips hull contacts to 4 points)
MANIFOLD_MAX_POINTS = 4

# ---------------------------------------------------------------------------
# Component-tuple vec3/quat math (each component an [..., K] array)
# ---------------------------------------------------------------------------


def v3(*comps):
    assert len(comps) == 3
    return tuple(comps)


def vmap3(f, *vs):
    return tuple(f(*[v[i] for v in vs]) for i in range(3))


def v3add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def norm3(a, eps=1e-30):
    return jnp.sqrt(jnp.maximum(dot3(a, a), eps))


def v3where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def qrot(q, v):
    """Rotate vec3 tuple by quat tuple (w,x,y,z)."""
    qw, qv = q[0], (q[1], q[2], q[3])
    t = v3scale(cross3(qv, v), 2.0)
    return v3add(v3add(v, v3scale(t, qw)), cross3(qv, t))


def qmul(a, b):
    """Quat product of (w,x,y,z) component tuples."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def qnormalize(q, eps=1e-30):
    inv = jax.lax.rsqrt(jnp.maximum(
        q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3], eps))
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def iota1(size, ndim, axis, dtype=jnp.int32):
    """Kernel-safe iota along `axis` of an ndim-rank broadcastable shape
    (TPU Mosaic rejects 1D iota; jnp.arange + reshape is not guaranteed)."""
    shape = tuple(size if i == axis else 1 for i in range(ndim))
    return jax.lax.broadcasted_iota(dtype, shape, axis)


def falses(shape):
    """All-False predicate WITHOUT a bool constant (Mosaic lowers bool
    constants as i8 + an unsupported i8->i1 truncation)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0) < 0


def trues(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0) >= 0


def bexp(m, axis, shape):
    """Expand + broadcast a bool mask to `shape`, relayouting in f32 —
    Mosaic cannot reshape/broadcast i1 vectors (it lowers them through an
    i8 round-trip with an unsupported i8->i1 truncation).  Row-list masks
    (vmask/fmask/emask/efmask) are f32 0/1 weights for the same reason."""
    mf = jnp.expand_dims(m.astype(jnp.float32), axis)
    return jnp.broadcast_to(mf, shape) > 0.5


def quat_axes(q):
    """Rotation-matrix columns of quat (w,x,y,z): three world-frame unit
    axes as vec3 tuples (the box's local x/y/z in world space)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    u0 = (1.0 - 2.0 * (yy + zz), 2.0 * (xy + wz), 2.0 * (xz - wy))
    u1 = (2.0 * (xy - wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz + wx))
    u2 = (2.0 * (xz + wy), 2.0 * (yz - wx), 1.0 - 2.0 * (xx + yy))
    return u0, u1, u2


def qrot_inv(q, v):
    qw, qv = q[0], (-q[1], -q[2], -q[3])
    t = v3scale(cross3(qv, v), 2.0)
    return v3add(v3add(v, v3scale(t, qw)), cross3(qv, t))


def expand(x, axis=1):
    """Insert a broadcast axis (e.g. per-pair scalar -> per-vert scalar)."""
    return jnp.expand_dims(x, axis)


def vexpand(v, axis=1):
    return tuple(jnp.expand_dims(c, axis) for c in v)


# ---------------------------------------------------------------------------
# One-hot gather / segment-sum over body rows (K-minor)
# ---------------------------------------------------------------------------


def onehot_rows(rows, valid, n):
    """[W,K] rows -> one-hot [W, n, K] f32 (all-zero column when ~valid)."""
    oh = iota1(n, 3, 1, rows.dtype) == rows[:, None, :]
    return (oh & valid[:, None, :]).astype(jnp.float32)


def extreme_onehot(score, mode, tie_eps=0.0):
    """score [W,R,K] -> (extreme [W,K], one-hot [W,R,K] bool at the FIRST
    (lowest index) occurrence of the extreme along axis 1).  The kernel-safe
    replacement for argmax/argmin + onehot select (TPU Mosaic has no
    argmin/argmax reduce; compare + min-index matches their first-occurrence
    tie-break exactly).

    tie_eps > 0 treats scores within eps of the extreme as tied (first
    index wins).  SAT axis selection needs this: face-on-face box stacks
    produce EXACTLY tied penetrations in real arithmetic, and different
    lowerings (XLA CPU/TPU, Mosaic, interpret) round the contenders
    differently — without the epsilon the winning axis, and therefore the
    contact normal, flips per backend."""
    ext = (jnp.max if mode == "max" else jnp.min)(score, axis=1)
    if tie_eps:
        at = ((score >= ext[:, None, :] - tie_eps) if mode == "max"
              else (score <= ext[:, None, :] + tie_eps))
    else:
        at = score == ext[:, None, :]
    R = score.shape[1]
    idx = jnp.broadcast_to(iota1(R, 3, 1), score.shape)
    first = jnp.min(jnp.where(at, idx, R), axis=1)
    oh = at & (idx == first[:, None, :])
    return ext, oh


def pick_rows(oh, values):
    """One-hot [W,R,K] select of row-list values ([W,R,K] array or vec3
    tuple) -> [W,K] (tuple)."""
    if isinstance(values, tuple):
        return tuple(jnp.sum(jnp.where(oh, c, 0.0), axis=1) for c in values)
    return jnp.sum(jnp.where(oh, values, 0.0), axis=1)


def gather_channels(packed_T, oh):
    """[W, D, n] @ [W, n, K] -> [W, D, K] per-pair channel rows (MXU).

    Mixed precision: the VALUES operand must not be rounded to one bf16
    pass (TPU default — silently truncates gathered f32 state to ~3
    digits; utils/math.py EXACT note), while the one-hot operand is
    bf16-exact and stays cheap."""
    return jax.lax.dot_general(
        packed_T, oh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(EXACT, DEFAULT_P))


def accumulate_channels(oh, vals):
    """Segment-sum pairs -> bodies: [W,n,K] x [W,C,K] -> [W,n,C] (MXU).
    vals must be zero on invalid pairs.  Mixed precision: see
    gather_channels."""
    return jax.lax.dot_general(
        oh, vals, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(DEFAULT_P, EXACT))


# ---------------------------------------------------------------------------
# Per-object asset constants, folded in by unrolled (obj == o) selects
# ---------------------------------------------------------------------------


class ObjTables:
    """Numpy-side snapshot of the padded object manager, exposed as
    per-pair virtual tensors via unrolled select chains (no gathers —
    O is small, and selects fuse into every consumer)."""

    def __init__(self, objmgr):
        om = {k: np.asarray(v) for k, v in objmgr.items()}
        self.O = om["prim_type"].shape[0]
        # hand-built managers predating the restitution table get e=0
        om.setdefault("restitution", np.zeros(self.O, np.float32))
        self.Vm = om["verts"].shape[1]
        self.Fm = om["face_normals"].shape[1]
        self.Em = om["edge_dirs"].shape[1]
        self.om = om
        # every hull is an axis-aligned box -> hull-hull SAT can take the
        # analytic OBB path (Gottschalk 15-axis test, no vert loops)
        if "hull_is_box" in om and not os.environ.get("GEM_NO_OBB"):
            hulls = om["prim_type"] == PRIM_HULL
            self.all_box = bool((om["hull_is_box"][hulls] == 1).all())
        else:
            self.all_box = False
        # static trace-time flag: with every material at e=0 the bounce
        # term vanishes and kernels skip the PreSolveVelocity pair gather
        self.any_restitution = bool(
            np.any(om.get("restitution", np.zeros(1)) != 0.0))

    def masks(self, obj):
        """(is_sphere, is_hull, is_plane) [W,K] bool."""
        pt = self.om["prim_type"]
        zero = falses(obj.shape)
        out = [zero, zero, zero]
        for o in range(self.O):
            m = obj == o
            out[int(pt[o])] = out[int(pt[o])] | m
        return out[PRIM_SPHERE], out[PRIM_HULL], out[PRIM_PLANE]

    def scalar(self, obj, key):
        """Per-pair scalar const [W,K] (e.g. sphere_radius)."""
        tab = self.om[key]
        acc = jnp.zeros(obj.shape, jnp.float32)
        for o in range(self.O):
            acc = acc + jnp.where(obj == o, float(tab[o]), 0.0)
        return acc

    def vec(self, obj, key):
        """Per-pair vec3 const tuple of [W,K] (e.g. local_aabb_lo)."""
        tab = self.om[key]
        comps = []
        for c in range(3):
            acc = jnp.zeros(obj.shape, jnp.float32)
            for o in range(self.O):
                acc = acc + jnp.where(obj == o, float(tab[o, c]), 0.0)
            comps.append(acc)
        return tuple(comps)

    def rows_vec(self, obj, key, count_key):
        """Per-pair padded row-list const: vec3 comps [W, R, K] + mask.
        key: [O, R, 3] table (verts / face_normals / edge_dirs).

        Built row-plane-wise from PYTHON scalar constants stacked along
        axis 1 (never from captured jnp arrays — Pallas kernels reject
        non-scalar closure constants, and scalar selects fold to the same
        thing under XLA)."""
        tab = self.om[key]
        R = tab.shape[1]
        counts = self.om[count_key]
        sel = [(obj == o) for o in range(self.O)]
        zero = jnp.zeros(obj.shape, jnp.float32)
        comps = []
        for c in range(3):
            planes = []
            for r in range(R):
                plane = zero
                for o in range(self.O):
                    val = float(tab[o, r, c])
                    if val != 0.0:
                        plane = plane + jnp.where(sel[o], val, 0.0)
                planes.append(plane)
            comps.append(jnp.stack(planes, axis=1))
        # f32 0/1 row mask (see bexp) — built with f32 broadcasts only
        maskf = jnp.zeros(obj.shape[:1] + (R,) + obj.shape[1:], jnp.float32)
        for o in range(self.O):
            cnt = int(counts[o])
            if cnt <= 0:
                continue
            validf = jnp.where(iota1(R, 3, 1) < cnt, 1.0, 0.0)   # [1,R,1]
            self_f = jnp.where(sel[o], 1.0, 0.0)[:, None, :]
            maskf = maskf + self_f * validf
        return tuple(comps), maskf

    def rows_scalar(self, obj, key):
        """Per-pair padded scalar row-list const [W, R, K] (face_d)."""
        tab = self.om[key]
        R = tab.shape[1]
        sel = [(obj == o) for o in range(self.O)]
        zero = jnp.zeros(obj.shape, jnp.float32)
        planes = []
        for r in range(R):
            plane = zero
            for o in range(self.O):
                val = float(tab[o, r])
                if val != 0.0:
                    plane = plane + jnp.where(sel[o], val, 0.0)
            planes.append(plane)
        return jnp.stack(planes, axis=1)

    def _coef2(self, sel, tab, r1, r2, c=None):
        """Per-pair scalar const Σ_o sel_o * tab[o, r1, r2(, c)] or None."""
        coef = None
        for o in range(self.O):
            val = float(tab[o, r1, r2] if c is None else tab[o, r1, r2, c])
            if val != 0.0:
                term = jnp.where(sel[o], val, 0.0)
                coef = term if coef is None else coef + term
        return coef

    def rows2_vec_sel(self, obj, key, ohf):
        """[O, R1, R2, 3] table contracted with a row one-hot ohf
        [W, R1, K] f32 → vec3 comps [W, R2, K].  Selects one face's
        vertex/plane rows per pair (incident-face clipping).  Unrolled
        scalar constants + elementwise only (kernel-safe, like rows_vec)."""
        tab = self.om[key]
        R1, R2 = tab.shape[1], tab.shape[2]
        sel = [(obj == o) for o in range(self.O)]
        zero = jnp.zeros(obj.shape, jnp.float32)
        comps = []
        for c in range(3):
            planes = []
            for r2 in range(R2):
                acc = zero
                for r1 in range(R1):
                    coef = self._coef2(sel, tab, r1, r2, c)
                    if coef is not None:
                        acc = acc + ohf[:, r1] * coef
                planes.append(acc)
            comps.append(jnp.stack(planes, axis=1))
        return tuple(comps)

    def rows2_scalar_sel(self, obj, key, ohf):
        """[O, R1, R2] table contracted with ohf [W, R1, K] → [W, R2, K]."""
        tab = self.om[key]
        R1, R2 = tab.shape[1], tab.shape[2]
        sel = [(obj == o) for o in range(self.O)]
        zero = jnp.zeros(obj.shape, jnp.float32)
        planes = []
        for r2 in range(R2):
            acc = zero
            for r1 in range(R1):
                coef = self._coef2(sel, tab, r1, r2)
                if coef is not None:
                    acc = acc + ohf[:, r1] * coef
            planes.append(acc)
        return jnp.stack(planes, axis=1)


def body_fields(pos, rot, obj, tables: ObjTables) -> Dict[str, Any]:
    """World-space per-pair-side fields.  pos: vec3 tuple [W,K]; rot: quat
    tuple [W,K]; obj [W,K] int.  The data a reference CollisionPrimitive
    carries (physics.hpp:245-264) pushed to world space per pair."""
    is_s, is_h, is_p = tables.masks(obj)
    verts_l, vmask = tables.rows_vec(obj, "verts", "num_verts")
    fnorm_l, fmask = tables.rows_vec(obj, "face_normals", "num_faces")
    face_d = tables.rows_scalar(obj, "face_d")
    edir_l, emask = tables.rows_vec(obj, "edge_dirs", "num_edges")
    # sign-deduped face axes for SAT (half the axis tests for boxes);
    # fall back to full face normals for object managers built before the
    # sat_axes table existed
    if "sat_axes" in tables.om:
        sat_l, smask = tables.rows_vec(obj, "sat_axes", "num_sat_axes")
    else:
        sat_l, smask = fnorm_l, fmask

    # full-edge endpoints (supporting-edge lookup for edge-edge contacts);
    # XLA DCEs these when the consumer graph never reads them
    ep0_l, efmask = tables.rows_vec(obj, "edge_p0", "num_full_edges")
    ep1_l, _ = tables.rows_vec(obj, "edge_p1", "num_full_edges")

    rq = tuple(expand(c) for c in rot)            # [W,1,K]
    pe = tuple(expand(c) for c in pos)
    verts_w = v3add(qrot(rq, verts_l), pe)        # comps [W,Vm,K]
    fnorm_w = qrot(rq, fnorm_l)
    face_dw = face_d + dot3(fnorm_w, pe)          # [W,Fm,K]
    edir_w = qrot(rq, edir_l)
    sat_w = qrot(rq, sat_l) if sat_l is not fnorm_l else fnorm_w
    zero = jnp.zeros_like(pos[0])
    plane_n = qrot(rot, (zero, zero, jnp.ones_like(zero)))
    plane_d = dot3(plane_n, pos)
    out_box = {}
    if tables.all_box:
        out_box = {"_all_box": True,
                   "box_u": quat_axes(rot),
                   "box_h": tables.vec(obj, "box_half")}
    return {
        **out_box,
        "obj": obj, "_tables": tables,
        "pos": pos, "rot": rot,
        "is_sphere": is_s, "is_hull": is_h, "is_plane": is_p,
        "radius": tables.scalar(obj, "sphere_radius"),
        "verts_w": verts_w, "vmask": vmask,
        "fnorm_w": fnorm_w, "face_dw": face_dw, "fmask": fmask,
        "sat_w": sat_w, "smask": smask,
        "edir_w": edir_w, "emask": emask,
        "edge_p0_w": v3add(qrot(rq, ep0_l), pe), "efmask": efmask,
        "edge_p1_w": v3add(qrot(rq, ep1_l), pe),
        "plane_n": plane_n, "plane_d": plane_d,
        "lo_l": tables.vec(obj, "local_aabb_lo"),
        "hi_l": tables.vec(obj, "local_aabb_hi"),
    }


# ---------------------------------------------------------------------------
# Narrowphase
# ---------------------------------------------------------------------------


def _obb_sat(A, B):
    """Gottschalk's 15-axis OBB separating-axis tests for box-box pairs.

    The general SAT projects every hull vert onto every axis
    ([W, ax, V, K] tensors — the VPU instruction count is what bounds the
    substep kernel); for boxes the support radius along an axis is
    analytic (sum of |axis . u_i| h_i), so all 15 penetration depths are
    [W, K] expressions of the frame-dot matrix M, its |.|, and the center
    offset in each frame.  Same contract as the general path: returns
    (minA, minB, minE [W,K] pens, fA, fB, fE winning-axis vec3 tuples,
    sign-agnostic — caller orients).  Reference runs the generic support
    loops even for boxes (narrowphase.cpp SAT helpers); this is the
    box specialization.
    """
    uA, uB = A["box_u"], B["box_u"]
    hA, hB = A["box_h"], B["box_h"]
    d = v3sub(B["pos"], A["pos"])
    t = [dot3(u, d) for u in uA]                       # d in A frame
    s = [dot3(u, d) for u in uB]                       # d in B frame
    M = [[dot3(uA[i], uB[j]) for j in range(3)] for i in range(3)]
    # Gottschalk eps: inflate |M| so near-parallel axes don't produce
    # false separations from cancellation
    aM = [[jnp.abs(M[i][j]) + 1e-6 for j in range(3)] for i in range(3)]

    penA = [hA[i] + aM[i][0] * hB[0] + aM[i][1] * hB[1] + aM[i][2] * hB[2]
            - jnp.abs(t[i]) for i in range(3)]
    penB = [hB[j] + aM[0][j] * hA[0] + aM[1][j] * hA[1] + aM[2][j] * hA[2]
            - jnp.abs(s[j]) for j in range(3)]

    penE = []
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            rA = hA[i1] * aM[i2][j] + hA[i2] * aM[i1][j]
            rB = hB[j1] * aM[i][j2] + hB[j2] * aM[i][j1]
            tL = jnp.abs(t[i2] * M[i1][j] - t[i1] * M[i2][j])
            len2 = 1.0 - M[i][j] * M[i][j]
            pen = (rA + rB - tL) * jax.lax.rsqrt(jnp.maximum(len2, 1e-12))
            penE.append(jnp.where(len2 > 1e-8, pen, BIG))

    stkA = jnp.stack(penA, axis=1)                     # [W,3,K]
    stkB = jnp.stack(penB, axis=1)
    stkE = jnp.stack(penE, axis=1)                     # [W,9,K], i-major
    minA, ohA = extreme_onehot(stkA, "min", tie_eps=SAT_TIE_EPS)
    minB, ohB = extreme_onehot(stkB, "min", tie_eps=SAT_TIE_EPS)
    minE, ohE = extreme_onehot(stkE, "min", tie_eps=SAT_TIE_EPS)

    def pick_axis(oh, axes):
        return tuple(
            jnp.sum(jnp.where(oh, jnp.stack([ax[c] for ax in axes], axis=1),
                              0.0), axis=1)
            for c in range(3))

    fA = pick_axis(ohA, list(uA))
    fB = pick_axis(ohB, list(uB))
    # winning cross axis: collapse the (i, j) one-hot to per-side axis
    # selections, then one cross product
    ohEf = ohE.astype(jnp.float32)
    selA_w = [jnp.sum(ohEf[:, 3 * i:3 * i + 3], axis=1) for i in range(3)]
    selB_w = [ohEf[:, 0] + ohEf[:, 3] + ohEf[:, 6],
              ohEf[:, 1] + ohEf[:, 4] + ohEf[:, 7],
              ohEf[:, 2] + ohEf[:, 5] + ohEf[:, 8]]
    uA_sel = tuple(sum(selA_w[i] * uA[i][c] for i in range(3))
                   for c in range(3))
    uB_sel = tuple(sum(selB_w[j] * uB[j][c] for j in range(3))
                   for c in range(3))
    fE = cross3(uA_sel, uB_sel)
    fE = v3scale(fE, 1.0 / jnp.maximum(norm3(fE), 1e-12))
    extras = {"selA_w": selA_w, "selB_w": selB_w,
              "uA_sel": uA_sel, "uB_sel": uB_sel}
    return minA, minB, minE, fA, fB, fE, extras


CLIP_EPS = 1e-6      # on-plane tolerance: boundary points count inside
CLIP_T_EPS = 1e-4    # segment-endpoint crossings are covered by the vert set
CLIP_STRICT = 1e-5   # ref-vert set must be STRICTLY inside (dedup vs vert set)


def _clip_face_manifold(polyI_w, polyIn_w, vvalI, sidesR, sidesI,
                        polyR_w, vvalR, n_reff, d_reff, n_incf, d_incf,
                        axis_inc):
    """Exact incident-face clip manifold — order-free Sutherland-Hodgman.

    The reference generates hull-hull manifolds by clipping the incident
    face against the reference face's side planes and keeping points below
    the reference face (narrowphase.cpp manifold generation after doSAT).
    Sequential SH needs ring-ordered compaction per clip plane — hostile to
    fixed shapes — but the corners of (incident polygon ∩ side-plane
    region) are exactly two order-free candidate sets:

      1. incident edges interval-clipped against the side planes: the
         clipped-segment START point per edge covers both "vertex inside
         the region" (t_lo = 0) and "entering crossing" (t_lo > 0); the
         END point is emitted only when strictly clipped (t_hi < 1 —
         otherwise it IS the next edge's start);
      2. reference-face verts strictly inside the incident polygon's side
         planes, projected onto the incident face along the contact axis
         (the "region corner inside polygon" case set 1 cannot see;
         strictness dedups against set 1 when the faces coincide).

    All sets are fixed-shape [W, FVe, K] masked computations; callers merge
    the 3*FVe candidates into the manifold slots and the caller-level
    deepest-MANIFOLD_MAX_POINTS compaction selects (reference caps at 4).

    Args: polyI_w/polyIn_w incident-face verts + next-in-loop (vec3 comps
    [W,FVe,K]); vvalI/vvalR f32 slot-valid; sidesR/sidesI lists of
    (unit normal vec3 [W,K], offset [W,K], valid f32 [W,K]) side planes;
    (n_reff, d_reff)/(n_incf, d_incf) face planes [W,K]; axis_inc unit
    vec3 [W,K] pointing from the reference face into the incident hull.
    Returns (pts vec3 [W,3*FVe,K], dep [W,3*FVe,K]); dep -BIG on dead
    slots."""
    shapeP = polyI_w[0].shape                      # [W, FVe, K]

    # set 1: incident edges interval-clipped against the side planes
    t_lo = jnp.zeros(shapeP)
    t_hi = jnp.ones(shapeP)
    empty = falses(shapeP)
    for sn, sd, pv in sidesR:
        d0 = dot3(polyI_w, vexpand(sn)) - expand(sd)
        d1 = dot3(polyIn_w, vexpand(sn)) - expand(sd)
        pvb = bexp(pv > 0.5, 1, shapeP)
        denom = d0 - d1
        tc = d0 / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        crossing = jnp.abs(denom) > 1e-12
        t_lo = jnp.where(pvb & crossing & (d0 > 0) & (d1 <= 0),
                         jnp.maximum(t_lo, tc), t_lo)
        t_hi = jnp.where(pvb & crossing & (d0 <= 0) & (d1 > 0),
                         jnp.minimum(t_hi, tc), t_hi)
        empty = empty | (pvb & (d0 > CLIP_EPS) & (d1 > CLIP_EPS))
    edge_ok = (vvalI > 0.5) & ~empty & (t_lo <= t_hi + 1e-9)
    seg = v3sub(polyIn_w, polyI_w)
    pt_lo = v3add(polyI_w, v3scale(seg, t_lo))
    pt_hi = v3add(polyI_w, v3scale(seg, t_hi))
    dep_lo = expand(d_reff) - dot3(pt_lo, vexpand(n_reff))
    dep_hi = expand(d_reff) - dot3(pt_hi, vexpand(n_reff))
    dep_lo = jnp.where(edge_ok, dep_lo, -BIG)
    dep_hi = jnp.where(edge_ok & (t_hi < 1.0 - CLIP_T_EPS), dep_hi, -BIG)

    # set 2: reference verts strictly inside the incident side planes,
    # projected onto the incident face along the contact axis
    inside3 = vvalR > 0.5
    for sn, sd, pv in sidesI:
        dist = dot3(polyR_w, vexpand(sn)) - expand(sd)
        inside3 = inside3 & ((dist <= -CLIP_STRICT)
                             | ~(bexp(pv > 0.5, 1, shapeP)))
    den = dot3(n_incf, axis_inc)                   # ~-1 when faces oppose
    den_ok = jnp.abs(den) > 0.1
    den_s = expand(jnp.where(den_ok, den, 1.0))
    s = (expand(d_incf) - dot3(polyR_w, vexpand(n_incf))) / den_s
    q = v3add(polyR_w, v3scale(vexpand(axis_inc), s))
    dep3 = expand(d_reff) - dot3(q, vexpand(n_reff))
    dep3 = jnp.where(inside3 & bexp(den_ok, 1, shapeP), dep3, -BIG)

    pts = tuple(jnp.concatenate([a, b, c], axis=1)
                for a, b, c in zip(pt_lo, pt_hi, q))
    dep = jnp.concatenate([dep_lo, dep_hi, dep3], axis=1)
    return pts, dep


def _box_face_frame(pos, u, h, outward):
    """Analytic face of a box most aligned with `outward` (vec3 [W,K]):
    returns (n vec3, d, tangent axes a/b vec3, half extents ha/hb, center
    vec3) — all [W,K].  Keeps the box clip path free of face tables."""
    score = [dot3(u[k], outward) for k in range(3)]
    mag = jnp.stack([jnp.abs(sc) for sc in score], axis=1)   # [W,3,K]
    _, oh = extreme_onehot(mag, "max")
    ohf = [jnp.where(oh[:, k], 1.0, 0.0) for k in range(3)]
    sgn = [jnp.where(score[k] >= 0, 1.0, -1.0) for k in range(3)]
    n = tuple(sum(ohf[k] * sgn[k] * u[k][c] for k in range(3))
              for c in range(3))
    hn = sum(ohf[k] * h[k] for k in range(3))
    a = tuple(sum(ohf[k] * u[(k + 1) % 3][c] for k in range(3))
              for c in range(3))
    b = tuple(sum(ohf[k] * u[(k + 2) % 3][c] for k in range(3))
              for c in range(3))
    ha = sum(ohf[k] * h[(k + 1) % 3] for k in range(3))
    hb = sum(ohf[k] * h[(k + 2) % 3] for k in range(3))
    d = dot3(n, pos) + hn
    center = v3add(pos, v3scale(n, hn))
    return n, d, a, b, ha, hb, center


def _box_face_inputs(pos, u, h, outward):
    """Box face as clip inputs: (poly vec3 [W,4,K] loop-ordered, poly_next,
    vval f32 [W,4,K], side planes [(n, d, valid)] x4, n_face, d_face)."""
    n, d, a, b, ha, hb, center = _box_face_frame(pos, u, h, outward)
    corners = []
    for sa, sb in ((1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)):
        corners.append(v3add(center,
                             v3add(v3scale(a, sa * ha), v3scale(b, sb * hb))))
    poly = tuple(jnp.stack([c[i] for c in corners], axis=1) for i in range(3))
    nxt = corners[1:] + corners[:1]
    poly_n = tuple(jnp.stack([c[i] for c in nxt], axis=1) for i in range(3))
    vval = jnp.ones_like(poly[0])
    one = jnp.ones_like(d)
    sides = [(a, dot3(a, pos) + ha, one),
             (v3scale(a, -1.0), -dot3(a, pos) + ha, one),
             (b, dot3(b, pos) + hb, one),
             (v3scale(b, -1.0), -dot3(b, pos) + hb, one)]
    return poly, poly_n, vval, sides, n, d


def pair_contacts(A: Dict[str, Any], B: Dict[str, Any],
                  pair_live: jax.Array,
                  stages: str = "sphere,plane,hull,sat",
                  speculative: float = 0.0) -> Dict[str, Any]:
    """Contacts for compacted pairs; A/B from body_fields, pair_live [W,K].

    speculative > 0 extends contact generation to NEAR-MISS pairs within
    that margin (depth in (-speculative, 0]): the speculative-contact CCD
    scheme (Catto) — the positional pass ignores them (depth <= 0) but the
    velocity pass clamps approach speed to depth/h so fast bodies cannot
    tunnel between substeps.  0 (default) preserves exact legacy gating.

    Same pair-kind semantics as narrowphase.pair_contacts (the dense-grid
    core); manifold = all incident-hull verts with depth masks (P = Vm).
    Output: ok [W,K], normal vec3 tuple [W,K], points vec3 tuple [W,P,K],
    depth [W,P,K], num_points [W,K].

    Structure notes (all perf-motivated, measured at 8192 worlds x 256
    pairs):
      * single-point pair kinds (sphere-*, *-plane point) carry only [W,K]
        slot-0 fields through the merge chain; the [W,P,K] manifold tensors
        exist only for the hull paths and the final assembly — one [W,P,K]
        select instead of one per kind.
      * hull-hull manifold selects the INCIDENT side first (one clip chain
        instead of clipping both hulls).

    stages: comma list subsetting the pair-kind families (profiling aid)."""
    W, K = pair_live.shape
    Vm = A["vmask"].shape[1]
    Fm = A["fmask"].shape[1]
    Em = A["emask"].shape[1]
    stage_set = set(stages.split(","))

    # manifold slot count: hull-plane uses all Vm verts; the hull-hull clip
    # emits 3 candidates per incident-face vertex slot (see
    # _clip_face_manifold).  Selection to MANIFOLD_MAX_POINTS happens once,
    # at the end — cheaper than compacting per branch.
    _tables = A.get("_tables")
    _use_clip = not os.environ.get("GEM_NO_CLIP") and (
        A.get("_all_box")
        or (_tables is not None and "face_side_n" in _tables.om))
    if "sat" in stage_set and _use_clip:
        n_clip = 12 if A.get("_all_box") else \
            3 * _tables.om["face_verts"].shape[2]
    else:
        n_clip = Vm
    P = max(Vm, n_clip)

    def padP(x, fill=0.0):
        """Pad a [W, R, K] manifold-channel array to [W, P, K]."""
        if x.shape[1] == P:
            return x
        return jnp.concatenate(
            [x, jnp.full((W, P - x.shape[1], K), fill, x.dtype)], axis=1)

    zeroK = jnp.zeros((W, K))
    out_ok = falses((W, K))
    out_normal = (zeroK, zeroK, zeroK)
    out_np = jnp.zeros((W, K), jnp.int32)
    # single-point channel (slot 0 only)
    pt0 = (zeroK, zeroK, zeroK)
    dep0 = jnp.full((W, K), -BIG)
    is_single = falses((W, K))
    # multi-point (hull manifold) channel
    zeroPK = jnp.zeros((W, P, K))
    mpts = (zeroPK, zeroPK, zeroPK)
    mdep = jnp.full((W, P, K), -BIG)
    is_multi = falses((W, K))

    def merge1(sel, ok, normal, point, pen, num_points):
        """Merge a single-point pair kind ([W,K] fields only)."""
        nonlocal out_ok, out_normal, out_np, pt0, dep0, is_single, is_multi
        sel = sel & pair_live
        # boolean algebra, not select: Mosaic can't select_n on i1 vectors
        out_ok = (sel & ok) | (out_ok & ~sel)
        out_normal = v3where(sel, normal, out_normal)
        out_np = jnp.where(sel, num_points, out_np)
        pt0 = v3where(sel, point, pt0)
        dep0 = jnp.where(sel, pen, dep0)
        is_single = is_single | sel
        is_multi = is_multi & ~sel

    def mergeP(sel, ok, normal, points, depth, num_points):
        """Merge a multi-point (hull-manifold) pair kind."""
        nonlocal out_ok, out_normal, out_np, mpts, mdep, is_multi, is_single
        sel = sel & pair_live
        selP = bexp(sel, 1, depth.shape)
        out_ok = (sel & ok) | (out_ok & ~sel)
        out_normal = v3where(sel, normal, out_normal)
        out_np = jnp.where(sel, num_points, out_np)
        mpts = v3where(selP, points, mpts)
        mdep = jnp.where(selP, depth, mdep)
        is_multi = is_multi | sel
        is_single = is_single & ~sel

    posA, posB = A["pos"], B["pos"]
    radA, radB = A["radius"], B["radius"]
    ones_np = jnp.ones((W, K), jnp.int32)
    _finish_sat = False

    # ---- sphere-sphere ----------------------------------------------------
    if "sphere" in stage_set:
        d = v3sub(posB, posA)
        dist = norm3(d, 1e-18)
        nrm = v3scale(d, 1.0 / dist)
        pen = (radA + radB) - dist
        mid = v3add(posA, v3scale(nrm, radA - 0.5 * pen))
        merge1(A["is_sphere"] & B["is_sphere"], pen > -speculative, nrm,
               mid, pen, ones_np)

        # ---- sphere-plane (either order) -----------------------------------
        def sphere_plane(s_pos, s_rad, p_n, p_d, flip):
            c_dist = dot3(s_pos, p_n) - p_d
            pen = s_rad - c_dist
            contact = v3sub(s_pos, v3scale(p_n, c_dist))
            nrm_sp = p_n if flip else v3scale(p_n, -1.0)
            return pen > -speculative, nrm_sp, contact, pen

        o1, n1, c1, d1 = sphere_plane(posA, radA, B["plane_n"], B["plane_d"],
                                      False)
        merge1(A["is_sphere"] & B["is_plane"], o1, n1, c1, d1, ones_np)
        o2, n2, c2, d2 = sphere_plane(posB, radB, A["plane_n"], A["plane_d"],
                                      True)
        merge1(A["is_plane"] & B["is_sphere"], o2, n2, c2, d2, ones_np)

    # ---- hull-plane (either order): all verts, depth-masked ---------------
    if "plane" in stage_set:
        def hull_plane(h_verts_w, h_vmask, p_n, p_d, flip):
            vd = dot3(h_verts_w, vexpand(p_n)) - expand(p_d)     # [W,Vm,K]
            pen_v = jnp.where(h_vmask > 0.5, -vd, -BIG)
            num = jnp.sum((pen_v > -speculative).astype(jnp.int32), axis=1)
            nrm_hp = p_n if flip else v3scale(p_n, -1.0)
            return (num > 0, nrm_hp, tuple(padP(c) for c in h_verts_w),
                    padP(pen_v, -BIG), num)

        o3, n3, p3, d3, c3 = hull_plane(A["verts_w"], A["vmask"],
                                        B["plane_n"], B["plane_d"], False)
        mergeP(A["is_hull"] & B["is_plane"], o3, n3, p3, d3, c3)
        o4, n4_, p4, d4, c4 = hull_plane(B["verts_w"], B["vmask"],
                                         A["plane_n"], A["plane_d"], True)
        mergeP(A["is_plane"] & B["is_hull"], o4, n4_, p4, d4, c4)

    # ---- sphere-hull (either order) ---------------------------------------
    if "hull" in stage_set and A.get("_all_box"):
        # analytic sphere-box: clamp the center into the box frame — exact
        # on faces, edges AND corners (the face-plane formulation below is
        # face-exact only), and it keeps the [W,Fm,K] world-space face
        # tables out of the box path entirely
        def sphere_box(s_pos, s_rad, b_pos, b_u, b_h, flip):
            d = v3sub(s_pos, b_pos)
            cl = tuple(dot3(b_u[k], d) for k in range(3))        # local ctr
            q = tuple(jnp.clip(cl[k], -b_h[k], b_h[k]) for k in range(3))
            inside = ((jnp.abs(cl[0]) < b_h[0])
                      & (jnp.abs(cl[1]) < b_h[1])
                      & (jnp.abs(cl[2]) < b_h[2]))
            # outside: push along center-to-closest-point
            q_w = tuple(sum(q[k] * b_u[k][c] for k in range(3))
                        for c in range(3))
            delta = v3sub(d, q_w)
            dist = norm3(delta, 1e-18)
            n_out = v3scale(delta, 1.0 / dist)
            # center inside: push out through the nearest face
            fdist = jnp.stack([b_h[k] - jnp.abs(cl[k]) for k in range(3)],
                              axis=1)                            # [W,3,K]
            _, oh_ax = extreme_onehot(fdist, "min")
            sgn = [jnp.where(cl[k] >= 0, 1.0, -1.0) for k in range(3)]
            n_in = tuple(sum(jnp.where(oh_ax[:, k], sgn[k] * b_u[k][c], 0.0)
                             for k in range(3)) for c in range(3))
            pen_in = s_rad + jnp.min(fdist, axis=1)
            nrm_hs = v3where(inside, n_in, n_out)     # box -> sphere
            pen = jnp.where(inside, pen_in, s_rad - dist)
            contact = tuple(b_pos[c]
                            + sum(q[k] * b_u[k][c] for k in range(3))
                            for c in range(3))
            nrm = nrm_hs if flip else v3scale(nrm_hs, -1.0)
            return pen > -speculative, nrm, contact, pen

        o5, n5, c5, d5 = sphere_box(posA, radA, posB, B["box_u"],
                                    B["box_h"], False)
        merge1(A["is_sphere"] & B["is_hull"], o5, n5, c5, d5, ones_np)
        o6, n6, c6, d6 = sphere_box(posB, radB, posA, A["box_u"],
                                    A["box_h"], True)
        merge1(A["is_hull"] & B["is_sphere"], o6, n6, c6, d6, ones_np)
    elif "hull" in stage_set:
        def sphere_hull(s_pos, s_rad, h_fn_w, h_fd_w, h_fmask, flip):
            cd = dot3(h_fn_w, vexpand(s_pos)) - h_fd_w           # [W,Fm,K]
            cd = jnp.where(h_fmask > 0.5, cd, NEG_BIG)
            fdist, oh_f = extreme_onehot(cd, "max")
            fn = pick_rows(oh_f, h_fn_w)
            pen = s_rad - fdist
            contact = v3sub(s_pos, v3scale(fn, fdist))
            nrm_sh = fn if flip else v3scale(fn, -1.0)
            return pen > -speculative, nrm_sh, contact, pen

        o5, n5, c5, d5 = sphere_hull(posA, radA, B["fnorm_w"], B["face_dw"],
                                     B["fmask"], False)
        merge1(A["is_sphere"] & B["is_hull"], o5, n5, c5, d5, ones_np)
        o6, n6, c6, d6 = sphere_hull(posB, radB, A["fnorm_w"], A["face_dw"],
                                     A["fmask"], True)
        merge1(A["is_hull"] & B["is_sphere"], o6, n6, c6, d6, ones_np)

    # ---- hull-hull SAT -----------------------------------------------------
    if "sat" in stage_set and A.get("_all_box"):
        # analytic OBB fast path: every hull in the object set is a box,
        # so the support loops collapse to Gottschalk's 15 axis tests on
        # the frame-dot matrix — everything [W,K], no [W,ax,V,K] tensors
        both_hull = A["is_hull"] & B["is_hull"] & pair_live
        minA_, minB_, minE_, fA, fB, fE, _obb_extras = _obb_sat(A, B)
        ab = v3sub(posB, posA)
        _finish_sat = True
    elif "sat" in stage_set:
        both_hull = A["is_hull"] & B["is_hull"] & pair_live

        def axis_pen(axes_w, valid):
            """axes_w: vec3 comps [W,ax,K]; supports = masked extrema of
            vert projections (the masked-min-reduction restructuring of the
            reference's support fns).  Returns pen [W,ax,K] (+BIG invalid)."""
            projA = (axes_w[0][:, :, None] * A["verts_w"][0][:, None]
                     + axes_w[1][:, :, None] * A["verts_w"][1][:, None]
                     + axes_w[2][:, :, None] * A["verts_w"][2][:, None])
            projB = (axes_w[0][:, :, None] * B["verts_w"][0][:, None]
                     + axes_w[1][:, :, None] * B["verts_w"][1][:, None]
                     + axes_w[2][:, :, None] * B["verts_w"][2][:, None])
            vmA = jnp.broadcast_to(A["vmask"][:, None], projA.shape) > 0.5
            vmB = jnp.broadcast_to(B["vmask"][:, None], projB.shape) > 0.5
            maxA = jnp.max(jnp.where(vmA, projA, NEG_BIG), axis=2)
            minA = jnp.min(jnp.where(vmA, projA, BIG), axis=2)
            maxB = jnp.max(jnp.where(vmB, projB, NEG_BIG), axis=2)
            minB = jnp.min(jnp.where(vmB, projB, BIG), axis=2)
            pen = jnp.minimum(maxA - minB, maxB - minA)
            return jnp.where(valid, pen, BIG)

        # edge-cross axes built per (i, j) edge-dir pair and stacked along
        # axis 1 — no [W,Em,Em,K] -> [W,Em^2,K] reshape (merging a major dim
        # into the sublane dim forces a TPU relayout; Mosaic rejects it)
        cr_parts, cv_parts = [], []
        for i in range(Em):
            eAi = tuple(c[:, i] for c in A["edir_w"])     # [W,K] comps
            emAi = A["emask"][:, i]
            for j in range(Em):
                eBj = tuple(c[:, j] for c in B["edir_w"])
                cr_parts.append(cross3(eAi, eBj))
                cv_parts.append(emAi * B["emask"][:, j])
        cr = tuple(jnp.stack([p[c] for p in cr_parts], axis=1)
                   for c in range(3))                     # comps [W,Em*Em,K]
        clen = norm3(cr)
        cvalid = (clen > 1e-6) & (jnp.stack(cv_parts, axis=1) > 0.5)
        cr = v3scale(cr, 1.0 / jnp.maximum(clen, 1e-12))

        penA = axis_pen(A["sat_w"], A["smask"] > 0.5)
        penB = axis_pen(B["sat_w"], B["smask"] > 0.5)
        penE = axis_pen(cr, cvalid)

        minA_, ohA_ = extreme_onehot(penA, "min", tie_eps=SAT_TIE_EPS)
        minB_, ohB_ = extreme_onehot(penB, "min", tie_eps=SAT_TIE_EPS)
        minE_, ohE_ = extreme_onehot(penE, "min", tie_eps=SAT_TIE_EPS)

        # winning axes come sign-deduped; orient() below restores the
        # outward direction from the center separation
        fA = pick_rows(ohA_, A["sat_w"])
        fB = pick_rows(ohB_, B["sat_w"])
        fE = pick_rows(ohE_, cr)
        ab = v3sub(posB, posA)
        _finish_sat = True

    if "sat" in stage_set and _finish_sat:
        sat_pen = jnp.minimum(jnp.minimum(minA_, minB_), minE_)
        hit = both_hull & (sat_pen > -speculative) & (sat_pen < BIG * 0.5)

        FACE_BIAS = 1.001
        use_faceA = (minA_ <= jnp.minimum(minB_, minE_) * FACE_BIAS
                     + SAT_TIE_EPS)
        use_faceB = (~use_faceA) & (minB_ <= minE_ * FACE_BIAS + SAT_TIE_EPS)
        use_edge = ~(use_faceA | use_faceB)

        def orient(v):
            sg = jnp.where(dot3(v, ab) >= 0, 1.0, -1.0)
            return v3scale(v, sg)

        sat_normal = v3where(use_faceA, orient(fA),
                             v3where(use_faceB, orient(fB), orient(fE)))

        # manifold: exact incident-face clip against the reference face's
        # side planes (reference narrowphase.cpp manifold generation) —
        # see _clip_face_manifold.  The incident side is selected first,
        # then processed once (one clip instead of two).
        # axis pointing from the reference face INTO the incident hull
        nrm_inc = v3where(use_faceB, v3scale(sat_normal, -1.0), sat_normal)
        ref_pos = v3where(use_faceB, posB, posA)
        inc_pos = v3where(use_faceB, posA, posB)
        ref_rot = tuple(jnp.where(use_faceB, b, a)
                        for a, b in zip(A["rot"], B["rot"]))
        inc_rot = tuple(jnp.where(use_faceB, a, b)
                        for a, b in zip(A["rot"], B["rot"]))
        tables = _tables
        clip_in = None
        if not _use_clip:
            pass                    # AABB-clamp fallback below (ablation /
            #                         object managers without face tables)
        elif A.get("_all_box"):
            # analytic box faces: no face tables needed — axes/extents give
            # the face polygon, side planes, and plane directly
            ref_u = tuple(v3where(use_faceB, ub, ua)
                          for ua, ub in zip(A["box_u"], B["box_u"]))
            inc_u = tuple(v3where(use_faceB, ua, ub)
                          for ua, ub in zip(A["box_u"], B["box_u"]))
            ref_h = tuple(jnp.where(use_faceB, hb, ha)
                          for ha, hb in zip(A["box_h"], B["box_h"]))
            inc_h = tuple(jnp.where(use_faceB, ha, hb)
                          for ha, hb in zip(A["box_h"], B["box_h"]))
            polyI, polyIn, vvalI, sidesI, n_incf, d_incf = _box_face_inputs(
                inc_pos, inc_u, inc_h, v3scale(nrm_inc, -1.0))
            polyR, _, vvalR, sidesR, n_reff, d_reff = _box_face_inputs(
                ref_pos, ref_u, ref_h, nrm_inc)
            clip_in = (polyI, polyIn, vvalI, sidesR, sidesI,
                       polyR, vvalR, n_reff, d_reff, n_incf, d_incf)
        elif tables is not None and "face_side_n" in tables.om:
            # general hulls: per-pair face selection over the precomputed
            # face polygon / side-plane tables (assets.py)
            obj_ref = jnp.where(use_faceB, B["obj"], A["obj"])
            obj_inc = jnp.where(use_faceB, A["obj"], B["obj"])
            ufF = bexp(use_faceB, 1, A["fnorm_w"][0].shape)
            fnormR_w = v3where(ufF, B["fnorm_w"], A["fnorm_w"])
            fnormI_w = v3where(ufF, A["fnorm_w"], B["fnorm_w"])
            fdR_w = jnp.where(ufF, B["face_dw"], A["face_dw"])
            fdI_w = jnp.where(ufF, A["face_dw"], B["face_dw"])
            fmR = jnp.where(ufF, B["fmask"], A["fmask"])
            fmI = jnp.where(ufF, A["fmask"], B["fmask"])
            # reference face: most aligned with the contact axis; incident
            # face: most anti-aligned
            scR = jnp.where(fmR > 0.5, dot3(fnormR_w, vexpand(nrm_inc)),
                            NEG_BIG)
            _, ohR = extreme_onehot(scR, "max")
            scI = jnp.where(fmI > 0.5, dot3(fnormI_w, vexpand(nrm_inc)), BIG)
            _, ohI = extreme_onehot(scI, "min")
            n_reff = pick_rows(ohR, fnormR_w)
            d_reff = pick_rows(ohR, fdR_w)
            n_incf = pick_rows(ohI, fnormI_w)
            d_incf = pick_rows(ohI, fdI_w)
            ohRf = jnp.where(ohR, 1.0, 0.0)
            ohIf = jnp.where(ohI, 1.0, 0.0)
            rqR, peR = tuple(expand(c) for c in ref_rot), vexpand(ref_pos)
            rqI, peI = tuple(expand(c) for c in inc_rot), vexpand(inc_pos)
            polyI = v3add(qrot(rqI, tables.rows2_vec_sel(
                obj_inc, "face_verts", ohIf)), peI)
            polyIn = v3add(qrot(rqI, tables.rows2_vec_sel(
                obj_inc, "face_verts_next", ohIf)), peI)
            vvalI = tables.rows2_scalar_sel(obj_inc, "face_slot_valid", ohIf)
            polyR = v3add(qrot(rqR, tables.rows2_vec_sel(
                obj_ref, "face_verts", ohRf)), peR)
            vvalR = tables.rows2_scalar_sel(obj_ref, "face_slot_valid", ohRf)

            def mk_sides(rot_q, pos_v, n_l, d_l, val):
                out = []
                for p in range(n_l[0].shape[1]):
                    sn_w = qrot(rot_q, tuple(c[:, p] for c in n_l))
                    out.append((sn_w, d_l[:, p] + dot3(sn_w, pos_v),
                                val[:, p]))
                return out

            sidesR = mk_sides(
                ref_rot, ref_pos,
                tables.rows2_vec_sel(obj_ref, "face_side_n", ohRf),
                tables.rows2_scalar_sel(obj_ref, "face_side_d", ohRf), vvalR)
            sidesI = mk_sides(
                inc_rot, inc_pos,
                tables.rows2_vec_sel(obj_inc, "face_side_n", ohIf),
                tables.rows2_scalar_sel(obj_inc, "face_side_d", ohIf), vvalI)
            clip_in = (polyI, polyIn, vvalI, sidesR, sidesI,
                       polyR, vvalR, n_reff, d_reff, n_incf, d_incf)

        if clip_in is not None:
            pts_c, dep_c = _clip_face_manifold(*clip_in, nrm_inc)
            dep_sat = padP(dep_c, -BIG)
            pts_sat = tuple(padP(c) for c in pts_c)
        else:
            # fallback (object managers without face tables): all incident
            # verts, clamped into the reference hull local AABB
            ufB = bexp(use_faceB, 1, A["verts_w"][0].shape)
            verts_inc = v3where(ufB, A["verts_w"], B["verts_w"])
            vmask_inc = jnp.where(ufB, A["vmask"], B["vmask"]) > 0.5
            proj = dot3(verts_inc, vexpand(nrm_inc))
            proj = jnp.where(vmask_inc, proj, BIG)
            pmin = jnp.min(proj, axis=1)
            dep_sat = sat_pen[:, None, :] - (proj - pmin[:, None, :])
            dep_sat = jnp.where(vmask_inc, dep_sat, -BIG)
            ref_lo = v3where(use_faceB, B["lo_l"], A["lo_l"])
            ref_hi = v3where(use_faceB, B["hi_l"], A["hi_l"])
            rq = tuple(expand(c) for c in ref_rot)
            rp = vexpand(ref_pos)
            local = qrot_inv(rq, v3sub(verts_inc, rp))
            local = tuple(jnp.clip(c, expand(lo), expand(hi))
                          for c, lo, hi in zip(local, ref_lo, ref_hi))
            pts_sat = v3add(qrot(rq, local), rp)
            dep_sat = padP(dep_sat, -BIG)
            pts_sat = tuple(padP(c) for c in pts_sat)

        # edge-edge: single contact at the closest point between the
        # supporting edges (reference narrowphase edge contact path) —
        # supporting edge = the full edge whose least-projecting endpoint
        # is maximal along the support direction.
        if A.get("_all_box"):
            # analytic supporting edges: the edge runs along the winning
            # cross axis' per-side direction, positioned at the corner
            # offset whose remaining-axis signs face the other box —
            # keeps the [W, EF, K] edge endpoint tables out of the OBB
            # path entirely (DCE removes their world-space transforms)
            def box_edge(pos, u, h, u_sel, sel_w, n_dir):
                off = (jnp.zeros_like(pos[0]),) * 3
                for k in range(3):
                    sk = jnp.where(dot3(n_dir, u[k]) >= 0, 1.0, -1.0)
                    wk = (1.0 - sel_w[k]) * sk * h[k]
                    off = v3add(off, v3scale(u[k], wk))
                h_sel = sel_w[0] * h[0] + sel_w[1] * h[1] + sel_w[2] * h[2]
                mid = v3add(pos, off)
                arm = v3scale(u_sel, h_sel)
                return v3sub(mid, arm), v3add(mid, arm)

            a0, a1 = box_edge(posA, A["box_u"], A["box_h"],
                              _obb_extras["uA_sel"], _obb_extras["selA_w"],
                              sat_normal)
            b0, b1 = box_edge(posB, B["box_u"], B["box_h"],
                              _obb_extras["uB_sel"], _obb_extras["selB_w"],
                              v3scale(sat_normal, -1.0))
        else:
            def support_edge(F, n_dir):
                p0, p1 = F["edge_p0_w"], F["edge_p1_w"]
                s0 = dot3(p0, vexpand(n_dir))             # [W,EF,K]
                s1 = dot3(p1, vexpand(n_dir))
                score = jnp.where(F["efmask"] > 0.5,
                                  jnp.minimum(s0, s1), NEG_BIG)
                _, oh = extreme_onehot(score, "max")
                return pick_rows(oh, p0), pick_rows(oh, p1)

            a0, a1 = support_edge(A, sat_normal)
            b0, b1 = support_edge(B, v3scale(sat_normal, -1.0))
        # closest points between segments (standard clamped form)
        d1v = v3sub(a1, a0)
        d2v = v3sub(b1, b0)
        rv = v3sub(a0, b0)
        a_ = dot3(d1v, d1v)
        e_ = dot3(d2v, d2v)
        f_ = dot3(d2v, rv)
        c_ = dot3(d1v, rv)
        b_ = dot3(d1v, d2v)
        denom = a_ * e_ - b_ * b_
        s_ = jnp.clip(jnp.where(jnp.abs(denom) > 1e-12,
                                (b_ * f_ - c_ * e_)
                                / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                                0.0), 0.0, 1.0)
        t_ = jnp.clip((b_ * s_ + f_) / jnp.maximum(e_, 1e-12), 0.0, 1.0)
        s_ = jnp.clip((b_ * t_ - c_) / jnp.maximum(a_, 1e-12), 0.0, 1.0)
        cA = v3add(a0, v3scale(d1v, s_))
        cB = v3add(b0, v3scale(d2v, t_))
        edge_pt = v3scale(v3add(cA, cB), 0.5)

        ue = bexp(use_edge, 1, dep_sat.shape)
        slot0 = jnp.broadcast_to(iota1(P, 3, 1), dep_sat.shape) == 0
        dep_sat = jnp.where(
            ue, jnp.where(slot0, sat_pen[:, None, :], -BIG), dep_sat)
        pts_sat = tuple(
            jnp.where(ue, jnp.where(slot0, expand(ec), 0.0), pc)
            for ec, pc in zip(edge_pt, pts_sat))

        num_sat = jnp.sum((dep_sat > 0).astype(jnp.int32), axis=1)
        mergeP(both_hull, hit, sat_normal, pts_sat, dep_sat, num_sat)

    # ---- final assembly: embed the single-point channel in slot 0 ----------
    slot0 = jnp.broadcast_to(iota1(P, 3, 1), mdep.shape) == 0
    sing = bexp(is_single, 1, mdep.shape)
    points = tuple(
        jnp.where(sing, jnp.where(slot0, expand(c0), 0.0), mc)
        for c0, mc in zip(pt0, mpts))
    depth = jnp.where(sing, jnp.where(slot0, expand(dep0), -BIG), mdep)

    # ---- deepest-N manifold compaction --------------------------------------
    # The solver passes cost O(P) per pair; the reference caps manifolds at
    # 4 contact points (its hull clipper emits <= 4).  Keep the deepest 4
    # candidates — identical physics whenever <= 4 points penetrate (the
    # steady-state case), reference-matching behavior when more do.
    if P > MANIFOLD_MAX_POINTS:
        rem = depth
        sel_d, sel_p = [], []
        for _ in range(MANIFOLD_MAX_POINTS):
            dmax, oh = extreme_onehot(rem, "max")
            sel_d.append(dmax)
            sel_p.append(pick_rows(oh, points))
            rem = jnp.where(oh, -BIG, rem)
        depth = jnp.stack(sel_d, axis=1)
        points = tuple(jnp.stack([p[c] for p in sel_p], axis=1)
                       for c in range(3))
        out_np = jnp.minimum(out_np, MANIFOLD_MAX_POINTS)

    return {
        "ok": out_ok,
        "normal": out_normal,
        "points": points,
        "depth": depth,
        "num_points": out_np,
    }


# ---------------------------------------------------------------------------
# Solver passes — math mirrors solver._positional_contact_math /
# _velocity_contact_math (reference physics.cpp:166-461, 716-1009)
# ---------------------------------------------------------------------------


def _gen_inv_mass(r, nrm, im, ii, rot):
    """w = 1/m + (r x n)^T I^-1 (r x n); r/nrm vec3 [W,P,K]; im [W,K];
    ii vec3 [W,K]; rot quat [W,K] (physics.cpp:215-231)."""
    rxn_b = qrot_inv(tuple(expand(c) for c in rot), cross3(r, nrm))
    return expand(im) + (rxn_b[0] ** 2 * expand(ii[0])
                         + rxn_b[1] ** 2 * expand(ii[1])
                         + rxn_b[2] ** 2 * expand(ii[2]))


def _apply_impulse(p, r, im, ii, rot):
    """positional impulse p at offset r -> (dx, dw) vec3 [W,P,K]
    (physics.cpp:247-268)."""
    rq = tuple(expand(c) for c in rot)
    dx = v3scale(p, expand(im))
    rxp_b = qrot_inv(rq, cross3(r, p))
    iie = (expand(ii[0]), expand(ii[1]), expand(ii[2]))
    dw = qrot(rq, vmap3(lambda a, b: a * b, iie, rxp_b))
    return dx, dw


def _side_vecs(g, lo, n):
    """Slice n consecutive channel rows of [W,D,K] into a component tuple."""
    return tuple(g[:, lo + i] for i in range(n))


def positional_pass(sideA, sideB, contacts, relaxation=1.0,
                    max_visible_depth=0.05):
    """Per-pair positional corrections.  sides: dicts with vec3/quat tuples
    (pos/rot/prev_pos) + scalars (im/mu) + vec3 ii.  Returns
    (packA [W,9,K], packB [W,9,K], lam [W,P,K]) — pack = (dx, dw, bias_dx)
    summed over points, zeroed on dead points (safe for segment-sum)."""
    pts = contacts["points"]                 # vec3 [W,P,K]
    depth = contacts["depth"]                # [W,P,K]
    pt_ok = bexp(contacts["ok"], 1, depth.shape) & (depth > 0)

    posA, rotA = sideA["pos"], sideA["rot"]
    posB, rotB = sideB["pos"], sideB["rot"]
    rA = v3sub(pts, vexpand(posA))
    rB = v3sub(pts, vexpand(posB))
    n4 = vexpand(contacts["normal"])         # [W,1,K]

    # world-frame inverse-inertia matrices (one per pair side, shared by
    # the normal + friction directions and all 4 points — replaces every
    # quaternion rotate-scale-rotate chain; see _sym_from_quat_ii)
    MA = tuple(expand(c) for c in _sym_from_quat_ii(rotA, sideA["ii"]))
    MB = tuple(expand(c) for c in _sym_from_quat_ii(rotB, sideB["ii"]))
    imA4, imB4 = expand(sideA["im"]), expand(sideB["im"])
    imsum = imA4 + imB4

    cA = cross3(rA, n4)
    cB = cross3(rB, n4)
    uA = _sym_mv(MA, cA)                     # d-omega response per unit
    uB = _sym_mv(MB, cB)                     # impulse along n
    wsum = imsum + dot3(cA, uA) + dot3(cB, uB)
    depth_vis = jnp.minimum(depth, max_visible_depth)
    ok_w = pt_ok & (wsum > 1e-12)
    inv_w = 1.0 / jnp.maximum(wsum, 1e-12)
    dlam = jnp.where(ok_w, depth * inv_w, 0.0) * relaxation
    dlam_vis = jnp.where(ok_w, depth_vis * inv_w, 0.0) * relaxation
    bias_frac = jnp.where(dlam > 1e-12,
                          (dlam - dlam_vis) / jnp.maximum(dlam, 1e-12), 0.0)
    # impulse -dlam*n on A, +dlam*n on B:
    # dx = im * p ; dw = M (r x p) = -/+ dlam * u
    dxA = v3scale(n4, -dlam * imA4)
    dwA = v3scale(uA, -dlam)
    dxB = v3scale(n4, dlam * imB4)
    dwB = v3scale(uB, dlam)

    # static friction (physics.cpp:369-441)
    drift = vexpand(v3sub(v3sub(posB, sideB["prev_pos"]),
                          v3sub(posA, sideA["prev_pos"])))
    tang = v3sub(drift, v3scale(n4, dot3(drift, n4)))
    tlen = norm3(tang)
    that = v3scale(tang, 1.0 / jnp.maximum(tlen, 1e-12))
    tA = cross3(rA, that)
    tB = cross3(rB, that)
    uA_t = _sym_mv(MA, tA)
    uB_t = _sym_mv(MB, tB)
    wsum_t = imsum + dot3(tA, uA_t) + dot3(tB, uB_t)
    mu_pair = (0.5 * (sideA["mu"] + sideB["mu"]))[:, None, :]
    dlam_t = jnp.where(
        pt_ok & (wsum_t > 1e-12) & (tlen < mu_pair * dlam),
        tlen / jnp.maximum(wsum_t, 1e-12), 0.0) * relaxation
    # impulse +dlam_t*that on A, -dlam_t*that on B
    dxA = v3add(dxA, v3scale(that, dlam_t * imA4))
    dwA = v3add(dwA, v3scale(uA_t, dlam_t))
    dxB = v3add(dxB, v3scale(that, -dlam_t * imB4))
    dwB = v3add(dwB, v3scale(uB_t, -dlam_t))

    def pack(dx, dw):
        def s(c):
            return jnp.sum(jnp.where(pt_ok, c, 0.0), axis=1)

        return jnp.stack(
            [s(dx[0]), s(dx[1]), s(dx[2]),
             s(dw[0]), s(dw[1]), s(dw[2]),
             s(dx[0] * bias_frac), s(dx[1] * bias_frac),
             s(dx[2] * bias_frac)], axis=1)     # [W,9,K]

    return pack(dxA, dwA), pack(dxB, dwB), jnp.where(pt_ok, dlam, 0.0)


def cache_contacts(contacts, PA, PB):
    """Body-frame contact cache for once-per-step narrowphase
    (contact_refresh mode): anchors + normal stored in each body's local
    frame at narrowphase time, so later substeps can refresh world-space
    points/depths by transform only (~10^2 VPU ops vs the ~10^4 of a full
    SAT + clip rebuild).  The standard engine trade (one collision
    detection per frame, solver iterations reuse the manifold); accuracy
    is bounded by per-substep motion, which the speculative margin and
    depth re-projection absorb."""
    pts = contacts["points"]                             # vec3 [W,P,K]
    qAc = (PA["rot"][0], *(jnp.negative(c) for c in PA["rot"][1:]))
    qBc = (PB["rot"][0], *(jnp.negative(c) for c in PB["rot"][1:]))
    qAc4 = tuple(expand(c) for c in qAc)
    qBc4 = tuple(expand(c) for c in qBc)
    rA = qrot(qAc4, v3sub(pts, vexpand(PA["pos"])))
    rB = qrot(qBc4, v3sub(pts, vexpand(PB["pos"])))
    n_loc = qrot(qAc, contacts["normal"])
    return {
        "ok": contacts["ok"],
        "num_points": contacts["num_points"],
        "depth0": contacts["depth"],
        "rA": rA, "rB": rB, "n_loc": n_loc,
    }


def refresh_contacts(cache, PA, PB):
    """Refresh a cache_contacts() manifold at the CURRENT pair poses:
    world points from body-frame anchors, normal rotated with body A,
    depth re-projected along the normal (separation along n reduces
    penetration; the anchors coincide at cache time, so the projection of
    their divergence is exactly the depth change)."""
    qA4 = tuple(expand(c) for c in PA["rot"])
    qB4 = tuple(expand(c) for c in PB["rot"])
    pA = v3add(vexpand(PA["pos"]), qrot(qA4, cache["rA"]))
    pB = v3add(vexpand(PB["pos"]), qrot(qB4, cache["rB"]))
    n = qrot(PA["rot"], cache["n_loc"])
    n4 = vexpand(n)
    depth = cache["depth0"] - dot3(n4, v3sub(pB, pA))
    pts = v3scale(v3add(pA, pB), 0.5)
    return {"ok": cache["ok"], "normal": n, "points": pts,
            "depth": depth, "num_points": cache["num_points"]}


def _sym_from_quat_ii(rot, ii):
    """World-frame inverse-inertia matrix M = R diag(ii) R^T from a quat
    tuple (w,x,y,z) and body-frame diagonal ii — symmetric, returned as
    (m00, m01, m02, m11, m12, m22).  One M per pair side replaces every
    qrot/qrot_inv chain in the velocity solve (M v costs 9 mults vs ~56
    for rotate-scale-rotate)."""
    qw, qx, qy, qz = rot
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    # rotation matrix columns R[:,k] (rotation of e_k)
    r00 = 1.0 - 2.0 * (yy + zz)
    r10 = 2.0 * (xy + wz)
    r20 = 2.0 * (xz - wy)
    r01 = 2.0 * (xy - wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r21 = 2.0 * (yz + wx)
    r02 = 2.0 * (xz + wy)
    r12 = 2.0 * (yz - wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    i0, i1, i2 = ii
    # M_ab = sum_k ii_k R_ak R_bk
    return (i0 * r00 * r00 + i1 * r01 * r01 + i2 * r02 * r02,
            i0 * r00 * r10 + i1 * r01 * r11 + i2 * r02 * r12,
            i0 * r00 * r20 + i1 * r01 * r21 + i2 * r02 * r22,
            i0 * r10 * r10 + i1 * r11 * r11 + i2 * r12 * r12,
            i0 * r10 * r20 + i1 * r11 * r21 + i2 * r12 * r22,
            i0 * r20 * r20 + i1 * r21 * r21 + i2 * r22 * r22)


def _sym_mv(M, v):
    m00, m01, m02, m11, m12, m22 = M
    return (m00 * v[0] + m01 * v[1] + m02 * v[2],
            m01 * v[0] + m11 * v[1] + m12 * v[2],
            m02 * v[0] + m12 * v[1] + m22 * v[2])


def velocity_pass(sideA, sideB, contacts, lambda_n, h, restitution_threshold,
                  speculative: float = 0.0):
    """Per-pair velocity corrections: the reference's solveVelocitiesForContact
    (physics.cpp:716-1009) reproduced within each manifold — two sequential
    restitution iterations over the (up to 4) contact points, then a
    sequential dynamic-friction pass, each point seeing the velocity state
    left by the previous one.  Sequential application is what damps
    asymmetric manifolds (a cube rocking on an edge: the closing corner is
    killed individually) AND what delivers full restitution on symmetric
    flat impacts (a Jacobi per-point mean under-applies ~1/4 when the four
    corner torques cancel).  Only the accumulation ACROSS pairs remains
    Jacobi (the lockstep-batch constraint); within a pair this matches the
    reference algorithm (fp reassociation only), so single-contact
    scenarios (cube on plane) match the reference binary's velocity
    semantics (gated by the cube_rock / cube_bounce goldens).

    Formulation (the kernel-hot restructuring of the naive loop): point
    velocities are LINEAR in the applied impulses, so the normal-direction
    restitution solve collapses to the 4x4 effective-mass (Schur) matrix
    K_ij = 1/mA + 1/mB + (rA_i x n) . MA (rA_j x n)
                       + (rB_i x n) . MB (rB_j x n)
    with MA/MB the world-frame inverse-inertia matrices; the sequential
    per-point impulses become a scalar Gauss-Seidel sweep over vn with
    rows of K (6 FMA-ops per point-update instead of a quaternion-chain
    apply), and the velocity deltas assemble once at the end from the
    accumulated lambdas.  Friction keeps the true sequential dependence
    (its direction renormalizes per point) but runs on MA/MB instead of
    rotate-scale-rotate chains.

    sides carry v/w vec3 tuples [W,K] (post-position-solve velocities);
    for restitution also pv/pw (pre-substep, i.e. post-integrate,
    velocities — the reference's PreSolveVelocity, physics.cpp:162-163)
    and rest (per-body restitution coefficient [W,K]).  h [W] or [W,1].
    Returns (packA [W,6,K], packB [W,6,K]) — velocity DELTAS per pair side.

    Restitution semantics (physics.cpp:825-867, translated to this
    framework's normal convention n: A->B, rel = vB - vA): e = pair
    coefficient when |vn_bar| > threshold (2*|g|*h) else 0; per-point
    target vn -> max(-e * vn_bar_i, 0), applied BILATERALLY (the
    reference also removes excess separating velocity; within the
    sequential sweep this is self-correcting).  Friction delta-v
    magnitude min(mu_d*|lambda_i|/h, |vt|) over the generalized mass —
    NOT the summed-per-point form (which over-applies up to 4x on flat
    manifolds).

    speculative > 0: near-miss contacts (depth <= 0, produced by
    pair_contacts with the same margin) get the speculative-CCD velocity
    clamp vn >= depth/h instead of the contact constraint.

    NOTE there is deliberately no relaxation parameter: the reference
    velocity pass applies impulses unrelaxed (physics.cpp:716-1009);
    relaxation affects only the positional pass."""
    pts = contacts["points"]
    pt_ok = bexp(contacts["ok"], 1, contacts["depth"].shape) & (
        contacts["depth"] > 0)
    n2 = contacts["normal"]                  # per-pair normal [W,K]

    posA, rotA = sideA["pos"], sideA["rot"]
    posB, rotB = sideB["pos"], sideB["rot"]
    imA, imB = sideA["im"], sideB["im"]
    mu2 = 0.5 * (sideA["mu"] + sideB["mu"])  # [W,K]
    h2 = jnp.reshape(h, h.shape[:1] + (1,) * (mu2.ndim - 1))
    imsum = imA + imB

    MA = _sym_from_quat_ii(rotA, sideA["ii"])
    MB = _sym_from_quat_ii(rotB, sideB["ii"])

    P = contacts["depth"].shape[1]
    # Dead-point discipline: inputs are FINITE (gathers read real body
    # columns), so dead-point garbage flows harmlessly through the K
    # matrix and u vectors — every impulse scalar is gated by okf at its
    # source (d and s below), and 0 * finite == 0.  No per-vector masking.
    rAs, rBs, okfs = [], [], []
    cAs, cBs, uAs, uBs = [], [], [], []
    for i in range(P):
        p_i = tuple(c[:, i] for c in pts)
        rA = v3sub(p_i, posA)
        rB = v3sub(p_i, posB)
        okf = pt_ok[:, i].astype(jnp.float32)
        cA = cross3(rA, n2)
        cB = cross3(rB, n2)
        rAs.append(rA)
        rBs.append(rB)
        okfs.append(okf)
        cAs.append(cA)
        cBs.append(cB)
        uAs.append(_sym_mv(MA, cA))
        uBs.append(_sym_mv(MB, cB))

    def pvel(v, w, r):
        return v3add(v, cross3(w, r))

    # effective-mass matrix rows (symmetric; dead-point rows/cols carry
    # garbage — only ever multiplied by okf-gated deltas)
    K = [[None] * P for _ in range(P)]
    for i in range(P):
        for j in range(i, P):
            kij = imsum + dot3(cAs[i], uAs[j]) + dot3(cBs[i], uBs[j])
            K[i][j] = kij
            K[j][i] = kij
    # okf folded into the inverse diagonal: d = (t - vn) * invKii_ok is
    # the whole per-point gate
    invKii_ok = [okfs[i] / jnp.maximum(K[i][i], 1e-12) for i in range(P)]

    # vn + vn_bar + e per point from the incoming velocities
    vA0, wA0 = sideA["v"], sideA["w"]
    vB0, wB0 = sideB["v"], sideB["w"]
    vns = [dot3(v3sub(pvel(vB0, wB0, rBs[i]), pvel(vA0, wA0, rAs[i])), n2)
           for i in range(P)]
    bounce = "pv" in sideA and "rest" in sideA
    if bounce:
        rest2 = jnp.reshape(restitution_threshold,
                            restitution_threshold.shape[:1]
                            + (1,) * (mu2.ndim - 1))
        e_pair = 0.5 * (sideA["rest"] + sideB["rest"])
        targets = []
        for i in range(P):
            vb = dot3(v3sub(pvel(sideB["pv"], sideB["pw"], rBs[i]),
                            pvel(sideA["pv"], sideA["pw"], rAs[i])), n2)
            e = jnp.where(jnp.abs(vb) <= rest2, 0.0, e_pair)
            targets.append(jnp.maximum(-e * vb, 0.0))
    else:
        targets = [jnp.zeros_like(mu2)] * P

    # perf-attribution ablations (wrong results; GEM_TPU_VEL_ABLATE=
    # norest,nofric) — mirrors substep_kernel's GEM_TPU_SUBSTEP_ABLATE
    import os as _os
    _abl = set(filter(None, _os.environ.get(
        "GEM_TPU_VEL_ABLATE", "").split(",")))

    # ---- restitution: 2 Gauss-Seidel sweeps in CLOSED FORM --------------
    # (reference restitution_iters loop, physics.cpp:953-966).  The sweep
    # has no projection/clamp, so two GS sweeps are a LINEAR operator on
    # the residual b = target - vn0: with A = diag(okf_i / K_ii) and L the
    # strictly-lower part of K, one sweep from zero is d1 = M b with
    # M = (I + A L)^{-1} A, and the second is d2 = M (b - K d1).  (I+AL)
    # is unit lower triangular, so its inverse is the exact nilpotent
    # series I - G + G^2 - G^3 (G = A L) — every M entry is a short
    # product computable in PARALLEL.  This replaces the 2 x P sequential
    # point-update chains (measured dependency-latency bound at ~12
    # cycles/op, 5.2 ms of the 43.9 ms step at 8192x64) with a
    # constant-depth evaluation; identical math, fp reassociation only
    # (gated by the cube_rock / cube_bounce reference-binary goldens).
    lams = [jnp.zeros_like(mu2) for _ in range(P)]
    if "norest" not in _abl:
        b = [targets[i] - vns[i] for i in range(P)]
        A = invKii_ok
        # G = A L entries (strictly lower); K is symmetric
        G = {}
        for i in range(1, P):
            for j in range(i):
                G[(i, j)] = A[i] * K[i][j]
        # M = (I - G + G^2 - G^3) A, lower triangular
        M = [[None] * P for _ in range(P)]
        for i in range(P):
            M[i][i] = A[i]
        if P > 1:
            M[1][0] = -G[(1, 0)] * A[0]
        if P > 2:
            M[2][0] = (-G[(2, 0)] + G[(2, 1)] * G[(1, 0)]) * A[0]
            M[2][1] = -G[(2, 1)] * A[1]
        if P > 3:
            M[3][0] = (-G[(3, 0)] + G[(3, 1)] * G[(1, 0)]
                       + G[(3, 2)] * G[(2, 0)]
                       - G[(3, 2)] * G[(2, 1)] * G[(1, 0)]) * A[0]
            M[3][1] = (-G[(3, 1)] + G[(3, 2)] * G[(2, 1)]) * A[1]
            M[3][2] = -G[(3, 2)] * A[2]
        assert P <= 4, "closed-form GS restitution assumes <= 4 points"

        def mvec_lower(x):
            return [sum(M[i][j] * x[j] for j in range(i + 1))
                    for i in range(P)]

        d1 = mvec_lower(b)
        r = [b[i] - sum(K[i][j] * d1[j] for j in range(P))
             for i in range(P)]
        d2 = mvec_lower(r)
        lams = [d1[i] + d2[i] for i in range(P)]

    # assemble the restitution velocity state for the friction pass:
    # dv = -/+ n * im * sum(lam); dw = -/+ sum(lam_i * u_i)
    lam_sum = lams[0]
    swA = v3scale(uAs[0], lams[0])
    swB = v3scale(uBs[0], lams[0])
    for i in range(1, P):
        lam_sum = lam_sum + lams[i]
        swA = v3add(swA, v3scale(uAs[i], lams[i]))
        swB = v3add(swB, v3scale(uBs[i], lams[i]))
    vA = v3sub(vA0, v3scale(n2, imA * lam_sum))
    wA = v3sub(wA0, swA)
    vB = v3add(vB0, v3scale(n2, imB * lam_sum))
    wB = v3add(wB0, swB)

    # ---- dynamic friction: one sequential pass -------------------------
    # (reference applyFrictionVelocityUpdate, physics.cpp:755-817)
    mu_h = mu2 / h2
    dyn_mags = [mu_h * jnp.abs(lambda_n[:, i]) for i in range(P)]
    for i in range(0 if "nofric" in _abl else P):
        vpt = v3sub(pvel(vB, wB, rBs[i]), pvel(vA, wA, rAs[i]))
        vn = dot3(vpt, n2)
        vt = v3sub(vpt, v3scale(n2, vn))
        # that unnormalized: fold 1/|vt| into the impulse scalar instead
        # (one rsqrt, no vector normalize)
        vt2 = dot3(vt, vt)
        inv_len = jax.lax.rsqrt(jnp.maximum(vt2, 1e-24))
        vt_len = vt2 * inv_len
        dyn_mag = dyn_mags[i]
        tA = cross3(rAs[i], vt)
        tB = cross3(rBs[i], vt)
        uA = _sym_mv(MA, tA)
        uB = _sym_mv(MB, tB)
        # generalized mass along vt_hat: the cross/dot terms carry |vt|^2
        wsum = jnp.maximum(
            imsum + (dot3(tA, uA) + dot3(tB, uB)) * inv_len * inv_len,
            1e-12)
        s = jnp.minimum(dyn_mag, vt_len) / wsum * inv_len
        s = jnp.where((vt_len > 1e-9) & (dyn_mag > 0), s, 0.0) * okfs[i]
        # impulse -s*vt at point i: dvA = +s*vt*imA, dwA = +s*uA/|vt|...
        # all folded: uA here is MA (rA x vt), so dwA = s * uA exactly
        vA = v3add(vA, v3scale(vt, s * imA))
        wA = v3add(wA, v3scale(uA, s))
        vB = v3sub(vB, v3scale(vt, s * imB))
        wB = v3sub(wB, v3scale(uB, s))

    # ---- speculative near-miss clamp (depth <= 0): per-point Jacobi ----
    if speculative > 0:
        dep = contacts["depth"]
        okexp = bexp(contacts["ok"], 1, dep.shape)
        h3 = jnp.reshape(h, h.shape[:1] + (1, 1))
        simp_scal = []
        s_oks = []
        for i in range(P):
            vn4 = dot3(v3sub(pvel(vB0, wB0, rBs[i]),
                             pvel(vA0, wA0, rAs[i])), n2)
            # cA/uA above are zeroed on non-pt_ok points; speculative
            # points are exactly those (depth <= 0) -> fresh arms here
            cA_s = cross3(rAs[i], n2)
            cB_s = cross3(rBs[i], n2)
            uA_s = _sym_mv(MA, cA_s)
            uB_s = _sym_mv(MB, cB_s)
            wsum_n = jnp.maximum(imsum + dot3(cA_s, uA_s)
                                 + dot3(cB_s, uB_s), 1e-12)
            dv_spec = dep[:, i] / h3[:, 0] - vn4
            s_ok = okexp[:, i] & (dep[:, i] <= 0) & (dv_spec > 0)
            simp_scal.append(jnp.where(s_ok, dv_spec / wsum_n, 0.0))
            s_oks.append(s_ok)
        npts_s = sum(s.astype(jnp.float32) for s in s_oks)
        inv_npts = 1.0 / jnp.maximum(npts_s, 1.0)
        stot = jnp.zeros_like(mu2)
        twA = (jnp.zeros_like(mu2),) * 3
        twB = (jnp.zeros_like(mu2),) * 3
        for i in range(P):
            si = simp_scal[i] * inv_npts
            stot = stot + si
            cA_s = cross3(rAs[i], n2)
            cB_s = cross3(rBs[i], n2)
            twA = v3add(twA, v3scale(_sym_mv(MA, cA_s), si))
            twB = v3add(twB, v3scale(_sym_mv(MB, cB_s), si))
        vA = v3sub(vA, v3scale(n2, imA * stot))
        wA = v3sub(wA, twA)
        vB = v3add(vB, v3scale(n2, imB * stot))
        wB = v3add(wB, twB)

    dvA = v3sub(vA, vA0)
    dwA_t = v3sub(wA, wA0)
    dvB = v3sub(vB, vB0)
    dwB_t = v3sub(wB, wB0)
    packA = jnp.stack([dvA[0], dvA[1], dvA[2],
                       dwA_t[0], dwA_t[1], dwA_t[2]], axis=1)  # [W,6,K]
    packB = jnp.stack([dvB[0], dvB[1], dvB[2],
                       dwB_t[0], dwB_t[1], dwB_t[2]], axis=1)
    return packA, packB


def aabb_overlap(loA, hiA, loB, hiB):
    """vec3 tuples [W,K] -> [W,K] overlap."""
    ok = trues(loA[0].shape)
    for c in range(3):
        ok = ok & (loA[c] <= hiB[c]) & (hiA[c] >= loB[c])
    return ok
