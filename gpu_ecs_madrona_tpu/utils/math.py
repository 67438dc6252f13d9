"""Batched math helpers: quaternions, rigid transforms, AABBs.

Functional counterparts of reference include/madrona/math.hpp (Vector3,
Quat, Mat3x4, AABB) designed for batched jax arrays: every function
broadcasts over arbitrary leading axes, so the same code serves one row or
[worlds, rows] blocks.  Quaternions are stored (w, x, y, z) matching the
reference's field order (math.hpp Quat{w,x,y,z}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU MXU hazard (measured on v5e, 2026-08): f32 dot/einsum under the
# DEFAULT matmul precision run ONE bf16 pass per operand — each operand is
# rounded to 8 mantissa bits before the systolic array.  That is fatal for
# exact-cancellation math (Gram-form d2 = |xi|^2+|xj|^2-2<xi,xj> computed
# ±0.4% of |x|^2 goes NEGATIVE for close pairs, and rsqrt(clamp) then
# yields 1e15 pushes — the collisions XLA path literally exploded to NaN
# in two steps) and silently truncates one-hot gathers/segment-sums of f32
# simulation state.  CPU backends compute f32 exactly, so CPU tests cannot
# catch it.  Every f32 matmul whose RESULT feeds simulation state must pass
# precision=EXACT (HIGHEST = enough bf16 passes for full f32); one-hot
# operands are bf16-exact and may stay DEFAULT via a (lhs, rhs) tuple.
EXACT = jax.lax.Precision.HIGHEST
DEFAULT_P = jax.lax.Precision.DEFAULT


# -- quaternions -------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(shape) + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_from_angle_axis(angle, axis):
    """reference Quat::angleAxis (math.hpp)."""
    angle = jnp.asarray(angle, jnp.float32)
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)

def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4]
    (reference Quat::rotateVec)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_inv_rotate(q, v):
    qc = jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)
    return quat_rotate(qc, v)


def quat_to_mat(q):
    """Rotation matrix [..., 3, 3] from quaternions [..., 4] (wxyz)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
    ], axis=-2)


def quat_normalize(q):
    # eps floor: all-zero quats (e.g. dead masked rows) must not produce
    # NaN — 0 * NaN poisons masked arithmetic downstream
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_integrate(q, omega, dt):
    """Integrate angular velocity omega [...,3] over dt (XPBD-style,
    reference physics.cpp substepRigidBodies)."""
    dq = 0.5 * quat_mul(
        jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1), q
    )
    return quat_normalize(q + dt * dq)


# -- transforms --------------------------------------------------------------


def transform_points(translation, rotation, points, scale=None):
    """Apply TRS to points [..., N, 3] (reference Mat3x4::fromTRS +
    txfmPoint, math.hpp)."""
    p = points
    if scale is not None:
        p = p * scale[..., None, :]
    p = quat_rotate(rotation[..., None, :], p)
    return p + translation[..., None, :]


# -- AABBs -------------------------------------------------------------------


def aabb_invalid(shape=(), dtype=jnp.float32):
    """reference AABB::invalid() — inverted infinite box."""
    lo = jnp.full(tuple(shape) + (3,), jnp.inf, dtype)
    hi = jnp.full(tuple(shape) + (3,), -jnp.inf, dtype)
    return lo, hi


def aabb_from_points(points):
    """AABB of points [..., N, 3] -> (pmin [...,3], pmax [...,3])."""
    return jnp.min(points, axis=-2), jnp.max(points, axis=-2)


def aabb_overlaps(a_lo, a_hi, b_lo, b_hi):
    """reference AABB::overlaps (math.hpp): strict-inequality slab test."""
    return jnp.all((a_lo <= b_hi) & (b_lo <= a_hi), axis=-1)


def aabb_expand(lo, hi, amount):
    return lo - amount, hi + amount


def aabb_union(a_lo, a_hi, b_lo, b_hi):
    return jnp.minimum(a_lo, b_lo), jnp.maximum(a_hi, b_hi)


UNIT_CUBE_CORNERS = jnp.array(
    [
        [-1.0, -1.0, -1.0],
        [1.0, -1.0, -1.0],
        [1.0, 1.0, -1.0],
        [-1.0, 1.0, -1.0],
        [-1.0, -1.0, 1.0],
        [1.0, -1.0, 1.0],
        [1.0, 1.0, 1.0],
        [-1.0, 1.0, 1.0],
    ],
    dtype=jnp.float32,
)


def mask_cumsum_last(mask, dtype=jnp.int32):
    """Inclusive cumsum of a 0/1 mask along the LAST axis, as a triangular
    matmul on the MXU.

    ``jnp.cumsum`` lowers to reduce_window on TPU — O(n) VPU work per
    element (666 us/step for [1024,100,100] in simple_jobs' broadphase).
    ``mask @ T`` with T[b,k] = (b <= k) is one [.., n] x [n, n] dot: the
    MXU does it in ~1% of that.  Operands are bf16 (0/1 is exact) with
    f32 accumulation — exact for any n < 2^24.  Only valid for 0/1
    inputs (bool or {0,1} ints).
    """
    import jax as _jax

    n = mask.shape[-1]
    tri = (
        jnp.arange(n, dtype=jnp.int32)[:, None]
        <= jnp.arange(n, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    y = _jax.lax.dot_general(
        mask.astype(jnp.bfloat16), tri,
        dimension_numbers=(((mask.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(dtype)
