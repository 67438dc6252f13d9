"""XPBD rigid-body solver — batched, Jacobi-accumulated.

TPU redesign of the reference's substep solver (src/physics/physics.cpp):
  - substepRigidBodies (physics.cpp:79-164): semi-implicit integration with
    gyroscopic term, previous-state stash.
  - solvePositions (physics.cpp:166-461): per-contact positional lambdas
    with generalized inverse mass + static-friction drift correction; joint
    constraints (physics.cpp:560-648).
  - setVelocities (physics.cpp:673-714): finite-difference velocity
    recovery.
  - solveVelocities (physics.cpp:716-1009): dynamic friction + restitution
    with threshold 2*|g|*h (physics.cpp:31).

The reference applies corrections serially per contact (Gauss-Seidel); a
lockstep batch cannot.  Corrections here are accumulated Jacobi-style.  The
per-contact impulse math lives in leading-shape-generic cores
(`_positional_contact_math`, `_velocity_contact_math`) shared by two
accumulation drivers:

  * dense grid [W, n, n]: per-body sums are reductions along the two grid
    axes (body i collects row i as ref and column i as other) — zero
    gathers/scatters.  Right for small body counts.
  * compacted pairs [W, K]: physics/pairs.py — the same math restructured
    pair-major (K-minor layouts), with one-hot matmul segment sums as the
    scatter-add replacement.  Right at scale, where the n^2 grid would
    dominate.

An optional relaxation factor damps the Jacobi iteration (standard
XPBD-on-GPU practice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.utils import math as m


def integrate(pos, rot, vel_lin, vel_ang, inv_mass, inv_inertia, ext_f,
              ext_t, response_dynamic, h, gravity):
    """Semi-implicit Euler substep (reference substepRigidBodies,
    physics.cpp:79-164).  Returns new (pos, rot, vel_lin, vel_ang) plus the
    prev stash.  All args lead with [W, n]."""
    prev_pos, prev_rot = pos, rot

    h = jnp.reshape(h, (h.shape[0], 1, 1))
    dyn = response_dynamic & (inv_mass > 0)
    v = vel_lin + h * (gravity[..., None, :] + ext_f * inv_mass[..., None])
    v = jnp.where(dyn[..., None], v, vel_lin)
    new_pos = pos + h * v
    new_pos = jnp.where(dyn[..., None], new_pos, pos)

    # angular: omega += h * invI * (tau - omega x (I omega)) (gyroscopic)
    inertia = jnp.where(inv_inertia > 0, 1.0 / jnp.maximum(inv_inertia, 1e-12), 0.0)
    # body-frame omega for the diagonal inertia product
    omega_b = m.quat_inv_rotate(rot, vel_ang)
    gyro_b = jnp.cross(omega_b, inertia * omega_b)
    tau_b = m.quat_inv_rotate(rot, ext_t)
    omega_b = omega_b + h * inv_inertia * (tau_b - gyro_b)
    w = m.quat_rotate(rot, omega_b)
    w = jnp.where(dyn[..., None], w, vel_ang)
    new_rot = m.quat_integrate(rot, w, h)
    new_rot = jnp.where(dyn[..., None], new_rot, rot)

    return new_pos, new_rot, v, w, prev_pos, prev_rot


def _generalized_inv_mass(r, nrm, inv_mass, inv_inertia, rot):
    """w = 1/m + (r x n)^T I^-1 (r x n) (reference physics.cpp:215-231).
    r, nrm [..., 3]; inv_mass [...], inv_inertia [..., 3] diagonal in the
    body frame; rot [..., 4]."""
    rxn = jnp.cross(r, nrm)
    rxn_b = m.quat_inv_rotate(rot, rxn)
    return inv_mass + jnp.sum(rxn_b * inv_inertia * rxn_b, axis=-1)


def _apply_impulse_terms(p, r, inv_mass, inv_inertia, rot):
    """Positional impulse p at offset r -> (dx [...,3], dq-omega [...,3]).
    dx = p/m ; rotation update vector = I^-1 (r x p) (physics.cpp:247-268)."""
    dx = p * inv_mass[..., None]
    rxp_b = m.quat_inv_rotate(rot, jnp.cross(r, p))
    dw = m.quat_rotate(rot, inv_inertia * rxp_b)
    return dx, dw


def _positional_contact_math(posA, rotA, imA, iiA, muA, prevA,
                             posB, rotB, imB, iiB, muB, prevB,
                             contacts, relaxation=1.0,
                             max_visible_depth=0.05):
    """Per-contact positional impulse math (reference solvePositions,
    physics.cpp:166-461), leading-shape generic.

    Per-side args have leading *L (the pair shape): pos [*L,3], rot [*L,4],
    im [*L], ii [*L,3], mu [*L], prev pos [*L,3].  contacts: dict with
    leading *L (ok/normal/points/depth/num_points; normal points A->B).

    Contact depths are solved with zero compliance; static friction corrects
    tangential drift of the contact point relative to the prev-state
    positions, clamped by mu_s (physics.cpp:369-441).  Corrections deeper
    than max_visible_depth are flagged as position *bias* — applied to the
    body but excluded from finite-difference velocity recovery — so deep
    depenetration does not convert into kinetic energy (the ejection
    failure mode of plain XPBD; cf. PhysX maxDepenetrationVelocity).

    Returns (dxA, dwA, dxB, dwB [*L,4,3] per-point corrections — already
    masked to zero on dead points, dlam [*L,4], bias_frac [*L,4],
    pt_ok [*L,4]).
    """
    ok = contacts["ok"]
    nrm = contacts["normal"]                      # A -> B
    pts = contacts["points"]                      # [*L,4,3]
    depth = contacts["depth"]                     # [*L,4]
    pt_ok = ok[..., None] & (depth > 0) & (
        jnp.arange(4) < contacts["num_points"][..., None]
    )

    imA4, imB4 = imA[..., None], imB[..., None]                 # [*L,1]
    iiA4, iiB4 = iiA[..., None, :], iiB[..., None, :]           # [*L,1,3]
    rotA4, rotB4 = rotA[..., None, :], rotB[..., None, :]

    rA = pts - posA[..., None, :]                 # [*L,4,3]
    rB = pts - posB[..., None, :]
    n4 = jnp.broadcast_to(nrm[..., None, :], rA.shape)

    wA = _generalized_inv_mass(rA, n4, imA4, iiA4, rotA4)
    wB = _generalized_inv_mass(rB, n4, imB4, iiB4, rotB4)
    wsum = wA + wB
    # XPBD: dlambda = -C / (w1 + w2); C = -depth (violation).
    depth_vis = jnp.minimum(depth, max_visible_depth)
    dlam = jnp.where(pt_ok & (wsum > 1e-12), depth / jnp.maximum(wsum, 1e-12), 0.0)
    dlam = dlam * relaxation
    dlam_vis = jnp.where(pt_ok & (wsum > 1e-12),
                         depth_vis / jnp.maximum(wsum, 1e-12), 0.0) * relaxation
    bias_frac = jnp.where(dlam > 1e-12, (dlam - dlam_vis) / jnp.maximum(dlam, 1e-12), 0.0)
    p = dlam[..., None] * n4
    # normal points A->B: push A backwards, B forwards (reference pushes
    # ref by -n * lambda, alt by +n * lambda)
    dxA, dwA = _apply_impulse_terms(-p, rA, imA4, iiA4, rotA4)
    dxB, dwB = _apply_impulse_terms(p, rB, imB4, iiB4, rotB4)

    # ---- static friction (physics.cpp:369-441): tangential drift of the
    # contact points since the substep start, clamped by mu_s * lambda_n.
    # The drift is the relative motion of the two bodies' frames at the
    # contact over this substep:
    dispA = (posA - prevA)[..., None, :]
    dispB = (posB - prevB)[..., None, :]
    drift = dispB - dispA
    tang = drift - jnp.sum(drift * n4, axis=-1, keepdims=True) * n4
    tlen = jnp.linalg.norm(tang, axis=-1)
    that = jnp.broadcast_to(tang / jnp.maximum(tlen[..., None], 1e-12), rA.shape)
    wA_t = _generalized_inv_mass(rA, that, imA4, iiA4, rotA4)
    wB_t = _generalized_inv_mass(rB, that, imB4, iiB4, rotB4)
    wsum_t = wA_t + wB_t
    mu_pair = (0.5 * (muA + muB))[..., None]
    dlam_t = jnp.where(
        pt_ok & (wsum_t > 1e-12) & (tlen < mu_pair * dlam),
        tlen / jnp.maximum(wsum_t, 1e-12), 0.0
    ) * relaxation
    pt = dlam_t[..., None] * that
    fxA, fwA = _apply_impulse_terms(pt, rA, imA4, iiA4, rotA4)
    fxB, fwB = _apply_impulse_terms(-pt, rB, imB4, iiB4, rotB4)
    dxA, dwA = dxA + fxA, dwA + fwA
    dxB, dwB = dxB + fxB, dwB + fwB

    # mask dead points to zero HERE: downstream accumulations (grid
    # reductions or one-hot matmuls) must never see the NaNs garbage pairs
    # can produce (0 * NaN = NaN).
    m4 = pt_ok[..., None]
    dxA = jnp.where(m4, dxA, 0.0)
    dwA = jnp.where(m4, dwA, 0.0)
    dxB = jnp.where(m4, dxB, 0.0)
    dwB = jnp.where(m4, dwB, 0.0)
    return dxA, dwA, dxB, dwB, jnp.where(pt_ok, dlam, 0.0), bias_frac, pt_ok


def _apply_rot_delta(rot, dw):
    """Accumulated rotation vector -> quaternion delta (physics.cpp:247-268)."""
    return m.quat_normalize(
        rot + 0.5 * m.quat_mul(
            jnp.concatenate([jnp.zeros_like(dw[..., :1]), dw], axis=-1), rot
        )
    )


def solve_positions(pos, rot, contacts, inv_mass, inv_inertia, mu_s,
                    prev_pos, prev_rot, response_dynamic, relaxation=1.0,
                    max_visible_depth=0.05):
    """One Jacobi XPBD positional pass over the dense contact grid
    (reference solvePositions, physics.cpp:166-461).

    contacts: dict from narrowphase_dense (leading [W, n, n], i=ref,
    j=other).  Returns (new_pos, new_rot, lambda_n [W,n,n,4], bias_dpos) —
    lambdas feed the velocity pass.
    """
    dynm = response_dynamic & (inv_mass > 0)
    imA = jnp.where(dynm, inv_mass, 0.0)[:, :, None]            # [W,n,1]
    imB = jnp.where(dynm, inv_mass, 0.0)[:, None, :]
    iiA = jnp.where(dynm[..., None], inv_inertia, 0.0)[:, :, None]
    iiB = jnp.where(dynm[..., None], inv_inertia, 0.0)[:, None, :]

    dxA, dwA, dxB, dwB, dlam, bias_frac, pt_ok = _positional_contact_math(
        pos[:, :, None], rot[:, :, None], imA, iiA, mu_s[:, :, None],
        prev_pos[:, :, None],
        pos[:, None, :], rot[:, None, :], imB, iiB, mu_s[:, None, :],
        prev_pos[:, None, :],
        contacts, relaxation, max_visible_depth)

    # ---- Jacobi accumulation: body k gets row k (as ref/A) + column k (as
    # other/B): reductions over grid axes — no scatter.
    dpos = jnp.sum(dxA, axis=(2, 3)) + jnp.sum(dxB, axis=(1, 3))  # [W,n,3]
    dw = jnp.sum(dwA, axis=(2, 3)) + jnp.sum(dwB, axis=(1, 3))

    # linear bias displacement (per body): the deep-depenetration share of
    # the normal correction, excluded from velocity recovery
    bias4 = bias_frac[..., None]
    bias_dpos = (
        jnp.sum(dxA * bias4, axis=(2, 3)) + jnp.sum(dxB * bias4, axis=(1, 3))
    )

    return pos + dpos, _apply_rot_delta(rot, dw), dlam, bias_dpos


def set_velocities(pos, rot, prev_pos, prev_rot, h, bias_dpos=None):
    """Finite-difference velocity recovery (reference setVelocities,
    physics.cpp:673-714).  bias_dpos (from solve_positions) is excluded so
    deep depenetration does not inject velocity."""
    h = jnp.reshape(h, (h.shape[0], 1, 1))
    if bias_dpos is None:
        bias_dpos = jnp.zeros_like(pos)
    v = (pos - prev_pos - bias_dpos) / h
    dq = m.quat_mul(rot, jnp.concatenate(
        [prev_rot[..., 0:1], -prev_rot[..., 1:4]], axis=-1))
    omega = 2.0 * dq[..., 1:4] / h
    omega = jnp.where(dq[..., 0:1] >= 0, omega, -omega)
    return v, omega


def _velocity_contact_math(posA, rotA, imA, iiA, muA, vA_lin, vA_ang,
                           pvA_lin, pvA_ang,
                           posB, rotB, imB, iiB, muB, vB_lin, vB_ang,
                           pvB_lin, pvB_ang,
                           contacts, lambda_n, h4, restitution4,
                           restA=None, restB=None,
                           speculative=0.0):
    """Per-contact velocity solve: the reference's solveVelocitiesForContact
    (physics.cpp:716-1009) reproduced EXACTLY within each manifold — two
    sequential restitution iterations over the (up to 4) contact points,
    then a sequential dynamic-friction pass, each point updating the
    pair's local velocity copies before the next reads them (see
    pairs.velocity_pass, the pair-major twin of this dense-grid form, for
    the full rationale).  Accumulation across pairs remains Jacobi.

    Leading-shape generic: per-side args broadcast over *L (grid
    [W, n, n]); contacts carries [*L, 4(,3)] manifolds.  h4/restitution4
    broadcast against [*L, 4].  restA/restB: per-side restitution
    coefficients shaped like muA/muB (None = 0, no bounce).

    Returns per-pair velocity DELTAS (dvA, dwA, dvB, dwB), each [*L, 3],
    exactly zero (never NaN) on dead pairs.

    NOTE there is deliberately no relaxation parameter: the reference
    velocity pass applies impulses unrelaxed (physics.cpp:716-1009);
    relaxation affects only the positional pass.
    """
    ok = contacts["ok"]
    nrm = contacts["normal"]                      # [*L, 3]
    pts = contacts["points"]                      # [*L, 4, 3]
    P = pts.shape[-2]
    pt_ok = ok[..., None] & (contacts["depth"] > 0) & (
        jnp.arange(P) < contacts["num_points"][..., None]
    )

    mu_pair = 0.5 * (muA + muB)                   # [*L]
    h1 = h4[..., 0]                               # [W,1,1] vs [*L]
    rest1 = restitution4[..., 0]

    rAs = [pts[..., i, :] - posA for i in range(P)]
    rBs = [pts[..., i, :] - posB for i in range(P)]
    oks = [pt_ok[..., i] for i in range(P)]
    lams = [lambda_n[..., i] for i in range(P)]

    def pvel(v, w, r):
        return v + jnp.cross(w, r)

    # vn_bar + e per point from the pre-substep velocities (captured once,
    # reference vn_bars[], physics.cpp:900-950)
    vbars, es = [], []
    bounce = restA is not None and restB is not None
    e_pair = 0.5 * (restA + restB) if bounce else None
    for i in range(P):
        if bounce:
            vb = jnp.sum((pvel(pvB_lin, pvB_ang, rBs[i])
                          - pvel(pvA_lin, pvA_ang, rAs[i])) * nrm, axis=-1)
            vbars.append(vb)
            es.append(jnp.where(jnp.abs(vb) <= rest1, 0.0, e_pair))
        else:
            vbars.append(None)
            es.append(None)

    vA, wA = vA_lin, vA_ang
    vB, wB = vB_lin, vB_ang
    vA0, wA0, vB0, wB0 = vA, wA, vB, wB

    def apply_point(vA, wA, vB, wB, imp, i, mask):
        m1 = mask[..., None]
        nvA = vA - imp * imA[..., None]
        nvB = vB + imp * imB[..., None]
        dwA = m.quat_rotate(rotA, iiA * m.quat_inv_rotate(
            rotA, jnp.cross(rAs[i], -imp)))
        dwB = m.quat_rotate(rotB, iiB * m.quat_inv_rotate(
            rotB, jnp.cross(rBs[i], imp)))
        return (jnp.where(m1, nvA, vA), jnp.where(m1, wA + dwA, wA),
                jnp.where(m1, nvB, vB), jnp.where(m1, wB + dwB, wB))

    # ---- restitution: 2 sequential iterations (physics.cpp:953-966);
    # generalized masses and targets are iteration-invariant -> hoisted
    wsum_ns = [jnp.maximum(
        _generalized_inv_mass(rAs[i], nrm, imA, iiA, rotA)
        + _generalized_inv_mass(rBs[i], nrm, imB, iiB, rotB), 1e-12)
        for i in range(P)]
    targets = [jnp.maximum(-es[i] * vbars[i], 0.0) if bounce
               else jnp.zeros_like(mu_pair) for i in range(P)]
    for _ in range(2):
        for i in range(P):
            vn = jnp.sum((pvel(vB, wB, rBs[i])
                          - pvel(vA, wA, rAs[i])) * nrm, axis=-1)
            imp = ((targets[i] - vn) / wsum_ns[i])[..., None] * nrm
            vA, wA, vB, wB = apply_point(vA, wA, vB, wB, imp, i, oks[i])

    # ---- dynamic friction: one sequential pass (physics.cpp:755-817) ---
    for i in range(P):
        vpt = pvel(vB, wB, rBs[i]) - pvel(vA, wA, rAs[i])
        vn = jnp.sum(vpt * nrm, axis=-1)
        vt = vpt - vn[..., None] * nrm
        vt_len = jnp.linalg.norm(vt, axis=-1)
        that = vt / jnp.maximum(vt_len[..., None], 1e-12)
        dyn_mag = mu_pair * jnp.abs(lams[i]) / h1
        corrected = jnp.minimum(dyn_mag, vt_len)
        wsum = jnp.maximum(
            _generalized_inv_mass(rAs[i], that, imA, iiA, rotA)
            + _generalized_inv_mass(rBs[i], that, imB, iiB, rotB), 1e-12)
        imp = (-corrected / wsum)[..., None] * that
        mask = oks[i] & (vt_len > 1e-9) & (dyn_mag > 0)
        vA, wA, vB, wB = apply_point(vA, wA, vB, wB, imp, i, mask)

    # ---- speculative near-miss clamp (depth <= 0): per-point Jacobi ----
    if speculative > 0:
        rA4 = pts - posA[..., None, :]
        rB4 = pts - posB[..., None, :]
        n4 = jnp.broadcast_to(nrm[..., None, :], rA4.shape)

        def point_vel4(v, w, r):
            return v[..., None, :] + jnp.cross(w[..., None, :], r)

        rel4 = point_vel4(vB0, wB0, rB4) - point_vel4(vA0, wA0, rA4)
        vn4 = jnp.sum(rel4 * n4, axis=-1)
        imA4, imB4 = imA[..., None], imB[..., None]
        iiA4, iiB4 = iiA[..., None, :], iiB[..., None, :]
        rotA4, rotB4 = rotA[..., None, :], rotB[..., None, :]
        wA_n = _generalized_inv_mass(rA4, n4, imA4, iiA4, rotA4)
        wB_n = _generalized_inv_mass(rB4, n4, imB4, iiB4, rotB4)
        wsum_n = jnp.maximum(wA_n + wB_n, 1e-12)
        depth4 = contacts["depth"]
        ok_np = ok[..., None] & (
            jnp.arange(P) < contacts["num_points"][..., None])
        dv_spec = depth4 / h4 - vn4
        s_ok = ok_np & (depth4 <= 0) & (dv_spec > 0)
        npts_s = jnp.maximum(jnp.sum(s_ok, axis=-1, keepdims=True), 1)
        simp = jnp.where(
            s_ok, dv_spec / wsum_n, 0.0)[..., None] / npts_s[..., None] * n4
        # per-point arms, one-shot apply (angular update linear in the
        # impulse: sum torques first)
        simp_sum = jnp.sum(simp, axis=-2)
        tqA = jnp.sum(jnp.cross(rA4, -simp), axis=-2)
        tqB = jnp.sum(jnp.cross(rB4, simp), axis=-2)
        any_s = jnp.any(s_ok, axis=-1)[..., None]
        vA = jnp.where(any_s, vA - simp_sum * imA[..., None], vA)
        vB = jnp.where(any_s, vB + simp_sum * imB[..., None], vB)
        wA = jnp.where(any_s, wA + m.quat_rotate(
            rotA, iiA * m.quat_inv_rotate(rotA, tqA)), wA)
        wB = jnp.where(any_s, wB + m.quat_rotate(
            rotB, iiB * m.quat_inv_rotate(rotB, tqB)), wB)

    zeroA = jnp.zeros_like(pts[..., 0, :])
    return (vA - vA0 + zeroA, wA - wA0 + zeroA,
            vB - vB0 + zeroA, wB - wB0 + zeroA)


def solve_velocities(pos, rot, vel_lin, vel_ang, contacts, lambda_n,
                     inv_mass, inv_inertia, mu_d, pre_v, pre_omega,
                     response_dynamic, h, restitution_threshold,
                     rest_coef=None, speculative=0.0):
    """Velocity pass over the dense contact grid (reference solveVelocities,
    physics.cpp:716-1009).  rest_coef: per-body restitution [W, n]
    (None = 0, no bounce).  speculative: near-miss margin (see
    pairs.velocity_pass).  No relaxation parameter by design — the
    reference velocity pass is unrelaxed; relaxation shapes only the
    positional pass."""
    dynm = response_dynamic & (inv_mass > 0)
    im = jnp.where(dynm, inv_mass, 0.0)
    ii = jnp.where(dynm[..., None], inv_inertia, 0.0)
    h4 = jnp.reshape(h, (h.shape[0], 1, 1, 1))
    rest4 = restitution_threshold[..., None, None, None]
    restA = None if rest_coef is None else rest_coef[:, :, None]
    restB = None if rest_coef is None else rest_coef[:, None, :]

    dvA, dwA, dvB, dwB = _velocity_contact_math(
        pos[:, :, None], rot[:, :, None], im[:, :, None], ii[:, :, None],
        mu_d[:, :, None], vel_lin[:, :, None], vel_ang[:, :, None],
        pre_v[:, :, None], pre_omega[:, :, None],
        pos[:, None, :], rot[:, None, :], im[:, None, :], ii[:, None, :],
        mu_d[:, None, :], vel_lin[:, None, :], vel_ang[:, None, :],
        pre_v[:, None, :], pre_omega[:, None, :],
        contacts, lambda_n, h4, rest4,
        restA=restA, restB=restB, speculative=speculative)

    dv = jnp.sum(dvA, axis=2) + jnp.sum(dvB, axis=1)
    dw = jnp.sum(dwA, axis=2) + jnp.sum(dwB, axis=1)
    return vel_lin + dv, vel_ang + dw


def solve_joints(pos, rot, inv_mass, inv_inertia, joints, rows1, rows2,
                 jmask, relaxation=1.0):
    """XPBD joint solve (reference handleJointConstraint + helpers,
    physics.cpp:478-650): Fixed joints constrain relative orientation (via
    attach_rot1/2) and separation along the attachment x-axis; Hinge joints
    align the local axes and pin the attachment points.

    pos/rot/inv_mass/inv_inertia: body columns [W, n, ...].
    joints: JointConstraint field dict [W, J, ...]; rows1/rows2 [W, J] body
    rows (-1 invalid); jmask [W, J] live joints.
    Returns (new_pos, new_rot) with Jacobi-accumulated corrections.
    """
    from gpu_ecs_madrona_tpu.core.state import batched_gather

    W, n = pos.shape[0], pos.shape[1]
    J = rows1.shape[1]
    valid = jmask & (rows1 >= 0) & (rows2 >= 0)

    x1 = batched_gather(pos, rows1)          # [W, J, 3]
    x2 = batched_gather(pos, rows2)
    q1 = batched_gather(rot, rows1)          # [W, J, 4]
    q2 = batched_gather(rot, rows2)
    im1 = batched_gather(inv_mass, rows1)    # [W, J]
    im2 = batched_gather(inv_mass, rows2)
    ii1 = batched_gather(inv_inertia, rows1)  # [W, J, 3]
    ii2 = batched_gather(inv_inertia, rows2)

    is_fixed = joints["joint_type"] == 0

    # ---- angular constraint -------------------------------------------
    # Fixed: delta_q = 2 * vec((q1 aq1) (q2 aq2)^-1)  (physics.cpp:478-505)
    o1 = m.quat_normalize(m.quat_mul(q1, joints["attach_rot1"]))
    o2 = m.quat_normalize(m.quat_mul(q2, joints["attach_rot2"]))
    o2_inv = jnp.concatenate([o2[..., 0:1], -o2[..., 1:4]], axis=-1)
    diff = m.quat_mul(o1, o2_inv)
    dq_fixed = 2.0 * diff[..., 1:4]
    # Hinge: delta_q = cross(a1_world, a2_world)  (physics.cpp:507-535)
    a1w = m.quat_rotate(q1, joints["a1_local"])
    a2w = m.quat_rotate(q2, joints["a2_local"])
    dq_hinge = jnp.cross(a1w, a2w)
    dq = jnp.where(is_fixed[..., None], dq_fixed, dq_hinge)
    mag = jnp.linalg.norm(dq, axis=-1)
    dq_dir = dq / jnp.maximum(mag[..., None], 1e-12)
    # sanitize dead rows: garbage fields can make dq NaN, and 0 * NaN
    # poisons the masked accumulation below
    dq_dir = jnp.where(valid[..., None], dq_dir, 0.0)
    mag = jnp.where(valid, mag, 0.0)

    n_l1 = m.quat_inv_rotate(q1, dq_dir)
    n_l2 = m.quat_inv_rotate(q2, dq_dir)
    w1_a = jnp.sum(n_l1 * ii1 * n_l1, axis=-1)
    w2_a = jnp.sum(n_l2 * ii2 * n_l2, axis=-1)
    ang_ok = valid & (mag > 1e-9) & (w1_a + w2_a > 1e-12)
    dlam_a = jnp.where(ang_ok, mag / jnp.maximum(w1_a + w2_a, 1e-12), 0.0)
    dlam_a = dlam_a * relaxation
    # world-frame angular corrections (computeAngularUpdate analog):
    # body1 rotates by -invI1*dq*dlam, body2 by +invI2*dq*dlam
    dw1 = -m.quat_rotate(q1, ii1 * n_l1 * dlam_a[..., None])
    dw2 = m.quat_rotate(q2, ii2 * n_l2 * dlam_a[..., None])

    # ---- positional constraint ----------------------------------------
    r1w = m.quat_rotate(q1, joints["r1"])
    r2w = m.quat_rotate(q2, joints["r2"])
    p1 = x1 + r1w
    p2 = x2 + r2w
    delta_r = p2 - p1
    # Fixed (physics.cpp:588-614): fixed separation along the attach x
    # axis, zero along the others
    axes_rot = m.quat_normalize(m.quat_mul(q1, joints["attach_rot1"]))
    a1 = m.quat_rotate(axes_rot, jnp.array([1.0, 0.0, 0.0]))
    b1 = m.quat_rotate(axes_rot, jnp.array([0.0, 1.0, 0.0]))
    c1 = jnp.cross(a1, b1)
    a_sep = jnp.sum(delta_r * a1, axis=-1) - joints["separation"]
    b_sep = jnp.sum(delta_r * b1, axis=-1)
    c_sep = jnp.sum(delta_r * c1, axis=-1)
    corr_fixed = (a_sep[..., None] * a1 + b_sep[..., None] * b1
                  + c_sep[..., None] * c1)
    # Hinge (physics.cpp:616-626): pin attachment points
    corr = jnp.where(is_fixed[..., None], corr_fixed, delta_r)
    c_mag = jnp.linalg.norm(corr, axis=-1)
    nrm = corr / jnp.maximum(c_mag[..., None], 1e-12)
    nrm = jnp.where(valid[..., None], nrm, 0.0)
    c_mag = jnp.where(valid, c_mag, 0.0)

    w1_p = _generalized_inv_mass(r1w, nrm, im1, ii1, q1)
    w2_p = _generalized_inv_mass(r2w, nrm, im2, ii2, q2)
    pos_ok = valid & (c_mag > 1e-9) & (w1_p + w2_p > 1e-12)
    dlam_p = jnp.where(pos_ok, c_mag / jnp.maximum(w1_p + w2_p, 1e-12), 0.0)
    dlam_p = dlam_p * relaxation
    p_imp = dlam_p[..., None] * nrm          # pulls p1 toward p2
    dx1, dwp1 = _apply_impulse_terms(p_imp, r1w, im1, ii1, q1)
    dx2, dwp2 = _apply_impulse_terms(-p_imp, r2w, im2, ii2, q2)

    # ---- accumulate to bodies (one-hot segment sums; J, n small) --------
    rows_iota = jnp.arange(n, dtype=jnp.int32)
    oh1 = ((rows1[..., None] == rows_iota[None, None, :]) & valid[..., None]
           ).astype(pos.dtype)                 # [W, J, n]
    oh2 = ((rows2[..., None] == rows_iota[None, None, :]) & valid[..., None]
           ).astype(pos.dtype)

    def seg(vals1, vals2):
        # [W, J, 3] -> [W, n, 3]
        # values side EXACT: one bf16 pass truncates joint impulses to ~3
        # digits on TPU (utils/math.py EXACT note); one-hot side exact.
        return (jnp.einsum("wjc,wjn->wnc", vals1, oh1,
                           preferred_element_type=jnp.float32,
                           precision=(m.EXACT, m.DEFAULT_P))
                + jnp.einsum("wjc,wjn->wnc", vals2, oh2,
                             preferred_element_type=jnp.float32,
                             precision=(m.EXACT, m.DEFAULT_P)))

    dpos = seg(dx1, dx2)
    dang = seg(dw1 + dwp1, dw2 + dwp2)

    new_pos = pos + dpos
    new_rot = m.quat_normalize(
        rot + 0.5 * m.quat_mul(
            jnp.concatenate([jnp.zeros_like(dang[..., :1]), dang], axis=-1),
            rot))
    return new_pos, new_rot
