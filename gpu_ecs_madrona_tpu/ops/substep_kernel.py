"""Pallas physics-substep megakernels: narrowphase + XPBD solve in VMEM.

The TPU analog of the reference's megakernel-resident physics substep
(src/mw/device megakernel running narrowphase.cpp + physics.cpp solver
nodes back to back with state in registers/smem).  Two entry points:

* SubstepKernel — ONE substep per pallas_call:
      gather pairs -> narrowphase -> positional pass -> segment-sum ->
      apply -> velocity recovery -> velocity pass -> segment-sum -> apply
  Used when joint constraints must interleave between the positional and
  velocity phases (joints are solved OUTSIDE the kernel).

* FusedSubstepKernel — ALL substeps in one pallas_call: the above in a
  static Python loop with pos/rot/v/w carried in VMEM, plus the
  semi-implicit Euler integrate (reference substepRigidBodies,
  physics.cpp:79-164) at the top of each iteration.  This is the default
  path: measured at 8192 worlds x 64 bodies the per-substep XLA
  pack/transpose + custom-call boundary costs ~7.7 ms per substep —
  4x more than the pallas pipeline itself — so crossing it once per STEP
  instead of once per substep is the single largest win.

The pair math is SHARED with the XLA path: physics/pairs.py functions are
written kernel-safe (component-scalarized tuples, no select-on-i1, no
argmin/1D iota) and are called directly from inside the kernel body on
block shapes [Wt, ...].  One source of truth for the contact model.

Layout per program (grid over world blocks):
    packed  [Wt, C, n]      body channels, channel-major (n = lanes,
                            padded to a full 128-lane tile)
    rows_i/j, kvalid [Wt, 1, K]  compacted candidate pairs (K = lanes)
    scal    [Wt, 1, 8]      per-world scalars (h, restitution threshold,
                            gravity xyz)
    out     [Wt, C_OUT, n]  pos/rot/vel (+ final-substep stashes, fused)

Pair gathers ride Mosaic's native dynamic lane gather (take_along_axis,
2D, one lane tile per chunk); segment-sums are per-world one-hot matmuls
(scatter-add has no native lowering).  Per-object constants fold in via
unrolled (obj == o) selects (physics/pairs.py ObjTables).

Joints are NOT solved in-kernel (they interleave between the positional
and velocity phases); worlds with joints use SubstepKernel + XLA joint
solve, or contact_mode="pairs".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_ecs_madrona_tpu.physics import pairs as pk

# ---- single-substep kernel input channels (channel-major [W, C_IN, n]) ----
# The first C_G channels are the per-pair gathered block; channels past
# C_G are only read per-body.  Broadphase AABBs are NOT carried: every
# candidate already passed the overlap test (broadphase emits only
# overlapping pairs), so the reference's in-narrowphase AABB recheck is
# redundant here.
CH_POS = 0        # 0:3   post-integrate position
CH_ROT = 3        # 3:7   post-integrate rotation (w,x,y,z)
CH_PREV_POS = 7   # 7:10  pre-substep position
CH_IM = 10        # inverse mass (0 for static/non-dynamic)
CH_II = 11        # 11:14 inverse inertia diagonal (body frame)
CH_MUS = 14       # static friction
CH_MUD = 15       # dynamic friction
CH_OBJ = 16       # object id (small int as f32)
C_G = 17          # gathered-block size
CH_V = 17         # 17:20 post-integrate linear velocity (body-only)
CH_W = 20         # 20:23 post-integrate angular velocity (body-only)
CH_PREV_ROT = 23  # 23:27 pre-substep rotation (body-only)
CH_DYN = 27       # 1.0 = dynamic response (body-only)
C_IN = 28

C_OUT = 13        # pos3 rot4 v3 w3

# ---- fused-substeps kernel input channels ----------------------------------
F_POS = 0         # 0:3
F_ROT = 3         # 3:7
F_V = 7           # 7:10
F_W = 10          # 10:13
F_IM = 13         # static pair block starts here (contiguous, gathered once)
F_II = 14         # 14:17
F_MUS = 17
F_MUD = 18
F_OBJ = 19
F_STATIC0 = F_IM
FC_STATIC = 7     # im ii3 mu_s mu_d obj
F_EXTF = 20       # 20:23 external force
F_EXTT = 23       # 23:26 external torque
F_DYN = 26
F_SCALE = 27      # 27:30 per-body scale (in-kernel broadphase AABBs)
F_LIVE = 30       # 1.0 = live archetype row
FC_IN = 31
# persist mode only: current CollisionAABB column (passthrough source for
# stable worlds whose broadphase is skipped)
F_ALO = 31        # 31:34
F_AHI = 34        # 34:37
FC_IN_P = 37

# fused output: final state + last-substep stash components
FO_POS = 0        # 0:3
FO_ROT = 3        # 3:7
FO_V = 7          # 7:10
FO_W = 10         # 10:13
FO_PREV_POS = 13  # 13:16 last substep's pre-substep position
FO_PREV_ROT = 16  # 16:20
FO_PS_POS = 20    # 20:23 last substep's post-integrate (pre-solve) pos
FO_PS_ROT = 23    # 23:27
FO_PS_V = 27      # 27:30 last substep's post-integrate velocity
FO_PS_W = 30      # 30:33
FC_OUT = 33

# ---- persistent-manifold cache layout (cross-STEP contact cache) -----------
# The ManifoldPersist singleton stores, per candidate slot (K lanes):
# channels 0:3 = rows_i / rows_j / kvalid (the cached broadphase), then the
# 33-channel body-frame manifold cache (pk.cache_contacts fields).
MC_ROWS = 3       # rows_i, rows_j, kvalid
MC_RA = 3         # 3:15   rA[c][p] at channel MC_RA + c*4 + p
MC_RB = 15        # 15:27
MC_NLOC = 27      # 27:30
MC_DEPTH0 = 30    # 30:34
MC_OK = 34
MC_NPTS = 35
MC_CHANNELS = 36
MC_CACHE = MC_CHANNELS - MC_ROWS   # 33 manifold-cache channels


def _pack_cache(cache):
    """pk.cache_contacts dict ([Wt,P,K] tuples) -> [Wt, MC_CACHE, K]."""
    chans = []
    for c in range(3):
        for p in range(4):
            chans.append(cache["rA"][c][:, p])
    for c in range(3):
        for p in range(4):
            chans.append(cache["rB"][c][:, p])
    chans.extend(cache["n_loc"])
    for p in range(4):
        chans.append(cache["depth0"][:, p])
    chans.append(cache["ok"].astype(jnp.float32))
    chans.append(cache["num_points"].astype(jnp.float32))
    return jnp.stack(chans, axis=1)


def _parse_cache(mcc):
    """[Wt, MC_CACHE, K] -> pk.cache_contacts dict."""
    def vec4(base):
        return tuple(
            jnp.stack([mcc[:, base + c * 4 + p] for p in range(4)], axis=1)
            for c in range(3))
    off = MC_RA - MC_ROWS
    return {
        "rA": vec4(off),
        "rB": vec4(MC_RB - MC_ROWS),
        "n_loc": tuple(mcc[:, MC_NLOC - MC_ROWS + c] for c in range(3)),
        "depth0": jnp.stack(
            [mcc[:, MC_DEPTH0 - MC_ROWS + p] for p in range(4)], axis=1),
        "ok": mcc[:, MC_OK - MC_ROWS] > 0.5,
        "num_points": jnp.round(mcc[:, MC_NPTS - MC_ROWS]).astype(jnp.int32),
    }


def _c3(g, lo):
    return (g[:, lo], g[:, lo + 1], g[:, lo + 2])


def _c4(g, lo):
    return (g[:, lo], g[:, lo + 1], g[:, lo + 2], g[:, lo + 3])


def _ablate():
    return set(filter(None, os.environ.get(
        "GEM_TPU_SUBSTEP_ABLATE", "").split(",")))


def _mk_pair_io(Wt, n, K, rows_i, rows_j, kvalid_f):
    """Gather/segment-sum helpers for one program block.

    ISSUE-BOUND DISCIPLINE: measured on v5e, a VPU op on [32, 256] costs
    the same as on [8, 128] (instruction issue dominates; width is free up
    to ~8 vregs).  Everything here is therefore batched across the WHOLE
    world block in single wide ops — per-world Python loops survive only
    where Mosaic forces them (the MXU segment-sum matmuls, which have no
    batched lowering).

    Gathers use Mosaic's native dynamic lane gather (2D take_along_axis
    with per-row indices, all worlds x channels in one op per lane-tile
    chunk); one-hot MXU matmuls remain only for the segment-sums.
    Returns (oh_i, oh_j, gather_i, gather_j, segsum).

    """
    ablate = _ablate()

    def onehots(rows):
        if "noonehot" in ablate:   # perf attribution only (wrong results)
            return jnp.broadcast_to(kvalid_f, (Wt, n, K))
        # [Wt*n, K] in ONE compare: row r of the flattened array is body
        # (r % n) of world (r // n); n is always a power of two here
        assert n & (n - 1) == 0
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (Wt * n, K), 0) & (n - 1)
        rows_b = jnp.broadcast_to(rows, (Wt, n, K)).reshape(Wt * n, K)
        valid_b = jnp.broadcast_to(kvalid_f > 0.5,
                                   (Wt, n, K)).reshape(Wt * n, K)
        return ((r_iota == rows_b) & valid_b).astype(
            jnp.float32).reshape(Wt, n, K)

    # Mosaic's dynamic lane gather operates within one 128-lane tile;
    # bodies beyond 128 lanes chunk into n/128 tile-gathers + selects
    # per K-chunk (round-4: the >128-body path previously fell back to
    # one-hot dot-gathers — [C, n] x [n, 128] matmuls per world — which
    # left 8192x128 at half speed)
    native = ((n % 128 == 0) and (K % 128 == 0)
              and os.environ.get("GEM_TPU_SUBSTEP_NATIVE", "1") != "0")

    def gather_with(rows, ohs):
        def gather(mat, C):
            # mat [Wt, C, n] -> [Wt, C, K]; one take_along_axis per
            # (lane-tile chunk x body tile) covering ALL channels
            if "nogather" in ablate:  # perf attribution only (wrong results)
                return jnp.concatenate([mat] * (K // n), axis=2)
            if not native:
                return jnp.stack([
                    jax.lax.dot_general(mat[w], ohs[w],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    for w in range(Wt)], axis=0)
            n_tiles = n // 128
            outs = []
            for w in range(Wt):
                xw = mat[w]                              # [C, n]
                chunks = []
                for c0 in range(0, K, 128):
                    idx = rows[w, :, c0:c0 + 128]        # [1, 128]
                    idxb = jnp.broadcast_to(idx, (C, 128))
                    if n_tiles == 1:
                        chunks.append(jnp.take_along_axis(xw, idxb, axis=1))
                        continue
                    acc = jnp.zeros((C, 128), xw.dtype)
                    for t in range(n_tiles):
                        tile = xw[:, t * 128:(t + 1) * 128]
                        g = jnp.take_along_axis(
                            tile, jnp.clip(idxb - t * 128, 0, 127), axis=1)
                        sel = (idxb >= t * 128) & (idxb < (t + 1) * 128)
                        acc = jnp.where(sel, g, acc)
                    chunks.append(acc)
                outs.append(jnp.concatenate(chunks, axis=1))
            return jnp.stack(outs, axis=0)
        return gather

    oh_i = onehots(rows_i)

    oh_j = onehots(rows_j)
    # both sides' one-hots pre-concatenated along K: the i- and j-side
    # segment-sums fuse into ONE MXU matmul per world per pass
    oh_ij = jnp.concatenate([oh_i, oh_j], axis=2)        # [Wt, n, 2K]
    # bf16 segment-sum knob (measured a wash on v5e: 54.2 vs 54.7 ms at
    # 8192x64 — the small-row matmuls are MXU tile-latency bound, not
    # FLOP bound — so full f32 stays the default; trajectories with bf16
    # diverge ~0.015 over 40 chaotic ticks)
    if os.environ.get("GEM_TPU_SEGSUM_BF16") == "1":
        oh_ij = oh_ij.astype(jnp.bfloat16)

    def segsum2(packA, packB):
        # packA/packB [Wt, C, K] (zeroed on dead pairs) -> [Wt, C, n]
        pack = jnp.concatenate([packA, packB], axis=2)   # [Wt, C, 2K]
        pack = pack.astype(oh_ij.dtype)
        if os.environ.get("GEM_TPU_SEGSUM_BATCHED") == "1":
            # single batched dot_general (A/B experiment: Mosaic lowering
            # of batch dims vs the per-world matmul chain)
            return jax.lax.dot_general(
                pack, oh_ij, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return jnp.stack([
            jax.lax.dot_general(pack[w], oh_ij[w], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for w in range(Wt)], axis=0)

    return (oh_i, oh_j, gather_with(rows_i, oh_i),
            gather_with(rows_j, oh_j), segsum2)


def _substep_core(tables, relaxation, kvalid, h1, rest1,
                  SA, SB, pos_b, rot_b, v_b, w_b, prev_pos_b, prev_rot_b,
                  oh_i, oh_j, gather_i, gather_j, segsum,
                  speculative=0.0, cached=None, want_cache=False,
                  cache_resolver=None):
    """One contact substep given pair-gathered static sides SA/SB
    (im/ii/mu_s/mu_d/obj [Wt,K]) and per-body state tuples [Wt,n].
    v_b/w_b are the POST-INTEGRATE velocities (the reference's
    PreSolveVelocity, physics.cpp:162-163) feeding the restitution term;
    their pair gather is skipped when no material has restitution.

    pos/rot/prev_pos are gathered per pair HERE (they change every
    substep); returns per-body (p2, r2, v2, w2, v3, w3): post-solve pose,
    recovered velocities, and post-velocity-pass velocities.

    contact_refresh plumbing: with ``cached`` set (a pk.cache_contacts
    dict from an earlier substep), the full SAT + clip narrowphase is
    SKIPPED and the manifold is refreshed by transform only; with
    ``want_cache``, the freshly computed contacts are also returned as a
    cache (appended to the return tuple).

    cache_resolver (persistent-manifold mode): a callable (PA, PB) ->
    cache dict that decides per world whether to reuse a cross-step
    cached manifold or build a fresh one (under pl.when, via a scratch
    ref); contacts then come from pk.refresh_contacts on the resolved
    cache uniformly.  Refreshing a cache at the very poses it was built
    from reproduces the fresh contacts exactly (anchors coincide), so
    the rebuild path loses nothing.
    """
    dyn_pair = jnp.stack(list(pos_b) + list(rot_b) + list(prev_pos_b),
                         axis=1)                             # [Wt, 10, n]
    gA = gather_i(dyn_pair, 10)
    gB = gather_j(dyn_pair, 10)

    PA = _side1(gA, SA, kvalid)
    PB = _side1(gB, SB, kvalid)

    # ---- narrowphase + positional pass (shared pair-major math) -------
    if cache_resolver is not None:
        cache_out = cache_resolver(PA, PB)
        contacts = pk.refresh_contacts(cache_out, PA, PB)
        if not want_cache:
            cache_out = None
    elif cached is None:
        FA = pk.body_fields(PA["pos"], PA["rot"], SA["obj"], tables)
        FB = pk.body_fields(PB["pos"], PB["rot"], SB["obj"], tables)
        contacts = pk.pair_contacts(FA, FB, kvalid,
                                    speculative=speculative)
        cache_out = pk.cache_contacts(contacts, PA, PB) if want_cache \
            else None
    else:
        contacts = pk.refresh_contacts(cached, PA, PB)
        cache_out = pk.cache_contacts(contacts, PA, PB) if want_cache \
            else None

    packA, packB, lam = pk.positional_pass(PA, PB, contacts,
                                           relaxation=relaxation)
    if "noseg" in _ablate():
        # perf attribution: solve math live, segment-sum matmuls skipped
        # (sliced near-zero stand-in keeps the data dependency without the
        # degenerate broadcast that SIGABRTs the Mosaic compiler)
        n_ = pos_b[0].shape[1]
        acc = packA[:, :, :n_] * 1e-30 + packB[:, :, :n_] * 1e-30
    else:
        acc = segsum(packA, packB)                           # [Wt, 9, n]

    # ---- apply positional + recover velocities (per-body, in VMEM) ----
    p2, r2, v2, w2 = _apply_positional_recover(
        pos_b, rot_b, prev_pos_b, prev_rot_b, acc, h1)

    # ---- velocity pass at post-solve poses -----------------------------
    bounce = tables.any_restitution
    chans = (list(p2) + list(r2) + list(v2) + list(w2)
             + (list(v_b) + list(w_b) if bounce else []))
    packed2 = jnp.stack(chans, axis=1)         # [Wt, 13(+6), n]
    C2 = len(chans)
    gA2 = gather_i(packed2, C2)
    gB2 = gather_j(packed2, C2)

    vpA, vpB = pk.velocity_pass(_side2(gA2, SA, kvalid, bounce, tables),
                                _side2(gB2, SB, kvalid, bounce, tables),
                                contacts, lam, h1, rest1,
                                speculative=speculative)
    if "noseg" in _ablate():
        n_ = pos_b[0].shape[1]
        accv = vpA[:, :, :n_] * 1e-30 + vpB[:, :, :n_] * 1e-30
    else:
        accv = segsum(vpA, vpB)                              # [Wt, 6, n]
    v3_ = pk.v3add(v2, _c3(accv, 0))
    w3_ = pk.v3add(w2, _c3(accv, 3))
    if want_cache:
        return p2, r2, v2, w2, v3_, w3_, cache_out
    return p2, r2, v2, w2, v3_, w3_


def _unpack_static(g, kvalid):
    del kvalid
    return {"im": g[:, 0], "ii": _c3(g, 1),
            "mu_s": g[:, 4], "mu_d": g[:, 5],
            "obj": jnp.round(g[:, 6]).astype(jnp.int32)}


def _side1(g, S, kvalid):
    """Positional-pass pair side from a 10-channel pose gather (pos3
    rot4 prev_pos3) + static side S.  Shared by _substep_core and the
    chunked kernel — one source of truth for the gather layout."""
    return {
        "pos": _c3(g, 0),
        "rot": (jnp.where(kvalid, g[:, 3], 1.0), g[:, 4], g[:, 5], g[:, 6]),
        "prev_pos": _c3(g, 7),
        "im": S["im"], "ii": S["ii"], "mu": S["mu_s"],
    }


def _side2(g2, S, kvalid, bounce, tables):
    """Velocity-pass pair side from a 13(+6 bounce)-channel gather
    (p2 r2 v2 w2 [+ post-integrate v w])."""
    side = {
        "pos": _c3(g2, 0),
        "rot": (jnp.where(kvalid, g2[:, 3], 1.0), g2[:, 4], g2[:, 5],
                g2[:, 6]),
        "im": S["im"], "ii": S["ii"], "mu": S["mu_d"],
        "v": _c3(g2, 7), "w": _c3(g2, 10),
    }
    if bounce:
        side["pv"] = _c3(g2, 13)
        side["pw"] = _c3(g2, 16)
        side["rest"] = tables.scalar(S["obj"], "restitution")
    return side


def _apply_positional_recover(pos_i, rot_i, prev_pos, prev_rot, acc, h1):
    """Apply the positional segment-sum acc [.., 9, n] to the
    post-integrate pose and recover substep velocities
    (set_velocities, reference physics.cpp:673-714; bias excluded).
    Shared by _substep_core and the chunked kernel so the quaternion
    update / sign-selected angular recovery can never diverge between
    the two paths (they are gated bit-identical by
    test_chunked_kernel_matches_unchunked)."""
    p2 = pk.v3add(pos_i, _c3(acc, 0))
    dw_acc = _c3(acc, 3)
    zero_n = jnp.zeros_like(dw_acc[0])
    dq = pk.qmul((zero_n,) + dw_acc, rot_i)
    r2 = pk.qnormalize(tuple(q + 0.5 * d for q, d in zip(rot_i, dq)))
    bias = _c3(acc, 6)
    v2 = tuple((p - pp - b) / h1
               for p, pp, b in zip(p2, prev_pos, bias))
    dqv = pk.qmul(r2, (prev_rot[0], -prev_rot[1],
                       -prev_rot[2], -prev_rot[3]))
    w2 = tuple(jnp.where(dqv[0] >= 0, 2.0 * c / h1, -2.0 * c / h1)
               for c in dqv[1:4])
    return p2, r2, v2, w2


def _integrate(pos, rot, v, w, im, ii, extf, extt, dyn, h1, g):
    """Semi-implicit Euler substep in tuple form (solver.integrate,
    reference substepRigidBodies physics.cpp:79-164)."""
    live = dyn & (im > 0)
    vn = tuple(jnp.where(live, vc + h1 * (gc + fc * im), vc)
               for vc, gc, fc in zip(v, g, extf))
    posn = tuple(jnp.where(live, pc + h1 * vc, pc)
                 for pc, vc in zip(pos, vn))
    inertia = tuple(jnp.where(iic > 0, 1.0 / jnp.maximum(iic, 1e-12), 0.0)
                    for iic in ii)
    om_b = pk.qrot_inv(rot, w)
    gyro = pk.cross3(om_b, tuple(a * b for a, b in zip(inertia, om_b)))
    tau_b = pk.qrot_inv(rot, extt)
    om_b = tuple(o + h1 * iic * (tc - gc)
                 for o, iic, tc, gc in zip(om_b, ii, tau_b, gyro))
    wn = pk.qrot(rot, om_b)
    wn = tuple(jnp.where(live, wc, w0) for wc, w0 in zip(wn, w))
    zero = jnp.zeros_like(pos[0])
    dq = pk.qmul((zero,) + wn, rot)
    rotn = pk.qnormalize(tuple(q + 0.5 * h1 * d for q, d in zip(rot, dq)))
    rotn = tuple(jnp.where(live, rc, r0) for rc, r0 in zip(rotn, rot))
    return posn, rotn, vn, wn


def _make_kernel(tables: pk.ObjTables, Wt: int, n: int, K: int,
                 relaxation: float, speculative: float = 0.0):
    """Single-substep kernel (joint-interleaved path)."""
    def kernel(packed_ref, rows_i_ref, rows_j_ref, kvalid_ref, scal_ref,
               out_ref):
        # pair/scalar inputs arrive [Wt, 1, K] / [Wt, 1, 8]: Mosaic block
        # shapes must tile (8, 128) or equal the array's last two dims
        packed = packed_ref[:]                      # [Wt, C_IN, n]
        kvalid = kvalid_ref[:][:, 0] > 0.5          # [Wt, K]
        h1 = scal_ref[:, 0, 0:1]                    # [Wt, 1]
        rest1 = scal_ref[:, 0, 1:2]

        oh_i, oh_j, gather_i, gather_j, segsum = _mk_pair_io(
            Wt, n, K, rows_i_ref[:], rows_j_ref[:], kvalid_ref[:])

        gSA = gather_i(packed[:, CH_IM:CH_IM + FC_STATIC], FC_STATIC)
        gSB = gather_j(packed[:, CH_IM:CH_IM + FC_STATIC], FC_STATIC)
        SA = _unpack_static(gSA, kvalid)
        SB = _unpack_static(gSB, kvalid)

        pos_b = _c3(packed, CH_POS)
        rot_b = _c4(packed, CH_ROT)
        v_b = _c3(packed, CH_V)
        w_b = _c3(packed, CH_W)
        prev_pos_b = _c3(packed, CH_PREV_POS)
        prev_rot_b = _c4(packed, CH_PREV_ROT)
        dyn_b = packed[:, CH_DYN] > 0.5

        p2, r2, _v2, _w2, v3_, w3_ = _substep_core(
            tables, relaxation, kvalid, h1, rest1, SA, SB,
            pos_b, rot_b, v_b, w_b, prev_pos_b, prev_rot_b,
            oh_i, oh_j, gather_i, gather_j, segsum,
            speculative=speculative)

        # ---- writeback (static bodies keep their state) ------------------
        keep = dyn_b
        outs = (
            [jnp.where(keep, a, b) for a, b in zip(p2, pos_b)]
            + [jnp.where(keep, a, b) for a, b in zip(r2, rot_b)]
            + [jnp.where(keep, a, jnp.zeros_like(a)) for a in v3_]
            + [jnp.where(keep, a, jnp.zeros_like(a)) for a in w3_]
        )
        out_ref[:] = jnp.stack(outs, axis=1)                 # [Wt, C_OUT, n]

    return kernel


def _inkernel_broadphase(tables, Wt, n, K, D, packed, dtv,
                         inflate: float = 0.0):
    """Velocity-expanded AABBs + dense rank-compaction broadphase, fully
    in VMEM (the simple_jobs-kernel pattern brought to physics; replaces
    the XLA bp_update_aabbs + bp_find_overlaps nodes, ~6 ms/step of the
    43.9 ms step at 8192x64).  Exactly mirrors the XLA dense 'rank' mode:
    pair slots ascending in (owner=higher row, partner) order, per-owner
    degree cap D accounted in the dropped stat.

    packed [Wt, FC_IN, n]; dtv [Wt, 1] = delta_t * velocity_expansion.
    inflate: constant extra AABB inflation per side (persistent-manifold
    mode inflates by margin/2 so the candidate set stays a superset while
    every body's surface moves less than margin/2).
    Returns (rows_i, rows_j, kvalid_f [Wt, 1, K] f32; lo3, hi3 [Wt,3,n];
    stats [Wt, 1, 128] with lane0=count, lane1=dropped).
    """
    pos = _c3(packed, F_POS)
    vel = _c3(packed, F_V)
    scl = _c3(packed, F_SCALE)
    live = packed[:, F_LIVE]                      # [Wt, n]
    obj = jnp.round(packed[:, F_OBJ]).astype(jnp.int32)
    lo_l = tables.vec(obj, "local_aabb_lo")
    hi_l = tables.vec(obj, "local_aabb_hi")
    c_l = tuple((lo + hi) * 0.5 * s for lo, hi, s in zip(lo_l, hi_l, scl))
    he = tuple((hi - lo) * 0.5 * s for lo, hi, s in zip(lo_l, hi_l, scl))

    qw, qx, qy, qz = _c4(packed, F_ROT)
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - qw * qz)
    r02 = 2.0 * (qx * qz + qw * qy)
    r10 = 2.0 * (qx * qy + qw * qz)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - qw * qx)
    r20 = 2.0 * (qx * qz - qw * qy)
    r21 = 2.0 * (qy * qz + qw * qx)
    r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    R = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
    # exact rotated-AABB: center +- |R| @ half (bp_update_aabbs' form)
    los, his = [], []
    for a in range(3):
        cw = pos[a] + sum(R[a][b] * c_l[b] for b in range(3))
        ext = sum(jnp.abs(R[a][b]) * he[b] for b in range(3))
        vexp = vel[a] * dtv
        los.append(cw - ext + jnp.minimum(vexp, 0.0) - inflate)
        his.append(cw + ext + jnp.maximum(vexp, 0.0) + inflate)
    lo3 = jnp.stack(los, axis=1)                  # [Wt, 3, n]
    hi3 = jnp.stack(his, axis=1)

    # constant triangulars (folded)
    tri_incl = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                ).astype(jnp.float32)             # [i', i]: i' <= i
    strict_lower = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                    > jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                    ).astype(jnp.float32)         # [r, c]: c < r
    i_iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (n, 1), 0).astype(jnp.float32)

    ri_out, rj_out, kv_out, st_out = [], [], [], []
    for w in range(Wt):
        lo_w, hi_w = lo3[w], hi3[w]               # [3, n]
        ok = (jnp.transpose(live[w:w + 1, :])
              * live[w:w + 1, :])                 # [n, n]
        for a in range(3):
            lo_r = lo_w[a:a + 1, :]
            hi_r = hi_w[a:a + 1, :]
            ok = ok * ((jnp.transpose(lo_r) <= hi_r)
                       & (jnp.transpose(hi_r) >= lo_r)).astype(jnp.float32)
        # owner = HIGHER row (XLA rank mode): P[j, i] live for i < j
        P = ok * strict_lower
        rank = jax.lax.dot_general(
            P, tri_incl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [j, i]
        deg = rank[:, n - 1:n]                    # [n, 1]
        degc = jnp.minimum(deg, float(D))
        base = jax.lax.dot_general(
            strict_lower, degc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [j, 1] exclusive prefix
        total = jnp.sum(degc)
        dropped = jnp.sum(deg) - total
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        st_out.append(jnp.where(lane == 0, total, 0.0)
                      + jnp.where(lane == 1, dropped, 0.0))

        rank_ok = jnp.where(P > 0.5, rank, 0.0)   # [j, i]
        base_row = jnp.transpose(base)            # [1, n] (narrow)
        degc_row = jnp.transpose(degc)

        ri_chunks, rj_chunks, kv_chunks = [], [], []
        for c0 in range(0, K, 128):
            k_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1).astype(jnp.float32) + float(c0)
            cmp = (base <= k_iota).astype(jnp.float32)    # [n, 128]
            owner = jnp.sum(cmp, axis=0, keepdims=True) - 1.0
            owner = jnp.clip(owner, 0.0, float(n - 1))
            oidx = owner.astype(jnp.int32)
            brow = jnp.concatenate([base_row, degc_row], axis=0)
            bg = jnp.take_along_axis(
                brow, jnp.broadcast_to(oidx, (2, 128)), axis=1)
            dd = k_iota - bg[0:1, :]
            valid = (k_iota < total) & (dd >= 0) & (dd < bg[1:2, :])
            oh = (i_iota_c == owner).astype(jnp.float32)  # [n(j), 128]
            rank_g = jax.lax.dot_general(
                rank_ok, oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [i, 128]
            sel = ((rank_g == (dd + 1.0))
                   & jnp.broadcast_to(valid, (n, 128))).astype(jnp.float32)
            partner = jnp.sum(sel * i_iota_c, axis=0,
                              keepdims=True)              # [1, 128]
            validf = valid.astype(jnp.float32)
            ri_chunks.append(partner * validf)
            rj_chunks.append(owner * validf)
            kv_chunks.append(validf)
        ri_out.append(jnp.concatenate(ri_chunks, axis=1))
        rj_out.append(jnp.concatenate(rj_chunks, axis=1))
        kv_out.append(jnp.concatenate(kv_chunks, axis=1))

    rows_i = jnp.stack(ri_out, axis=0)            # [Wt, 1, K] f32
    rows_j = jnp.stack(rj_out, axis=0)
    kvalid_f = jnp.stack(kv_out, axis=0)
    stats = jnp.stack(st_out, axis=0)             # [Wt, 1, 128]
    return rows_i, rows_j, kvalid_f, lo3, hi3, stats


def _make_fused_kernel(tables: pk.ObjTables, Wt: int, n: int, K: int,
                       relaxation: float, num_substeps: int,
                       speculative: float = 0.0,
                       refresh: bool = False, sleep: bool = False,
                       bp_degree: int = 0, persist_margin: float = 0.0):
    """All-substeps kernel: integrate + contact solve looped in VMEM.

    refresh=True runs the full SAT + clip narrowphase only on the FIRST
    substep and refreshes the cached manifold by transform on the rest
    (pk.cache_contacts/refresh_contacts) — one collision detection per
    step, the standard engine trade.  The reference re-runs narrowphase
    every substep (physics.cpp:1149-1199); this is a documented
    TPU-motivated deviation, off by default.

    sleep=True reads a per-world active flag from scal channel 5 and
    skips the ENTIRE substep pipeline (pl.when early-exit) for world
    blocks where every world is asleep, writing the frozen passthrough
    instead; awake-block worlds that are individually asleep get the
    passthrough by per-world select.  World-level sleeping is beyond the
    reference (no sleeping in physics.cpp); the skip is real wall-clock
    because grid programs execute sequentially per TensorCore.

    persist_margin > 0 (with bp_degree and refresh): CROSS-STEP
    persistent manifolds — the generalization of sleeping from
    fully-frozen worlds to worlds whose bodies have moved less than
    margin/2 since their manifold cache was built (the stable flag
    arrives per world on scal channel 7; the cache and its broadphase
    rows on mc_ref).  Stable worlds skip candidate construction AND the
    SAT + clip narrowphase (pl.when when the whole block is stable;
    per-world select otherwise, so trajectories never depend on block
    composition), refreshing the cached manifold by transform instead —
    the same trade contact_refresh makes within a step, extended across
    steps.  Unstable worlds rebuild, and the refreshed-rebuild equals the
    fresh contacts exactly (anchors coincide at build poses)."""
    persist = persist_margin > 0.0

    def kernel(packed_ref, rows_i_ref, rows_j_ref, kvalid_ref, scal_ref,
               out_ref, aabb_ref=None, pairs_ref=None, bp_stats_ref=None,
               mc_ref=None, mc_out_ref=None, mc_scratch=None):
        packed = packed_ref[:]                      # [Wt, FC_IN, n]
        pos = _c3(packed, F_POS)
        rot = _c4(packed, F_ROT)
        v = _c3(packed, F_V)
        w = _c3(packed, F_W)

        def passthrough():
            # frozen world: pose/velocity unchanged, stashes = current
            outs = (list(pos) + list(rot) + list(v) + list(w)
                    + list(pos) + list(rot)
                    + list(pos) + list(rot) + list(v) + list(w))
            return jnp.stack(outs, axis=1)          # [Wt, FC_OUT, n]

        def solve():
            h1 = scal_ref[:, 0, 0:1]                # [Wt, 1]
            rest1 = scal_ref[:, 0, 1:2]
            g = (scal_ref[:, 0, 2:3], scal_ref[:, 0, 3:4],
                 scal_ref[:, 0, 4:5])

            if persist:
                stable_w = scal_ref[:, 0, 7]        # [Wt] 1.0 = stable
                all_stable = jnp.min(stable_w) > 0.5
                selw = stable_w[:, None, None] > 0.5
                mc = mc_ref[:]                      # [Wt, MC_CHANNELS, K]
                cached_rows = mc[:, :MC_ROWS]
                aabb_in = packed[:, F_ALO:F_AHI + 3]
                lane128 = jax.lax.broadcasted_iota(
                    jnp.int32, (Wt, 1, 128), 2)
                cnt = jnp.sum(mc[:, 2], axis=-1)[:, None, None]
                # lane1 (dropped) = 0 is EXACT for stable worlds: the
                # host only marks a cache valid when its build had zero
                # degree-cap drops (physics/__init__.py), so a dirty
                # build rebuilds every step and keeps its drops
                # accounted there
                cached_stats = jnp.where(lane128 == 0, cnt, 0.0)
                dtv = scal_ref[:, 0, 6:7]

                @pl.when(jnp.logical_not(all_stable))
                def _():
                    ri, rj, kv, lo3, hi3, st = _inkernel_broadphase(
                        tables, Wt, n, K, bp_degree, packed, dtv,
                        inflate=0.5 * persist_margin)
                    pairs_ref[:] = jnp.where(
                        selw, cached_rows,
                        jnp.concatenate([ri, rj, kv], axis=1))
                    aabb_ref[:] = jnp.where(
                        selw, aabb_in, jnp.concatenate([lo3, hi3], axis=1))
                    bp_stats_ref[:] = jnp.where(selw, cached_stats, st)

                @pl.when(all_stable)
                def _():
                    pairs_ref[:] = cached_rows
                    aabb_ref[:] = aabb_in
                    bp_stats_ref[:] = cached_stats

                pr = pairs_ref[:]
                rows_i_a = pr[:, 0:1].astype(jnp.int32)
                rows_j_a = pr[:, 1:2].astype(jnp.int32)
                kvalid_a = pr[:, 2:3]
            elif bp_degree:
                dtv = scal_ref[:, 0, 6:7]           # delta_t * expansion
                rows_i_a, rows_j_a, kvalid_a, lo3, hi3, bp_stats = \
                    _inkernel_broadphase(tables, Wt, n, K, bp_degree,
                                         packed, dtv)
                aabb_ref[:] = jnp.concatenate([lo3, hi3], axis=1)
                pairs_ref[:] = jnp.concatenate(
                    [rows_i_a, rows_j_a, kvalid_a], axis=1)
                bp_stats_ref[:] = bp_stats
                rows_i_a = rows_i_a.astype(jnp.int32)
                rows_j_a = rows_j_a.astype(jnp.int32)
            else:
                rows_i_a = rows_i_ref[:]
                rows_j_a = rows_j_ref[:]
                kvalid_a = kvalid_ref[:]
            kvalid = kvalid_a[:, 0] > 0.5

            oh_i, oh_j, gather_i, gather_j, segsum = _mk_pair_io(
                Wt, n, K, rows_i_a, rows_j_a, kvalid_a)

            # static pair data: gathered ONCE, reused across substeps
            gSA = gather_i(packed[:, F_STATIC0:F_STATIC0 + FC_STATIC],
                           FC_STATIC)
            gSB = gather_j(packed[:, F_STATIC0:F_STATIC0 + FC_STATIC],
                           FC_STATIC)
            SA = _unpack_static(gSA, kvalid)
            SB = _unpack_static(gSB, kvalid)

            im_b = packed[:, F_IM]
            ii_b = _c3(packed, F_II)
            extf = _c3(packed, F_EXTF)
            extt = _c3(packed, F_EXTT)
            dyn_b = packed[:, F_DYN] > 0.5

            posc, rotc, vc, wc = pos, rot, v, w
            prev_pos = posc
            prev_rot = rotc
            ps_pos, ps_rot, ps_v, ps_w = posc, rotc, vc, wc
            cache = None
            for step_i in range(num_substeps):
                prev_pos, prev_rot = posc, rotc
                pos_i, rot_i, v_i, w_i = _integrate(
                    posc, rotc, vc, wc, im_b, ii_b, extf, extt, dyn_b,
                    h1, g)
                ps_pos, ps_rot, ps_v, ps_w = pos_i, rot_i, v_i, w_i

                resolver = None
                if persist and step_i == 0:
                    def resolver(PA, PB):
                        # per-world cache choice: cached manifold for
                        # stable worlds, fresh SAT + clip for the rest —
                        # SAT skipped entirely when the block is stable
                        @pl.when(jnp.logical_not(all_stable))
                        def _():
                            FA = pk.body_fields(PA["pos"], PA["rot"],
                                                SA["obj"], tables)
                            FB = pk.body_fields(PB["pos"], PB["rot"],
                                                SB["obj"], tables)
                            fresh = pk.cache_contacts(
                                pk.pair_contacts(
                                    FA, FB, kvalid,
                                    speculative=speculative),
                                PA, PB)
                            mc_scratch[:] = jnp.where(
                                selw, mc[:, MC_ROWS:], _pack_cache(fresh))

                        @pl.when(all_stable)
                        def _():
                            mc_scratch[:] = mc[:, MC_ROWS:]

                        return _parse_cache(mc_scratch[:])

                want_cache = (persist or refresh) and step_i == 0 \
                    and (persist or num_substeps > 1)
                out = _substep_core(
                    tables, relaxation, kvalid, h1, rest1, SA, SB,
                    pos_i, rot_i, v_i, w_i, prev_pos, prev_rot,
                    oh_i, oh_j, gather_i, gather_j, segsum,
                    speculative=speculative,
                    cached=cache if refresh else None,
                    want_cache=want_cache,
                    cache_resolver=resolver)
                if want_cache:
                    p2, r2, _v2, _w2, v3_, w3_, cache = out
                else:
                    p2, r2, _v2, _w2, v3_, w3_ = out
                if persist and step_i == 0:
                    mc_out_ref[:] = jnp.concatenate(
                        [pairs_ref[:], mc_scratch[:]], axis=1)

                keep = dyn_b
                posc = tuple(jnp.where(keep, a, b)
                             for a, b in zip(p2, posc))
                rotc = tuple(jnp.where(keep, a, b)
                             for a, b in zip(r2, rotc))
                vc = tuple(jnp.where(keep, a, jnp.zeros_like(a))
                           for a in v3_)
                wc = tuple(jnp.where(keep, a, jnp.zeros_like(a))
                           for a in w3_)

            outs = (list(posc) + list(rotc) + list(vc) + list(wc)
                    + list(prev_pos) + list(prev_rot)
                    + list(ps_pos) + list(ps_rot) + list(ps_v)
                    + list(ps_w))
            return jnp.stack(outs, axis=1)          # [Wt, FC_OUT, n]

        if not sleep:
            out_ref[:] = solve()
            return

        active = scal_ref[:, 0, 5]                  # [Wt] 1.0 = awake
        blk_active = jnp.max(active) > 0.5

        @pl.when(blk_active)
        def _():
            # per-world select: frozen worlds inside an awake block keep
            # their state bit-exactly (the solve would otherwise drift
            # them by the integrate/contact residual each step)
            aw = active[:, None, None] > 0.5
            out_ref[:] = jnp.where(aw, solve(), passthrough())

        @pl.when(jnp.logical_not(blk_active))
        def _():
            out_ref[:] = passthrough()
            if persist:
                # fully-asleep block under persist: the broadphase/cache
                # surface passes through unchanged too
                mc0 = mc_ref[:]
                pairs_ref[:] = mc0[:, :MC_ROWS]
                aabb_ref[:] = packed_ref[:][:, F_ALO:F_AHI + 3]
                lane128 = jax.lax.broadcasted_iota(
                    jnp.int32, (Wt, 1, 128), 2)
                cnt0 = jnp.sum(mc0[:, 2], axis=-1)[:, None, None]
                bp_stats_ref[:] = jnp.where(lane128 == 0, cnt0, 0.0)
                mc_out_ref[:] = mc0

    return kernel


def _make_fused_kernel_chunked(tables: pk.ObjTables, Wt: int, n: int,
                               K: int, relaxation: float,
                               num_substeps: int,
                               speculative: float = 0.0,
                               refresh: bool = False):
    """K-SLAB CHUNKED all-substeps kernel (used when the candidate
    capacity K exceeds one 128-lane tile, e.g. the 8192x128-body point
    whose validated capacity is K=384): the whole pair pipeline — one-hot
    build, gathers, SAT + clip narrowphase, positional pass, segment
    sums, velocity pass — runs per 128-slot K-slab under a pl.when
    dead-slab skip, so per-step cost tracks the BLOCK's actual candidate
    count instead of the capacity contract (the simple_jobs dead-chunk
    trick, ops/simple_jobs_kernel.py:139-192, brought to physics).
    Candidate slots are a validity prefix (broadphase emits compacted
    ascending slots), so slab c is dead exactly when c*128 >= max world
    total in the block.  Per-pair results accumulate into VMEM scratch
    ([Wt, 9|6, n] segment-sum accumulators, a contacts+lambda stash and
    the refresh cache, all slab-sliced), making slab order irrelevant and
    results bit-identical to the unchunked kernel up to segment-sum
    addition order.  External-rows path only (in-kernel broadphase
    requires <= 128 bodies, which implies K <= 128 capacities in
    practice)."""
    NC = K // 128
    bounce = tables.any_restitution
    # contacts+lambda slab stash: ok 1, normal 3, points 12, depth 4,
    # num_points 1, lam 4
    CL = 25

    def kernel(packed_ref, rows_i_ref, rows_j_ref, kvalid_ref, scal_ref,
               out_ref, st_s, acc_s, accv_s, cl_s, mcc_s=None):
        # mcc_s (the cross-substep refresh cache) is only allocated when
        # refresh is on — dead VMEM would otherwise shrink the live-set
        # headroom the chunked path exists to create
        packed = packed_ref[:]                      # [Wt, FC_IN, n]
        h1 = scal_ref[:, 0, 0:1]
        rest1 = scal_ref[:, 0, 1:2]
        g = (scal_ref[:, 0, 2:3], scal_ref[:, 0, 3:4], scal_ref[:, 0, 4:5])
        rows_i_a = rows_i_ref[:]
        rows_j_a = rows_j_ref[:]
        kvalid_a = kvalid_ref[:]
        tmax = jnp.max(jnp.sum(kvalid_a, axis=2))   # block max pair count

        pos = _c3(packed, F_POS)
        rot = _c4(packed, F_ROT)
        v = _c3(packed, F_V)
        w = _c3(packed, F_W)
        im_b = packed[:, F_IM]
        ii_b = _c3(packed, F_II)
        extf = _c3(packed, F_EXTF)
        extt = _c3(packed, F_EXTT)
        dyn_b = packed[:, F_DYN] > 0.5

        n_tiles = n // 128
        assert n & (n - 1) == 0

        def slab(c):
            c0 = c * 128
            sl = slice(c0, c0 + 128)
            rows_i_c = rows_i_a[:, :, sl]
            rows_j_c = rows_j_a[:, :, sl]
            kvf_c = kvalid_a[:, :, sl]
            kv_c = kvf_c[:, 0] > 0.5

            # per-world 2D one-hots ([n,1] iota vs [1,128] rows — the
            # _inkernel_broadphase pattern; a sliced 3D broadcast here
            # hits a Mosaic "Invalid input layout" on vector.broadcast)
            i_iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

            def onehot_w(rows, wi):
                return ((i_iota_c == rows[wi])
                        & (kvf_c[wi] > 0.5)).astype(jnp.float32)  # [n,128]

            def gather_rows(rows):
                def gather(mat, C):
                    outs = []
                    for wi in range(Wt):
                        xw = mat[wi]                       # [C, n]
                        idxb = jnp.broadcast_to(rows[wi], (C, 128))
                        if n_tiles == 1:
                            outs.append(jnp.take_along_axis(xw, idxb,
                                                            axis=1))
                            continue
                        acc = jnp.zeros((C, 128), xw.dtype)
                        for t in range(n_tiles):
                            tile = xw[:, t * 128:(t + 1) * 128]
                            gg = jnp.take_along_axis(
                                tile, jnp.clip(idxb - t * 128, 0, 127),
                                axis=1)
                            sel = ((idxb >= t * 128)
                                   & (idxb < (t + 1) * 128))
                            acc = jnp.where(sel, gg, acc)
                        outs.append(acc)
                    return jnp.stack(outs, axis=0)
                return gather

            def segsum(packA, packB):
                pack = jnp.concatenate([packA, packB], axis=2)
                return jnp.stack([
                    jax.lax.dot_general(
                        pack[wi],
                        jnp.concatenate([onehot_w(rows_i_c, wi),
                                         onehot_w(rows_j_c, wi)], axis=1),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    for wi in range(Wt)], axis=0)

            return (kv_c, gather_rows(rows_i_c), gather_rows(rows_j_c),
                    segsum, sl)

        slabs = [slab(c) for c in range(NC)]

        def active(c):
            return jnp.float32(c * 128) < tmax

        # ---- static pair channels, gathered once per step per slab -----
        for c in range(NC):
            kv_c, gi, gj, _, sl = slabs[c]

            @pl.when(active(c))
            def _(kv_c=kv_c, gi=gi, gj=gj, sl=sl):
                st_s[:, 0:FC_STATIC, sl] = gi(
                    packed[:, F_STATIC0:F_STATIC0 + FC_STATIC], FC_STATIC)
                st_s[:, FC_STATIC:2 * FC_STATIC, sl] = gj(
                    packed[:, F_STATIC0:F_STATIC0 + FC_STATIC], FC_STATIC)

            @pl.when(jnp.logical_not(active(c)))
            def _(sl=sl):
                st_s[:, :, sl] = jnp.zeros((Wt, 2 * FC_STATIC, 128),
                                           jnp.float32)

        posc, rotc, vc, wc = pos, rot, v, w
        prev_pos = posc
        prev_rot = rotc
        ps_pos, ps_rot, ps_v, ps_w = posc, rotc, vc, wc
        for step_i in range(num_substeps):
            prev_pos, prev_rot = posc, rotc
            pos_i, rot_i, v_i, w_i = _integrate(
                posc, rotc, vc, wc, im_b, ii_b, extf, extt, dyn_b, h1, g)
            ps_pos, ps_rot, ps_v, ps_w = pos_i, rot_i, v_i, w_i

            # ---- positional phase, slab loop ---------------------------
            acc_s[:] = jnp.zeros((Wt, 9, n), jnp.float32)
            if refresh and step_i == 0:
                mcc_s[:] = jnp.zeros((Wt, MC_CACHE, K), jnp.float32)
            cl_s[:] = jnp.zeros((Wt, CL, K), jnp.float32)
            dyn_pair = jnp.stack(
                list(pos_i) + list(rot_i) + list(prev_pos), axis=1)

            for c in range(NC):
                kv_c, gi, gj, segsum, sl = slabs[c]

                @pl.when(active(c))
                def _(kv_c=kv_c, gi=gi, gj=gj, segsum=segsum, sl=sl,
                      step_i=step_i):
                    gA = gi(dyn_pair, 10)
                    gB = gj(dyn_pair, 10)
                    stg = st_s[:, :, sl]
                    SA = _unpack_static(stg[:, 0:FC_STATIC], kv_c)
                    SB = _unpack_static(stg[:, FC_STATIC:2 * FC_STATIC],
                                        kv_c)

                    PA = _side1(gA, SA, kv_c)
                    PB = _side1(gB, SB, kv_c)
                    if refresh and step_i > 0:
                        contacts = pk.refresh_contacts(
                            _parse_cache(mcc_s[:, :, sl]), PA, PB)
                    else:
                        FA = pk.body_fields(PA["pos"], PA["rot"],
                                            SA["obj"], tables)
                        FB = pk.body_fields(PB["pos"], PB["rot"],
                                            SB["obj"], tables)
                        contacts = pk.pair_contacts(
                            FA, FB, kv_c, speculative=speculative)
                        if refresh and step_i == 0:
                            mcc_s[:, :, sl] = _pack_cache(
                                pk.cache_contacts(contacts, PA, PB))
                    packA, packB, lam = pk.positional_pass(
                        PA, PB, contacts, relaxation=relaxation)
                    acc_s[:] = acc_s[:] + segsum(packA, packB)
                    cl = [contacts["ok"].astype(jnp.float32)]
                    cl.extend(contacts["normal"])
                    for cc in range(3):
                        for p in range(4):
                            cl.append(contacts["points"][cc][:, p])
                    for p in range(4):
                        cl.append(contacts["depth"][:, p])
                    cl.append(contacts["num_points"].astype(jnp.float32))
                    for p in range(4):
                        cl.append(lam[:, p])
                    cl_s[:, :, sl] = jnp.stack(cl, axis=1)

            acc = acc_s[:]
            p2, r2, v2, w2 = _apply_positional_recover(
                pos_i, rot_i, prev_pos, prev_rot, acc, h1)

            # ---- velocity phase, slab loop -----------------------------
            accv_s[:] = jnp.zeros((Wt, 6, n), jnp.float32)
            chans = (list(p2) + list(r2) + list(v2) + list(w2)
                     + (list(v_i) + list(w_i) if bounce else []))
            packed2 = jnp.stack(chans, axis=1)
            C2 = len(chans)

            for c in range(NC):
                kv_c, gi, gj, segsum, sl = slabs[c]

                @pl.when(active(c))
                def _(kv_c=kv_c, gi=gi, gj=gj, segsum=segsum, sl=sl):
                    gA2 = gi(packed2, C2)
                    gB2 = gj(packed2, C2)
                    stg = st_s[:, :, sl]
                    SA = _unpack_static(stg[:, 0:FC_STATIC], kv_c)
                    SB = _unpack_static(stg[:, FC_STATIC:2 * FC_STATIC],
                                        kv_c)
                    clg = cl_s[:, :, sl]
                    contacts = {
                        "ok": clg[:, 0] > 0.5,
                        "normal": tuple(clg[:, 1 + cc] for cc in range(3)),
                        "points": tuple(
                            jnp.stack([clg[:, 4 + cc * 4 + p]
                                       for p in range(4)], axis=1)
                            for cc in range(3)),
                        "depth": jnp.stack(
                            [clg[:, 16 + p] for p in range(4)], axis=1),
                        "num_points": jnp.round(
                            clg[:, 20]).astype(jnp.int32),
                    }
                    lam = jnp.stack([clg[:, 21 + p] for p in range(4)],
                                    axis=1)

                    vpA, vpB = pk.velocity_pass(
                        _side2(gA2, SA, kv_c, bounce, tables),
                        _side2(gB2, SB, kv_c, bounce, tables),
                        contacts, lam, h1, rest1,
                        speculative=speculative)
                    accv_s[:] = accv_s[:] + segsum(vpA, vpB)

            accv = accv_s[:]
            v3_ = pk.v3add(v2, _c3(accv, 0))
            w3_ = pk.v3add(w2, _c3(accv, 3))

            keep = dyn_b
            posc = tuple(jnp.where(keep, a, b) for a, b in zip(p2, posc))
            rotc = tuple(jnp.where(keep, a, b) for a, b in zip(r2, rotc))
            vc = tuple(jnp.where(keep, a, jnp.zeros_like(a)) for a in v3_)
            wc = tuple(jnp.where(keep, a, jnp.zeros_like(a)) for a in w3_)

        outs = (list(posc) + list(rotc) + list(vc) + list(wc)
                + list(prev_pos) + list(prev_rot)
                + list(ps_pos) + list(ps_rot) + list(ps_v) + list(ps_w))
        out_ref[:] = jnp.stack(outs, axis=1)

    return kernel


def _pick_wt(W: int, K: int, override=None) -> int:
    env = override or os.environ.get("GEM_TPU_SUBSTEP_WT")
    if env:
        return int(env)
    # Live-set pressure: measured at 8192x64 (K=256) the fused kernel runs
    # fastest at Wt=4 (89ms) vs Wt=8 (100ms) — bigger blocks spill
    wt = max(1, 1024 // max(K, 1))
    while wt > 1 and W % wt != 0:
        wt -= 1
    return wt


_COMPILER_PARAMS = pltpu.CompilerParams(
    # world blocks are independent: lets megacore chips (v4/v5p) split
    # the grid across both TensorCores
    dimension_semantics=("parallel",),
    # the pair working set legitimately exceeds the default 16MB
    # scoped-vmem budget at larger world blocks; v5e/v5p have 128MB VMEM
    vmem_limit_bytes=100 * 1024 * 1024)


def _pallas_specs(Wt, C_in, n, K, C_out):
    def bs(shape):
        return pl.BlockSpec((Wt,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    return dict(
        in_specs=[bs((C_in, n)), bs((1, K)), bs((1, K)), bs((1, K)),
                  bs((1, 8))],
        out_specs=bs((C_out, n)))


@functools.partial(jax.jit, static_argnames=("tables", "relaxation",
                                              "interpret", "wt",
                                              "speculative"))
def _run(packed, rows_i, rows_j, kvalid, scal, *, tables, relaxation,
         interpret, wt=None, speculative=0.0):
    W, _, n = packed.shape
    K = rows_i.shape[2]
    Wt = _pick_wt(W, K, wt)
    return pl.pallas_call(
        _make_kernel(tables, Wt, n, K, relaxation, speculative),
        grid=(W // Wt,),
        out_shape=jax.ShapeDtypeStruct((W, C_OUT, n), jnp.float32),
        interpret=interpret,
        debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
        compiler_params=_COMPILER_PARAMS,
        **_pallas_specs(Wt, C_IN, n, K, C_OUT),
    )(packed, rows_i, rows_j, kvalid, scal)


@functools.partial(jax.jit, static_argnames=("tables", "relaxation",
                                              "num_substeps", "interpret",
                                              "wt", "speculative",
                                              "refresh", "sleep",
                                              "bp_degree", "K",
                                              "persist_margin"))
def _run_fused(packed, rows_i, rows_j, kvalid, scal, mc=None, *, tables,
               relaxation, num_substeps, interpret, wt=None,
               speculative=0.0, refresh=False, sleep=False, bp_degree=0,
               K=None, persist_margin=0.0):
    W, _, n = packed.shape
    if K is None:
        K = rows_i.shape[2]
    # K-slab chunked kernels keep only one 128-slot slab's pair state
    # live at a time, so the live-set-pressure heuristic should not see
    # the full capacity: measured at 8192x128 (K=384) Wt=4 gives 62.1K
    # vs Wt=2's 60.7K and Wt=1's 55.4K
    chunked = (K > 128 and not sleep and persist_margin == 0.0
               and os.environ.get("GEM_TPU_SUBSTEP_CHUNKED", "1") != "0"
               and not bp_degree)
    Wt = _pick_wt(W, min(K, 256) if chunked else K, wt)
    kern = _make_fused_kernel(tables, Wt, n, K, relaxation, num_substeps,
                              speculative, refresh, sleep, bp_degree,
                              persist_margin)
    specs = _pallas_specs(Wt, FC_IN, n, K, FC_OUT)

    if persist_margin > 0.0:
        def bsp(shape):
            return pl.BlockSpec(
                (Wt,) + shape, lambda i, _s=len(shape): (i,) + (0,) * _s,
                memory_space=pltpu.VMEM)

        def kern_persist(packed_ref, scal_ref, mc_ref, out_ref, aabb_ref,
                         pairs_ref, bp_stats_ref, mc_out_ref, mc_scratch):
            kern(packed_ref, None, None, None, scal_ref, out_ref,
                 aabb_ref, pairs_ref, bp_stats_ref, mc_ref, mc_out_ref,
                 mc_scratch)

        return pl.pallas_call(
            kern_persist,
            grid=(W // Wt,),
            out_shape=[
                jax.ShapeDtypeStruct((W, FC_OUT, n), jnp.float32),
                jax.ShapeDtypeStruct((W, 6, n), jnp.float32),
                jax.ShapeDtypeStruct((W, 3, K), jnp.float32),
                jax.ShapeDtypeStruct((W, 1, 128), jnp.float32),
                jax.ShapeDtypeStruct((W, MC_CHANNELS, K), jnp.float32)],
            interpret=interpret,
            debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
            compiler_params=_COMPILER_PARAMS,
            in_specs=[bsp((FC_IN_P, n)), bsp((1, 8)),
                      bsp((MC_CHANNELS, K))],
            out_specs=[bsp((FC_OUT, n)), bsp((6, n)), bsp((3, K)),
                       bsp((1, 128)), bsp((MC_CHANNELS, K))],
            scratch_shapes=[pltpu.VMEM((Wt, MC_CACHE, K), jnp.float32)],
        )(packed, scal, mc)

    if not bp_degree:
        if (K > 128 and not sleep
                and os.environ.get("GEM_TPU_SUBSTEP_CHUNKED", "1") != "0"):
            # K-slab chunked path: cost tracks actual pairs, not the
            # capacity contract (see _make_fused_kernel_chunked)
            kern_c = _make_fused_kernel_chunked(
                tables, Wt, n, K, relaxation, num_substeps, speculative,
                refresh)
            return pl.pallas_call(
                kern_c,
                grid=(W // Wt,),
                out_shape=jax.ShapeDtypeStruct((W, FC_OUT, n), jnp.float32),
                interpret=interpret,
                debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
                compiler_params=_COMPILER_PARAMS,
                scratch_shapes=[
                    pltpu.VMEM((Wt, 2 * FC_STATIC, K), jnp.float32),
                    pltpu.VMEM((Wt, 9, n), jnp.float32),
                    pltpu.VMEM((Wt, 6, n), jnp.float32),
                    pltpu.VMEM((Wt, 25, K), jnp.float32),
                ] + ([pltpu.VMEM((Wt, MC_CACHE, K), jnp.float32)]
                     if refresh else []),
                **specs,
            )(packed, rows_i, rows_j, kvalid, scal)
        return pl.pallas_call(
            kern,
            grid=(W // Wt,),
            out_shape=jax.ShapeDtypeStruct((W, FC_OUT, n), jnp.float32),
            interpret=interpret,
            debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
            compiler_params=_COMPILER_PARAMS,
            **specs,
        )(packed, rows_i, rows_j, kvalid, scal)

    # in-kernel broadphase: rows inputs replaced by bp outputs
    def bs(shape):
        return pl.BlockSpec((Wt,) + shape,
                            lambda i, _s=len(shape): (i,) + (0,) * _s,
                            memory_space=pltpu.VMEM)

    def kern_bp(packed_ref, scal_ref, out_ref, aabb_ref, pairs_ref,
                bp_stats_ref):
        kern(packed_ref, None, None, None, scal_ref, out_ref,
             aabb_ref, pairs_ref, bp_stats_ref)

    return pl.pallas_call(
        kern_bp,
        grid=(W // Wt,),
        out_shape=[jax.ShapeDtypeStruct((W, FC_OUT, n), jnp.float32),
                   jax.ShapeDtypeStruct((W, 6, n), jnp.float32),
                   jax.ShapeDtypeStruct((W, 3, K), jnp.float32),
                   jax.ShapeDtypeStruct((W, 1, 128), jnp.float32)],
        interpret=interpret,
        debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[bs((FC_IN, n)), bs((1, 8))],
        out_specs=[bs((FC_OUT, n)), bs((6, n)), bs((3, K)), bs((1, 128))],
    )(packed, scal)


def _pad_lanes(x, n0, n):
    if n == n0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n - n0)))


def _pad_pairs(rows_i, rows_j, kvalid, K0):
    K = max(128, -(-K0 // 128) * 128)
    if K != K0:
        padk = ((0, 0), (0, K - K0))
        rows_i = jnp.pad(rows_i, padk)
        rows_j = jnp.pad(rows_j, padk)
        kvalid = jnp.pad(kvalid, padk)
    return rows_i, rows_j, kvalid


def _T(x):
    return jnp.swapaxes(x, 1, 2)


def _T1(x):
    return x[:, None, :]


class SubstepKernel:
    """Single-substep kernel driver (joint-interleaved path).

    Construct once at taskgraph-build time with the object manager; call
    per substep with body columns.  Handles lane padding (n -> one full
    128-lane tile; K -> x128).
    """

    def __init__(self, object_manager, relaxation: float = 1.0,
                 interpret: bool = False, wt=None, speculative: float = 0.0):
        self.tables = pk.ObjTables(object_manager)
        self.relaxation = float(relaxation)
        self.interpret = bool(interpret)
        self.wt = wt  # None = heuristic/env (see _pick_wt)
        self.speculative = float(speculative)

    def __call__(self, *, pos, rot, v, w, prev_pos, prev_rot, im, ii,
                 mu_s, mu_d, obj, dyn, rows_i, rows_j,
                 kvalid, h, restitution_threshold):
        """All body args [W, n(,3/4)]; pair args [W, K]; h/rest [W].
        Returns (pos, rot, v, w) updated [W, n, ...]."""
        W, n0 = im.shape
        packed = jnp.concatenate([
            _T(pos), _T(rot), _T(prev_pos),
            _T1(im), _T(ii), _T1(mu_s), _T1(mu_d),
            _T1(obj.astype(jnp.float32)),
            _T(v), _T(w), _T(prev_rot), _T1(dyn.astype(jnp.float32)),
        ], axis=1)                                    # [W, C_IN, n0]
        # pad bodies to a full 128-lane tile: enables the native dynamic
        # lane gather in the kernel (and K is always a multiple of 128).
        # Beyond 128, the next power of two (the kernel's batched one-hot
        # build folds the world axis with a power-of-two lane mask)
        n = 128
        while n < n0:
            n *= 2
        packed = _pad_lanes(packed, n0, n)
        rows_i, rows_j, kvalid = _pad_pairs(rows_i, rows_j, kvalid,
                                            rows_i.shape[1])
        scal = jnp.stack([h, restitution_threshold] + [jnp.zeros_like(h)] * 6,
                         axis=1)                      # [W, 8]

        out = _run(packed, rows_i[:, None, :], rows_j[:, None, :],
                   kvalid.astype(jnp.float32)[:, None, :], scal[:, None, :],
                   tables=self.tables, relaxation=self.relaxation,
                   interpret=self.interpret, wt=self.wt,
                   speculative=self.speculative)         # [W, C_OUT, n]
        out = out[:, :, :n0]
        return (_T(out[:, 0:3]), _T(out[:, 3:7]), _T(out[:, 7:10]),
                _T(out[:, 10:13]))


class FusedSubstepKernel:
    """All-substeps kernel driver: one pallas_call per STEP.

    Returns the final state plus the last substep's stash values
    (prev pos/rot, pre-solve pose and velocities) for the PreSolve* /
    SubstepPrevState component columns.
    """

    def __init__(self, object_manager, num_substeps: int,
                 relaxation: float = 1.0, interpret: bool = False, wt=None,
                 speculative: float = 0.0,
                 contact_refresh: bool = False, bp_degree: int = 0,
                 bp_capacity: int = 0, persist_margin: float = 0.0):
        self.tables = pk.ObjTables(object_manager)
        self.num_substeps = int(num_substeps)
        self.relaxation = float(relaxation)
        self.interpret = bool(interpret)
        self.wt = wt  # None = heuristic/env (see _pick_wt)
        self.speculative = float(speculative)
        self.contact_refresh = bool(contact_refresh)
        # bp_degree > 0: run the velocity-expanded AABB + rank-compaction
        # broadphase INSIDE the kernel (_inkernel_broadphase); callers
        # then pass no rows and read aabbs/pairs/stats from the outputs
        self.bp_degree = int(bp_degree)
        self.bp_capacity = int(bp_capacity)
        # persist_margin > 0: cross-step persistent manifolds (requires
        # bp_degree + contact_refresh); callers pass mcache/stable/
        # aabb_lo/aabb_hi and read the updated "mcache" output
        self.persist_margin = float(persist_margin)
        if self.persist_margin > 0.0 and not (self.bp_degree
                                              and self.contact_refresh):
            raise ValueError("persist_margin requires the in-kernel "
                             "broadphase (bp_degree) and contact_refresh")

    def __call__(self, *, pos, rot, v, w, im, ii, mu_s, mu_d, obj,
                 ext_f, ext_t, dyn, h, gravity,
                 restitution_threshold, rows_i=None, rows_j=None,
                 kvalid=None, active=None, scale=None, live=None,
                 dtv=None, mcache=None, stable=None, aabb_lo=None,
                 aabb_hi=None):
        """Body args [W, n(,3/4)]; pair args [W, K]; h/rest [W],
        gravity [W, 3]; active [W] (1.0 = awake, None = all awake).
        With bp_degree set, omit rows_i/rows_j/kvalid and pass scale
        [W, n, 3], live [W, n] and dtv [W] (delta_t * velocity
        expansion); the returned dict then also carries aabb_lo/hi
        [W, n, 3], rows_i/rows_j [W, K] int32, kvalid [W, K] bool,
        bp_count/bp_dropped [W] int32.
        With persist_margin set, also pass mcache [W, MC_CHANNELS, K]
        (the ManifoldPersist singleton), stable [W] (1.0 = reuse the
        cache) and the current aabb_lo/hi [W, n, 3] columns; the
        returned dict carries the updated "mcache".
        Returns a dict of updated columns."""
        W, n0 = im.shape
        if scale is None:
            scale = jnp.ones(pos.shape)
        if live is None:
            live = jnp.ones(im.shape)
        persist = self.persist_margin > 0.0
        chans = [
            _T(pos), _T(rot), _T(v), _T(w),
            _T1(im), _T(ii), _T1(mu_s), _T1(mu_d),
            _T1(obj.astype(jnp.float32)),
            _T(ext_f), _T(ext_t), _T1(dyn.astype(jnp.float32)),
            _T(scale), _T1(live.astype(jnp.float32)),
        ]
        if persist:
            chans += [_T(aabb_lo), _T(aabb_hi)]
        packed = jnp.concatenate(chans, axis=1)       # [W, FC_IN(_P), n0]
        n = 128
        while n < n0:
            n *= 2
        packed = _pad_lanes(packed, n0, n)
        if self.bp_degree:
            # sleep composes with the in-kernel broadphase only through
            # the persistent-manifold path (the frozen passthrough needs
            # the cache surface to echo)
            assert active is None or persist, \
                "sleep + in-kernel broadphase requires persist_margin"
            K = max(128, -(-self.bp_capacity // 128) * 128)
            rows_args = (None, None, None)
        else:
            rows_i, rows_j, kvalid = _pad_pairs(rows_i, rows_j, kvalid,
                                                rows_i.shape[1])
            K = rows_i.shape[1]
            rows_args = (rows_i[:, None, :], rows_j[:, None, :],
                         kvalid.astype(jnp.float32)[:, None, :])
        act = (jnp.ones_like(h) if active is None
               else active.astype(jnp.float32))
        dtv_c = jnp.zeros_like(h) if dtv is None else dtv
        stable_c = (jnp.zeros_like(h) if stable is None
                    else stable.astype(jnp.float32))
        scal = jnp.stack(
            [h, restitution_threshold, gravity[:, 0], gravity[:, 1],
             gravity[:, 2], act, dtv_c, stable_c], axis=1)

        out = _run_fused(
            packed, rows_args[0], rows_args[1], rows_args[2],
            scal[:, None, :], mcache,
            tables=self.tables, relaxation=self.relaxation,
            num_substeps=self.num_substeps, interpret=self.interpret,
            wt=self.wt, speculative=self.speculative,
            refresh=self.contact_refresh,
            sleep=active is not None,
            bp_degree=self.bp_degree, K=K,
            persist_margin=self.persist_margin)
        extra = {}
        if self.bp_degree:
            if persist:
                out, aabb, pairs, stats, mc_out = out
                extra["mcache"] = mc_out
            else:
                out, aabb, pairs, stats = out
            extra.update({
                "aabb_lo": _T(aabb[:, 0:3, :n0]),
                "aabb_hi": _T(aabb[:, 3:6, :n0]),
                "rows_i": pairs[:, 0].astype(jnp.int32),
                "rows_j": pairs[:, 1].astype(jnp.int32),
                "kvalid": pairs[:, 2] > 0.5,
                "bp_count": stats[:, 0, 0].astype(jnp.int32),
                "bp_dropped": stats[:, 0, 1].astype(jnp.int32),
            })
        out = out[:, :, :n0]
        return extra | {
            "pos": _T(out[:, FO_POS:FO_POS + 3]),
            "rot": _T(out[:, FO_ROT:FO_ROT + 4]),
            "v": _T(out[:, FO_V:FO_V + 3]),
            "w": _T(out[:, FO_W:FO_W + 3]),
            "prev_pos": _T(out[:, FO_PREV_POS:FO_PREV_POS + 3]),
            "prev_rot": _T(out[:, FO_PREV_ROT:FO_PREV_ROT + 4]),
            "ps_pos": _T(out[:, FO_PS_POS:FO_PS_POS + 3]),
            "ps_rot": _T(out[:, FO_PS_ROT:FO_PS_ROT + 4]),
            "ps_v": _T(out[:, FO_PS_V:FO_PS_V + 3]),
            "ps_w": _T(out[:, FO_PS_W:FO_PS_W + 3]),
        }
