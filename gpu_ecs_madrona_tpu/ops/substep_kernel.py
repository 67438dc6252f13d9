"""Pallas physics-substep megakernel: narrowphase + XPBD solve in VMEM.

The TPU analog of the reference's megakernel-resident physics substep
(src/mw/device megakernel running narrowphase.cpp + physics.cpp solver
nodes back to back with state in registers/smem): one `pallas_call` per
substep that runs

    gather pairs -> SAT narrowphase -> positional pass -> segment-sum ->
    apply -> velocity recovery -> velocity pass -> segment-sum -> apply

entirely in VMEM.  The XLA pairs pipeline (physics/pairs.py) materializes
every [W, R, K] intermediate in HBM — measured 13.6 ms per substep at
2048 worlds x 256 pairs; this kernel's HBM traffic is one [W, C, n] body
read + one [W, 13, n] write per substep (~100x less).

The pair math is SHARED with the XLA path: physics/pairs.py functions are
written kernel-safe (component-scalarized tuples, no argmin/gather/1D
iota) and are called directly from inside the kernel body on block shapes
[Wt, ...].  One source of truth for the contact model.

Layout per program (grid over world blocks):
    packed  [Wt, C_IN, n]   body channels, channel-major (n = lanes)
    rows_i/j, kvalid [Wt, K]  compacted candidate pairs (K = lanes)
    scal    [Wt, 8]          per-world scalars (h, restitution threshold)
    out     [Wt, C_OUT, n]   pos/rot/vel writeback

Gathers/segment-sums ride the MXU as per-world [C, n] @ [n, K] one-hot
matmuls (cheap here: operands already in VMEM).

Joints are NOT solved in-kernel (they interleave between the positional
and velocity phases); worlds with joints use contact_mode="pairs".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_ecs_madrona_tpu.physics import pairs as pk

# ---- input channel map (channel-major [W, C_IN, n]) -----------------------
CH_POS = 0        # 0:3   post-integrate position
CH_ROT = 3        # 3:7   post-integrate rotation (w,x,y,z)
CH_V = 7          # 7:10  post-integrate linear velocity
CH_W = 10         # 10:13 post-integrate angular velocity
CH_PREV_POS = 13  # 13:16 pre-substep position
CH_PREV_ROT = 16  # 16:20 pre-substep rotation
CH_IM = 20        # inverse mass (0 for static/non-dynamic)
CH_II = 21        # 21:24 inverse inertia diagonal (body frame)
CH_MUS = 24       # static friction
CH_MUD = 25       # dynamic friction
CH_OBJ = 26       # object id (small int as f32)
CH_LO = 27        # 27:30 broadphase AABB lo
CH_HI = 30        # 30:33 broadphase AABB hi
CH_DYN = 33       # 1.0 = dynamic response
C_IN = 34

C_OUT = 13        # pos3 rot4 v3 w3


def _c3(g, lo):
    return (g[:, lo], g[:, lo + 1], g[:, lo + 2])


def _make_kernel(tables: pk.ObjTables, Wt: int, n: int, K: int,
                 relaxation: float):
    # perf attribution (debug only): "novel" skips the velocity pass,
    # "nosolve" also skips the positional pass
    ablate = os.environ.get("GEM_TPU_SUBSTEP_ABLATE", "")

    def kernel(packed_ref, rows_i_ref, rows_j_ref, kvalid_ref, scal_ref,
               out_ref):
        # pair/scalar inputs arrive [Wt, 1, K] / [Wt, 1, 8]: Mosaic block
        # shapes must tile (8, 128) or equal the array's last two dims
        packed = packed_ref[:]                      # [Wt, C_IN, n]
        kvalid = kvalid_ref[:, 0] > 0.5             # [Wt, K]
        h1 = scal_ref[:, 0, 0:1]                    # [Wt, 1]
        rest1 = scal_ref[:, 0, 1:2]

        # ---- one-hot pair matrices + packed gathers (per-world MXU) -----
        iota_nK = jax.lax.broadcasted_iota(jnp.int32, (n, K), 0)

        def onehots(rows_ref):
            ohs = []
            for w in range(Wt):
                rows_row = rows_ref[w]                           # [1, K]
                valid_row = kvalid_ref[w] > 0.5
                ohs.append(((iota_nK == rows_row) & valid_row)
                           .astype(jnp.float32))                 # [n, K]
            return ohs

        def gather(ohs, mat):
            # mat [Wt, C, n] -> [Wt, C, K]
            return jnp.stack([
                jax.lax.dot_general(mat[w], ohs[w], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for w in range(Wt)], axis=0)

        def segsum(ohs, pack):
            # pack [Wt, C, K] (zeroed on dead pairs) -> [Wt, C, n]
            return jnp.stack([
                jax.lax.dot_general(pack[w], ohs[w], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for w in range(Wt)], axis=0)

        oh_i = onehots(rows_i_ref)
        oh_j = onehots(rows_j_ref)
        gA = gather(oh_i, packed)
        gB = gather(oh_j, packed)

        def unpack(g):
            return {
                "pos": _c3(g, CH_POS),
                "rot": (jnp.where(kvalid, g[:, CH_ROT], 1.0),
                        g[:, CH_ROT + 1], g[:, CH_ROT + 2], g[:, CH_ROT + 3]),
                "v": _c3(g, CH_V), "w": _c3(g, CH_W),
                "prev_pos": _c3(g, CH_PREV_POS),
                "im": g[:, CH_IM], "ii": _c3(g, CH_II),
                "mu_s": g[:, CH_MUS], "mu_d": g[:, CH_MUD],
                "obj": jnp.round(g[:, CH_OBJ]).astype(jnp.int32),
                "lo": _c3(g, CH_LO), "hi": _c3(g, CH_HI),
            }

        SA, SB = unpack(gA), unpack(gB)
        pair_ok = kvalid & pk.aabb_overlap(SA["lo"], SA["hi"],
                                           SB["lo"], SB["hi"])

        # ---- narrowphase + positional pass (shared pair-major math) -----
        FA = pk.body_fields(SA["pos"], SA["rot"], SA["obj"], tables)
        FB = pk.body_fields(SB["pos"], SB["rot"], SB["obj"], tables)
        contacts = pk.pair_contacts(FA, FB, pair_ok)

        sideA = {"pos": SA["pos"], "rot": SA["rot"], "im": SA["im"],
                 "ii": SA["ii"], "mu": SA["mu_s"], "prev_pos": SA["prev_pos"]}
        sideB = {"pos": SB["pos"], "rot": SB["rot"], "im": SB["im"],
                 "ii": SB["ii"], "mu": SB["mu_s"], "prev_pos": SB["prev_pos"]}
        if ablate == "nosolve":
            acc = jnp.zeros((Wt, 9, n)) + contacts["depth"][:, 0:1, :n] * 0
        else:
            packA, packB, lam = pk.positional_pass(sideA, sideB, contacts,
                                                   relaxation=relaxation)
            acc = segsum(oh_i, packA) + segsum(oh_j, packB)  # [Wt, 9, n]

        # ---- apply positional + recover velocities (per-body, in VMEM) --
        pos_b = _c3(packed, CH_POS)
        rot_b = (packed[:, CH_ROT], packed[:, CH_ROT + 1],
                 packed[:, CH_ROT + 2], packed[:, CH_ROT + 3])
        prev_pos_b = _c3(packed, CH_PREV_POS)
        prev_rot_b = (packed[:, CH_PREV_ROT], packed[:, CH_PREV_ROT + 1],
                      packed[:, CH_PREV_ROT + 2], packed[:, CH_PREV_ROT + 3])
        dyn_b = packed[:, CH_DYN] > 0.5

        p2 = pk.v3add(pos_b, _c3(acc, 0))
        dw_acc = _c3(acc, 3)
        zero_n = jnp.zeros_like(dw_acc[0])
        dq = pk.qmul((zero_n,) + dw_acc, rot_b)
        r2 = pk.qnormalize(tuple(q + 0.5 * d for q, d in zip(rot_b, dq)))

        # set_velocities (physics.cpp:673-714), bias excluded
        bias = _c3(acc, 6)
        v2 = tuple((p - pp - b) / h1
                   for p, pp, b in zip(p2, prev_pos_b, bias))
        dqv = pk.qmul(r2, (prev_rot_b[0], -prev_rot_b[1],
                           -prev_rot_b[2], -prev_rot_b[3]))
        w2 = tuple(jnp.where(dqv[0] >= 0, 2.0 * c / h1, -2.0 * c / h1)
                   for c in dqv[1:4])

        # ---- velocity pass at post-solve poses ---------------------------
        if ablate in ("novel", "nosolve"):
            v3_, w3_ = v2, w2
            keep = dyn_b
            outs = (
                [jnp.where(keep, a, b) for a, b in zip(p2, pos_b)]
                + [jnp.where(keep, a, b) for a, b in zip(r2, rot_b)]
                + [jnp.where(keep, a, jnp.zeros_like(a)) for a in v3_]
                + [jnp.where(keep, a, jnp.zeros_like(a)) for a in w3_]
            )
            out_ref[:] = jnp.stack(outs, axis=1)
            return
        packed2 = jnp.stack(list(p2) + list(r2) + list(v2) + list(w2),
                            axis=1)                          # [Wt, 13, n]
        gA2 = gather(oh_i, packed2)
        gB2 = gather(oh_j, packed2)

        def side2(g2, S):
            return {
                "pos": _c3(g2, 0),
                "rot": (jnp.where(kvalid, g2[:, 3], 1.0),
                        g2[:, 4], g2[:, 5], g2[:, 6]),
                "im": S["im"], "ii": S["ii"], "mu": S["mu_d"],
                "v": _c3(g2, 7), "w": _c3(g2, 10),
                "pre_v": S["v"], "pre_w": S["w"],
            }

        vpA, vpB = pk.velocity_pass(side2(gA2, SA), side2(gB2, SB),
                                    contacts, lam, h1, rest1,
                                    relaxation=relaxation)
        accv = segsum(oh_i, vpA) + segsum(oh_j, vpB)         # [Wt, 6, n]
        v3_ = pk.v3add(v2, _c3(accv, 0))
        w3_ = pk.v3add(w2, _c3(accv, 3))

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


def _pick_wt(W: int, K: int) -> int:
    env = os.environ.get("GEM_TPU_SUBSTEP_WT")
    if env:
        return int(env)
    # VMEM budget: the live pair set is ~200 [Wt, K] f32 planes plus two
    # [Wt, n, K]-ish one-hot lists; keep Wt * K around 1k lanes
    wt = max(1, 1024 // max(K, 1))
    while wt > 1 and W % wt != 0:
        wt -= 1
    return wt


@functools.partial(jax.jit, static_argnames=("tables", "relaxation",
                                              "interpret"))
def _run(packed, rows_i, rows_j, kvalid, scal, *, tables, relaxation,
         interpret):
    W, _, n = packed.shape
    K = rows_i.shape[2]
    Wt = _pick_wt(W, K)
    grid = (W // Wt,)

    def bs(shape):
        return pl.BlockSpec((Wt,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(tables, Wt, n, K, relaxation),
        grid=grid,
        in_specs=[bs((C_IN, n)), bs((1, K)), bs((1, K)), bs((1, K)),
                  bs((1, 8))],
        out_specs=bs((C_OUT, n)),
        out_shape=jax.ShapeDtypeStruct((W, C_OUT, n), jnp.float32),
        interpret=interpret,
        debug=bool(os.environ.get("GEM_TPU_SUBSTEP_DEBUG")),
    )(packed, rows_i, rows_j, kvalid, scal)


class SubstepKernel:
    """Builder/driver for the substep megakernel.

    Construct once at taskgraph-build time with the object manager; call
    per substep with body columns.  Handles lane padding (n -> x8 lanes
    via the packed layout; K -> x128).
    """

    def __init__(self, object_manager, relaxation: float = 1.0,
                 interpret: bool = False):
        self.tables = pk.ObjTables(object_manager)
        self.relaxation = float(relaxation)
        self.interpret = bool(interpret)

    def __call__(self, *, pos, rot, v, w, prev_pos, prev_rot, im, ii,
                 mu_s, mu_d, obj, aabb_lo, aabb_hi, dyn, rows_i, rows_j,
                 kvalid, h, restitution_threshold):
        """All body args [W, n(,3/4)]; pair args [W, K]; h/rest [W].
        Returns (pos, rot, v, w) updated [W, n, ...]."""
        W, n0 = im.shape
        K0 = rows_i.shape[1]

        def T(x):
            return jnp.swapaxes(x, 1, 2)

        def T1(x):
            return x[:, None, :]

        packed = jnp.concatenate([
            T(pos), T(rot), T(v), T(w), T(prev_pos), T(prev_rot),
            T1(im), T(ii), T1(mu_s), T1(mu_d),
            T1(obj.astype(jnp.float32)), T(aabb_lo), T(aabb_hi),
            T1(dyn.astype(jnp.float32)),
        ], axis=1)                                    # [W, C_IN, n0]
        n = max(8, -(-n0 // 8) * 8)
        if n != n0:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, n - n0)))
        K = max(128, -(-K0 // 128) * 128)
        if K != K0:
            padk = ((0, 0), (0, K - K0))
            rows_i = jnp.pad(rows_i, padk)
            rows_j = jnp.pad(rows_j, padk)
            kvalid = jnp.pad(kvalid, padk)
        scal = jnp.stack([h, restitution_threshold] + [jnp.zeros_like(h)] * 6,
                         axis=1)                      # [W, 8]

        out = _run(packed, rows_i[:, None, :], rows_j[:, None, :],
                   kvalid.astype(jnp.float32)[:, None, :], scal[:, None, :],
                   tables=self.tables, relaxation=self.relaxation,
                   interpret=self.interpret)          # [W, C_OUT, n]
        out = out[:, :, :n0]
        return (T(out[:, 0:3]), T(out[:, 3:7]), T(out[:, 7:10]),
                T(out[:, 10:13]))
