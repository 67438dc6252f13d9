"""RigidBodyPhysicsSystem — public physics API.

Mirrors reference include/madrona/physics.hpp:419-447:
  registerTypes        -> register_types(registry, body_archetype, capacity)
  init                 -> init(ctx, delta_t, num_substeps, gravity)
  registerEntity       -> implicit (all live rows of the body archetype
                          with physics components participate; the
                          reference's LeafID reservation has no TPU analog
                          because the "BVH" is the dense row grid)
  setupBroadphaseTasks -> setup_broadphase_tasks(builder, deps, ...)
  setupSubstepTasks    -> setup_substep_tasks(builder, deps, num_substeps, ...)
  setupCleanupTasks    -> setup_cleanup_tasks(builder, deps)

Pipeline per step (reference SURVEY.md §3.4):
  broadphase: velocity-expanded AABB update + candidate grid
  x num_substeps: integrate -> narrowphase -> solvePositions
                  -> setVelocities -> solveVelocities
  cleanup: clear temporaries

Broadphase is a dense AABB overlap grid rather than the reference's 4-wide
BVH (physics.hpp:302-396): pointer-chasing trees are GPU-idiomatic, not
TPU; for the O(100) bodies/world regime the dense grid is faster than any
tree and fully vectorizes (SURVEY.md §7.1).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import NodeID, TaskGraphBuilder
from gpu_ecs_madrona_tpu.core import base
from gpu_ecs_madrona_tpu.physics import (
    assets,
    narrowphase as np_mod,
    pairs as pk,
    solver as solver_mod,
)
from gpu_ecs_madrona_tpu.physics.components import (
    CandidateCollision,
    CandidatePairRows,
    CollisionAABB,
    CollisionEvent,
    ContactConstraint,
    ExternalForce,
    ExternalTorque,
    JointConstraint,
    LeafID,
    PhysicsState,
    PreSolvePositional,
    PreSolveVelocity,
    ResponseType,
    RESPONSE_DYNAMIC,
    SleepState,
    SubstepPrevState,
    Velocity,
)
from gpu_ecs_madrona_tpu.utils import debug
from gpu_ecs_madrona_tpu.utils import math as m

# Components a body archetype must include (reference registers these onto
# user archetypes via registerTypes + archetype composition,
# physics.cpp:1055-1081).
BODY_COMPONENTS = [
    base.Position,
    base.Rotation,
    base.Scale,
    base.ObjectID,
    Velocity,
    ResponseType,
    ExternalForce,
    ExternalTorque,
    CollisionAABB,
    LeafID,
    SubstepPrevState,
    PreSolvePositional,
    PreSolveVelocity,
]

CandidateTemporary = Archetype("CandidateTemporary", [CandidateCollision])
CandidateRowsTemporary = Archetype("CandidateRowsTemporary", [CandidatePairRows])
ContactTemporary = Archetype("ContactTemporary", [ContactConstraint])
CollisionEventTemporary = Archetype("CollisionEventTemporary", [CollisionEvent])
JointArchetype = Archetype("JointArchetype", [JointConstraint])


def _candidate_rows(ctx: Context):
    """Candidate pair rows + validity for the substep consumers."""
    rowsc = ctx.column(CandidateRowsTemporary, CandidatePairRows)
    kmask = ctx.row_mask(CandidateRowsTemporary)
    return rowsc, kmask


class RigidBodyPhysicsSystem:
    @staticmethod
    def register_types(registry: ECSRegistry, max_candidates: int = 1024,
                       max_contacts: int = 1024, max_joints: int = 64):
        """reference RigidBodyPhysicsSystem::registerTypes
        (physics.cpp:1055-1081)."""
        base.register_types(registry)
        for comp in BODY_COMPONENTS:
            registry.register_component(comp)
        registry.register_singleton(PhysicsState)
        registry.register_singleton(SleepState)
        registry.register_archetype(CandidateTemporary, capacity=max_candidates,
                                    temporary=True)
        registry.register_archetype(CandidateRowsTemporary,
                                    capacity=max_candidates, temporary=True)
        registry.register_archetype(ContactTemporary, capacity=max_contacts,
                                    temporary=True)
        registry.register_archetype(CollisionEventTemporary,
                                    capacity=max_contacts, temporary=True)
        if max_joints > 0:
            registry.register_archetype(JointArchetype, capacity=max_joints)

    @staticmethod
    def init(ctx: Context, delta_t: float, num_substeps: int,
             gravity=(0.0, 0.0, -9.8)):
        """reference RigidBodyPhysicsSystem::init (physics.cpp:1012-1036).
        Sets the per-world solver singleton; restitution threshold
        2*|g|*h (physics.cpp:31)."""
        import math as pymath

        W = ctx.num_worlds
        h = delta_t / num_substeps
        g = jnp.asarray(gravity, jnp.float32)
        gmag = pymath.sqrt(sum(float(x) ** 2 for x in gravity))
        ctx.set_singleton(PhysicsState, {
            "delta_t": jnp.full((W,), delta_t),
            "h": jnp.full((W,), h),
            "gravity": jnp.broadcast_to(g, (W, 3)),
            "restitution_threshold": jnp.full((W,), 2.0 * gmag * h),
        })
        ctx.set_singleton(SleepState, {
            "quiet_steps": jnp.zeros((W,), jnp.int32),
            "asleep": jnp.zeros((W,), jnp.int32),
        })

    @staticmethod
    def register_persistent_manifolds(registry: ECSRegistry,
                                      body_archetype: Archetype,
                                      max_candidates: int):
        """Register the cross-step persistent-manifold cache singleton
        (setup_substep_tasks manifold_persist=True).  Call from the
        world's register_types AFTER the body archetype is registered —
        the cache shapes depend on the body capacity and the candidate
        capacity.  Beyond the reference (which re-runs broadphase +
        narrowphase every step, physics.cpp:1149-1199): worlds whose
        bodies have moved less than margin/2 since their manifold was
        built skip both and refresh the cached manifold by transform
        (the sleep machinery generalized from frozen worlds to
        quasi-static ones)."""
        from gpu_ecs_madrona_tpu.core.component import singleton_component
        from gpu_ecs_madrona_tpu.ops.substep_kernel import MC_CHANNELS
        n_cap = registry.archetypes[body_archetype.name].capacity
        K = max(128, -(-max_candidates // 128) * 128)
        comp = singleton_component(
            "ManifoldPersist",
            mc=((MC_CHANNELS, K), jnp.float32),   # rows + body-frame cache
            apos=((n_cap, 3), jnp.float32),       # poses at cache build
            arot=((n_cap, 4), jnp.float32),
            valid=((), jnp.int32))
        registry.register_singleton(comp)
        return comp

    @staticmethod
    def reset(ctx: Context):
        """reference RigidBodyPhysicsSystem::reset (physics.hpp:428):
        clear per-step physics temporaries."""
        ctx.clear_archetype(CandidateTemporary)
        ctx.clear_archetype(CandidateRowsTemporary)
        ctx.clear_archetype(ContactTemporary)
        ctx.clear_archetype(CollisionEventTemporary)

    @staticmethod
    def register_entity(ctx: Context, ents, valid=None):
        """reference registerEntity (physics.hpp:429-431).  The dense
        broadphase has no leaf reservation; this validates handles and
        returns their rows as LeafIDs for API parity."""
        _, rows, live = ctx.mgr.lookup(ctx.state, ents)
        if valid is not None:
            live = live & valid
        return jnp.where(live, rows, -1)

    # ------------------------------------------------------------------

    @staticmethod
    def _body_data(ctx: Context, arch: Archetype, objmgr):
        pos = ctx.column(arch, base.Position)
        rot = ctx.column(arch, base.Rotation)
        obj = ctx.column(arch, base.ObjectID)
        mask = ctx.row_mask(arch)
        inv_mass = objmgr["inv_mass"][obj]
        inv_inertia = objmgr["inv_inertia"][obj]
        mu_s = objmgr["mu_s"][obj]
        mu_d = objmgr["mu_d"][obj]
        return pos, rot, obj, mask, inv_mass, inv_inertia, mu_s, mu_d

    @staticmethod
    def setup_broadphase_tasks(
        builder: TaskGraphBuilder,
        deps: Sequence[NodeID],
        body_archetype: Archetype,
        object_manager: Dict[str, Any],
        velocity_expansion: float = 1.0,
        mode: str = "auto",
        sap_window: int = 0,
        sap_globals: int = 4,
        sap_degree: int = 16,
        dense_degree: int = 0,
    ) -> NodeID:
        """reference setupBroadphaseTasks (broadphase.cpp:934-956):
        updateLeafPositions -> tree update -> overlap candidates.  Here:
        velocity-expanded world AABBs + candidate pair emission; candidates
        also emitted as CandidateTemporary rows (DCE'd when unobserved).

        mode selects the candidate search (the TPU redesign of the
        reference's 4-wide BVH, physics.hpp:302-396 — trees are
        pointer-chasing and anti-idiomatic on TPU):
          "dense": all-pairs [W, n, n] AABB overlap grid.  Zero gathers,
                   optimal at the reference's O(100) bodies/world.
          "sap":   sweep-and-prune — sort bodies along x by AABB lo, test
                   each body only against the next ``sap_window`` bodies in
                   sorted order (O(n*S) instead of O(n^2); the sort is an
                   XLA batched sort, not a data structure).  A pair beyond
                   the window is missed; window saturation (a later body
                   whose x-interval still overlaps) is accounted into the
                   CandidateRowsTemporary overflow counter and fires a
                   GEM_TPU_DEBUG check — the same capacity-overflow
                   contract as every other fixed-capacity stage.
          "auto":  dense when the body capacity n <= 128, else sap.
        sap_window: 0 = min(n - 1, 64).
        sap_globals: size of the dense-tested wide-body set (ground
        planes / large statics whose x-interval would saturate any
        window); the top-G widest live bodies are excluded from the
        sweep and tested against all n bodies."""
        objmgr = {k: jnp.asarray(v) for k, v in object_manager.items()}
        arch = body_archetype
        cap_n = builder.mgr.registry.archetypes[arch.name].capacity
        if mode == "auto":
            # crossover measured round 5 at 8192 worlds x 129 rows: the
            # dense rank grid costs ~10 ms/step where SAP's windowed
            # sort + two-stage compaction costs 36 ms (node_timeline;
            # whole-step 79.8K vs 61.9K env-steps/s) — the [n, n] grid
            # stays cheaper than sorting until well past 128 lanes
            mode = "dense" if cap_n <= 192 else "sap"
        if mode not in ("dense", "sap", "fused"):
            raise ValueError(f"unknown broadphase mode {mode!r}")
        if mode == "fused":
            # broadphase runs INSIDE the fused substep kernel
            # (ops/substep_kernel._inkernel_broadphase): velocity-expanded
            # AABBs + dense rank compaction per world, VMEM-resident.
            # This node registers nothing but a marker; the substep node
            # writes the CollisionAABB/LeafID columns and emits the
            # candidate temporaries from the kernel's outputs, so the
            # observable surface is unchanged.  Requires body capacity
            # <= 128 and contact_mode='pallas' without joints/sleep.
            if cap_n > 128:
                raise ValueError("fused broadphase requires body "
                                 f"capacity <= 128 (got {cap_n})")
            builder._gem_fused_bp = {
                "degree": dense_degree or 12,
                "vexp": float(velocity_expansion),
            }

            def bp_fused_marker(ctx: Context):
                pass

            return builder.add_node(bp_fused_marker, deps,
                                    name="bp_fused_marker")

        def update_aabbs(ctx: Context):
            pos = ctx.column(arch, base.Position)
            rot = ctx.column(arch, base.Rotation)
            scale = ctx.column(arch, base.Scale)
            obj = ctx.column(arch, base.ObjectID)
            vel = ctx.column(arch, Velocity)
            phys = ctx.singleton(PhysicsState)
            lo_l = objmgr["local_aabb_lo"][obj]      # [W,n,3]
            hi_l = objmgr["local_aabb_hi"][obj]
            # exact rotated-AABB: center +- |R| @ half (identical to the
            # min/max over the 8 transformed corners, 4x less work than
            # materializing them — measured 4.0 ms/step at 8192x64)
            c_l = (lo_l + hi_l) * 0.5 * scale
            half = (hi_l - lo_l) * 0.5 * scale
            R = m.quat_to_mat(rot)                   # [W,n,3,3]
            cw = pos + jnp.einsum("...ij,...j->...i", R, c_l)
            ext = jnp.einsum("...ij,...j->...i", jnp.abs(R), half)
            lo = cw - ext
            hi = cw + ext
            # velocity expansion (reference expandLeaf, physics.cpp:1023-1027)
            dt = phys["delta_t"][:, None, None]
            vexp = vel["linear"] * dt * velocity_expansion
            lo = lo + jnp.minimum(vexp, 0.0)
            hi = hi + jnp.maximum(vexp, 0.0)
            ctx.set_column(arch, CollisionAABB, {"lo": lo, "hi": hi})
            # LeafID = row index (API parity)
            n = lo.shape[1]
            ctx.set_column(arch, LeafID, jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None], lo.shape[:2]))

        n_aabb = builder.add_node(update_aabbs, deps, name="bp_update_aabbs")

        def emit_candidates(ctx: Context, counts, rows_i, rows_j):
            # CandidateTemporary rows (entity handles) are the
            # observable/API-parity surface; CandidateRowsTemporary rows
            # are the solver's working set for the pairs-mode substep
            from gpu_ecs_madrona_tpu.core.state import batched_gather
            ents = ctx.entity_column(arch)
            a_ent = batched_gather(ents, rows_i)
            b_ent = batched_gather(ents, rows_j)
            ctx.emit_temporaries(
                CandidateTemporary, counts=counts,
                values={CandidateCollision: {"a": a_ent, "b": b_ent}})
            ctx.emit_temporaries(
                CandidateRowsTemporary, counts=counts,
                values={CandidatePairRows: {"i": rows_i, "j": rows_j}})

        def find_overlaps(ctx: Context):
            # reference findOverlappingEntry (broadphase.cpp:897-932)
            aabb = ctx.column(arch, CollisionAABB)
            mask = ctx.row_mask(arch)
            lo, hi = aabb["lo"], aabb["hi"]
            ok = m.aabb_overlaps(
                lo[:, :, None, :], hi[:, :, None, :],
                lo[:, None, :, :], hi[:, None, :, :])
            n = mask.shape[1]
            ok = ok & mask[:, :, None] & mask[:, None, :]
            ok = ok & jnp.triu(jnp.ones((n, n), bool), k=1)[None]
            W = ok.shape[0]
            counts = jnp.sum(ok.astype(jnp.int32), axis=(1, 2))
            k_cap = ctx.mgr.registry.archetypes[CandidateTemporary.name].capacity
            k_eff = min(k_cap, n * n)

            import os as _os
            D = int(_os.environ.get("GEM_TPU_BP_DEGREE", 0)) or dense_degree
            if not D:
                # exact semantics (no per-owner cap): global top_k.  A
                # full per-world variadic sort — 21.8 ms/step at 8192x64;
                # pass dense_degree > 0 for the rank-compacted fast path.
                flat = ok.reshape(W, n * n)
                _, pair_idx = jax.lax.top_k(flat.astype(jnp.int8), k_eff)
                emit_candidates(ctx, counts, pair_idx // n, pair_idx % n)
                return

            # RANK COMPACTION (sort-free): each pair's compacted slot is
            # base[owner] + rank-within-owner, extracted per-owner
            # (degree-capped at D, overflow accounted) and scattered by
            # ONE one-hot matmul over n*D rows.  Replaces the top_k sort
            # (measured 21.8 -> ~6 ms/step at 8192x64); the cap D is an
            # additional capacity contract of the same kind as
            # max_candidates itself.
            D = min(D, n)
            ok_t = jnp.swapaxes(ok, 1, 2)           # [W, owner, partner<o]
            # MXU triangular-matmul cumsum: jnp.cumsum lowers to
            # reduce_window (O(n) VPU work per element) on TPU
            local_rank = m.mask_cumsum_last(ok_t)   # [W, n, n]
            deg = local_rank[:, :, -1]              # [W, n]
            degc = jnp.minimum(deg, D)
            base = jnp.cumsum(degc, axis=1) - degc  # exclusive [W, n]

            # owner's d-th partner: rank-compare extraction (no sort);
            # f32 select-sum (int32 multiply is decomposed on the VPU)
            p_iota = jnp.arange(n, dtype=jnp.float32)[None, None, :]
            d_iota = jnp.arange(D, dtype=jnp.int32)
            sel = (local_rank[:, :, None, :] == (d_iota + 1)[None, None, :,
                                                            None]) & \
                ok_t[:, :, None, :]                  # [W, n, D, n]
            partners = jnp.sum(
                jnp.where(sel, p_iota[:, None], 0.0), axis=3
            ).astype(jnp.int32)                      # [W, n, D]

            # INVERSE slot -> (owner, rank) map (gather form).  The
            # scatter one-hot this replaces materialized a [W, n*D,
            # k_eff] f32 operand — 4.3 GB of HBM traffic at 8192x64
            # (D=8, k_eff=256).  Slot k's owner is the last row with
            # base <= k (ties from empty rows resolve forward to the
            # row whose [base, base+degc) interval contains k).
            from gpu_ecs_madrona_tpu.core.state import batched_gather
            total = jnp.sum(degc, axis=1)                    # [W]
            k_iota = jnp.arange(k_eff, dtype=jnp.int32)
            owner = jnp.sum(
                (base[:, :, None] <= k_iota[None, None, :])
                .astype(jnp.int32), axis=1) - 1              # [W, k_eff]
            owner = jnp.clip(owner, 0, n - 1)
            dd = k_iota[None] - batched_gather(base, owner)
            # partners[w, owner, dd] as a one-hot-row matmul over n plus
            # a rank select over D (bf16 exact: indices < n <= 256)
            oh_dt = jnp.bfloat16 if n <= 256 else jnp.float32
            oh_owner = (owner[:, :, None]
                        == jnp.arange(n, dtype=jnp.int32)[None, None]
                        ).astype(oh_dt)                      # [W, k_eff, n]
            rows_g = jax.lax.dot_general(
                oh_owner, partners.astype(oh_dt),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # [W, k_eff, D]
            part = jnp.sum(
                jnp.where(dd[:, :, None] == d_iota[None, None], rows_g, 0.0),
                axis=2).astype(jnp.int32)
            valid_k = k_iota[None] < total[:, None]
            # pair index in i*n+j (i = lower row = partner, j = owner)
            pair_idx = jnp.where(valid_k, part * n + owner, 0)

            # degree-cap accounting (top_k had no per-owner cap; the
            # two-level scheme does — no silent clipping)
            excess = jnp.sum(jnp.maximum(deg - D, 0), axis=1)
            debug.check(excess == 0,
                        f"dense rank-compaction degree cap {D} exceeded: "
                        "dropped pairs={} per world", excess)
            ctx.add_overflow(CandidateRowsTemporary, excess)
            counts = counts - excess
            emit_candidates(ctx, counts, pair_idx // n, pair_idx % n)

        def find_overlaps_sap(ctx: Context):
            # sweep-and-prune: one XLA sort along x, then each body tests
            # only its next S neighbors in sorted order.  O(n log n + n*S)
            # total vs the dense grid's O(n^2) — the at-scale mode (the
            # redesign of the reference BVH's traversal pruning).
            #
            # SAP's classic failure mode — huge AABBs (ground planes, big
            # statics) whose x-interval spans the whole world and overlaps
            # far beyond any window — is handled by a "globals" set: the
            # top-G widest live bodies are EXCLUDED from the sweep and
            # tested densely against every body ([W, G, n], G small).
            from gpu_ecs_madrona_tpu.core.state import batched_gather
            aabb = ctx.column(arch, CollisionAABB)
            mask = ctx.row_mask(arch)
            lo, hi = aabb["lo"], aabb["hi"]
            W, n = mask.shape
            S = min(sap_window or 64, n - 1)
            G = min(sap_globals, n)
            rows_n = jnp.arange(n, dtype=jnp.int32)

            # globals: top-G x-extent among live bodies
            extent = jnp.where(mask, hi[..., 0] - lo[..., 0], -jnp.inf)
            _, grow = jax.lax.top_k(extent, G)                    # [W, G]
            grow = grow.astype(jnp.int32)
            is_global = jnp.any(rows_n[None, None, :] == grow[:, :, None],
                                axis=1)                           # [W, n]
            mask_eff = mask & ~is_global

            # ---- windowed sweep over the non-global bodies ----------------
            key = jnp.where(mask_eff, lo[..., 0], jnp.inf)  # dead/global last
            order = jnp.argsort(key, axis=1).astype(jnp.int32)
            lo_s = batched_gather(lo, order)
            hi_s = batched_gather(hi, order)
            mask_s = batched_gather(mask_eff, order)
            # neighbor table: sorted j = i + k for k = 1..S (static indices)
            j_idx = (rows_n[:, None]
                     + jnp.arange(1, S + 1, dtype=jnp.int32)[None, :])
            j_valid = j_idx < n
            j_clip = jnp.minimum(j_idx, n - 1).reshape(-1)
            lo_j = jnp.take(lo_s, j_clip, axis=1).reshape(W, n, S, 3)
            hi_j = jnp.take(hi_s, j_clip, axis=1).reshape(W, n, S, 3)
            mask_j = jnp.take(mask_s, j_clip, axis=1).reshape(W, n, S)
            ok = m.aabb_overlaps(lo_s[:, :, None, :], hi_s[:, :, None, :],
                                 lo_j, hi_j)
            ok = ok & mask_s[:, :, None] & mask_j & j_valid[None]

            # ---- globals vs everyone --------------------------------------
            glo = batched_gather(lo, grow)                        # [W, G, 3]
            ghi = batched_gather(hi, grow)
            gmask = batched_gather(mask, grow)
            ok_g = m.aabb_overlaps(glo[:, :, None, :], ghi[:, :, None, :],
                                   lo[:, None, :, :], hi[:, None, :, :])
            ok_g = ok_g & gmask[:, :, None] & mask[:, None, :]
            # global-global pairs counted once (higher row only); self never
            ok_g = ok_g & (~is_global[:, None, :]
                           | (rows_n[None, None, :] > grow[:, :, None]))

            # ---- one compaction over both regions -------------------------
            # TWO-STAGE single-key sort (the simple_jobs 'twostage' result:
            # ~1.6x over a global variadic top_k): stage 1 packs each sweep
            # row's window hits by a small per-row sort (degree-capped at
            # Dc, drops accounted), stage 2 sorts the [n*Dc + G*n]
            # survivors — ascending flat-index order, identical to the
            # top_k's.  The dense global rows (planes etc.) are passed
            # through uncapped.
            k_cap = ctx.mgr.registry.archetypes[CandidateTemporary.name].capacity
            k_eff = min(k_cap, n * S + G * n)
            BIGI = jnp.int32(2 ** 30)
            Dc = min(sap_degree or S, S)
            kk = jnp.arange(S, dtype=jnp.int32)[None, None]
            rkey = jnp.where(ok, kk, BIGI)                 # [W, n, S]
            part = jnp.sort(rkey, axis=2)[:, :, :Dc]
            pvalid = part < BIGI
            deg = jnp.sum(ok.astype(jnp.int32), axis=2)
            dropped = jnp.sum(jnp.maximum(deg - Dc, 0), axis=1)
            debug.check(dropped == 0,
                        f"sap per-row degree cap {Dc} exceeded: dropped "
                        "pairs={} per world", dropped)
            ctx.add_overflow(CandidateRowsTemporary, dropped)
            i_iota = jnp.arange(n, dtype=jnp.int32)[None, :, None]
            flat1 = jnp.where(pvalid, i_iota * S + part, BIGI)\
                .reshape(W, n * Dc)
            gidx_iota = jnp.arange(G * n, dtype=jnp.int32)[None]
            flat_g = jnp.where(ok_g.reshape(W, G * n), n * S + gidx_iota,
                               BIGI)
            key2 = jnp.concatenate([flat1, flat_g], axis=1)
            k_take = min(k_eff, n * Dc + G * n)
            pair_idx = jnp.sort(key2, axis=1)[:, :k_take]
            pair_idx = jnp.where(pair_idx < BIGI, pair_idx, 0)
            if k_take < k_eff:         # stage-1 caps below the requested K
                pair_idx = jnp.pad(pair_idx, ((0, 0), (0, k_eff - k_take)))
            counts = (jnp.sum(ok.astype(jnp.int32), axis=(1, 2)) - dropped
                      + jnp.sum(ok_g.astype(jnp.int32), axis=(1, 2)))
            in_sweep = pair_idx < n * S
            # sweep region: sorted i = idx // S, j = i + idx % S + 1
            si = jnp.where(in_sweep, pair_idx, 0) // S
            sj = jnp.minimum(si + pair_idx % S + 1, n - 1)
            ri_sw = batched_gather(order, si)
            rj_sw = batched_gather(order, sj)
            # global region: g = idx' // n (gathered to its row), b = idx' % n
            gidx = jnp.where(in_sweep, 0, pair_idx - n * S)
            ri_gl = batched_gather(grow, gidx // n)
            rj_gl = gidx % n
            ri = jnp.where(in_sweep, ri_sw, ri_gl)
            rj = jnp.where(in_sweep, rj_sw, rj_gl)
            # normalize to (low row, high row) — dense-mode pair semantics
            emit_candidates(ctx, counts,
                            jnp.minimum(ri, rj), jnp.maximum(ri, rj))

            # window-saturation observability: if the first body PAST the
            # window still starts before this body's x-interval ends, pairs
            # beyond the window may have been missed — account it like any
            # other capacity overflow (VERDICT: no silent clipping)
            past = jnp.minimum(rows_n + S + 1, n - 1)
            in_range = rows_n + S + 1 <= n - 1
            lo_p = jnp.take(lo_s[..., 0], past, axis=1)           # [W, n]
            mask_p = jnp.take(mask_s, past, axis=1) & in_range[None]
            sat = mask_s & mask_p & (lo_p <= hi_s[..., 0])
            sat_counts = jnp.sum(sat.astype(jnp.int32), axis=1)
            debug.check(sat_counts == 0,
                        "sap broadphase window saturated (window "
                        f"{S}): possibly-missed pairs={{}} per world "
                        "— raise sap_window", sat_counts)
            ctx.add_overflow(CandidateRowsTemporary, sat_counts)

        node = {"dense": find_overlaps, "sap": find_overlaps_sap}[mode]
        return builder.add_node(node, [n_aabb], name="bp_find_overlaps")

    @staticmethod
    def setup_substep_tasks(
        builder: TaskGraphBuilder,
        deps: Sequence[NodeID],
        num_substeps: int,
        body_archetype: Archetype,
        object_manager: Dict[str, Any],
        relaxation: float = 1.0,
        contact_mode: str = "auto",
        substep_wt=None,
        speculative_margin: float = 0.0,
        contact_refresh: bool = False,
        sleep_threshold: float = 0.0,
        sleep_frames: int = 10,
        manifold_persist: bool = False,
        persist_margin: float = 0.05,
    ) -> NodeID:
        """reference setupSubstepTasks (physics.cpp:1149-1199): the XPBD
        substep chain, unrolled num_substeps times.  Each substep is one
        node running integrate -> narrowphase -> solvePositions ->
        setVelocities -> solveVelocities (the reference splits these into
        separate nodes; under XLA they fuse regardless, and fusing them in
        one node lets the contact grid live in registers/VMEM instead of
        the state pytree).

        contact_mode selects how candidate pairs flow through narrowphase
        + solve (the TPU analog of the reference running narrowphase only
        on broadphase candidates, narrowphase.cpp:1768-1783):
          "dense":  all-pairs [W, n, n] grid — zero gathers, right for small
                    body counts where n^2 SAT work is cheap.
          "pairs":  compacted broadphase candidates [W, K] (CandidateRows
                    temporaries); body data gathered per pair by one-hot
                    matmuls, per-body sums via segment-sum matmuls.  O(K)
                    instead of O(n^2) SAT work.
          "pallas": same pair pipeline fused into one VMEM-resident Pallas
                    megakernel per substep (ops/substep_kernel.py) — the
                    at-scale mode.  Contact temporaries are not emitted
                    (nothing leaves VMEM), and joint constraints are solved
                    AFTER the substep kernel rather than between the
                    positional and velocity phases — use "pairs" for
                    contact export or joint-heavy worlds.
          "auto":   consult the exec-config artifact first (the analog of
                    MADRONA_MWGPU_EXEC_CONFIG_FILE, cuda_exec.cpp:1460-1517
                    — tooling/autotuner.py, GEM_TPU_EXEC_CONFIG_FILE); if
                    no tuned entry matches: body archetype capacity <= 48
                    -> "dense"; above that "pallas" on TPU, "pairs"
                    elsewhere (the Pallas kernel only runs interpreted
                    off-TPU, which is debug-speed).

        substep_wt: Pallas world-block size override (None = tuned
        artifact value if present, else heuristic; see substep_kernel
        _pick_wt).

        speculative_margin > 0 enables speculative-contact CCD (the TOI
        story the BASELINE north star names; the reference lacks it):
        near-miss contacts within the margin clamp approach speed to
        depth/h in the velocity pass so fast bodies cannot tunnel between
        substeps.  Size it to the fastest expected per-substep travel.

        sleep_threshold > 0 enables WORLD-LEVEL SLEEPING (beyond the
        reference, which has none): a world whose dynamic bodies all stay
        below the velocity threshold (|v|^2 + |w|^2 < thr^2) for
        sleep_frames consecutive steps, with zero ExternalForce/Torque,
        is frozen bit-exactly.  NOTE the combined-norm convention: linear
        (m/s) and angular (rad/s) speed are summed into ONE scalar and
        compared against one threshold, so the effective angular cutoff
        scales with your unit choice — for unit-scale bodies (the engine's
        own asset convention) the two terms are comparable; for very large
        or small bodies pick sleep_threshold with the dominant term in
        mind.  The fused Pallas kernel skips the whole
        substep pipeline for world blocks where every world sleeps
        (pl.when early-exit — real wall-clock, since grid programs run
        sequentially per TensorCore).  Waking: set a velocity above the
        threshold or a nonzero external force.  Fused-pallas only.

        manifold_persist=True (requires broadphase mode 'fused' +
        contact_refresh, and register_persistent_manifolds in the
        world's register_types) keeps each world's contact manifolds
        ACROSS steps: a world whose bodies have all moved less than
        persist_margin/2 (position plus a conservative rotation-times-
        radius bound) since its cache was built skips candidate
        construction and the SAT + clip narrowphase entirely, refreshing
        the cached manifold by transform — build-time AABBs are inflated
        by persist_margin/2 so the cached candidate set remains a
        superset while the predicate holds.  Whole-kernel-block skips
        happen via pl.when when every world in the block is stable;
        mixed blocks select per world, so trajectories never depend on
        block composition.  The error model: a contact forming entirely
        within the stability window can be seen up to ~persist_margin
        late (the body movement needed to form it triggers a rebuild).
        The quasi-static generalization of sleep_threshold (which it
        does not compose with).
        """
        objmgr = {k: jnp.asarray(v) for k, v in object_manager.items()}
        if "restitution" not in objmgr:
            # hand-built managers predating the restitution table get e=0
            objmgr["restitution"] = jnp.zeros_like(objmgr["mu_d"])
        arch = body_archetype
        if contact_mode == "auto":
            cap_n = builder.mgr.registry.archetypes[arch.name].capacity
            from gpu_ecs_madrona_tpu.tooling import autotuner
            tuned = autotuner.lookup("physics_substep",
                                     num_worlds=builder.mgr.num_worlds,
                                     bodies=cap_n)
            if tuned and tuned.get("contact_mode") in ("dense", "pairs",
                                                       "pallas"):
                contact_mode = tuned["contact_mode"]
                if substep_wt is None:
                    substep_wt = tuned.get("substep_wt")
            elif cap_n <= 48:
                contact_mode = "dense"
            else:
                # TPU-like platforms (incl. the axon tunnel, which reports
                # "axon" not "tpu") get the Pallas megakernel; everything
                # else — cpu AND non-TPU accelerators where Mosaic cannot
                # compile — falls back to the XLA pairs path
                from gpu_ecs_madrona_tpu.utils.platform import is_tpu
                contact_mode = "pallas" if is_tpu() else "pairs"

        if contact_mode not in ("dense", "pairs", "pallas"):
            raise ValueError(f"unknown contact_mode {contact_mode!r}")
        if contact_mode == "pairs":
            obj_tables = pk.ObjTables(object_manager)
        jinfo = builder.mgr.registry.archetypes.get(JointArchetype.name)
        has_joints = jinfo is not None and jinfo.capacity > 0
        if contact_mode == "pallas":
            from gpu_ecs_madrona_tpu.ops.substep_kernel import (
                FusedSubstepKernel, SubstepKernel)
            from gpu_ecs_madrona_tpu.utils.platform import pallas_interpret
            interp = pallas_interpret()
            if has_joints:
                if contact_refresh:
                    raise ValueError(
                        "contact_refresh requires the fused substep kernel; "
                        "worlds with joints run the per-substep kernel "
                        "(joints interleave between the positional and "
                        "velocity phases) — drop contact_refresh or joints")
                # joints interleave between the positional and velocity
                # phases, so each substep is its own kernel call with the
                # joint solve in XLA between calls
                substep_kernel = SubstepKernel(
                    object_manager, relaxation=relaxation, interpret=interp,
                    wt=substep_wt, speculative=speculative_margin)
            else:
                _fbp = getattr(builder, "_gem_fused_bp", None)
                _cap = builder.mgr.registry.archetypes[
                    CandidateRowsTemporary.name].capacity
                if manifold_persist:
                    if _fbp is None or not contact_refresh:
                        raise ValueError(
                            "manifold_persist requires broadphase mode "
                            "'fused' and contact_refresh=True (the cache "
                            "lives in the fused kernel and extends the "
                            "refresh across steps)")
                    if "ManifoldPersist" not in \
                            builder.mgr.registry.singletons:
                        raise ValueError(
                            "manifold_persist: call register_persistent_"
                            "manifolds from the world's register_types")
                fused_kernel = FusedSubstepKernel(
                    object_manager, num_substeps=num_substeps,
                    relaxation=relaxation, interpret=interp, wt=substep_wt,
                    speculative=speculative_margin,
                    contact_refresh=contact_refresh,
                    bp_degree=_fbp["degree"] if _fbp else 0,
                    bp_capacity=_cap if _fbp else 0,
                    persist_margin=persist_margin if manifold_persist
                    else 0.0)
        if sleep_threshold > 0.0 and (contact_mode != "pallas" or has_joints):
            raise ValueError(
                "sleep_threshold requires the fused Pallas substep kernel "
                "(contact_mode='pallas', no joints) — the skip happens at "
                "the kernel's world-block grid")

        def make_substep(idx):
            def substep(ctx: Context):
                phys = ctx.singleton(PhysicsState)
                h = phys["h"]                                # [W]
                g = phys["gravity"]
                pos = ctx.column(arch, base.Position)
                rot = ctx.column(arch, base.Rotation)
                obj = ctx.column(arch, base.ObjectID)
                mask = ctx.row_mask(arch)
                vel = ctx.column(arch, Velocity)
                resp = ctx.column(arch, ResponseType)
                ext_f = ctx.column(arch, ExternalForce)
                ext_t = ctx.column(arch, ExternalTorque)
                inv_mass = objmgr["inv_mass"][obj]
                inv_inertia = objmgr["inv_inertia"][obj]
                mu_s = objmgr["mu_s"][obj]
                mu_d = objmgr["mu_d"][obj]
                dyn = (resp == RESPONSE_DYNAMIC) & mask

                h_s = h
                new_pos, new_rot, v, w, prev_pos, prev_rot = solver_mod.integrate(
                    pos, rot, vel["linear"], vel["angular"],
                    inv_mass, inv_inertia, ext_f, ext_t, dyn,
                    h_s, g,
                )
                # pre-solve stash (reference PreSolvePositional/Velocity)
                ctx.set_column(arch, SubstepPrevState,
                               {"prev_pos": prev_pos, "prev_rot": prev_rot})
                ctx.set_column(arch, PreSolvePositional,
                               {"x": new_pos, "q": new_rot})
                ctx.set_column(arch, PreSolveVelocity, {"v": v, "omega": w})

                def solve_joints_at(p2, r2):
                    # joint constraints (reference solvePositions joint
                    # query, physics.cpp:538-650) — solved after contacts
                    # each substep
                    jinfo = ctx.mgr.registry.archetypes.get(JointArchetype.name)
                    if jinfo is None or jinfo.capacity <= 0:
                        return p2, r2
                    jfields = ctx.column(JointArchetype, JointConstraint)
                    jmask = ctx.row_mask(JointArchetype)
                    arch_idx = ctx.mgr.arch_index[arch.name]
                    la1, lr1, lv1 = ctx.mgr.lookup(ctx.state, jfields["e1"])
                    la2, lr2, lv2 = ctx.mgr.lookup(ctx.state, jfields["e2"])
                    rows1 = jnp.where(lv1 & (la1 == arch_idx), lr1, -1)
                    rows2 = jnp.where(lv2 & (la2 == arch_idx), lr2, -1)
                    im_j = jnp.where(dyn, inv_mass, 0.0)
                    ii_j = jnp.where(dyn[..., None], inv_inertia, 0.0)
                    return solver_mod.solve_joints(
                        p2, r2, im_j, ii_j, jfields, rows1, rows2, jmask,
                        relaxation=relaxation)

                def writeback(p2, r2, v3, w3):
                    keep = dyn[..., None]
                    ctx.set_column(arch, base.Position, jnp.where(keep, p2, pos))
                    ctx.set_column(arch, base.Rotation, jnp.where(keep, r2, rot))
                    ctx.set_column(arch, Velocity, {
                        "linear": jnp.where(keep, v3, vel["linear"]),
                        "angular": jnp.where(keep, w3, vel["angular"]),
                    })

                def emit_observables(okk, a_ent, b_ent, contacts, lam, K):
                    # emit contact temporaries on the final substep for
                    # observability/export parity (DCE'd when unobserved).
                    # okk/a_ent/b_ent/contacts/lam lead with [W, K] (K =
                    # n*n grid-flat in dense mode, candidate capacity in
                    # pairs mode).
                    from gpu_ecs_madrona_tpu.core.state import batched_gather
                    counts = jnp.sum(okk.astype(jnp.int32), axis=1)
                    k_cap = ctx.mgr.registry.archetypes[
                        ContactTemporary.name].capacity
                    k_eff = min(k_cap, K)
                    _, pidx = jax.lax.top_k(okk.astype(jnp.int8), k_eff)

                    def gat(x):
                        return batched_gather(x, pidx)

                    ctx.emit_temporaries(
                        CollisionEventTemporary,
                        counts=counts,
                        values={CollisionEvent: {
                            "a": gat(a_ent), "b": gat(b_ent),
                        }})
                    ctx.emit_temporaries(
                        ContactTemporary,
                        counts=counts,
                        values={ContactConstraint: {
                            "ref": gat(a_ent),
                            "alt": gat(b_ent),
                            "points": jnp.concatenate([
                                gat(contacts["points"]),
                                gat(contacts["depth"])[..., None]], axis=-1),
                            "num_points": gat(contacts["num_points"]),
                            "normal": gat(contacts["normal"]),
                            "lambda_n": gat(lam),
                        }})

                aabb = ctx.column(arch, CollisionAABB)

                if contact_mode == "pallas":
                    # VMEM-resident fused substep (ops/substep_kernel.py);
                    # joints solved post-hoc (see docstring)
                    import os as _os
                    if _os.environ.get("GEM_TPU_PHYS_ABLATE") == "nokernel":
                        p2, r2 = solve_joints_at(new_pos, new_rot)
                        writeback(p2, r2, v, w)
                        return
                    rowsc, kmask = _candidate_rows(ctx)
                    p2, r2, v3_, w3_ = substep_kernel(
                        pos=new_pos, rot=new_rot, v=v, w=w,
                        prev_pos=prev_pos, prev_rot=prev_rot,
                        im=jnp.where(dyn, inv_mass, 0.0),
                        ii=jnp.where(dyn[..., None], inv_inertia, 0.0),
                        mu_s=mu_s, mu_d=mu_d, obj=obj, dyn=dyn,
                        rows_i=rowsc["i"], rows_j=rowsc["j"], kvalid=kmask,
                        h=h_s,
                        restitution_threshold=phys["restitution_threshold"])
                    p2, r2 = solve_joints_at(p2, r2)
                    writeback(p2, r2, v3_, w3_)
                    return

                if contact_mode == "dense":
                    # narrowphase at post-integration poses, gated by the
                    # broadphase AABB grid (reference runs narrowphase on
                    # broadphase candidates)
                    cand = m.aabb_overlaps(
                        aabb["lo"][:, :, None, :], aabb["hi"][:, :, None, :],
                        aabb["lo"][:, None, :, :], aabb["hi"][:, None, :, :])
                    contacts = np_mod.narrowphase_dense(
                        new_pos, new_rot, obj, mask, objmgr,
                        speculative=speculative_margin)
                    contacts = dict(contacts)
                    contacts["ok"] = contacts["ok"] & cand

                    # positional solve
                    p2, r2, lam, bias_dpos = solver_mod.solve_positions(
                        new_pos, new_rot, contacts, inv_mass, inv_inertia,
                        mu_s, prev_pos, prev_rot, dyn, relaxation=relaxation)
                    p2, r2 = solve_joints_at(p2, r2)

                    # velocity recovery + velocity solve
                    v2, w2 = solver_mod.set_velocities(
                        p2, r2, prev_pos, prev_rot, h_s, bias_dpos)
                    v3, w3 = solver_mod.solve_velocities(
                        p2, r2, v2, w2, contacts, lam, inv_mass, inv_inertia,
                        mu_d, v, w, dyn, h_s,
                        phys["restitution_threshold"],
                        rest_coef=objmgr["restitution"][obj],
                        speculative=speculative_margin)
                    writeback(p2, r2, v3, w3)

                    if idx == num_substeps - 1:
                        W, n = mask.shape
                        ents = ctx.entity_column(arch)
                        a_grid = jnp.broadcast_to(ents[:, :, None], (W, n, n))
                        b_grid = jnp.broadcast_to(ents[:, None, :], (W, n, n))
                        cflat = {
                            k: v.reshape((W, n * n) + v.shape[3:])
                            for k, v in contacts.items()
                        }
                        emit_observables(
                            cflat["ok"], a_grid.reshape(W, n * n),
                            b_grid.reshape(W, n * n), cflat,
                            lam.reshape(W, n * n, 4), n * n)
                    return

                # ---- pairs mode: compacted broadphase candidates ----------
                # All per-pair math runs pair-major (K-minor layouts) in
                # physics/pairs.py — see its module doc for why.
                rowsc = ctx.column(CandidateRowsTemporary, CandidatePairRows)
                kmask = ctx.row_mask(CandidateRowsTemporary)
                rows_i, rows_j = rowsc["i"], rowsc["j"]
                n = mask.shape[1]
                oh_i = pk.onehot_rows(rows_i, kmask, n)    # [W,n,K]
                oh_j = pk.onehot_rows(rows_j, kmask, n)

                im_eff = jnp.where(dyn, inv_mass, 0.0)
                ii_eff = jnp.where(dyn[..., None], inv_inertia, 0.0)

                def T(x):  # [W,n,c] -> [W,c,n]
                    return jnp.swapaxes(x, 1, 2)

                def T1(x):  # [W,n] -> [W,1,n]
                    return x[:, None, :]

                # one packed gather per side for all per-body channels
                # (single one-hot matmul each; XLA CSEs oh across substeps)
                packed_T = jnp.concatenate([
                    T(new_pos),                            # 0:3
                    T(new_rot),                            # 3:7
                    T(prev_pos),                           # 7:10
                    T(v),                                  # 10:13 pre-solve
                    T(w),                                  # 13:16
                    T1(im_eff),                            # 16
                    T(ii_eff),                             # 17:20
                    T1(mu_s),                              # 20
                    T1(mu_d),                              # 21
                    T1(obj.astype(jnp.float32)),           # 22 (small ints)
                    T(aabb["lo"]), T(aabb["hi"]),          # 23:26, 26:29
                ], axis=1)                                 # [W, 29, n]
                gA = pk.gather_channels(packed_T, oh_i)    # [W, 29, K]
                gB = pk.gather_channels(packed_T, oh_j)

                def unpack(g):
                    # vec3/quat = component TUPLES of [W,K] rows (see
                    # physics/pairs.py module doc for the layout rationale).
                    # Invalid pairs gather all-zeros; give them an identity
                    # quat so downstream quat math stays tame.
                    return {
                        "pos": (g[:, 0], g[:, 1], g[:, 2]),
                        "rot": (jnp.where(kmask, g[:, 3], 1.0),
                                jnp.where(kmask, g[:, 4], 0.0),
                                jnp.where(kmask, g[:, 5], 0.0),
                                jnp.where(kmask, g[:, 6], 0.0)),
                        "prev_pos": (g[:, 7], g[:, 8], g[:, 9]),
                        "v": (g[:, 10], g[:, 11], g[:, 12]),
                        "w": (g[:, 13], g[:, 14], g[:, 15]),
                        "im": g[:, 16], "ii": (g[:, 17], g[:, 18], g[:, 19]),
                        "mu_s": g[:, 20], "mu_d": g[:, 21],
                        "obj": jnp.round(g[:, 22]).astype(jnp.int32),
                        "lo": (g[:, 23], g[:, 24], g[:, 25]),
                        "hi": (g[:, 26], g[:, 27], g[:, 28]),
                    }

                SA, SB = unpack(gA), unpack(gB)
                pair_ok = kmask & pk.aabb_overlap(
                    SA["lo"], SA["hi"], SB["lo"], SB["hi"])
                FA = pk.body_fields(SA["pos"], SA["rot"], SA["obj"], obj_tables)
                FB = pk.body_fields(SB["pos"], SB["rot"], SB["obj"], obj_tables)
                contacts = pk.pair_contacts(FA, FB, pair_ok,
                                            speculative=speculative_margin)

                sideA = {"pos": SA["pos"], "rot": SA["rot"], "im": SA["im"],
                         "ii": SA["ii"], "mu": SA["mu_s"],
                         "prev_pos": SA["prev_pos"]}
                sideB = {"pos": SB["pos"], "rot": SB["rot"], "im": SB["im"],
                         "ii": SB["ii"], "mu": SB["mu_s"],
                         "prev_pos": SB["prev_pos"]}
                packA, packB, lam = pk.positional_pass(
                    sideA, sideB, contacts, relaxation=relaxation)
                acc = (pk.accumulate_channels(oh_i, packA)
                       + pk.accumulate_channels(oh_j, packB))   # [W,n,9]
                p2 = new_pos + acc[..., 0:3]
                r2 = solver_mod._apply_rot_delta(new_rot, acc[..., 3:6])
                bias_dpos = acc[..., 6:9]
                p2, r2 = solve_joints_at(p2, r2)

                v2, w2 = solver_mod.set_velocities(
                    p2, r2, prev_pos, prev_rot, h_s, bias_dpos)

                # velocity pass at post-solve poses: re-gather p2/r2/v2/w2
                packed2_T = jnp.concatenate(
                    [T(p2), T(r2), T(v2), T(w2)], axis=1)       # [W,14,n]
                gA2 = pk.gather_channels(packed2_T, oh_i)
                gB2 = pk.gather_channels(packed2_T, oh_j)

                def side2(g2, S):
                    return {
                        "pos": (g2[:, 0], g2[:, 1], g2[:, 2]),
                        "rot": (jnp.where(kmask, g2[:, 3], 1.0),
                                jnp.where(kmask, g2[:, 4], 0.0),
                                jnp.where(kmask, g2[:, 5], 0.0),
                                jnp.where(kmask, g2[:, 6], 0.0)),
                        "im": S["im"], "ii": S["ii"], "mu": S["mu_d"],
                        "v": (g2[:, 7], g2[:, 8], g2[:, 9]),
                        "w": (g2[:, 10], g2[:, 11], g2[:, 12]),
                        # restitution inputs: post-integrate velocities
                        # (gathered at indices 10:16 of the first packed
                        # gather = the reference's PreSolveVelocity) and the
                        # per-body material coefficient
                        "pv": S["v"], "pw": S["w"],
                        "rest": obj_tables.scalar(S["obj"], "restitution"),
                    }

                vpA, vpB = pk.velocity_pass(
                    side2(gA2, SA), side2(gB2, SB), contacts, lam, h_s,
                    phys["restitution_threshold"],
                    speculative=speculative_margin)
                accv = (pk.accumulate_channels(oh_i, vpA)
                        + pk.accumulate_channels(oh_j, vpB))    # [W,n,6]
                writeback(p2, r2, v2 + accv[..., 0:3], w2 + accv[..., 3:6])

                if idx == num_substeps - 1:
                    from gpu_ecs_madrona_tpu.core.state import batched_gather
                    ents = ctx.entity_column(arch)
                    a_ent = batched_gather(ents, jnp.where(kmask, rows_i, 0))
                    b_ent = batched_gather(ents, jnp.where(kmask, rows_j, 0))
                    okk = contacts["ok"] & kmask
                    # deepest-4 manifold selection for the observable
                    # contact tables (this path is DCE'd when nothing reads
                    # the temporaries, so the selection cost is observed-only)
                    dep = contacts["depth"]                     # [W,P,K]
                    P = dep.shape[1]
                    cur = dep
                    sel_p, sel_d, sel_l = [], [], []
                    for _ in range(4):
                        di = jnp.argmax(cur, axis=1)
                        ohp = (jnp.arange(P)[None, :, None]
                               == di[:, None, :])
                        sel_d.append(jnp.max(cur, axis=1))       # [W,K]
                        sel_p.append(jnp.stack([
                            jnp.sum(jnp.where(ohp, c, 0.0), axis=1)
                            for c in contacts["points"]], axis=-1))  # [W,K,3]
                        sel_l.append(jnp.sum(jnp.where(ohp, lam, 0.0), axis=1))
                        cur = jnp.where(ohp, -1e9, cur)
                    c_aos = {
                        "points": jnp.stack(sel_p, axis=2),      # [W,K,4,3]
                        "depth": jnp.stack(sel_d, axis=2),       # [W,K,4]
                        "num_points": jnp.minimum(contacts["num_points"], 4),
                        "normal": jnp.stack(contacts["normal"], axis=-1),
                        "ok": okk,
                    }
                    emit_observables(
                        okk, a_ent, b_ent, c_aos,
                        jnp.stack(sel_l, axis=2), kmask.shape[1])

            substep.__name__ = f"physics_substep_{idx}"
            return substep

        def emit_candidates_fused(ctx: Context, counts, rows_i, rows_j):
            # parity surface mirroring setup_broadphase_tasks'
            # emit_candidates: entity-handle candidates + row pairs
            from gpu_ecs_madrona_tpu.core.state import batched_gather
            ents = ctx.entity_column(arch)
            a_ent = batched_gather(ents, rows_i)
            b_ent = batched_gather(ents, rows_j)
            ctx.emit_temporaries(
                CandidateTemporary, counts=counts,
                values={CandidateCollision: {"a": a_ent, "b": b_ent}})
            ctx.emit_temporaries(
                CandidateRowsTemporary, counts=counts,
                values={CandidatePairRows: {"i": rows_i, "j": rows_j}})

        fused_bp = getattr(builder, "_gem_fused_bp", None)
        if fused_bp is not None:
            if contact_mode != "pallas" or has_joints:
                raise ValueError(
                    "broadphase mode 'fused' requires contact_mode="
                    "'pallas' without joints (the broadphase lives inside "
                    f"the fused kernel; got {contact_mode!r}, "
                    f"joints={has_joints})")
            if sleep_threshold > 0.0 and not manifold_persist:
                raise ValueError(
                    "broadphase mode 'fused' composes with "
                    "sleep_threshold only through manifold_persist "
                    "(the sleep passthrough echoes the persistent "
                    "cache's AABB/pair surface)")

        if contact_mode == "pallas" and not has_joints:
            # persistent-manifold stability predicate inputs (per-object
            # bounding radius for the rotation term, precomputed once)
            if manifold_persist:
                import numpy as _np
                _r_tab = jnp.asarray(_np.linalg.norm(_np.maximum(
                    _np.abs(_np.asarray(objmgr["local_aabb_lo"])),
                    _np.abs(_np.asarray(objmgr["local_aabb_hi"]))),
                    axis=-1).astype(_np.float32))

            # one pallas_call for the whole substep chain: the XLA
            # pack/transpose + custom-call boundary costs ~4x the pallas
            # pipeline itself, so it is crossed once per STEP
            def substeps_fused(ctx: Context):
                phys = ctx.singleton(PhysicsState)
                pos = ctx.column(arch, base.Position)
                rot = ctx.column(arch, base.Rotation)
                obj = ctx.column(arch, base.ObjectID)
                mask = ctx.row_mask(arch)
                vel = ctx.column(arch, Velocity)
                resp = ctx.column(arch, ResponseType)
                dyn = (resp == RESPONSE_DYNAMIC) & mask
                bp_kwargs = {}
                if fused_bp is not None:
                    bp_kwargs = {
                        "scale": ctx.column(arch, base.Scale),
                        "live": mask,
                        "dtv": phys["delta_t"] * fused_bp["vexp"],
                    }
                else:
                    rowsc, kmask = _candidate_rows(ctx)
                    bp_kwargs = {"rows_i": rowsc["i"],
                                 "rows_j": rowsc["j"], "kvalid": kmask}
                active = None
                if sleep_threshold > 0.0:
                    # world-level sleep classifier (see docstring): all
                    # dynamic bodies below threshold + no external
                    # force/torque for sleep_frames consecutive steps
                    sl = ctx.singleton(SleepState)
                    ef = ctx.column(arch, ExternalForce)
                    et = ctx.column(arch, ExternalTorque)
                    sp2 = (jnp.sum(vel["linear"] ** 2, -1)
                           + jnp.sum(vel["angular"] ** 2, -1))
                    moving = jnp.any(
                        dyn & (sp2 > sleep_threshold ** 2), axis=1)
                    forced = jnp.any(
                        dyn & (jnp.any(ef != 0.0, -1)
                               | jnp.any(et != 0.0, -1)), axis=1)
                    quiet = ~(moving | forced)
                    # saturate at sleep_frames: an int32 counter left
                    # incrementing would wrap negative after 2^31 quiet
                    # steps and spuriously wake the world
                    qs = jnp.minimum(
                        jnp.where(quiet, sl["quiet_steps"] + 1, 0),
                        jnp.int32(sleep_frames))
                    asleep = qs >= sleep_frames
                    ctx.set_singleton(SleepState, {
                        "quiet_steps": qs,
                        "asleep": asleep.astype(jnp.int32)})
                    active = (~asleep).astype(jnp.float32)
                persist_kwargs = {}
                if manifold_persist:
                    # stability predicate: every live dynamic body's
                    # surface (a) has moved less than persist_margin/2
                    # since the world's manifold cache was built AND
                    # (b) cannot move past it by the END of this step.
                    # Surface movement bound: |dpos| + pi*|dq|*r (the
                    # quat chord |dq| = 2 sin(theta/4) bounds the
                    # rotation angle by theta <= pi*|dq|; a point at
                    # radius r moves at most theta*r) — conservative for
                    # any rotation.  Term (b) adds the current step's
                    # velocity carry (|v| + |w|*r) * dt: without it, an
                    # impulsively kicked stable world (RL inject, ctx
                    # write) would skip broadphase for one step and
                    # tunnel with stale candidates — the predicate is
                    # evaluated on PRE-step poses.  Nonzero external
                    # force/torque also breaks stability (its velocity
                    # change lands within the step).
                    mpcomp = ctx.mgr.registry.singletons["ManifoldPersist"]
                    mp = ctx.singleton(mpcomp)
                    aabb_cur = ctx.column(arch, CollisionAABB)
                    scale_c = ctx.column(arch, base.Scale)
                    ef_c = ctx.column(arch, ExternalForce)
                    et_c = ctx.column(arch, ExternalTorque)
                    dt_c = phys["delta_t"][:, None]
                    disp = jnp.linalg.norm(pos - mp["apos"], axis=-1)
                    dq = jnp.linalg.norm(rot - mp["arot"], axis=-1)
                    rad = _r_tab[obj] * jnp.max(scale_c, axis=-1)
                    carry = (jnp.linalg.norm(vel["linear"], axis=-1)
                             + jnp.linalg.norm(vel["angular"], axis=-1)
                             * rad) * dt_c
                    move = disp + jnp.pi * dq * rad + carry
                    forced = dyn & (jnp.any(ef_c != 0.0, -1)
                                    | jnp.any(et_c != 0.0, -1))
                    moving = dyn & (move >= 0.5 * persist_margin)
                    stable = (mp["valid"] > 0) \
                        & ~jnp.any(moving | forced, axis=1)
                    persist_kwargs = {
                        "mcache": mp["mc"], "stable": stable,
                        "aabb_lo": aabb_cur["lo"],
                        "aabb_hi": aabb_cur["hi"]}
                out = fused_kernel(
                    pos=pos, rot=rot, v=vel["linear"], w=vel["angular"],
                    im=jnp.where(dyn, objmgr["inv_mass"][obj], 0.0),
                    ii=jnp.where(dyn[..., None],
                                 objmgr["inv_inertia"][obj], 0.0),
                    mu_s=objmgr["mu_s"][obj], mu_d=objmgr["mu_d"][obj],
                    obj=obj,
                    ext_f=ctx.column(arch, ExternalForce),
                    ext_t=ctx.column(arch, ExternalTorque),
                    dyn=dyn,
                    h=phys["h"], gravity=phys["gravity"],
                    restitution_threshold=phys["restitution_threshold"],
                    active=active, **bp_kwargs, **persist_kwargs)
                if manifold_persist:
                    # Re-anchor ONLY worlds whose cache the kernel
                    # actually rebuilt: unstable worlds in AWAKE blocks.
                    # Worlds in fully-asleep blocks pass their mc through
                    # unchanged — re-anchoring them (e.g. after an
                    # external teleport while sleeping) would mark a
                    # STALE cache as freshly built.  A rebuild whose
                    # degree cap dropped pairs leaves valid=0: an
                    # incomplete candidate set must never be reused, and
                    # rebuilding every step keeps its drops accounted in
                    # the overflow counter per step.
                    awake = (jnp.ones_like(stable) if active is None
                             else active > 0.5)
                    rebuilt = (~stable) & awake
                    keep3 = ~rebuilt[:, None, None]
                    ctx.set_singleton(mpcomp, {
                        "mc": out["mcache"],
                        "apos": jnp.where(keep3, mp["apos"], pos),
                        "arot": jnp.where(keep3, mp["arot"], rot),
                        "valid": jnp.where(
                            rebuilt,
                            (out["bp_dropped"] == 0).astype(jnp.int32),
                            mp["valid"])})
                if fused_bp is not None:
                    # observable broadphase surface from kernel outputs:
                    # AABB/LeafID columns + candidate temporaries (DCE'd
                    # unless observed) + overflow accounting
                    ctx.set_column(arch, CollisionAABB,
                                   {"lo": out["aabb_lo"],
                                    "hi": out["aabb_hi"]})
                    nrows = mask.shape[1]
                    ctx.set_column(arch, LeafID, jnp.broadcast_to(
                        jnp.arange(nrows, dtype=jnp.int32)[None],
                        mask.shape))
                    debug.check(out["bp_dropped"] == 0,
                                "fused broadphase degree cap "
                                f"{fused_bp['degree']} exceeded: dropped "
                                "pairs={} per world — raise dense_degree",
                                out["bp_dropped"])
                    ctx.add_overflow(CandidateRowsTemporary,
                                     out["bp_dropped"])
                    # the kernel rounds its pair axis up to a multiple of
                    # 128 lanes; slice back to the archetype capacity
                    # before emitting (counts > capacity is accounted by
                    # emit_temporaries' overflow clip)
                    _cap = ctx.mgr.registry.archetypes[
                        CandidateRowsTemporary.name].capacity
                    emit_candidates_fused(ctx, out["bp_count"],
                                          out["rows_i"][:, :_cap],
                                          out["rows_j"][:, :_cap])
                ctx.set_column(arch, base.Position, out["pos"])
                ctx.set_column(arch, base.Rotation, out["rot"])
                keep = dyn[..., None]
                ctx.set_column(arch, Velocity, {
                    "linear": jnp.where(keep, out["v"], vel["linear"]),
                    "angular": jnp.where(keep, out["w"], vel["angular"]),
                })
                ctx.set_column(arch, SubstepPrevState,
                               {"prev_pos": out["prev_pos"],
                                "prev_rot": out["prev_rot"]})
                ctx.set_column(arch, PreSolvePositional,
                               {"x": out["ps_pos"], "q": out["ps_rot"]})
                ctx.set_column(arch, PreSolveVelocity,
                               {"v": out["ps_v"], "omega": out["ps_w"]})

            substeps_fused.__name__ = "physics_substeps_fused"
            return builder.add_node(substeps_fused, list(deps))

        last = list(deps)
        for i in range(num_substeps):
            last = [builder.add_node(make_substep(i), last)]
        return last[0]

    @staticmethod
    def setup_cleanup_tasks(builder: TaskGraphBuilder,
                            deps: Sequence[NodeID]) -> NodeID:
        """reference setupCleanupTasks: clear per-step temporaries."""
        n1 = builder.clear_tmp_node(CandidateTemporary, deps)
        n1b = builder.clear_tmp_node(CandidateRowsTemporary, [n1])
        n2 = builder.clear_tmp_node(ContactTemporary, [n1b])
        n3 = builder.clear_tmp_node(CollisionEventTemporary, [n2])
        return n3


def make_fixed_joint(ctx: Context, e1, e2, attach_rot1, attach_rot2,
                     r1, r2, separation, counts=1, max_new=1):
    """Create Fixed joints (reference JointConstraint::setupFixed,
    physics.hpp:228-233).  e1/e2: entity handles [W, K]."""
    W = ctx.num_worlds
    K = e1.shape[1]
    zeros3 = jnp.zeros((W, K, 3))
    return ctx.make_entities(JointArchetype, counts=counts, max_new=max_new,
                             values={JointConstraint: {
        "e1": e1, "e2": e2,
        "joint_type": jnp.zeros((W, K), jnp.int32),
        "attach_rot1": attach_rot1, "attach_rot2": attach_rot2,
        "separation": separation,
        "a1_local": zeros3, "a2_local": zeros3,
        "b1_local": zeros3, "b2_local": zeros3,
        "r1": r1, "r2": r2,
    }})


def make_hinge_joint(ctx: Context, e1, e2, a1_local, a2_local,
                     b1_local, b2_local, r1, r2, counts=1, max_new=1):
    """Create Hinge joints (reference JointConstraint::setupHinge,
    physics.hpp:235-243)."""
    W = ctx.num_worlds
    K = e1.shape[1]
    ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (W, K, 4))
    return ctx.make_entities(JointArchetype, counts=counts, max_new=max_new,
                             values={JointConstraint: {
        "e1": e1, "e2": e2,
        "joint_type": jnp.ones((W, K), jnp.int32),
        "attach_rot1": ident, "attach_rot2": ident,
        "separation": jnp.zeros((W, K)),
        "a1_local": a1_local, "a2_local": a2_local,
        "b1_local": b1_local, "b2_local": b2_local,
        "r1": r1, "r2": r2,
    }})


def raycast(pos, rot, scale, obj_id, row_mask, object_manager,
            origins, directions, t_max=1e9):
    """Batched ray cast against all bodies (reference broadphase::BVH::
    traceRay, physics.hpp:316-320 / broadphase.cpp ray path) — analytic
    sphere/convex-hull/plane intersections over the dense body list, no
    tree (hulls are exact: slab test over face planes).

    pos/rot/scale/obj_id/row_mask: body columns [W, n, ...];
    origins/directions: [W, R, 3].
    Returns (hit_row [W, R] int32 (-1 = miss), hit_t [W, R] f32).
    """
    from gpu_ecs_madrona_tpu.render.renderer import BatchRenderer
    from gpu_ecs_madrona_tpu.physics.assets import PRIM_HULL, PRIM_PLANE, PRIM_SPHERE

    objmgr = {k: jnp.asarray(v) for k, v in object_manager.items()}
    ptype = objmgr["prim_type"][obj_id]                       # [W, n]
    radius = objmgr["sphere_radius"][obj_id] * scale[..., 0]

    ro = origins[:, :, None, :]       # [W, R, 1, 3]
    rd = directions[:, :, None, :]
    c = pos[:, None, :, :]            # [W, 1, n, 3]
    q = rot[:, None, :, :]
    ts = BatchRenderer._ray_sphere_t(ro, rd, c, radius[:, None, :])
    fnorm = objmgr["face_normals"][obj_id]                    # [W, n, F, 3]
    face_d = objmgr["face_d"][obj_id]
    fmask = jnp.arange(face_d.shape[-1])[None, None] < (
        objmgr["num_faces"][obj_id][..., None])
    tb = BatchRenderer._ray_convex_t(
        ro, rd, c, q, scale[:, None], fnorm[:, None], face_d[:, None],
        fmask[:, None])
    tp = BatchRenderer._ray_plane_t(ro, rd, c, q)
    pt = ptype[:, None, :]
    t = jnp.where(pt == PRIM_SPHERE, ts,
                  jnp.where(pt == PRIM_HULL, tb, tp))
    t = jnp.where(row_mask[:, None, :] & (t <= t_max), t, 1e9)
    best = jnp.min(t, axis=-1)
    row = jnp.argmin(t, axis=-1).astype(jnp.int32)
    miss = best >= 1e9 * 0.5
    return jnp.where(miss, -1, row), jnp.where(miss, jnp.inf, best)
