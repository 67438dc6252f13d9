"""Collisions example — TPU lowering of reference examples/collisions/.

The reference implements this with the legacy dynamic job system
(collisions.cpp: broadphaseSystem -> narrowphaseSystem -> solverSystem,
re-queued recursively per tick via simLoop, collisions.cpp:201-227).  Here
the per-tick job chain is lowered to a *static* taskgraph — the same
migration the reference itself performed for simple_taskgraph (SURVEY.md
§7.3: recursive job semantics cannot be traced; a static per-tick graph is
the supported path).

Semantics preserved per tick (reference collisions.cpp):
  1. AABB preprocess (collisions.cpp:96-122): each cube's world-space AABB
     from its translation/rotation applied to a unit cube (the reference's
     "fake 2*unit cube").
  2. Broadphase (collisions.cpp:125-145): every ordered pair (a, b), a != b,
     with overlapping AABBs creates a CollisionCandidate entity holding
     the two entity handles.
  3. Narrowphase (collisions.cpp:148-173): each candidate produces a Contact
     with normal = normalize(b_pos - a_pos).
  4. Solver (collisions.cpp:179-200): for each contact, push a by -normal
     and b by +normal, then clear Contact; candidates cleared after
     narrowphase (collisions.cpp:176).  The reference applies pushes
     serially but all normals are computed before any push, so the batched
     scatter-add here is the same sum (commutative up to fp rounding).

Initial state (collisions.cpp:39-88): 100 cubes per world, uniform random
positions in bounds [-10,-10,0]..[10,10,10], rotation angle-axis about
+Y with angle ~ U[0, pi).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype, component
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.executor import ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraphBuilder
from gpu_ecs_madrona_tpu.utils import math as m

# Components (reference collisions.hpp:15-43)
Translation = component("Translation", ((3,), jnp.float32))
Rotation = component("Rotation", ((4,), jnp.float32))
PhysicsAABB = component("PhysicsAABB", lo=((3,), jnp.float32), hi=((3,), jnp.float32))
CandidatePair = component("CandidatePair", a=((), jnp.int32), b=((), jnp.int32))
ContactData = component(
    "ContactData", normal=((3,), jnp.float32), a=((), jnp.int32), b=((), jnp.int32)
)

# Archetypes (reference collisions.hpp:45-48)
CubeObject = Archetype("CubeObject", [Translation, Rotation, PhysicsAABB])
CollisionCandidate = Archetype("CollisionCandidate", [CandidatePair])
Contact = Archetype("Contact", [ContactData])


@dataclasses.dataclass
class CollisionsConfig:
    num_worlds: int = 1024
    num_objects: int = 100  # reference collisions.cpp:72 init_num_objects
    # candidate/contact capacity per world; the reference's job system has no
    # cap (dynamic allocation) — fixed capacity is the static-shape contract
    # (SURVEY.md §7.3).  16*objects comfortably covers the observed overlap
    # rate of the reference's random init.
    max_pairs: int = 1600
    seed: int = 0
    # Use the fused Pallas collision kernel for the solver.  Measured on
    # one v5e at 8192 worlds x 100 objects: XLA dense path 5.5 ms/step
    # (1.48M env-steps/s) vs Pallas 6.6 ms — XLA's reduce fusion already
    # keeps this small pair grid on-chip, and the kernel pays layout
    # conversion at the custom-call boundary.  The kernel wins only when
    # the [W, n, n] grid would not fit through HBM (large n); default off
    # for the 100-object headline workload.
    use_pallas: bool = False
    # Fuse the whole per-tick chain (AABB preprocess + overlap + push) into
    # ONE pallas_call (ops/collision_kernel.fused_collisions_step): the
    # [n, n] grids never touch HBM — the megakernel analog (measured 37x
    # step time vs the XLA chain at 8192 worlds on one v5e; verified
    # against a NumPy oracle to 7.6e-6 on hardware).  None = auto: on for
    # TPU when n fits a VMEM tile, off on CPU (tests force it on to run
    # the kernel in interpret mode).  The broadphase/narrowphase
    # temporary-emitting nodes are unchanged (and still DCE'd when
    # unobserved), so observable semantics are identical.
    fused: bool = None


class CollisionsWorld:
    """World-class protocol implementation for the executor front door."""

    config: CollisionsConfig = CollisionsConfig()

    @classmethod
    def with_config(cls, cfg: CollisionsConfig):
        return type("CollisionsWorld", (cls,), {"config": cfg})

    # -- registration (reference collisions.cpp:53-66) ---------------------

    @classmethod
    def register_types(cls, registry: ECSRegistry):
        cfg = cls.config
        registry.register_archetype(CubeObject, capacity=cfg.num_objects + 8)
        registry.register_archetype(
            CollisionCandidate, capacity=cfg.max_pairs, temporary=True
        )
        registry.register_archetype(Contact, capacity=cfg.max_pairs, temporary=True)
        registry.export_column(CubeObject, Translation, 0)
        registry.export_column(CubeObject, Rotation, 1)

    # -- world ctor (reference collisions.cpp:39-88) ------------------------

    @classmethod
    def init(cls, ctx: Context, init_data=None):
        cfg = cls.config
        W = ctx.num_worlds
        n = cfg.num_objects
        lo = jnp.array([-10.0, -10.0, 0.0])
        hi = jnp.array([10.0, 10.0, 10.0])
        ctx.data = {
            "bounds_lo": jnp.broadcast_to(lo, (W, 3)),
            "bounds_hi": jnp.broadcast_to(hi, (W, 3)),
        }
        # fused-step stash: the megakernel computes the push delta alongside
        # the AABBs (before broadphase in node order); the solver node
        # applies it after narrowphase.  Pre-created so the state pytree
        # structure is step-invariant.
        ctx.data["push_delta"] = jnp.zeros((W, cfg.num_objects + 8, 3),
                                           jnp.float32)
        kpos, kang = ctx.rng_one(), ctx.rng_one()
        pos = jax.vmap(
            lambda k: jax.random.uniform(k, (n, 3), minval=lo, maxval=hi)
        )(kpos)
        ang = jax.vmap(
            lambda k: jax.random.uniform(k, (n,), minval=0.0, maxval=jnp.pi)
        )(kang)
        rot = m.quat_from_angle_axis(ang, jnp.array([0.0, 1.0, 0.0]))
        inv_lo, inv_hi = m.aabb_invalid((W, n))
        ctx.make_entities(
            CubeObject,
            counts=n,
            max_new=n,
            values={
                Translation: pos,
                Rotation: rot,
                PhysicsAABB: {"lo": inv_lo, "hi": inv_hi},
            },
        )

    # -- taskgraph (lowering of the reference's per-tick job chain) ---------

    @classmethod
    def setup_tasks(cls, builder: TaskGraphBuilder):
        cfg = cls.config
        max_pairs = cfg.max_pairs
        n_pad = ((cfg.num_objects + 8 + 127) // 128) * 128
        fused = cfg.fused
        if fused is None:
            # exec-config artifact first (the MADRONA_MWGPU_EXEC_CONFIG_FILE
            # analog, tooling/autotuner.py), then the static heuristic
            from gpu_ecs_madrona_tpu.tooling import autotuner
            tuned = autotuner.lookup("collisions",
                                     num_worlds=cfg.num_worlds,
                                     num_objects=cfg.num_objects)
            if tuned is not None and "fused" in tuned:
                fused = bool(tuned["fused"])
            else:
                from gpu_ecs_madrona_tpu.utils.platform import is_tpu
                fused = (is_tpu()
                         and n_pad * n_pad * 12 <= 6 * 1024 * 1024)
        if fused and n_pad * n_pad * 12 > 6 * 1024 * 1024:
            raise ValueError("fused=True: object count exceeds the fused "
                             "kernel's single-tile VMEM bound")

        if fused:
            def fused_pre(ctx: Context):
                # one pallas_call computes the AABBs AND the push delta from
                # the pre-push positions; the delta is stashed and applied
                # by the solver node so broadphase/narrowphase still observe
                # pre-push state (reference node order).
                from gpu_ecs_madrona_tpu.ops.collision_kernel import (
                    fused_collisions_step)
                from gpu_ecs_madrona_tpu.utils.platform import (
                    pallas_interpret)
                pos = ctx.column(CubeObject, Translation)
                rot = ctx.column(CubeObject, Rotation)
                mask = ctx.row_mask(CubeObject)
                # forcing fused=True off-TPU (tests) runs the kernel in
                # interpret mode
                delta, lo, hi = fused_collisions_step(
                    pos, rot, mask, interpret=pallas_interpret())
                ctx.set_column(CubeObject, PhysicsAABB, {"lo": lo, "hi": hi})
                ctx.data["push_delta"] = delta

            n_pre = builder.add_node(fused_pre, name="aabb_preprocess")
        else:
            def aabb_preprocess(rowctx, pos, rot, aabb):
                # reference collisions.cpp:96-122 (unit-cube corner transform)
                corners = m.transform_points(pos, rot, m.UNIT_CUBE_CORNERS)
                lo, hi = m.aabb_from_points(corners)
                return pos, rot, {"lo": lo, "hi": hi}

            n_pre = builder.parallel_for_node(
                aabb_preprocess, [Translation, Rotation, PhysicsAABB],
                name="aabb_preprocess"
            )

        # The three pair-grid nodes below each recompute the (cheap) dense
        # overlap grid from the AABB columns rather than passing buffers
        # between nodes: within the single jit-compiled step, XLA CSE
        # dedupes the recomputation — the megakernel-fusion analog of the
        # reference's nodes sharing device state in one kernel.

        def pair_grid(ctx: Context):
            """Dense ordered-pair overlap grid + deterministic pair ranks.

            Returns (ok_flat [W, n*n] bool, ranks [W, n*n] i32 — rank among
            hits in pair-index order, counts [W]).  Pair-index order equals
            the reference's serial (a, b) loop order (collisions.cpp:
            125-145), so candidate rows come out in the same sequence.
            """
            mask = ctx.row_mask(CubeObject)
            aabb = ctx.column(CubeObject, PhysicsAABB)
            lo, hi = aabb["lo"], aabb["hi"]
            overlap = m.aabb_overlaps(
                lo[:, :, None, :], hi[:, :, None, :],
                lo[:, None, :, :], hi[:, None, :, :],
            )  # [W, n, n]
            cap = mask.shape[1]
            ok = overlap & mask[:, :, None] & mask[:, None, :]
            ok = ok & ~jnp.eye(cap, dtype=bool)[None]
            flat = ok.reshape(ok.shape[0], cap * cap)
            ranks = jnp.cumsum(flat, axis=1, dtype=jnp.int32) - 1
            counts = jnp.sum(flat.astype(jnp.int32), axis=1)
            return flat, ranks, counts, cap

        def compact(flat, ranks, k, grid_vals):
            """Scatter-compact grid channels [W, n*n, ...] to [W, k, ...]
            in pair-index order.  Scatter sources are fused broadcasts, so
            HBM traffic is only the compacted writes."""
            W = flat.shape[0]
            dest = jnp.where(flat & (ranks < k), ranks, k)  # k -> dropped
            widx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], dest.shape)
            outs = []
            for v in grid_vals:
                out = jnp.zeros((W, k) + v.shape[2:], v.dtype)
                outs.append(out.at[widx, dest].set(v, mode="drop"))
            return outs

        def broadphase(ctx: Context):
            # reference collisions.cpp:125-145: candidates = overlapping
            # ordered pairs, as entity-handle pairs.
            flat, ranks, counts, cap = pair_grid(ctx)
            k_eff = min(max_pairs, cap * cap)
            ents = ctx.entity_column(CubeObject)  # [W, n]
            a_grid = jnp.broadcast_to(ents[:, :, None], (ents.shape[0], cap, cap))
            b_grid = jnp.broadcast_to(ents[:, None, :], (ents.shape[0], cap, cap))
            n2 = cap * cap
            a_ent, b_ent = compact(
                flat, ranks, k_eff,
                [a_grid.reshape(-1, n2), b_grid.reshape(-1, n2)],
            )
            ctx.emit_temporaries(
                CollisionCandidate,
                counts=counts,  # emit clips to k_eff + counts overflow
                values={CandidatePair: {"a": a_ent, "b": b_ent}},
                # fused mode: the solve happens in-kernel on the full VMEM
                # grid — these rows are observability-only, and counting
                # their clipping would keep the XLA pair grid live that
                # DCE otherwise deletes (60x on the headline bench)
                count_overflow=not fused,
            )

        n_broad = builder.add_node(broadphase, deps=[n_pre], name="broadphase")

        def pair_normals(ctx: Context, cap):
            """normal(a->b) = normalize(pos_b - pos_a) for every grid pair
            (reference collisions.cpp:156-160), computed densely."""
            pos = ctx.column(CubeObject, Translation)  # [W, n, 3]
            diff = pos[:, None, :, :] - pos[:, :, None, :]  # [W, a, b, 3]
            inv = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(diff * diff, axis=-1, keepdims=True), 1e-30)
            )
            return diff * inv  # [W, n, n, 3]

        def narrowphase(ctx: Context):
            # reference collisions.cpp:148-173: contact per candidate.
            flat, ranks, counts, cap = pair_grid(ctx)
            k_eff = min(max_pairs, cap * cap)
            norm_grid = pair_normals(ctx, cap)
            n2 = cap * cap
            ents = ctx.entity_column(CubeObject)
            W = flat.shape[0]
            a_grid = jnp.broadcast_to(ents[:, :, None], (W, cap, cap))
            b_grid = jnp.broadcast_to(ents[:, None, :], (W, cap, cap))
            norm_c, a_ent, b_ent = compact(
                flat, ranks, k_eff,
                [norm_grid.reshape(W, n2, 3),
                 a_grid.reshape(W, n2), b_grid.reshape(W, n2)],
            )
            ctx.emit_temporaries(
                Contact,
                counts=counts,  # emit clips to k_eff + counts overflow
                values={ContactData: {"normal": norm_c, "a": a_ent, "b": b_ent}},
                count_overflow=not fused,  # see CollisionCandidate emit
            )

        n_narrow = builder.add_node(narrowphase, deps=[n_broad], name="narrowphase")
        n_clear_cand = builder.clear_tmp_node(CollisionCandidate, deps=[n_narrow])

        def solver(ctx: Context):
            # reference collisions.cpp:179-200: for each contact push a by
            # -normal and b by +normal.  Every unordered overlapping pair
            # {i, j} appears as both (i, j) and (j, i), and normals are all
            # computed before any push, so the net per-object delta is the
            # dense masked reduction
            #     delta_i = -2 * sum_j ok_ij * normalize(pos_j - pos_i)
            # — a fused VPU reduction with zero gathers/scatters (commutes
            # with the reference's serial loop up to fp rounding).  ALL
            # overlapping pairs contribute, exactly like the reference,
            # which sizes its buffers at numObjs^2 and never drops
            # (simple_jobs/simple.cpp max_collisions); only the *observable
            # contact table* truncates at its configured capacity.
            pos_col = ctx.column(CubeObject, Translation)
            if fused:
                ctx.set_column(CubeObject, Translation,
                               pos_col + ctx.data["push_delta"])
                return
            from gpu_ecs_madrona_tpu.utils.platform import is_tpu
            use_pallas = cfg.use_pallas and is_tpu()
            if use_pallas:
                # fused VMEM-resident pair grid (ops/collision_kernel.py)
                aabb = ctx.column(CubeObject, PhysicsAABB)
                mask = ctx.row_mask(CubeObject)
                from gpu_ecs_madrona_tpu.ops.collision_kernel import collision_pushes
                delta = collision_pushes(pos_col, aabb["lo"], aabb["hi"], mask)
            else:
                # Gram-matrix formulation: identical math to the per-pair
                # normals reduction, but the only [W, n, n] tensor is the
                # scalar M = ok * rsqrt(d2) — the [W, n, n, 3] normal grid
                # never exists (it cost ~3.5 ms/step in HBM traffic at
                # 8192 worlds; this form runs ~2x faster).
                #   delta_i = -2 sum_j ok_ij (x_j - x_i) rsqrt(d2_ij)
                #           = -2 (M x - x * rowsum(M))
                flat, ranks, counts, cap = pair_grid(ctx)
                W = flat.shape[0]
                ok = flat.reshape(W, cap, cap)
                # center per world before the Gram: d2 is translation-
                # invariant, and |x|^2 terms at large coordinates lose the
                # few-units-scale d2 to f32 cancellation (measured 0.06
                # position error at |x|~1000 without this).
                pc = pos_col - jnp.mean(pos_col, axis=1, keepdims=True)
                # precision=EXACT is load-bearing: one-bf16-pass gram loses
                # close-pair d2 to cancellation and the rsqrt explodes
                # (utils/math.py EXACT note; reproduced on v5e).
                gram = jnp.einsum("wic,wjc->wij", pc, pc,
                                  preferred_element_type=jnp.float32,
                                  precision=m.EXACT)
                sq = jnp.sum(pc * pc, axis=-1)
                d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
                mmat = jnp.where(ok, jax.lax.rsqrt(jnp.maximum(d2, 1e-30)), 0.0)
                mx = jnp.einsum("wij,wjc->wic", mmat, pc,
                                preferred_element_type=jnp.float32,
                                precision=m.EXACT)
                rowsum = jnp.sum(mmat, axis=2)
                delta = -2.0 * (mx - pc * rowsum[..., None])
            ctx.set_column(CubeObject, Translation, pos_col + delta)

        n_solve = builder.add_node(solver, deps=[n_clear_cand], name="solver")
        builder.clear_tmp_node(Contact, deps=[n_solve])


def make_executor(cfg: CollisionsConfig = CollisionsConfig(), **exec_kwargs):
    world = CollisionsWorld.with_config(cfg)
    return TaskGraphExecutor(
        world,
        ExecutorConfig(
            num_worlds=cfg.num_worlds,
            max_entities_per_world=cfg.num_objects + 8,
            seed=cfg.seed,
            **exec_kwargs,
        ),
    )
