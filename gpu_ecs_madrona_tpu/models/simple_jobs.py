"""simple_jobs example — TPU lowering of reference examples/simple_jobs/.

The reference expresses this workload as dynamic fork-join jobs over raw
per-world buffers (simple.cpp: SphereObject/candidate/contact arrays with
atomic counters, ctx.submitN grids) — the legacy job-system path (SURVEY.md
§2.3 JobManager).  The recursive simLoop (simple.cpp:192-214) lowers to a
static per-tick taskgraph; the atomic-counter buffers lower to per-world
user-data arrays with count scalars (ctx.data), exercising the user-data
path rather than ECS archetypes — matching the reference, which keeps this
example's state *outside* the ECS.

Semantics per tick (reference simple.cpp):
  1. preprocess (simple.cpp:148-190 in broadphaseSystem): clamp translation
     to world bounds, then AABB of the rotated unit cube.
  2. broadphase (simple.cpp:193-218): all ordered pairs (a != b) with AABB
     overlap append (a, b) index pairs.
  3. narrowphase (simple.cpp:222-250): contact normal = normalize(b - a).
  4. solver (simple.cpp:159-181): a -= normal, b += normal per contact
     (serial in reference; commutes — see collisions.py), counters reset.

Init (simple_jobs/init.cpp): 100 objects, uniform random positions in
bounds [-10,-10,0]..[10,10,10], rotations angle-axis about +Y, U[0, pi).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.executor import ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraphBuilder
from gpu_ecs_madrona_tpu.utils import debug
from gpu_ecs_madrona_tpu.utils import math as m

BOUNDS_LO = (-10.0, -10.0, 0.0)
BOUNDS_HI = (10.0, 10.0, 10.0)


@dataclasses.dataclass
class SimpleJobsConfig:
    num_worlds: int = 1024
    num_objects: int = 100
    max_pairs: int = 1600  # candidate/contact buffer capacity (static shapes)
    # per-body partner cap for the compacting broadphase modes (twostage/
    # rank).  A capacity contract of the same kind as max_pairs (the
    # reference sizes these buffers at n*n, simple.cpp:34); overflow is
    # accounted and check()-gated, never silently dropped.
    degree_cap: int = 32
    seed: int = 0
    # fuse the whole tick into ONE pallas_call
    # (ops/simple_jobs_kernel.py): clamp + AABB + overlap + rank
    # compaction + narrowphase + solver VMEM-resident, with a per-chunk
    # dead-slot skip so compaction work scales with actual pairs instead
    # of the max_pairs contract.  None = auto (TPU only; interpret mode
    # off-TPU is debug-speed).  Candidate slots are identical integers to
    # the XLA 'rank' mode; trajectories match to fp-reassociation
    # tolerance (the solver uses the subtract-first distance form).
    fused: bool = None


class SimpleJobsWorld:
    config: SimpleJobsConfig = SimpleJobsConfig()

    @classmethod
    def with_config(cls, cfg: SimpleJobsConfig):
        return type("SimpleJobsWorld", (cls,), {"config": cfg})

    @classmethod
    def register_types(cls, registry: ECSRegistry):
        # The reference keeps this example's state outside the ECS
        # (simple.hpp:63-88: raw malloc'd arrays in SimpleSim); nothing to
        # register.  Exports are defined over user data instead.
        pass

    @classmethod
    def init(cls, ctx: Context, init_data=None):
        cfg = cls.config
        W = ctx.num_worlds
        n = cfg.num_objects
        lo = jnp.array(BOUNDS_LO)
        hi = jnp.array(BOUNDS_HI)
        kpos, kang = ctx.rng_one(), ctx.rng_one()
        pos = jax.vmap(lambda k: jax.random.uniform(k, (n, 3), minval=lo, maxval=hi))(kpos)
        ang = jax.vmap(lambda k: jax.random.uniform(k, (n,), minval=0.0, maxval=jnp.pi))(kang)
        rot = m.quat_from_angle_axis(ang, jnp.array([0.0, 1.0, 0.0]))
        K = cfg.max_pairs
        ctx.data = {
            "translation": pos,                         # [W, n, 3]
            "rotation": rot,                            # [W, n, 4]
            "aabb_lo": jnp.zeros((W, n, 3)),
            "aabb_hi": jnp.zeros((W, n, 3)),
            "candidates": jnp.zeros((W, K, 2), jnp.int32),
            "num_candidates": jnp.zeros((W,), jnp.int32),
            "contacts_normal": jnp.zeros((W, K, 3)),
            "contacts_ab": jnp.zeros((W, K, 2), jnp.int32),
            "num_contacts": jnp.zeros((W,), jnp.int32),
        }

    @classmethod
    def setup_tasks(cls, builder: TaskGraphBuilder):
        cfg = cls.config
        K = cfg.max_pairs

        fused = cfg.fused
        if fused is None:
            from gpu_ecs_madrona_tpu.utils.platform import is_tpu
            fused = is_tpu()
        if fused:
            from gpu_ecs_madrona_tpu.ops.simple_jobs_kernel import (
                fused_simple_jobs_step)
            from gpu_ecs_madrona_tpu.utils.platform import pallas_interpret

            def fused_step(ctx: Context):
                d = dict(ctx.data)
                npos, lo, hi, ab, nrm, counts, dropped = \
                    fused_simple_jobs_step(
                        d["translation"], d["rotation"],
                        n0=cfg.num_objects, K=K,
                        degree_cap=min(cfg.degree_cap, cfg.num_objects),
                        bounds=(BOUNDS_LO, BOUNDS_HI),
                        interpret=pallas_interpret())
                debug.check(dropped == 0,
                            f"simple_jobs degree cap exceeded: dropped "
                            "pairs={} per world — raise degree_cap",
                            dropped)
                zero = jnp.zeros_like(counts)
                d.update(translation=npos, aabb_lo=lo, aabb_hi=hi,
                         candidates=ab, num_candidates=zero,
                         contacts_normal=nrm, contacts_ab=ab,
                         num_contacts=zero)
                ctx.data = d

            builder.add_node(fused_step, name="fused_step")
            return

        def preprocess(ctx: Context):
            d = ctx.data
            lo = jnp.array(BOUNDS_LO)
            hi = jnp.array(BOUNDS_HI)
            pos = jnp.clip(d["translation"], lo, hi)
            corners = m.transform_points(pos, d["rotation"], m.UNIT_CUBE_CORNERS)
            alo, ahi = m.aabb_from_points(corners)
            d = dict(d)
            d.update(translation=pos, aabb_lo=alo, aabb_hi=ahi)
            ctx.data = d

        n_pre = builder.add_node(preprocess, name="preprocess")

        def overlap_grid(d):
            lo, hi = d["aabb_lo"], d["aabb_hi"]
            ok = m.aabb_overlaps(
                lo[:, :, None, :], hi[:, :, None, :],
                lo[:, None, :, :], hi[:, None, :, :],
            )
            n = lo.shape[1]
            return ok & ~jnp.eye(n, dtype=bool)[None]

        def broadphase(ctx: Context):
            # reference simple.cpp:193-218 (atomic append -> deterministic
            # pair-index-order compaction; the reference's append order is
            # scheduler-dependent, ours is reproducible).
            # Unlike the ECS examples these buffers are live user state
            # (the reference keeps them observable, simple.hpp:80-86), so
            # the compaction cannot be DCE'd.  A scatter form serializes on
            # TPU (measured 431 ms/step at 1024 worlds); top_k works but a
            # variadic sort of the [n*n] grid dominated the whole step
            # (4.84 of 6.19 ms at 1024 worlds); twostage (per-row sort
            # packs partners, one sort over the [n*D] survivors) cut that
            # to 2.3 ms.  The default 'rank' mode goes fully SORT-FREE:
            # slot(a, b) = base[a] + rank(b within row a) — base the
            # exclusive prefix over rows (MXU triangular-matmul cumsum,
            # utils/math.mask_cumsum_last), rank via compare extraction,
            # then an inverse slot->(owner, rank) map with one-hot-matmul
            # gathers — ascending pair-index order by construction, no
            # sort anywhere (3.58 -> 2.25 ms/step at 1024 worlds; 1.26 ms
            # under the tight degree_cap=16/max_pairs=512 contract).
            # GEM_SJ_COMPACT selects topk/sortkey/twostage/rank/rank_sort
            # for A/B measurement.
            import os as _os
            mode = _os.environ.get("GEM_SJ_COMPACT", "rank")
            d = dict(ctx.data)
            ok = overlap_grid(d)
            W, n = ok.shape[:2]
            k_eff = min(K, n * n)
            BIGI = jnp.int32(2 ** 30)
            if mode == "topk":
                flat = ok.reshape(W, n * n)
                counts = jnp.sum(flat.astype(jnp.int32), axis=1)
                _, pair_idx = jax.lax.top_k(flat.astype(jnp.int8), k_eff)
            elif mode == "sortkey":
                flat = ok.reshape(W, n * n)
                counts = jnp.sum(flat.astype(jnp.int32), axis=1)
                iota = jnp.arange(n * n, dtype=jnp.int32)[None]
                key = jnp.where(flat, iota, BIGI)
                pair_idx = jnp.sort(key, axis=1)[:, :k_eff]
                pair_idx = jnp.where(pair_idx < BIGI, pair_idx, 0)
            elif mode in ("rank", "rank_sort"):
                # sort-free two-level compaction.  slot(a, b) =
                # base[a] + rank(b within row a) is ascending in (a, b)
                # because base is the exclusive prefix over rows and the
                # within-row rank is ascending in b — so no sort at all.
                D = min(cfg.degree_cap, n)
                local_rank = m.mask_cumsum_last(ok)      # [W, n, n] (MXU)
                deg = local_rank[:, :, -1]               # [W, n]
                degc = jnp.minimum(deg, D)
                base = jnp.cumsum(degc, axis=1) - degc   # exclusive [W, n]
                dropped = jnp.sum(jnp.maximum(deg - D, 0), axis=1)
                debug.check(dropped == 0,
                            f"simple_jobs degree cap {D} exceeded: dropped "
                            "pairs={} per world — raise degree_cap", dropped)
                counts = jnp.sum(deg, axis=1) - dropped

                if mode == "rank_sort":
                    # per-row sort packs each row's partners ascending
                    # (the twostage stage 1) — rows are only n wide
                    iota_n = jnp.arange(n, dtype=jnp.int32)[None, None]
                    rkey = jnp.where(ok, iota_n, BIGI)
                    partners = jnp.sort(rkey, axis=2)[:, :, :D]  # [W,n,D]
                    partners = jnp.where(partners < BIGI, partners, 0)
                    d_iota = jnp.arange(D, dtype=jnp.int32)
                else:
                    # row a's d-th partner via rank-compare extraction.
                    # f32 select-sum: int32 multiply is decomposed on the
                    # TPU VPU; f32 is single-op and exact for idx < 2^24.
                    p_iota = jnp.arange(n, dtype=jnp.float32)[None, None, :]
                    d_iota = jnp.arange(D, dtype=jnp.int32)
                    sel = (local_rank[:, :, None, :]
                           == (d_iota + 1)[None, None, :, None]) & \
                        ok[:, :, None, :]                # [W, n, D, n]
                    partners = jnp.sum(
                        jnp.where(sel, p_iota[:, None], 0.0), axis=3
                    ).astype(jnp.int32)                  # [W, n, D]

                # INVERSE map (gather form, not the physics broadphase's
                # scatter one-hot: at this k_eff the one-hot operand
                # would be [W, n*D, k_eff] f32 ~ 20 GB).  Slot k's owner
                # row is the last row with base <= k (ties from empty
                # rows resolve to the following non-empty row, which is
                # the one whose [base, base+degc) interval contains k).
                from gpu_ecs_madrona_tpu.core.state import batched_gather
                total = jnp.sum(degc, axis=1)            # [W]
                k_iota = jnp.arange(k_eff, dtype=jnp.int32)
                owner = jnp.sum(
                    (base[:, :, None] <= k_iota[None, None, :])
                    .astype(jnp.int32), axis=1) - 1      # [W, k_eff]
                owner = jnp.clip(owner, 0, n - 1)
                dd = k_iota[None] - batched_gather(base, owner)
                # 2D gather partners[w, owner, dd] as one-hot-row matmul
                # over n (a [W,k,n]x[W,n,D] dot) + a rank select over D —
                # take_along_axis over the n*D flat axis measured 16 ms
                # extra at this config (TPU dynamic gather).
                # bf16 operands when indices are bf16-exact (n <= 256,
                # 8 mantissa bits): halves the HBM traffic of the
                # [W,k,n] one-hot (the dominant cost at k_eff ~ 10^3)
                oh_dt = jnp.bfloat16 if n <= 256 else jnp.float32
                oh_owner = (owner[:, :, None]
                            == jnp.arange(n, dtype=jnp.int32)[None, None]
                            ).astype(oh_dt)              # [W, k_eff, n]
                rows_g = jax.lax.dot_general(
                    oh_owner, partners.astype(oh_dt),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [W, k_eff, D]
                part = jnp.sum(
                    jnp.where(dd[:, :, None] == d_iota[None, None],
                              rows_g, 0.0), axis=2).astype(jnp.int32)
                valid = k_iota[None] < total[:, None]
                pair_idx = jnp.where(valid, owner * n + part, 0)
            else:  # twostage
                # per-body partner cap D; overflow accounted into counts
                D = min(cfg.degree_cap, n)
                iota_n = jnp.arange(n, dtype=jnp.int32)[None, None]
                rkey = jnp.where(ok, iota_n, BIGI)       # [W, n, n]
                part = jnp.sort(rkey, axis=2)[:, :, :D]  # [W, n, D]
                valid = part < BIGI
                deg = jnp.sum(ok.astype(jnp.int32), axis=2)
                dropped = jnp.sum(jnp.maximum(deg - D, 0), axis=1)
                debug.check(dropped == 0,
                            f"simple_jobs degree cap {D} exceeded: dropped "
                            "pairs={} per world — raise degree_cap", dropped)
                counts = jnp.sum(deg, axis=1) - dropped
                a_iota = jnp.arange(n, dtype=jnp.int32)[None, :, None]
                fkey = jnp.where(valid, a_iota * n + part, BIGI)
                k_take = min(k_eff, n * D)
                pair_idx = jnp.sort(fkey.reshape(W, n * D),
                                    axis=1)[:, :k_take]
                pair_idx = jnp.where(pair_idx < BIGI, pair_idx, 0)
                if k_take < k_eff:     # stage-1 caps below the requested K
                    pair_idx = jnp.pad(pair_idx,
                                       ((0, 0), (0, k_eff - k_take)))
            ab = jnp.stack([pair_idx // n, pair_idx % n], axis=-1)  # [W,k,2]
            cands = jnp.zeros((W, K, 2), jnp.int32).at[:, :k_eff].set(ab)
            d.update(candidates=cands, num_candidates=jnp.minimum(counts, k_eff))
            ctx.data = d

        n_broad = builder.add_node(broadphase, deps=[n_pre], name="broadphase")

        def narrowphase(ctx: Context):
            # reference simple.cpp:222-250 + candidate counter reset at :154-157
            from gpu_ecs_madrona_tpu.core.state import batched_gather

            d = dict(ctx.data)
            pos = d["translation"]
            cands = d["candidates"]
            a = batched_gather(pos, cands[..., 0])
            b = batched_gather(pos, cands[..., 1])
            diff = b - a
            inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True), 1e-30))
            d.update(
                contacts_normal=diff * inv,
                contacts_ab=cands,
                num_contacts=d["num_candidates"],
                num_candidates=jnp.zeros_like(d["num_candidates"]),
            )
            ctx.data = d

        n_narrow = builder.add_node(narrowphase, deps=[n_broad], name="narrowphase")

        def solver(ctx: Context):
            # reference simple.cpp:159-181.  Net push via the Gram-matrix
            # formulation (identical math + fp behavior to collisions.py's
            # solver; see the derivation there) — the [W, n, n, 3] normal
            # grid never materializes.
            d = dict(ctx.data)
            ok = overlap_grid(d)
            pos = d["translation"]
            # center per world before the Gram (see collisions.py solver)
            pc = pos - jnp.mean(pos, axis=1, keepdims=True)
            gram = jnp.einsum("wic,wjc->wij", pc, pc,
                              preferred_element_type=jnp.float32,
                              precision=m.EXACT)  # see utils/math.py EXACT
            sq = jnp.sum(pc * pc, axis=-1)
            d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
            # coincident pairs (clamped into the same bounds corner)
            # have no defined push direction (reference normalize(0) is
            # NaN): excluded — see ops/simple_jobs_kernel.py
            mmat = jnp.where(ok & (d2 > 1e-12),
                             jax.lax.rsqrt(jnp.maximum(d2, 1e-30)), 0.0)
            mx = jnp.einsum("wij,wjc->wic", mmat, pc,
                            preferred_element_type=jnp.float32,
                            precision=m.EXACT)
            rowsum = jnp.sum(mmat, axis=2)
            delta = -2.0 * (mx - pc * rowsum[..., None])
            d.update(
                translation=pos + delta,
                num_contacts=jnp.zeros_like(d["num_contacts"]),
            )
            ctx.data = d

        builder.add_node(solver, deps=[n_narrow], name="solver")


def make_executor(cfg: SimpleJobsConfig = SimpleJobsConfig(), **exec_kwargs):
    world = SimpleJobsWorld.with_config(cfg)
    return TaskGraphExecutor(
        world,
        ExecutorConfig(num_worlds=cfg.num_worlds, max_entities_per_world=8,
                       seed=cfg.seed, **exec_kwargs),
    )
