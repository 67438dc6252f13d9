"""TaskGraphExecutor — the front door: build world, compile step, run.

TPU-native analog of the reference's two executors:
  - CPU: TaskGraphExecutor / ThreadPoolExecutor (include/madrona/mw_cpu.hpp,
    src/mw/cpu_exec.cpp) — construct per-world state via
    WorldT::registerTypes / setupTasks / ctor, then run one job per world
    per step.
  - GPU: MWCudaExecutor (include/madrona/mw_gpu.hpp, src/mw/cuda_exec.cpp)
    — NVRTC-JIT the engine+user code into a megakernel and replay a CUDA
    graph each step.

Here both collapse into one path: the world class registers types, builds a
taskgraph, and the sorted graph is traced and jit-compiled once
(jax.jit(donate) = the CUDA-graph replay; JAX persistent compilation cache =
the reference's MADRONA_MWGPU_KERNEL_CACHE cubin cache).  Running on CPU vs
TPU is a backend flag, not a separate engine.

World-class protocol (mirrors reference WorldT usage, mw_cpu.inl:5-44):

    class MyWorld:
        @staticmethod
        def register_types(registry: ECSRegistry): ...
        @staticmethod
        def setup_tasks(builder: TaskGraphBuilder): ...
        @staticmethod
        def init(ctx: Context, init_data): ...   # world ctor, batched
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.utils import tracing

from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.state import SimState, StateManager
from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraph, TaskGraphBuilder


@dataclasses.dataclass
class ExecutorConfig:
    """reference ThreadPoolExecutor::Config / StateConfig (mw_cpu.hpp:11-22,
    mw_gpu.hpp:20-36): world count + capacities + seed."""

    num_worlds: int
    max_entities_per_world: Optional[int] = None
    seed: int = 0
    # donate state buffers into the jit step (in-place update; the analog of
    # the reference stepping its persistent device state).
    donate: bool = True
    # optional jax.sharding.Sharding applied to every state leaf (worlds
    # axis sharded across devices); see parallel/ for mesh helpers.
    sharding: Optional[Any] = None


class TaskGraphExecutor:
    """Build + compile + run a world across many lockstep worlds."""

    def __init__(self, world_cls, cfg: ExecutorConfig, init_data: Any = None):
        self.cfg = cfg
        self.world_cls = world_cls

        registry = ECSRegistry()
        world_cls.register_types(registry)
        self.registry = registry
        self.mgr = StateManager(
            registry, cfg.num_worlds, cfg.max_entities_per_world
        )

        state = self.mgr.make_initial_state(seed=cfg.seed)

        # World construction (reference: per-world WorldT ctor, batched here).
        def init_fn(s):
            ctx = Context(self.mgr, s)
            world_cls.init(ctx, init_data)
            return ctx.state

        state = jax.jit(init_fn)(state)

        builder = TaskGraphBuilder(self.mgr)
        world_cls.setup_tasks(builder)
        self.graph: TaskGraph = builder.build()

        if cfg.sharding is not None:
            state = jax.device_put(
                state, jax.tree_util.tree_map(lambda _: cfg.sharding, state)
            )
        self._state = state

        donate = (0,) if cfg.donate else ()
        self._step = jax.jit(self.graph.step, donate_argnums=donate)

        def multi_step(s, n_steps):
            def body(carry, _):
                return self.graph.step(carry), None

            out, _ = jax.lax.scan(body, s, None, length=n_steps)
            return out

        self._multi_step = jax.jit(
            multi_step, static_argnums=1, donate_argnums=donate
        )

    # -- stepping ----------------------------------------------------------

    @property
    def state(self) -> SimState:
        return self._state

    @state.setter
    def state(self, value: SimState):
        self._state = value

    def step(self):
        """One step (reference MWCudaExecutor::run / ThreadPoolExecutor::run)."""
        tracing.log(tracing.HostEvent.STEP_START)
        self._state = self._step(self._state)
        tracing.log(tracing.HostEvent.STEP_END)

    def run(self, num_steps: int = 1, use_scan: bool = False):
        """Run ``num_steps`` steps.

        Default: repeated donated jit calls — JAX async dispatch pipelines
        them with no host sync between steps (the analog of the reference's
        CUDA-graph replay loop, cuda_exec.cpp:1777-1794).  Measured faster
        than a fused lax.scan, which inserts carry copies at loop
        boundaries; pass use_scan=True to get the single-dispatch scan
        (useful under multi-host orchestration where one XLA program per
        batch is preferable)."""
        if use_scan and num_steps > 1:
            self._state = self._multi_step(self._state, num_steps)
        else:
            for _ in range(num_steps):
                self.step()

    def block_until_ready(self):
        jax.block_until_ready(self._state)

    # -- export (reference getExported / python bindings) -------------------

    def get_exported(self, slot: int, packed: bool = False):
        """Zero-copy view of an exported column: (values [W, cap, ...],
        live row mask [W, cap]).  Analog of reference exportColumn /
        Tensor hand-off (src/core/state.cpp:437-487, python/bindings.cpp).
        Unlike the reference's packed copy-out pipeline
        (device/consts.cpp:137-273), the column is already dense per world —
        no copy happens.

        packed=True returns the reference's cross-world packed layout
        (exportBlockSums + exportCopyOut, device/consts.cpp:137-273)
        instead: (values [W*cap, ...] with every live row compacted to
        the front in (world, row) order, counts [W] int32, offsets [W]
        int32 exclusive prefix) — world w's rows live at
        [offsets[w] : offsets[w] + counts[w]].  This is a copy (one
        stable sort), sized for external (e.g. torch) consumers that
        want dense rows without reimplementing compaction; rows past
        counts.sum() are zero padding.

        NOTE: exports are *snapshots* of the current state, not stable
        pointers.  With donation on (default), stepping invalidates arrays
        returned earlier — re-fetch after each run().  (The reference
        updates fixed export buffers in place; JAX's functional arrays
        cannot, and donation is what makes the step zero-alloc.)  Pass
        ExecutorConfig(donate=False) if you need exports to outlive steps."""
        info = self.registry.exports[slot]
        vals = self.mgr.column(self._state, info.archetype, info.comp)
        mask = self.mgr.row_mask(self._state, info.archetype)
        if not packed:
            return vals, mask
        W, cap = mask.shape
        flat_mask = jnp.reshape(mask, (W * cap,))
        # live rows first, (world, row) order preserved (stable)
        order = jnp.argsort(~flat_mask, stable=True)

        def pack_leaf(x):
            flat = jnp.reshape(x, (W * cap,) + x.shape[2:])
            kept = jnp.take(flat, order, axis=0)
            live = flat_mask[order]
            return jnp.where(
                jnp.reshape(live, (W * cap,) + (1,) * (kept.ndim - 1)),
                kept, jnp.zeros_like(kept))

        packed_vals = jax.tree_util.tree_map(pack_leaf, vals)
        counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        return packed_vals, counts, offsets

    def set_exported(self, slot: int, value):
        """External write-back (reference copyInExportedColumns,
        src/core/state.cpp:489-514) — e.g. action tensors from a learner."""
        info = self.registry.exports[slot]
        self._state = self.mgr.set_column(
            self._state, info.archetype, info.comp, value
        )

    def overflow_counters(self):
        """Per-world dropped-create counters, {archetype_name: [W] int32}.

        The release-build surface for capacity overflow (the masked analog
        of the reference's asserts, src/core/state.inl:398-449): any
        nonzero entry means creates/temporaries were silently clipped by a
        too-small capacity (e.g. max_pairs) and results for those worlds
        are suspect.  GEM_TPU_DEBUG=1 additionally fires an in-step
        check() print at the offending node."""
        return self._state["overflow"]

    # -- observation accessors (reference rgbObservations/depthObservations,
    # include/madrona/mw_render.hpp + vk/batch_renderer.cpp readback ptrs) --

    def rgb_observations(self):
        """RGBA8 observations [W, views, H, Wpx, 4] (requires a
        render.renderer.BatchRenderer node in the graph)."""
        return self._state["user"]["render_out"]["rgb"]

    def depth_observations(self):
        """f32 depth observations [W, views, H, Wpx] (inf = miss)."""
        return self._state["user"]["render_out"]["depth"]

    # -- checkpoint (absent in reference; SURVEY.md §5.4) --------------------

    def save_state(self) -> SimState:
        """The full simulation is one pytree — snapshot it."""
        return jax.tree_util.tree_map(lambda x: x, self._state)

    def restore_state(self, snapshot: SimState):
        self._state = snapshot

    def save_checkpoint(self, path: str):
        """Persist the full simulation state to disk.  The reference has no
        state checkpointing (SURVEY.md §5.4 — only a kernel cache); here the
        whole sim is one pytree, serialized leaf-by-leaf: flat npz + a JSON
        structure spec.  The spec is deliberately NOT pickle — a checkpoint
        file must never be an arbitrary-code-execution vector."""
        import json
        import numpy as np

        arrays = {}

        def spec_of(node):
            if isinstance(node, dict):
                return {"t": "dict",
                        "k": sorted(node),
                        "c": [spec_of(node[k]) for k in sorted(node)]}
            if isinstance(node, (list, tuple)):
                return {"t": "list" if isinstance(node, list) else "tuple",
                        "c": [spec_of(x) for x in node]}
            i = len(arrays)
            arrays[f"leaf_{i}"] = np.asarray(node)
            return {"t": "leaf", "i": i}

        spec = spec_of(self._state)
        np.savez(path, __spec__=np.frombuffer(
            json.dumps(spec).encode(), dtype=np.uint8), **arrays)

    def restore_checkpoint(self, path: str):
        import json
        import numpy as np

        with np.load(path if path.endswith(".npz") else path + ".npz",
                     allow_pickle=False) as z:
            if "__spec__" not in z.files:
                if "__treedef__" in z.files:
                    raise ValueError(
                        "unsupported legacy checkpoint format: this .npz "
                        "carries a pickled '__treedef__' (pre-JSON-spec "
                        "format); re-save it with the current "
                        "save_checkpoint, or restore it with the revision "
                        "that wrote it")
                raise ValueError(
                    "not a framework checkpoint: missing '__spec__' entry")
            spec = json.loads(z["__spec__"].tobytes().decode())

            def build(s):
                if s["t"] == "dict":
                    return {k: build(c) for k, c in zip(s["k"], s["c"])}
                if s["t"] in ("list", "tuple"):
                    seq = [build(c) for c in s["c"]]
                    return seq if s["t"] == "list" else tuple(seq)
                return jnp.asarray(z[f"leaf_{s['i']}"])

            state = build(spec)
        if self.cfg.sharding is not None:
            state = jax.device_put(
                state, jax.tree_util.tree_map(lambda _: self.cfg.sharding, state))
        self._state = state
