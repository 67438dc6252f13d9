"""Per-node profiling + step tracing.

TPU analog of the reference's tracing/tooling stack (SURVEY.md §5.1):
  - DeviceTracing + parse_device_tracing.py (per-node device timelines)
      -> trace_step(): jax.profiler trace of the compiled step; node
         attribution comes free from the jax.named_scope each taskgraph
         node is wrapped in (taskgraph.py), aggregated by
         aggregate_trace().
  - scripts/profile.py (per-node launch-config autotuner)
      -> profile_nodes(): times every node as a standalone jit to rank
         hot nodes, and sweep(): generic config sweep harness emitting the
         same kind of JSON the reference feeds back in.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import time
from typing import Any, Callable, Dict, List, Optional

import jax

from gpu_ecs_madrona_tpu.core.context import Context


def profile_nodes(executor, iters: int = 20) -> List[Dict[str, Any]]:
    """Time each taskgraph node standalone (compile excluded).

    Mirrors the reference autotuner's per-node timing loop
    (scripts/profile.py) — but the numbers are advisory: inside the fused
    step XLA may overlap or eliminate work (e.g. unobserved temporaries),
    so the full-step time is NOT the sum of the node times.
    """
    mgr, graph, state = executor.mgr, executor.graph, executor.state
    results = []
    for node in graph.nodes:
        def run_node(s, _node=node):
            ctx = Context(mgr, s)
            _node.run(ctx)
            return ctx.state

        f = jax.jit(run_node)
        out = f(state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(state)
        jax.block_until_ready(out)
        results.append({
            "node": node.name,
            "mean_ms": (time.perf_counter() - t0) / iters * 1000.0,
        })
    # full step for comparison
    f = jax.jit(graph.step)
    out = f(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(state)
    jax.block_until_ready(out)
    results.append({
        "node": "__full_step__",
        "mean_ms": (time.perf_counter() - t0) / iters * 1000.0,
    })
    return results


def trace_step(executor, out_dir: str, steps: int = 5):
    """Capture a jax.profiler trace of the compiled step (the analog of the
    reference's MADRONA_TRACING device log dump)."""
    f = jax.jit(executor.graph.step)
    s = executor.state
    out = f(s)
    jax.block_until_ready(out)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        out = f(s)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return out_dir


def aggregate_trace(trace_dir: str, top: int = 30) -> List[Dict[str, Any]]:
    """Aggregate a jax.profiler trace by op name (the analog of
    scripts/parse_device_tracing.py's per-node stats table)."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    agg = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            agg[e["name"]] += e["dur"]
    return [
        {"op": name, "total_us": dur}
        for name, dur in agg.most_common(top)
    ]


def sweep(make_fn: Callable[..., float], param_grid: Dict[str, List[Any]],
          out_json: Optional[str] = None) -> List[Dict[str, Any]]:
    """Generic config sweep (reference scripts/profile.py block-count sweep):
    make_fn(**params) returns a metric (higher = better); emits ranked JSON.
    """
    import itertools

    keys = list(param_grid)
    rows = []
    for combo in itertools.product(*(param_grid[k] for k in keys)):
        params = dict(zip(keys, combo))
        metric = make_fn(**params)
        rows.append({**params, "metric": metric})
    rows.sort(key=lambda r: -r["metric"])
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rows, f, indent=2)
    return rows
