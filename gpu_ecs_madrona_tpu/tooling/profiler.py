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


def _load_trace_events(trace_dir: str) -> List[Dict[str, Any]]:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f).get("traceEvents", [])


def _scope_node(tf_op: str) -> str:
    """'jit(step)/bp_find_overlaps/top_k:' -> 'bp_find_overlaps'.

    Taskgraph nodes are wrapped in jax.named_scope(node.name)
    (core/taskgraph.py), which XLA propagates into each op's tf_op
    metadata — the same per-node attribution channel the reference gets
    from its DeviceLog nodeID field (mw_gpu/tracing.hpp:24-130)."""
    for p in tf_op.rstrip(":").split("/"):
        if not p or p.startswith("jit(") or p.startswith("pjit("):
            continue
        return p
    return tf_op or "<unattributed>"


def node_timeline(trace_dir: str,
                  events: Optional[List[Dict[str, Any]]] = None
                  ) -> Dict[str, Any]:
    """Per-taskgraph-node device timeline from a trace_step() capture.

    The TPU analog of the reference's parse_device_tracing.py (~300 LoC
    reconstructing per-SM/block/node timelines from 40-byte DeviceLog
    records): steps come from the XLA Modules thread (one span per
    executed program), ops from the XLA Ops thread, and each op is
    attributed to its taskgraph node via the named_scope in tf_op.

    Returns {"steps": [{"start_us", "dur_us", "segments": [
                {"node", "start_us", "dur_us"}, ...]}],
             "nodes": [{"node", "total_us", "mean_us_per_step", "pct",
                        "count"}]} — segments are per-node contiguous
    spans within each step (ops of one node interleaved with another's
    show up as separate segments, preserving true device ordering).
    """
    evs = events if events is not None else _load_trace_events(trace_dir)
    # device pid: the process named /device:...; its tid 2 = XLA Modules,
    # tid 3 = XLA Ops (stable tensorboard profile convention)
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    mods = sorted((e for e in evs if e.get("ph") == "X"
                   and e.get("pid") in dev_pids and e.get("tid") == 2),
                  key=lambda e: e["ts"])
    ops = sorted((e for e in evs if e.get("ph") == "X"
                  and e.get("pid") in dev_pids and e.get("tid") == 3
                  and e.get("dur", 0) > 0),
                 key=lambda e: e["ts"])

    steps = []
    totals: Dict[str, List[float]] = collections.defaultdict(
        lambda: [0.0, 0])
    op_pos = 0     # both lists are ts-sorted: advance once, O(total ops)
    for mod in mods:
        t0, t1 = mod["ts"], mod["ts"] + mod["dur"]
        segments = []
        cur = None
        while op_pos < len(ops) and ops[op_pos]["ts"] < t0:
            op_pos += 1
        while op_pos < len(ops) and ops[op_pos]["ts"] < t1:
            op = ops[op_pos]
            op_pos += 1
            node = _scope_node(op.get("args", {}).get("tf_op", op["name"]))
            totals[node][0] += op["dur"]
            totals[node][1] += 1
            if cur is not None and cur["node"] == node:
                cur["dur_us"] = (op["ts"] + op["dur"] - t0) - cur["start_us"]
            else:
                cur = {"node": node, "start_us": op["ts"] - t0,
                       "dur_us": op["dur"]}
                segments.append(cur)
        steps.append({"start_us": t0, "dur_us": mod["dur"],
                      "segments": segments})

    n_steps = max(len(steps), 1)
    step_total = sum(s["dur_us"] for s in steps) or 1.0
    nodes = sorted(
        ({"node": k, "total_us": round(v[0], 1),
          "mean_us_per_step": round(v[0] / n_steps, 1),
          "pct": round(100.0 * v[0] / step_total, 1), "count": v[1]}
         for k, v in totals.items()),
        key=lambda r: -r["total_us"])
    return {"steps": steps, "nodes": nodes}


def render_timeline_svg(timeline: Dict[str, Any], path: str,
                        width: int = 1000, row_h: int = 22) -> str:
    """Render node_timeline() output as a simple SVG: one row per step,
    one colored box per node segment (the analog of the reference
    device-trace PNG render)."""
    steps = timeline["steps"]
    if not steps:
        raise ValueError("empty timeline")
    # legend: top nodes only (the tail is host noise / tiny copies)
    top_rows = timeline["nodes"][:12]
    nodes = [r["node"] for r in top_rows]
    palette = ["#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
               "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac"]
    color = {n: palette[i % len(palette)] for i, n in enumerate(nodes)}
    max_dur = max(s["dur_us"] for s in steps)
    scale = (width - 160) / max_dur
    legend_h = 16 * (min(len(nodes), 12) + 1)
    h = row_h * len(steps) + 30 + legend_h
    out = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
           f'height="{h}" font-family="monospace" font-size="11">']
    for i, s in enumerate(steps):
        y = 10 + i * row_h
        out.append(f'<text x="2" y="{y + 14}">step {i} '
                   f'{s["dur_us"] / 1000:.2f}ms</text>')
        for seg in s["segments"]:
            x = 150 + seg["start_us"] * scale
            w = max(seg["dur_us"] * scale, 0.5)
            c = color.get(seg["node"], "#999")
            out.append(f'<rect x="{x:.1f}" y="{y}" width="{w:.1f}" '
                       f'height="{row_h - 4}" fill="{c}">'
                       f'<title>{seg["node"]}: {seg["dur_us"]:.0f}us'
                       f'</title></rect>')
    y0 = 20 + row_h * len(steps)
    for i, r in enumerate(top_rows):
        y = y0 + 16 * i
        out.append(f'<rect x="150" y="{y}" width="12" height="12" '
                   f'fill="{color[r["node"]]}"/>')
        out.append(f'<text x="168" y="{y + 10}">{r["node"]} — '
                   f'{r["mean_us_per_step"] / 1000:.2f}ms/step '
                   f'({r["pct"]}%)</text>')
    out.append("</svg>")
    svg = "\n".join(out)
    with open(path, "w") as f:
        f.write(svg)
    return path


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
