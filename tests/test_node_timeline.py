"""Per-node device timeline (VERDICT round-2 item #4): the analog of the
reference's scripts/parse_device_tracing.py per-SM/node timeline
reconstruction, built from jax.profiler traces + the per-node named_scope
wrappers in core/taskgraph.py."""

import os

from gpu_ecs_madrona_tpu.tooling import profiler


def synthetic_events():
    """A minimal tensorboard-style trace: 2 steps, 2 nodes + an
    unattributed op."""
    evs = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
    ]
    for step, t0 in enumerate((1000.0, 2000.0)):
        evs.append({"ph": "X", "pid": 3, "tid": 2, "ts": t0, "dur": 500.0,
                    "name": "jit_step(123)"})
        evs += [
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0 + 10, "dur": 100.0,
             "name": "fusion.1",
             "args": {"tf_op": "jit(step)/node_a/add:"}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0 + 110, "dur": 50.0,
             "name": "fusion.2",
             "args": {"tf_op": "jit(step)/node_a/mul:"}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0 + 200, "dur": 200.0,
             "name": "custom-call",
             "args": {"tf_op": "jit(step)/node_b/pallas_call:"}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0 + 420, "dur": 30.0,
             "name": "copy.9", "args": {}},
        ]
        # host-side noise that must be ignored
        evs.append({"ph": "X", "pid": 701, "tid": 1, "ts": t0, "dur": 400.0,
                    "name": "PjitFunction(step)"})
    return evs


def test_node_timeline_synthetic(tmp_path):
    tl = profiler.node_timeline("unused", events=synthetic_events())
    assert len(tl["steps"]) == 2
    by_node = {r["node"]: r for r in tl["nodes"]}
    assert by_node["node_a"]["total_us"] == 300.0      # (100+50) x 2 steps
    assert by_node["node_a"]["mean_us_per_step"] == 150.0
    assert by_node["node_b"]["total_us"] == 400.0
    assert by_node["node_b"]["count"] == 2
    # contiguous same-node ops merge into one segment
    segs = tl["steps"][0]["segments"]
    assert [s["node"] for s in segs] == ["node_a", "node_b", "copy.9"]
    assert segs[0]["dur_us"] == 150.0                  # 10..160 merged
    assert segs[1]["start_us"] == 200.0

    svg = profiler.render_timeline_svg(tl, str(tmp_path / "t.svg"))
    body = open(svg).read()
    assert "node_a" in body and "node_b" in body and "<svg" in body


def test_scope_node_parsing():
    assert profiler._scope_node("jit(step)/bp_find_overlaps/top_k:") == \
        "bp_find_overlaps"
    assert profiler._scope_node(
        "jit(step)/physics_substeps_fused/jit(_run_fused)/pallas_call:") == \
        "physics_substeps_fused"
    assert profiler._scope_node("") == "<unattributed>"
