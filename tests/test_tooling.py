"""Tooling tests: checkpoint/resume, host tracing, per-node profiling,
queries — the aux subsystems SURVEY.md §5 lists."""

import os

import numpy as np
import pytest

from gpu_ecs_madrona_tpu.models import collisions as col


def make_sim(**kw):
    d = dict(num_worlds=2, num_objects=8, max_pairs=64, seed=6)
    d.update(kw)
    return col.make_executor(col.CollisionsConfig(**d))


def test_checkpoint_resume_exact(tmp_path):
    """Checkpoint -> run -> restore -> run must replay bit-exactly (the
    determinism guarantee the reference lacks, SURVEY.md §5.4)."""
    sim = make_sim()
    sim.run(5)
    path = str(tmp_path / "ckpt.npz")
    sim.save_checkpoint(path)
    sim.run(10)
    p1, _ = sim.get_exported(0)
    p1 = np.asarray(p1).copy()

    sim2 = make_sim()
    sim2.restore_checkpoint(path)
    sim2.run(10)
    p2, _ = sim2.get_exported(0)
    np.testing.assert_array_equal(p1, np.asarray(p2))


def test_profile_nodes():
    from gpu_ecs_madrona_tpu.tooling.profiler import profile_nodes

    sim = make_sim()
    rows = profile_nodes(sim, iters=2)
    names = [r["node"] for r in rows]
    assert "broadphase" in names
    assert "__full_step__" in names
    assert all(r["mean_ms"] >= 0 for r in rows)


def test_host_tracing(tmp_path, monkeypatch):
    from gpu_ecs_madrona_tpu.utils import tracing

    monkeypatch.setattr(tracing, "_ENABLED", True)
    monkeypatch.setattr(tracing, "_all_logs", [])
    tracing.log(tracing.HostEvent.STEP_START)
    tracing.log(tracing.HostEvent.STEP_END)
    path = str(tmp_path / "trace.bin")
    tracing.dump(path)
    events = tracing.parse(path)
    assert [e for e, _ in events] == [0, 1]
    assert events[0][1] <= events[1][1]


def test_query_api():
    sim = make_sim()
    mgr = sim.mgr
    q = mgr.query(col.Translation)
    assert [i.archetype.name for i in q] == ["CubeObject"]
    for arch, cols, mask in mgr.query_columns(sim.state, q, [col.Translation]):
        assert cols[0].shape[0] == 2
        assert mask.any()


def test_sweep_harness(tmp_path):
    from gpu_ecs_madrona_tpu.tooling.profiler import sweep

    rows = sweep(lambda a, b: a * 10 + b, {"a": [1, 2], "b": [3, 4]},
                 out_json=str(tmp_path / "sweep.json"))
    assert rows[0] == {"a": 2, "b": 4, "metric": 24}
    assert (tmp_path / "sweep.json").exists()
