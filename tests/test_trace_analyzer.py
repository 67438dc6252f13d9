"""Host-trace analyzer: native C++ aggregation vs Python fallback.

The reference ships trace tooling as native code next to its binary host
logs (src/common/tracing.cpp + parse scripts); here
_native.analyze_trace aggregates utils/tracing.py's (u32 event, u64 ns)
records with the GIL released, and utils.tracing.analyze falls back to
pure Python when the extension is absent.
"""

import struct

import pytest

from gpu_ecs_madrona_tpu.utils import tracing


def write_trace(path, records):
    with open(path, "wb") as f:
        for ev, ts in records:
            f.write(struct.pack("<IQ", ev, ts))


def sample_records():
    # 3 steps (10us, 20us, 30us), 1 render (5us), 1 unpaired start
    recs = []
    t = 1000
    for dur in (10_000, 20_000, 30_000):
        recs.append((tracing.HostEvent.STEP_START, t))
        recs.append((tracing.HostEvent.STEP_END, t + dur))
        t += dur + 1_000
    recs.append((tracing.HostEvent.RENDER_START, t))
    recs.append((tracing.HostEvent.RENDER_END, t + 5_000))
    recs.append((tracing.HostEvent.INIT_START, t + 10_000))
    return sorted(recs, key=lambda r: r[1])


def check(out):
    assert out["event_counts"][int(tracing.HostEvent.STEP_START)] == 3
    st = out["spans"]["step"]
    assert st["count"] == 3
    assert st["min_ns"] == 10_000 and st["max_ns"] == 30_000
    assert st["mean_ns"] == 20_000 and st["total_ns"] == 60_000
    assert st["p50_ns"] == 20_000
    assert out["spans"]["render"]["count"] == 1
    assert "init" not in out["spans"]       # unpaired start -> no span


def test_analyze_native(tmp_path):
    _native = pytest.importorskip("gpu_ecs_madrona_tpu._native")
    if not hasattr(_native, "analyze_trace"):
        pytest.skip("extension built without analyze_trace")
    p = tmp_path / "t.bin"
    write_trace(p, sample_records())
    check(tracing.analyze(str(p)))


def test_analyze_fallback_matches(tmp_path, monkeypatch):
    p = tmp_path / "t.bin"
    write_trace(p, sample_records())
    native_out = None
    try:
        from gpu_ecs_madrona_tpu import _native
        if hasattr(_native, "analyze_trace"):
            native_out = tracing.analyze(str(p))
            monkeypatch.delattr(_native, "analyze_trace")
    except ImportError:
        pass
    fallback_out = tracing.analyze(str(p))
    check(fallback_out)
    if native_out is not None:
        assert fallback_out == native_out


def test_roundtrip_with_logger(tmp_path, monkeypatch):
    """log() -> dump() -> analyze() end-to-end (env-gated logger)."""
    monkeypatch.setattr(tracing, "_ENABLED", True)
    monkeypatch.setattr(tracing, "_all_logs", [])
    tracing._local.events = None
    tracing.log(tracing.HostEvent.STEP_START)
    tracing.log(tracing.HostEvent.STEP_END)
    path = tracing.dump(str(tmp_path / "rt.bin"))
    out = tracing.analyze(path)
    assert out["spans"]["step"]["count"] == 1
