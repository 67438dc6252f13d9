// Native host-trace analyzer (gpu_ecs_madrona_tpu._native.analyze_trace).
//
// Counterpart of the reference's trace-parsing scripts over
// src/common/tracing.cpp's binary event logs — here the log format is
// utils/tracing.py's little-endian (u32 event, u64 perf_counter_ns)
// records.  Parsing + span aggregation run with the GIL released, so
// multi-GB traces from long runs do not stall the host loop.
//
// Returns {event_counts: {event: n},
//          spans: {name: {count, total_ns, mean_ns, min_ns, max_ns,
//                         p50_ns, p95_ns}}}
// for the paired events (STEP_START/STEP_END, RENDER_*, INIT_*).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Record {
    uint32_t event;
    uint64_t ts;
};

struct SpanStats {
    std::vector<uint64_t> durs;
};

// Matches utils/tracing.py HostEvent (reference tracing.hpp:11-20).
constexpr uint32_t kStepStart = 0, kStepEnd = 1;
constexpr uint32_t kRenderStart = 2, kRenderEnd = 3;
constexpr uint32_t kInitStart = 6, kInitEnd = 7;

struct PairDef {
    uint32_t start, end;
    const char *name;
};
constexpr PairDef kPairs[] = {
    {kStepStart, kStepEnd, "step"},
    {kRenderStart, kRenderEnd, "render"},
    {kInitStart, kInitEnd, "init"},
};

uint64_t percentile(std::vector<uint64_t> &sorted, double p) {
    if (sorted.empty()) return 0;
    double idx = p * (double)(sorted.size() - 1);
    size_t lo = (size_t)idx;
    size_t hi = std::min(lo + 1, sorted.size() - 1);
    double frac = idx - (double)lo;
    return (uint64_t)((1.0 - frac) * (double)sorted[lo] +
                      frac * (double)sorted[hi]);
}

}  // namespace

PyObject *gem_analyze_trace(PyObject *, PyObject *args) {
    const char *buf;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "y#", &buf, &len)) return nullptr;

    std::map<uint32_t, uint64_t> counts;
    std::map<std::string, SpanStats> spans;

    Py_BEGIN_ALLOW_THREADS;
    size_t n = (size_t)len / 12;
    std::vector<Record> recs;
    recs.reserve(n);
    for (size_t i = 0; i < n; i++) {
        Record r;
        std::memcpy(&r.event, buf + i * 12, 4);
        std::memcpy(&r.ts, buf + i * 12 + 4, 8);
        recs.push_back(r);
        counts[r.event]++;
    }
    // records are sorted by timestamp at dump time; pair first-in-first-out
    for (const auto &pd : kPairs) {
        // head index instead of erase(begin()): each pop is O(1) even when
        // many unpaired starts accumulate (multi-GB traces)
        std::vector<uint64_t> open;
        size_t head = 0;
        SpanStats st;
        for (const auto &r : recs) {
            if (r.event == pd.start) {
                open.push_back(r.ts);
            } else if (r.event == pd.end && head < open.size()) {
                uint64_t t0 = open[head++];
                if (r.ts >= t0) st.durs.push_back(r.ts - t0);
            }
        }
        if (!st.durs.empty()) spans[pd.name] = std::move(st);
    }
    Py_END_ALLOW_THREADS;

    PyObject *ev = PyDict_New();
    for (auto &kv : counts) {
        PyObject *k = PyLong_FromUnsignedLong(kv.first);
        PyObject *v = PyLong_FromUnsignedLongLong(kv.second);
        PyDict_SetItem(ev, k, v);
        Py_DECREF(k);
        Py_DECREF(v);
    }
    PyObject *sp = PyDict_New();
    for (auto &kv : spans) {
        auto &durs = kv.second.durs;
        std::sort(durs.begin(), durs.end());
        uint64_t total = 0;
        for (uint64_t d : durs) total += d;
        PyObject *d = Py_BuildValue(
            "{s:n,s:K,s:K,s:K,s:K,s:K,s:K}",
            "count", (Py_ssize_t)durs.size(),
            "total_ns", (unsigned long long)total,
            "mean_ns", (unsigned long long)(total / durs.size()),
            "min_ns", (unsigned long long)durs.front(),
            "max_ns", (unsigned long long)durs.back(),
            "p50_ns", (unsigned long long)percentile(durs, 0.5),
            "p95_ns", (unsigned long long)percentile(durs, 0.95));
        PyDict_SetItemString(sp, kv.first.c_str(), d);
        Py_DECREF(d);
    }
    PyObject *out = Py_BuildValue("{s:O,s:O}", "event_counts", ev,
                                  "spans", sp);
    Py_DECREF(ev);
    Py_DECREF(sp);
    return out;
}

// registered in importer.cpp's method table
