// Fast Wavefront OBJ importer — native core of the asset pipeline.
//
// TPU-native counterpart of reference src/common/importer.cpp (loadOBJ,
// importer.cpp:35-409): the reference parses .obj on the host in C++
// (fast_float + meshoptimizer) before uploading hulls to the GPU; here the
// same host-side role is filled by this CPython extension, which parses
// vertex/face data in a single pass over the buffer and returns numpy-ready
// buffers to Python (gpu_ecs_madrona_tpu.utils.importer wraps it and falls
// back to a pure-Python parser when the extension is not built).
//
// Exposed functions:
//   parse_obj(data: bytes) -> (vertices: bytes (float32 x 3 per vertex),
//                              num_vertices: int,
//                              face_indices: bytes (int32),
//                              face_offsets: bytes (int32; CSR offsets))
//   parse_obj_full(data: bytes) -> full-fidelity parse: positions +
//       normals (vn) + uvs (vt) + per-corner v/vn/vt index triples +
//       face CSR + per-object face ranges + object names (o/g lines) —
//       the coverage of reference loadOBJ (importer.cpp:120-409).
//
// Negative (relative) OBJ indices and v/vt/vn composite indices are
// handled; faces keep their winding order.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline const char *skip_ws(const char *p, const char *end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

inline const char *skip_line(const char *p, const char *end) {
    while (p < end && *p != '\n') p++;
    return p < end ? p + 1 : end;
}

// minimal fast float parser (decimal + exponent), strtod fallback for
// exotic forms
inline const char *parse_float(const char *p, const char *end, float *out) {
    char *q;
    double v = strtod(p, &q);
    if (q == p || q > end) return nullptr;
    *out = (float)v;
    return q;
}

inline const char *parse_int(const char *p, const char *end, long *out) {
    char *q;
    long v = strtol(p, &q, 10);
    if (q == p || q > end) return nullptr;
    *out = v;
    return q;
}

}  // namespace

static PyObject *parse_obj(PyObject *, PyObject *args) {
    const char *data;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "y#", &data, &len)) return nullptr;

    std::vector<float> verts;
    std::vector<int32_t> face_indices;
    std::vector<int32_t> face_offsets;
    verts.reserve(1024);
    face_indices.reserve(2048);
    face_offsets.reserve(256);
    face_offsets.push_back(0);

    const char *p = data;
    const char *end = data + len;

    // release the GIL for the parse loop: large scene files parse while
    // Python threads (e.g. the async IO manager) keep running
    Py_BEGIN_ALLOW_THREADS

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            float x = 0, y = 0, z = 0;
            const char *q = parse_float(skip_ws(p, end), end, &x);
            if (q) q = parse_float(skip_ws(q, end), end, &y);
            if (q) q = parse_float(skip_ws(q, end), end, &z);
            if (q) {
                verts.push_back(x);
                verts.push_back(y);
                verts.push_back(z);
            }
            p = skip_line(p, end);
        } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            size_t start_count = face_indices.size();
            while (true) {
                p = skip_ws(p, end);
                if (p >= end || *p == '\n' || *p == '#') break;
                long idx;
                const char *q = parse_int(p, end, &idx);
                if (!q) break;
                // skip /vt/vn suffixes
                p = q;
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n' &&
                       *p != '\r')
                    p++;
                long nverts = (long)(verts.size() / 3);
                // OBJ is 1-based; negative = relative to current count
                long resolved = idx > 0 ? idx - 1 : nverts + idx;
                if (resolved >= 0 && resolved < nverts)
                    face_indices.push_back((int32_t)resolved);
            }
            if (face_indices.size() - start_count >= 3)
                face_offsets.push_back((int32_t)face_indices.size());
            else
                face_indices.resize(start_count);  // degenerate face
            p = skip_line(p, end);
        } else {
            p = skip_line(p, end);
        }
    }

    Py_END_ALLOW_THREADS

    PyObject *v_bytes = PyBytes_FromStringAndSize(
        (const char *)verts.data(), (Py_ssize_t)(verts.size() * sizeof(float)));
    PyObject *fi_bytes = PyBytes_FromStringAndSize(
        (const char *)face_indices.data(),
        (Py_ssize_t)(face_indices.size() * sizeof(int32_t)));
    PyObject *fo_bytes = PyBytes_FromStringAndSize(
        (const char *)face_offsets.data(),
        (Py_ssize_t)(face_offsets.size() * sizeof(int32_t)));
    if (!v_bytes || !fi_bytes || !fo_bytes) return nullptr;

    PyObject *result = Py_BuildValue(
        "(OnOO)", v_bytes, (Py_ssize_t)(verts.size() / 3), fi_bytes, fo_bytes);
    Py_DECREF(v_bytes);
    Py_DECREF(fi_bytes);
    Py_DECREF(fo_bytes);
    return result;
}

// ---------------------------------------------------------------------------
// Full-fidelity parse: positions + normals + uvs + per-corner index
// triples + multi-object ranges (reference loadOBJ, importer.cpp:120-409).
// ---------------------------------------------------------------------------

namespace {

struct FullParse {
    std::vector<float> v;        // positions, xyz
    std::vector<float> vn;       // normals, xyz
    std::vector<float> vt;       // uvs, uv
    std::vector<int32_t> cv;     // per-corner position index
    std::vector<int32_t> cn;     // per-corner normal index (-1 absent)
    std::vector<int32_t> ct;     // per-corner uv index (-1 absent)
    std::vector<int32_t> face_off;   // CSR over corners
    std::vector<int32_t> obj_off;    // CSR over faces (object boundaries)
    std::vector<std::string> names;  // per object
};

inline long resolve_idx(long idx, long count) {
    long r = idx > 0 ? idx - 1 : count + idx;
    return (r >= 0 && r < count) ? r : -1;
}

// strict int parse: no leading-whitespace skip (strtol would cross token
// boundaries inside v/vt/vn composites)
inline const char *parse_int_nows(const char *p, const char *end, long *out) {
    if (p >= end || !(*p == '-' || *p == '+' || (*p >= '0' && *p <= '9')))
        return nullptr;
    return parse_int(p, end, out);
}

void parse_full(const char *p, const char *end, FullParse &out) {
    out.face_off.push_back(0);
    bool open_object = false;  // faces seen since last o/g (or file start)

    auto begin_object = [&](const char *name, size_t len) {
        if (open_object) {
            out.obj_off.push_back((int32_t)(out.face_off.size() - 1));
        }
        out.names.emplace_back(name, len);
        if (out.obj_off.empty()) out.obj_off.push_back(0);
        open_object = true;
    };

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        if (p[0] == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            float x = 0, y = 0, z = 0;
            const char *q = parse_float(skip_ws(p, end), end, &x);
            if (q) q = parse_float(skip_ws(q, end), end, &y);
            if (q) q = parse_float(skip_ws(q, end), end, &z);
            if (q) { out.v.push_back(x); out.v.push_back(y); out.v.push_back(z); }
            p = skip_line(p, end);
        } else if (p[0] == 'v' && p + 1 < end && p[1] == 'n' && p + 2 < end &&
                   (p[2] == ' ' || p[2] == '\t')) {
            p += 3;
            float x = 0, y = 0, z = 0;
            const char *q = parse_float(skip_ws(p, end), end, &x);
            if (q) q = parse_float(skip_ws(q, end), end, &y);
            if (q) q = parse_float(skip_ws(q, end), end, &z);
            if (q) { out.vn.push_back(x); out.vn.push_back(y); out.vn.push_back(z); }
            p = skip_line(p, end);
        } else if (p[0] == 'v' && p + 1 < end && p[1] == 't' && p + 2 < end &&
                   (p[2] == ' ' || p[2] == '\t')) {
            p += 3;
            float u = 0, w = 0;
            const char *q = parse_float(skip_ws(p, end), end, &u);
            if (q) parse_float(skip_ws(q, end), end, &w);  // w optional
            if (q) { out.vt.push_back(u); out.vt.push_back(w); }
            p = skip_line(p, end);
        } else if ((p[0] == 'o' || p[0] == 'g') && p + 1 < end &&
                   (p[1] == ' ' || p[1] == '\t')) {
            const char *q = skip_ws(p + 2, end);
            const char *e = q;
            while (e < end && *e != '\n' && *e != '\r') e++;
            begin_object(q, (size_t)(e - q));
            p = skip_line(p, end);
        } else if (p[0] == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            if (!open_object) begin_object("", 0);
            p += 2;
            size_t start_count = out.cv.size();
            long nv = (long)(out.v.size() / 3);
            long nn = (long)(out.vn.size() / 3);
            long nt = (long)(out.vt.size() / 2);
            while (true) {
                p = skip_ws(p, end);
                if (p >= end || *p == '\n' || *p == '#') break;
                long iv;
                const char *q = parse_int(p, end, &iv);
                if (!q) break;
                long it = 0, in = 0;
                bool has_t = false, has_n = false;
                p = q;
                if (p < end && *p == '/') {
                    p++;
                    q = parse_int_nows(p, end, &it);
                    if (q) { has_t = true; p = q; }
                    if (p < end && *p == '/') {
                        p++;
                        q = parse_int_nows(p, end, &in);
                        if (q) { has_n = true; p = q; }
                    }
                }
                long rv = resolve_idx(iv, nv);
                if (rv >= 0) {
                    out.cv.push_back((int32_t)rv);
                    out.ct.push_back(has_t ? (int32_t)resolve_idx(it, nt) : -1);
                    out.cn.push_back(has_n ? (int32_t)resolve_idx(in, nn) : -1);
                }
            }
            if (out.cv.size() - start_count >= 3) {
                out.face_off.push_back((int32_t)out.cv.size());
            } else {
                out.cv.resize(start_count);
                out.cn.resize(start_count);
                out.ct.resize(start_count);
            }
            p = skip_line(p, end);
        } else {
            p = skip_line(p, end);
        }
    }
    if (open_object || !out.names.empty()) {
        out.obj_off.push_back((int32_t)(out.face_off.size() - 1));
    } else if (out.face_off.size() > 1) {
        out.obj_off.push_back(0);
        out.obj_off.push_back((int32_t)(out.face_off.size() - 1));
        out.names.emplace_back("");
    } else {
        out.obj_off.push_back(0);
    }
}

PyObject *bytes_of(const void *data, size_t n) {
    return PyBytes_FromStringAndSize((const char *)data, (Py_ssize_t)n);
}

}  // namespace

static PyObject *parse_obj_full_py(PyObject *, PyObject *args) {
    const char *data;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "y#", &data, &len)) return nullptr;

    FullParse fp;
    Py_BEGIN_ALLOW_THREADS
    parse_full(data, data + len, fp);
    Py_END_ALLOW_THREADS

    PyObject *names = PyList_New((Py_ssize_t)fp.names.size());
    if (!names) return nullptr;
    for (size_t i = 0; i < fp.names.size(); i++) {
        PyList_SET_ITEM(names, (Py_ssize_t)i,
                        PyUnicode_FromStringAndSize(fp.names[i].data(),
                                                    (Py_ssize_t)fp.names[i].size()));
    }
    PyObject *result = Py_BuildValue(
        "(NnNnNnNNNNNO)",
        bytes_of(fp.v.data(), fp.v.size() * sizeof(float)),
        (Py_ssize_t)(fp.v.size() / 3),
        bytes_of(fp.vn.data(), fp.vn.size() * sizeof(float)),
        (Py_ssize_t)(fp.vn.size() / 3),
        bytes_of(fp.vt.data(), fp.vt.size() * sizeof(float)),
        (Py_ssize_t)(fp.vt.size() / 2),
        bytes_of(fp.cv.data(), fp.cv.size() * sizeof(int32_t)),
        bytes_of(fp.cn.data(), fp.cn.size() * sizeof(int32_t)),
        bytes_of(fp.ct.data(), fp.ct.size() * sizeof(int32_t)),
        bytes_of(fp.face_off.data(), fp.face_off.size() * sizeof(int32_t)),
        bytes_of(fp.obj_off.data(), fp.obj_off.size() * sizeof(int32_t)),
        names);
    Py_DECREF(names);
    return result;
}

PyObject *gem_analyze_trace(PyObject *, PyObject *args);  // native/trace.cpp

static PyMethodDef Methods[] = {
    {"parse_obj", parse_obj, METH_VARARGS,
     "Parse a Wavefront OBJ buffer -> (vertex bytes, nverts, face index "
     "bytes, face offset bytes)"},
    {"parse_obj_full", parse_obj_full_py, METH_VARARGS,
     "Full parse -> (v, nv, vn, nvn, vt, nvt, corner_v, corner_vn, "
     "corner_vt, face_offsets, obj_offsets, names)"},
    {"analyze_trace", gem_analyze_trace, METH_VARARGS,
     "Aggregate a host-trace byte buffer -> {event_counts, spans}"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native host-side helpers (asset import)", -1, Methods,
};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moduledef); }
