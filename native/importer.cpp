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
//
// Negative (relative) OBJ indices and v/vt/vn composite indices are
// handled; faces keep their winding order.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
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

static PyMethodDef Methods[] = {
    {"parse_obj", parse_obj, METH_VARARGS,
     "Parse a Wavefront OBJ buffer -> (vertex bytes, nverts, face index "
     "bytes, face offset bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native host-side helpers (asset import)", -1, Methods,
};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moduledef); }
