// scnative: native runtime utilities for the TPU seamless-clone framework.
//
// TPU-native C++ equivalents of the reference's native host-side runtime
// (the device compute path is JAX/XLA/Pallas; these are the IO / host-prep
// components the reference implements in C++/CUDA host code):
//
//  - OpenCV-FileStorage YAML matrix reader/writer: the bit-exact input
//    fixture format of the reference test protocol
//    (readFromYaml, seamlessClone-CUDA/seamlessClone_imp.cu:226-237;
//     write2Yaml, seamlessClone-CUDA/seamlessClone_imp.h:49-63).
//  - BMP image writer/reader (writeBMP, seamlessClone_imp.cu:68-190).
//  - Fused mask preparation: binarize + 1-px border zero + bounding box in
//    one pass (replaces the reference's device-side setMaskBoundaryToConstant
//    + calBoundingBox + host sync, seamlessClone_imp.cpp:967-1012 — on the
//    TPU build the bbox must be host-side because it decides static shapes).
//
// Exposed as a CPython extension (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <stdexcept>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// YAML (OpenCV FileStorage dialect) matrix IO
// ---------------------------------------------------------------------------

struct YamlMat {
  std::string name;
  int rows = 0, cols = 0, channels = 1;
  char dt = 'u';  // u = uint8, f = float32, i = int32, d = float64, s = int16
  std::vector<uint8_t> data;
};

int elem_size(char dt) {
  switch (dt) {
    case 'u': return 1;
    case 's': return 2;
    case 'i': return 4;
    case 'f': return 4;
    case 'd': return 8;
    default: return 0;
  }
}

// Find "key:" at the start of a line (after indentation), return ptr past it.
const char* find_key(const char* p, const char* end, const char* key) {
  size_t klen = strlen(key);
  const char* line = p;
  while (line < end) {
    const char* s = line;
    while (s < end && (*s == ' ' || *s == '\t')) s++;
    if (s + klen + 1 <= end && memcmp(s, key, klen) == 0 && s[klen] == ':')
      return s + klen + 1;
    while (line < end && *line != '\n') line++;
    line++;
  }
  return nullptr;
}

bool parse_yaml_mat(const char* buf, size_t len, YamlMat* out, std::string* err) {
  const char* end = buf + len;
  const char* p;

  if ((p = find_key(buf, end, "mat_name")) != nullptr) {
    while (p < end && (*p == ' ' || *p == '"')) p++;
    const char* q = p;
    while (q < end && *q != '\n' && *q != '"' && *q != '\r') q++;
    out->name.assign(p, q - p);
  }
  if ((p = find_key(buf, end, "rows")) == nullptr) { *err = "missing rows:"; return false; }
  out->rows = (int)strtol(p, nullptr, 10);
  if ((p = find_key(buf, end, "cols")) == nullptr) { *err = "missing cols:"; return false; }
  out->cols = (int)strtol(p, nullptr, 10);
  if ((p = find_key(buf, end, "dt")) == nullptr) { *err = "missing dt:"; return false; }
  while (p < end && (*p == ' ' || *p == '"')) p++;
  if (p < end && *p >= '1' && *p <= '9') {
    out->channels = (int)strtol(p, const_cast<char**>(&p), 10);
  } else {
    out->channels = 1;
  }
  if (p >= end) { *err = "bad dt:"; return false; }
  out->dt = *p;
  if (elem_size(out->dt) == 0) { *err = std::string("unsupported dt: ") + out->dt; return false; }

  if (out->rows <= 0 || out->cols <= 0 || out->channels <= 0 ||
      (int64_t)out->rows * out->cols * out->channels > (int64_t)1 << 33) {
    *err = "bad matrix dimensions";
    return false;
  }
  if ((p = find_key(buf, end, "data")) == nullptr) { *err = "missing data:"; return false; }
  while (p < end && *p != '[') p++;
  if (p >= end) { *err = "missing data ["; return false; }
  p++;

  size_t n = (size_t)out->rows * out->cols * out->channels;
  int esz = elem_size(out->dt);
  out->data.resize(n * esz);
  uint8_t* d8 = out->data.data();

  for (size_t i = 0; i < n; i++) {
    while (p < end && (*p == ' ' || *p == ',' || *p == '\n' || *p == '\r' || *p == '\t')) p++;
    if (p >= end || *p == ']') { *err = "data too short"; return false; }
    char* next = nullptr;
    switch (out->dt) {
      case 'u': d8[i] = (uint8_t)strtol(p, &next, 10); break;
      case 's': reinterpret_cast<int16_t*>(d8)[i] = (int16_t)strtol(p, &next, 10); break;
      case 'i': reinterpret_cast<int32_t*>(d8)[i] = (int32_t)strtol(p, &next, 10); break;
      case 'f': reinterpret_cast<float*>(d8)[i] = strtof(p, &next); break;
      case 'd': reinterpret_cast<double*>(d8)[i] = strtod(p, &next); break;
    }
    p = next;
  }
  return true;
}

PyObject* py_read_yaml_mat(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) { PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path); return nullptr; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf((size_t)sz);
  if (fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    PyErr_Format(PyExc_IOError, "short read on %s", path);
    return nullptr;
  }
  fclose(f);

  YamlMat m;
  std::string err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  try {
    ok = parse_yaml_mat(buf.data(), buf.size(), &m, &err);
  } catch (const std::exception& e) {
    ok = false;
    err = e.what();
  }
  Py_END_ALLOW_THREADS
  if (!ok) { PyErr_Format(PyExc_ValueError, "%s: %s", path, err.c_str()); return nullptr; }

  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(m.data.data()), (Py_ssize_t)m.data.size());
  if (!bytes) return nullptr;
  PyObject* ret = Py_BuildValue("{s:s,s:i,s:i,s:i,s:C,s:N}",
                                "name", m.name.c_str(), "rows", m.rows, "cols", m.cols,
                                "channels", m.channels, "dt", (int)m.dt, "data", bytes);
  return ret;
}

PyObject* py_write_yaml_mat(PyObject*, PyObject* args) {
  const char* path;
  const char* name;
  int rows, cols, channels;
  int dt_i;
  Py_buffer data;
  if (!PyArg_ParseTuple(args, "ssiiiCy*", &path, &name, &rows, &cols, &channels, &dt_i, &data))
    return nullptr;
  char dt = (char)dt_i;
  int esz = elem_size(dt);
  size_t n = (size_t)rows * cols * channels;
  if (esz == 0 || data.len != (Py_ssize_t)(n * esz)) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "bad dt or data size");
    return nullptr;
  }
  FILE* f = fopen(path, "wb");
  if (!f) { PyBuffer_Release(&data); PyErr_Format(PyExc_IOError, "cannot open %s", path); return nullptr; }

  int rc = 0;
  Py_BEGIN_ALLOW_THREADS
  // Header formatting matches OpenCV FileStorage YAML (the reference fixture
  // files, e.g. seamlessClone-CUDA/images/src.yml).
  fprintf(f, "%%YAML:1.0\n---\nmat_name: %s\ndata: !!opencv-matrix\n", name);
  fprintf(f, "   rows: %d\n   cols: %d\n", rows, cols);
  if (channels > 1) fprintf(f, "   dt: \"%d%c\"\n", channels, dt);
  else fprintf(f, "   dt: %c\n", dt);
  fprintf(f, "   data: [ ");
  const uint8_t* d8 = reinterpret_cast<const uint8_t*>(data.buf);
  int col = 0;
  for (size_t i = 0; i < n && rc == 0; i++) {
    char tok[64];
    int tl = 0;
    switch (dt) {
      case 'u': tl = snprintf(tok, sizeof tok, "%u", (unsigned)d8[i]); break;
      case 's': tl = snprintf(tok, sizeof tok, "%d", (int)reinterpret_cast<const int16_t*>(d8)[i]); break;
      case 'i': tl = snprintf(tok, sizeof tok, "%d", reinterpret_cast<const int32_t*>(d8)[i]); break;
      case 'f': tl = snprintf(tok, sizeof tok, "%.9g", reinterpret_cast<const float*>(d8)[i]); break;
      case 'd': tl = snprintf(tok, sizeof tok, "%.17g", reinterpret_cast<const double*>(d8)[i]); break;
    }
    if (i + 1 < n) { tok[tl++] = ','; tok[tl] = 0; }
    if (col + tl + 1 > 68) { fputs("\n       ", f); col = 7; }
    else if (i) { fputc(' ', f); col++; }
    if (fputs(tok, f) == EOF) rc = -1;
    col += tl;
  }
  fputs(" ]\n", f);
  if (fclose(f) != 0) rc = -1;
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&data);
  if (rc != 0) { PyErr_Format(PyExc_IOError, "write failed: %s", path); return nullptr; }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// BMP IO (24-bit uncompressed; the reference's output artifact format)
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct BmpHeader {
  uint16_t magic;      // 'BM'
  uint32_t file_size;
  uint32_t reserved;
  uint32_t data_offset;
  uint32_t info_size;  // 40
  int32_t width;
  int32_t height;      // positive = bottom-up
  uint16_t planes;
  uint16_t bpp;
  uint32_t compression;
  uint32_t image_size;
  int32_t ppm_x, ppm_y;
  uint32_t colors_used, colors_important;
};
#pragma pack(pop)

PyObject* py_write_bmp(PyObject*, PyObject* args) {
  // write_bmp(path, height, width, channels, data) — data is interleaved BGR
  // (or single-channel) row-major top-down, as cv2.imread produces.
  const char* path;
  int h, w, c;
  Py_buffer data;
  if (!PyArg_ParseTuple(args, "siiiy*", &path, &h, &w, &c, &data)) return nullptr;
  if ((c != 1 && c != 3) || data.len != (Py_ssize_t)h * w * c) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "channels must be 1 or 3 and data h*w*c bytes");
    return nullptr;
  }
  size_t row_bytes = ((size_t)w * 3 + 3) & ~size_t(3);
  BmpHeader hdr = {};
  hdr.magic = 0x4D42;
  hdr.data_offset = sizeof(BmpHeader);
  hdr.info_size = 40;
  hdr.width = w;
  hdr.height = h;
  hdr.planes = 1;
  hdr.bpp = 24;
  hdr.image_size = (uint32_t)(row_bytes * h);
  hdr.file_size = hdr.data_offset + hdr.image_size;
  hdr.ppm_x = hdr.ppm_y = 2835;

  FILE* f = fopen(path, "wb");
  if (!f) { PyBuffer_Release(&data); PyErr_Format(PyExc_IOError, "cannot open %s", path); return nullptr; }
  int rc = 0;
  Py_BEGIN_ALLOW_THREADS
  fwrite(&hdr, sizeof hdr, 1, f);
  const uint8_t* src = reinterpret_cast<const uint8_t*>(data.buf);
  std::vector<uint8_t> row(row_bytes, 0);
  for (int y = h - 1; y >= 0 && rc == 0; y--) {  // bottom-up
    const uint8_t* s = src + (size_t)y * w * c;
    if (c == 3) {
      memcpy(row.data(), s, (size_t)w * 3);
    } else {
      for (int x = 0; x < w; x++) row[3 * x] = row[3 * x + 1] = row[3 * x + 2] = s[x];
    }
    if (fwrite(row.data(), 1, row_bytes, f) != row_bytes) rc = -1;
  }
  if (fclose(f) != 0) rc = -1;
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  if (rc != 0) { PyErr_Format(PyExc_IOError, "write failed: %s", path); return nullptr; }
  Py_RETURN_NONE;
}

PyObject* py_read_bmp(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) { PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path); return nullptr; }
  BmpHeader hdr;
  if (fread(&hdr, sizeof hdr, 1, f) != 1 || hdr.magic != 0x4D42 || hdr.bpp != 24 ||
      hdr.compression != 0) {
    fclose(f);
    PyErr_SetString(PyExc_ValueError, "not an uncompressed 24-bit BMP");
    return nullptr;
  }
  int w = hdr.width;
  int h = hdr.height < 0 ? -hdr.height : hdr.height;
  bool bottom_up = hdr.height > 0;
  size_t row_bytes = ((size_t)w * 3 + 3) & ~size_t(3);
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)h * w * 3);
  if (!bytes) { fclose(f); return nullptr; }
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(bytes));
  int rc = 0;
  Py_BEGIN_ALLOW_THREADS
  fseek(f, (long)hdr.data_offset, SEEK_SET);
  std::vector<uint8_t> row(row_bytes);
  for (int i = 0; i < h && rc == 0; i++) {
    if (fread(row.data(), 1, row_bytes, f) != row_bytes) { rc = -1; break; }
    int y = bottom_up ? h - 1 - i : i;
    memcpy(dst + (size_t)y * w * 3, row.data(), (size_t)w * 3);
  }
  fclose(f);
  Py_END_ALLOW_THREADS
  if (rc != 0) { Py_DECREF(bytes); PyErr_Format(PyExc_IOError, "short read: %s", path); return nullptr; }
  return Py_BuildValue("(iiN)", h, w, bytes);
}

// ---------------------------------------------------------------------------
// Fused mask preparation: binarize + border-zero + bbox in one pass
// ---------------------------------------------------------------------------

PyObject* py_prep_mask(PyObject*, PyObject* args) {
  // prep_mask(mask_bytes, h, w) -> (prepared_bytes, x0, y0, bw, bh)
  // Matches core/reference.py zero_mask_border + binarize + bounding box
  // (reference kernels seamlessClone_imp.cpp:967-976, 927-963) without the
  // intermediate index arrays numpy needs.
  Py_buffer data;
  int h, w;
  if (!PyArg_ParseTuple(args, "y*ii", &data, &h, &w)) return nullptr;
  if (data.len != (Py_ssize_t)h * w) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "mask must be h*w bytes");
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)h * w);
  if (!bytes) { PyBuffer_Release(&data); return nullptr; }
  uint8_t* out = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(bytes));
  const uint8_t* in = reinterpret_cast<const uint8_t*>(data.buf);
  int x0 = w, x1 = -1, y0 = h, y1 = -1;
  Py_BEGIN_ALLOW_THREADS
  memset(out, 0, (size_t)w);                    // top frame
  memset(out + (size_t)(h - 1) * w, 0, (size_t)w);  // bottom frame
  for (int y = 1; y < h - 1; y++) {
    const uint8_t* row = in + (size_t)y * w;
    uint8_t* orow = out + (size_t)y * w;
    orow[0] = 0;
    orow[w - 1] = 0;
    int first = -1, last = -1;
    for (int x = 1; x < w - 1; x++) {
      if (row[x]) {
        orow[x] = 255;
        if (first < 0) first = x;
        last = x;
      } else {
        orow[x] = 0;
      }
    }
    if (first >= 0) {
      if (first < x0) x0 = first;
      if (last > x1) x1 = last;
      if (y < y0) y0 = y;
      y1 = y;
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  if (x1 < 0) return Py_BuildValue("(Niiii)", bytes, 0, 0, 0, 0);
  return Py_BuildValue("(Niiii)", bytes, x0, y0, x1 - x0 + 1, y1 - y0 + 1);
}

PyMethodDef methods[] = {
    {"read_yaml_mat", py_read_yaml_mat, METH_VARARGS,
     "read_yaml_mat(path) -> {name, rows, cols, channels, dt, data}"},
    {"write_yaml_mat", py_write_yaml_mat, METH_VARARGS,
     "write_yaml_mat(path, name, rows, cols, channels, dt, data)"},
    {"write_bmp", py_write_bmp, METH_VARARGS, "write_bmp(path, h, w, c, data)"},
    {"read_bmp", py_read_bmp, METH_VARARGS, "read_bmp(path) -> (h, w, data)"},
    {"prep_mask", py_prep_mask, METH_VARARGS,
     "prep_mask(mask, h, w) -> (prepared, x0, y0, bw, bh)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "scnative",
                      "Native runtime utilities (YAML/BMP IO, mask prep)", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_scnative(void) { return PyModule_Create(&module); }
