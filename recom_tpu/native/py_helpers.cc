// CPython-API host helpers (loaded with ctypes.PyDLL — the GIL is HELD).
//
// The one hot function: extract raw buffer pointers from a Python list of
// numpy arrays.  At 1000 columns per request, the pure-Python alternative
// (`a.ctypes.data` per array) costs ~1ms/request of ctypes object churn;
// PyObject_GetBuffer does the same job at ~100ns/item with format/size
// validation for free.  Kept in its own .so so a Python.h build failure
// degrades only this helper, not the whole native library.

#include <Python.h>

#include <cstdint>

extern "C" {

// Fill out[i] with the buffer pointer of list[i] for i in [0, n).
//  mode 0: any C-contiguous buffer
//  mode 1: float32 (itemsize 4, format 'f')
//  mode 2: int64   (itemsize 8, format 'l'/'q')
// min_bytes: each buffer must hold at least this many bytes.
// Returns 0 on success; nonzero when any item fails validation or buffer
// export (callers fall back to the coercing Python path).
int64_t rt_ptrs_from_buffers(PyObject* list, int64_t n, int64_t mode,
                             int64_t min_bytes, int64_t* out) {
  if (!PyList_Check(list) || PyList_GET_SIZE(list) < n) return -1;
  for (int64_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GET_ITEM(list, i);  // borrowed
    Py_buffer view;
    if (PyObject_GetBuffer(item, &view, PyBUF_SIMPLE | PyBUF_FORMAT) != 0) {
      PyErr_Clear();
      return -(i + 2);
    }
    bool ok = view.len >= min_bytes;
    if (mode == 1)
      ok = ok && view.itemsize == 4 && view.format && view.format[0] == 'f';
    else if (mode == 2)
      ok = ok && view.itemsize == 8 && view.format &&
           (view.format[0] == 'l' || view.format[0] == 'q');
    out[i] = reinterpret_cast<int64_t>(view.buf);
    PyBuffer_Release(&view);
    if (!ok) return -(i + 2);
  }
  return 0;
}

}  // extern "C"
