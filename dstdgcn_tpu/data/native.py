"""Native (C++) data-loading acceleration, with pure-numpy fallback.

The reference reads expmap CSVs with a Python line loop
(``dataset/utils.py:230-250``) — the slowest part of dataset construction.
Here a small C++ shared library parses the file with ``strtof`` into a
caller-owned buffer; built lazily with the system compiler on first use and
cached under ``~/.cache/dstdgcn_tpu``.  ``fast_read_csv`` returns None when
the native path is unavailable so callers can fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse a comma/newline separated float matrix.
// Returns number of values written, or -1 on error.  First call with
// out=nullptr to obtain counts.
long parse_csv(const char* path, float* out, long capacity,
               long* n_rows, long* n_cols) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return -1; }
    fclose(f);
    buf[size] = '\0';

    long rows = 0, cols = 0, count = 0, row_cols = 0;
    char* p = buf.data();
    char* end = buf.data() + size;
    while (p < end) {
        char* next;
        float v = strtof(p, &next);
        if (next == p) { ++p; continue; }
        if (out) {
            if (count >= capacity) return -1;
            out[count] = v;
        }
        ++count; ++row_cols;
        p = next;
        while (p < end && (*p == ',' || *p == ' ' || *p == '\r')) ++p;
        if (p < end && *p == '\n') {
            if (row_cols > cols) cols = row_cols;
            row_cols = 0; ++rows; ++p;
        }
    }
    if (row_cols > 0) { ++rows; if (row_cols > cols) cols = row_cols; }
    *n_rows = rows; *n_cols = cols;
    return count;
}

}  // extern "C"
"""

_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    cache = os.path.join(os.path.expanduser("~"), ".cache", "dstdgcn_tpu")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libfastcsv.so")
    if not os.path.exists(so_path):
        with tempfile.NamedTemporaryFile("w", suffix=".cpp",
                                         delete=False) as f:
            f.write(_SRC)
            src_path = f.name
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, src_path],
                check=True, capture_output=True, timeout=120)
        finally:
            os.unlink(src_path)
    lib = ctypes.CDLL(so_path)
    lib.parse_csv.restype = ctypes.c_long
    lib.parse_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib


def fast_read_csv(path: str) -> Optional[np.ndarray]:
    """Native CSV float-matrix read; None if the native lib is unavailable
    or the file is ragged."""
    lib = _get_lib()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    count = lib.parse_csv(path.encode(), None, 0, ctypes.byref(rows),
                          ctypes.byref(cols))
    if count <= 0 or rows.value * cols.value != count:
        return None
    out = np.empty(count, np.float32)
    got = lib.parse_csv(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count, ctypes.byref(rows), ctypes.byref(cols))
    if got != count:
        return None
    return out.reshape(rows.value, cols.value)
