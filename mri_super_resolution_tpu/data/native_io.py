"""ctypes bindings for the native IO runtime (native/mri_io.cpp).

Provides a drop-in fast path for MATLAB v5 volume loading plus a background
prefetch pool, replacing the reference's blocking per-call scipy loads
(nn_mri.py:46-54). The shared library is compiled on first use with g++ and
cached next to the source; every entry point degrades gracefully to the
scipy-based ``data.io.load_mat`` when the toolchain or zlib is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mri_io.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libmri_io.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
             "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        stale = (not os.path.exists(_LIB)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)))
        if stale and not _build() and not os.path.exists(_LIB):
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.mri_load.argtypes = [ctypes.c_char_p]
        lib.mri_load.restype = ctypes.c_int64
        lib.mri_prefetch.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mri_prefetch.restype = ctypes.c_int64
        lib.mri_ready.argtypes = [ctypes.c_int64]
        lib.mri_ready.restype = ctypes.c_int
        lib.mri_num_arrays.argtypes = [ctypes.c_int64]
        lib.mri_num_arrays.restype = ctypes.c_int
        lib.mri_array_name.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.mri_array_name.restype = ctypes.c_int
        lib.mri_array_ndim.argtypes = [ctypes.c_int64, ctypes.c_int]
        lib.mri_array_ndim.restype = ctypes.c_int
        lib.mri_array_dims.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.mri_array_dims.restype = ctypes.c_int
        lib.mri_array_data.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.mri_array_data.restype = ctypes.c_int64
        lib.mri_release.argtypes = [ctypes.c_int64]
        if hasattr(lib, "mri_notes"):  # 0.2.0+: skip reasons for cell/struct
            lib.mri_notes.argtypes = [ctypes.c_int64, ctypes.c_char_p, ctypes.c_int]
            lib.mri_notes.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _extract(lib, handle) -> dict[str, np.ndarray]:
    n = lib.mri_num_arrays(handle)
    out = {}
    for i in range(n):
        buf = ctypes.create_string_buffer(256)
        lib.mri_array_name(handle, i, buf, 256)
        name = buf.value.decode()
        ndim = lib.mri_array_ndim(handle, i)
        dims = (ctypes.c_int64 * ndim)()
        lib.mri_array_dims(handle, i, dims)
        shape = tuple(int(d) for d in dims)
        count = int(np.prod(shape))
        data = np.empty(count, dtype=np.float64)
        got = lib.mri_array_data(
            handle, i, data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), count
        )
        if got != count:
            continue
        # MATLAB stores column-major: reshape in F order
        out[name] = data.reshape(shape, order="F")
    return out


def _assemble_cell(arrays: dict, marker: str) -> None:
    """``name#cell`` carries the cell dims; ``name#<i>`` are the cells in
    column-major order. Result: an object ndarray, indexable ``[b][te]``
    exactly like scipy's v5 load (superresHybrid.py:50-55)."""
    name = marker[: -len("#cell")]
    dims = tuple(int(d) for d in arrays.pop(marker).reshape(-1))
    cell = np.empty(dims, dtype=object)
    for i in range(cell.size):
        # cells are stored column-major; reshape(order="F") would copy
        cell[np.unravel_index(i, dims, order="F")] = \
            arrays.pop(f"{name}#{i}", None)
    arrays[name] = cell


def _assemble_struct(arrays: dict, marker: str) -> None:
    """``name#struct`` carries the struct dims; ``name.<field>#<e>`` are the
    per-element field values, element index column-major. Result: a numpy
    structured ndarray with object fields — the same access pattern as
    scipy's default struct load (``rec['field'][0, 0]``)."""
    name = marker[: -len("#struct")]
    dims = tuple(int(d) for d in arrays.pop(marker).reshape(-1))
    prefix = name + "."
    fields: list[str] = []
    for k in list(arrays):
        if k.startswith(prefix) and "#" in k[len(prefix):]:
            f = k[len(prefix):].rsplit("#", 1)[0]
            if "#" not in f and "." not in f and f not in fields:
                fields.append(f)
    if not fields:  # empty struct (no decodable fields)
        arrays[name] = np.empty(dims, dtype=object)
        return
    rec = np.empty(dims, dtype=[(f, object) for f in fields])
    n = int(np.prod(dims))
    for e in range(n):
        idx = np.unravel_index(e, dims, order="F")
        for f in fields:
            rec[f][idx] = arrays.pop(f"{prefix}{f}#{e}", None)
    arrays[name] = rec


def _reassemble_cells(arrays: dict) -> dict:
    """Rebuild MATLAB container types from the native reader's flat
    encoding: char arrays (``name#char`` code points -> str), then cell and
    struct markers deepest-first — an inner container ("x#0#cell",
    "x.f#0#struct") must be assembled into its entry before the outer
    marker pops it, or nested containers come back None."""
    for k in [k for k in arrays if k.endswith("#char")]:
        name = k[: -len("#char")]
        codes = arrays.pop(k)
        if codes.ndim == 2 and codes.shape[0] <= 1:
            # row vector: the MATLAB string case (scipy returns str arrays)
            arrays[name] = "".join(chr(int(c)) for c in codes.reshape(-1))
        else:
            arrays[name] = codes  # char grid: keep the code-point array
    markers = sorted(
        (k for k in arrays if k.endswith("#cell") or k.endswith("#struct")),
        key=lambda k: k.count("#"), reverse=True)
    for marker in markers:
        if marker.endswith("#cell"):
            _assemble_cell(arrays, marker)
        else:
            _assemble_struct(arrays, marker)
    return arrays


def _notes(lib, handle) -> str:
    if not hasattr(lib, "mri_notes"):
        return ""
    buf = ctypes.create_string_buffer(4096)
    lib.mri_notes(handle, buf, 4096)
    return buf.value.decode(errors="replace")


def load_mat_native(path: str, key: str | None = None):
    """Native v5 load; raises RuntimeError if the library can't parse it
    (caller falls back to scipy). Cell arrays of numeric arrays come back as
    object ndarrays; unsupported variables raise with the reader's precise
    skip note instead of a bare KeyError."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    handle = lib.mri_load(path.encode())
    if handle == 0:
        raise RuntimeError(f"native loader failed for {path}")
    try:
        arrays = _reassemble_cells(_extract(lib, handle))
        notes = _notes(lib, handle)
    finally:
        lib.mri_release(handle)
    if key is not None:
        if key not in arrays:
            hint = f" (native reader notes: {notes})" if notes else ""
            raise RuntimeError(f"{path}: variable {key!r} not decoded{hint}")
        return arrays[key]
    return arrays


class Prefetcher:
    """Background volume prefetch: submit paths, collect decoded dicts.

    Usage::

        pf = Prefetcher(num_threads=4)
        handles = [pf.submit(p) for p in paths]
        for h in handles:
            arrays = pf.get(h)   # blocks until that volume is decoded
    """

    def __init__(self, num_threads: int = 4):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native IO unavailable")
        self.num_threads = num_threads

    def submit(self, path: str) -> int:
        return int(self.lib.mri_prefetch(path.encode(), self.num_threads))

    def ready(self, handle: int) -> bool:
        return self.lib.mri_ready(handle) == 1

    def get(self, handle: int, timeout: float = 60.0) -> dict[str, np.ndarray]:
        import time

        t0 = time.monotonic()
        try:
            while True:
                state = self.lib.mri_ready(handle)
                if state == 1:
                    break
                if state < 0:
                    raise RuntimeError(f"prefetch failed (state {state})")
                if time.monotonic() - t0 > timeout:
                    raise TimeoutError("prefetch timed out")
                time.sleep(0.002)
            return _reassemble_cells(_extract(self.lib, handle))
        finally:
            # release on EVERY exit: a timed-out handle would otherwise pin
            # the decoded volume (hundreds of MB) for the process lifetime
            self.lib.mri_release(handle)
