"""ctypes bindings for the native C++ schedule builder (csrc/scheduler.cpp).

The shared library is built lazily with g++ on first use (and cached next to
this module); any failure falls back silently to the NumPy builder. The two
implementations are differential-tested against each other
(tests/test_native_scheduler.py) — the same fallback-as-oracle pattern the
reference uses for its custom CUDA ops (gpu_ops.py:13-27).

Set GRU4REC_TPU_NO_NATIVE=1 to force the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_scheduler.so")
_SRC_PATH = os.path.normpath(os.path.join(_HERE, "..", "..", "csrc", "scheduler.cpp"))

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GRU4REC_TPU_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO_PATH)) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not os.path.exists(_SRC_PATH):
                return None
            # compile to a per-process temp path and rename into place:
            # os.replace is atomic, so a concurrent process can never dlopen
            # a half-written shared object
            tmp_so = f"{_SO_PATH}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
                     "-o", tmp_so, _SRC_PATH],
                    check=True, capture_output=True,
                )
                os.replace(tmp_so, _SO_PATH)
            finally:
                if os.path.exists(tmp_so):
                    os.remove(tmp_so)
        lib = ctypes.CDLL(_SO_PATH)
        fn = lib.g4r_build_schedule
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,   # data_items, n_events
            ctypes.c_void_p, ctypes.c_int64,   # offsets, n_sessions
            ctypes.c_void_p,                   # order
            ctypes.c_int64, ctypes.c_int,      # batch_size, require_two_lanes
            ctypes.c_int,                      # emit
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_schedule(data_items, offsets, order, batch_size, require_two_lanes):
    from gru4rec_tpu.data.scheduler import Schedule, _build_schedule_numpy

    lib = _load()
    if lib is None:
        return _build_schedule_numpy(
            data_items, offsets, order, batch_size, require_two_lanes
        )
    data_items = np.ascontiguousarray(data_items, dtype=np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    n_sessions = len(offsets) - 1
    args_head = (
        data_items.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(data_items)),
        offsets.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n_sessions),
        order.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(batch_size), ctypes.c_int(int(require_two_lanes)),
    )
    T = lib.g4r_build_schedule(*args_head, 0, None, None, None, None)
    if T < 0:
        raise ValueError("native scheduler rejected its arguments")
    in_idx = np.zeros((T, batch_size), dtype=np.int32)
    out_idx = np.zeros((T, batch_size), dtype=np.int32)
    valid = np.zeros((T, batch_size), dtype=np.uint8)
    reset = np.zeros((T, batch_size), dtype=np.uint8)
    T2 = lib.g4r_build_schedule(
        *args_head, 1,
        in_idx.ctypes.data_as(ctypes.c_void_p),
        out_idx.ctypes.data_as(ctypes.c_void_p),
        valid.ctypes.data_as(ctypes.c_void_p),
        reset.ctypes.data_as(ctypes.c_void_p),
    )
    assert T2 == T
    return Schedule(in_idx, out_idx, valid.astype(bool), reset.astype(bool))
