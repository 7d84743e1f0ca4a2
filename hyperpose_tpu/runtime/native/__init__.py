"""ctypes bindings for the native runtime core (libhp_runtime.so).

Auto-builds the shared library on first import if a compiler is available;
falls back to pure-Python equivalents otherwise (mirrors the reference's
FAKE build that keeps the API alive without the native backend,
reference: cmake/hyperpose.fake.cmake).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhp_runtime.so")
_SRC = os.path.join(_HERE, "hp_runtime.cpp")

_lib = None
_build_lock = threading.Lock()

# C task callback signature for the native worker pool.
TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_int64
        p = ctypes.c_void_p
        lib.hp_queue_new.restype = p
        lib.hp_queue_new.argtypes = [i64]
        lib.hp_queue_free.argtypes = [p]
        lib.hp_queue_push.restype = ctypes.c_int
        lib.hp_queue_push.argtypes = [p, i64]
        lib.hp_queue_try_push.restype = ctypes.c_int
        lib.hp_queue_try_push.argtypes = [p, i64]
        lib.hp_queue_pop.restype = ctypes.c_int
        lib.hp_queue_pop.argtypes = [p, ctypes.POINTER(i64), i64]
        lib.hp_queue_dump.restype = i64
        lib.hp_queue_dump.argtypes = [p, ctypes.POINTER(i64), i64, i64]
        lib.hp_queue_close.argtypes = [p]
        lib.hp_queue_stats.argtypes = [p, ctypes.POINTER(i64)]
        lib.hp_copy_into_batch.argtypes = [
            ctypes.c_char_p, i64, i64, ctypes.c_char_p, i64, i64, i64,
        ]
        lib.hp_resize_into_batch.argtypes = [
            ctypes.c_char_p, i64, i64, ctypes.c_char_p, i64, i64, i64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.hp_pool_new.restype = p
        lib.hp_pool_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.hp_pool_free.argtypes = [p]
        lib.hp_pool_enqueue.argtypes = [p, TASK_FN, p]
        lib.hp_pool_wait.argtypes = [p]
        _lib = lib
        return _lib


def resize_into_batch(img, batch, slot: int, keep_ratio: bool = False,
                      swap_rb: bool = False):
    """Native bilinear resize of an HWC3 uint8 frame straight into
    `batch[slot]` (letterbox when keep_ratio). Returns (rx, ry) coverage
    ratios, or None when the native library is unavailable (caller should
    fall back to the cv2 path).

    Reference analog: the resize worker + nhwc_images_append_nchw_batch
    (src/stream.cpp:68-112, src/data.cpp:21-69) — here the resize lands
    directly in the device-staging NHWC batch with no intermediate copies.
    """
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        return None
    if not img.flags["C_CONTIGUOUS"]:
        img = np.ascontiguousarray(img)
    assert batch.dtype == np.uint8 and batch.flags["C_CONTIGUOUS"]
    b, dh, dw, _ = batch.shape
    assert 0 <= slot < b
    ratio = (ctypes.c_float * 2)()
    lib.hp_resize_into_batch(
        img.ctypes.data_as(ctypes.c_char_p), img.shape[0], img.shape[1],
        batch.ctypes.data_as(ctypes.c_char_p), slot, dh, dw,
        1 if keep_ratio else 0, 1 if swap_rb else 0, ratio,
    )
    return float(ratio[0]), float(ratio[1])


class NativeQueue:
    """Bounded MPMC token queue backed by the C++ ring buffer; carries
    Python objects through a token registry."""

    def __init__(self, capacity: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._q = lib.hp_queue_new(capacity)
        self._objects: dict[int, object] = {}
        self._next = 1
        self._reg_lock = threading.Lock()

    def push(self, obj) -> bool:
        with self._reg_lock:
            token = self._next
            self._next += 1
            self._objects[token] = obj
        if self._lib.hp_queue_push(self._q, token) != 0:
            with self._reg_lock:
                self._objects.pop(token, None)
            return False
        return True

    def pop(self, timeout_ms: int = -1):
        out = ctypes.c_int64(0)
        rc = self._lib.hp_queue_pop(self._q, ctypes.byref(out), timeout_ms)
        if rc == 1:
            raise TimeoutError
        if rc == -1:
            raise EOFError
        with self._reg_lock:
            return self._objects.pop(out.value)

    def dump(self, max_items: int, timeout_ms: int = -1) -> list:
        buf = (ctypes.c_int64 * max_items)()
        n = self._lib.hp_queue_dump(self._q, buf, max_items, timeout_ms)
        if n == 0:
            stats = self.stats()
            if stats["closed"] and stats["size"] == 0:
                raise EOFError
            return []
        with self._reg_lock:
            return [self._objects.pop(buf[i]) for i in range(n)]

    def close(self):
        self._lib.hp_queue_close(self._q)

    def stats(self) -> dict:
        s = (ctypes.c_int64 * 5)()
        self._lib.hp_queue_stats(self._q, s)
        return {
            "size": s[0], "capacity": s[1], "pushed": s[2], "popped": s[3],
            "closed": bool(s[4]),
        }

    def __del__(self):
        try:
            self._lib.hp_queue_free(self._q)
        except Exception:
            pass


class NativePool:
    """Affinity-pinned C++ worker pool driving Python callables via a
    ctypes trampoline (reference: src/thread_pool.cpp:39-68)."""

    def __init__(self, n_threads: int, pin_affinity: bool = True):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._pool = lib.hp_pool_new(n_threads, 1 if pin_affinity else 0)
        self._tasks: dict[int, object] = {}
        self._next = 1
        self._lock = threading.Lock()

        def trampoline(ctx):
            with self._lock:
                fn = self._tasks.pop(int(ctx), None)
            if fn is not None:
                try:
                    fn()
                except Exception:
                    pass

        self._trampoline = TASK_FN(trampoline)  # keep alive

    def enqueue(self, fn) -> None:
        with self._lock:
            token = self._next
            self._next += 1
            self._tasks[token] = fn
        self._lib.hp_pool_enqueue(self._pool, self._trampoline, token)

    def wait(self) -> None:
        self._lib.hp_pool_wait(self._pool)

    def close(self) -> None:
        if self._pool is not None:
            self._lib.hp_pool_free(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
