"""ctypes bindings + on-demand build for the native async trace writer."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "trace_writer.cpp")
_LIB = os.path.join(_HERE, "_trace_writer.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None
# True when the loaded native library was linked with libzstd (codec="zstd"
# compresses on the worker threads); False on the NO_ZSTD fallback build,
# where zstd chunks must be compressed Python-side and handed to write_raw.
_lib_has_zstd = True
_ZSTD_MARK = _LIB + ".nozstd"  # records which variant the cached .so is


def _build() -> None:
    """Build the native writer, preferring the -lzstd link; hosts without
    libzstd get a -DNO_ZSTD build so the zlib async path stays available
    (the previous unconditional -lzstd link killed the whole native writer
    on such hosts)."""
    global _lib_has_zstd
    base = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-o", _LIB, "-lz"]
    try:
        subprocess.run(base + ["-lzstd"], check=True, capture_output=True)
        _lib_has_zstd = True
        if os.path.exists(_ZSTD_MARK):
            os.remove(_ZSTD_MARK)
    except subprocess.CalledProcessError:
        subprocess.run(base + ["-DNO_ZSTD"], check=True, capture_output=True)
        _lib_has_zstd = False
        with open(_ZSTD_MARK, "w"):
            pass


def _load():
    global _lib, _build_error, _lib_has_zstd
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            else:
                _lib_has_zstd = not os.path.exists(_ZSTD_MARK)
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        lib.tw_create.restype = ctypes.c_void_p
        lib.tw_create.argtypes = [ctypes.c_size_t, ctypes.c_int]
        lib.tw_write.restype = None
        lib.tw_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_void_p, ctypes.c_size_t,
                                 ctypes.c_int]
        lib.tw_write2.restype = None
        lib.tw_write2.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_void_p, ctypes.c_size_t,
                                  ctypes.c_int, ctypes.c_int]
        lib.tw_flush.restype = None
        lib.tw_flush.argtypes = [ctypes.c_void_p]
        lib.tw_error.restype = ctypes.c_char_p
        lib.tw_error.argtypes = [ctypes.c_void_p]
        lib.tw_destroy.restype = None
        lib.tw_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_zstd_available() -> bool:
    """True when the native writer compresses zstd itself (built -lzstd)."""
    return _load() is not None and _lib_has_zstd


class AsyncTraceWriter:
    """Bounded-queue async file writer backed by the C++ worker pool.

    ``write(path, data, compress_level)`` enqueues and returns immediately;
    it blocks only when ``max_queue`` chunks are already in flight
    (backpressure, mirroring nuts-rs ``async_impl.rs:365-400``).
    """

    def __init__(self, max_queue: int = 64, n_threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native trace writer unavailable: {_build_error}")
        self._lib = lib
        self._handle = lib.tw_create(max_queue, n_threads)
        # False on the NO_ZSTD fallback build: callers must compress zstd
        # payloads Python-side and use write_raw (see storage/zarr_format).
        self.supports_zstd = _lib_has_zstd

    def _live_handle(self):
        # A NULL handle would be dereferenced by the C side (hard segfault,
        # not an exception) — guard every entry point after close().
        h = self._handle
        if h is None:
            raise RuntimeError("AsyncTraceWriter used after close()")
        return h

    def write(self, path: str, data: bytes, compress_level: int = 1,
              codec: str = "zlib") -> None:
        self._lib.tw_write2(self._live_handle(), path.encode(), data,
                            len(data), compress_level,
                            1 if codec == "zstd" else 0)

    def write_raw(self, path: str, data: bytes) -> None:
        self._lib.tw_write(self._live_handle(), path.encode(), data,
                           len(data), -1)

    def flush(self) -> None:
        h = self._live_handle()
        self._lib.tw_flush(h)
        err = self._lib.tw_error(h)
        if err:
            raise IOError(err.decode())

    def close(self) -> None:
        if self._handle is not None:
            try:
                self.flush()
            finally:
                # Destroy even when flush raises: a latched writer error must
                # not leave a handle that invites reuse of a failed writer.
                self._lib.tw_destroy(self._handle)
                self._handle = None

    def __del__(self):
        try:
            if getattr(self, "_handle", None) is not None:
                self._lib.tw_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
