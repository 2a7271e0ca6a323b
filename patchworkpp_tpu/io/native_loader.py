"""ctypes wrapper for the native prefetching scan loader (native/loader.cpp).

The native loader stages KITTI scans as fixed-capacity padded (capacity, 4)
float32 buffers behind a thread pool, in scan order, so the serving loop's
host side is a zero-copy buffer handoff instead of per-frame
read+pad+copy in Python. Falls back transparently: callers should use
:func:`available` and fall back to :func:`patchworkpp_tpu.io.read_bin` +
:func:`pad_cloud` when the shared library isn't built.

Build once with: ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

def _lib_path() -> str:
    """Locate libppk_loader.so: env override, package-adjacent, repo layout."""
    env = os.environ.get("PPK_NATIVE_LIB")
    if env:
        return env
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(pkg, "_native", "libppk_loader.so"),
        os.path.join(os.path.dirname(pkg), "native", "libppk_loader.so"),
    ):
        if os.path.exists(cand):
            return cand
    return os.path.join(os.path.dirname(pkg), "native", "libppk_loader.so")


_LIB_PATH = _lib_path()
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = _bind(ctypes.CDLL(_LIB_PATH))
    except (OSError, AttributeError):
        # Unloadable or STALE library (e.g. a prebuilt .so from an older
        # revision missing a symbol such as ppk_loader_truncations): treat
        # as not-built so available() falls through to build(), which
        # recompiles (make sees the newer loader.cpp) instead of raising.
        return None
    _lib = lib
    return lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.ppk_loader_create.restype = ctypes.c_void_p
    lib.ppk_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ppk_loader_acquire.restype = ctypes.c_int
    lib.ppk_loader_acquire.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ppk_loader_release.restype = ctypes.c_int
    lib.ppk_loader_release.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.ppk_loader_io_errors.restype = ctypes.c_int
    lib.ppk_loader_io_errors.argtypes = [ctypes.c_void_p]
    lib.ppk_loader_truncations.restype = ctypes.c_int
    lib.ppk_loader_truncations.argtypes = [ctypes.c_void_p]
    lib.ppk_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def build(quiet: bool = True) -> bool:
    """Compile the shared library if the toolchain is available."""
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _load() is not None


def available() -> bool:
    return _load() is not None or build()


class NativeScanLoader:
    """Ordered, prefetched iteration over .bin scans as padded buffers.

    Yields (padded_view, npts, scan_index); the view is only valid until the
    next iteration (the slot is recycled). Copy if you need to keep it —
    ``jnp.asarray`` does, implicitly, when feeding the device.
    """

    def __init__(
        self,
        paths: List[str],
        capacity: int,
        queue_depth: int = 4,
        n_threads: int = 2,
        loop: bool = False,
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built; run make -C native")
        self._lib = lib
        self.capacity = capacity
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.ppk_loader_create(
            arr, len(paths), capacity, queue_depth, n_threads, int(loop)
        )
        if not self._handle:
            raise RuntimeError("failed to create native loader")
        self._held: Optional[ctypes.POINTER(ctypes.c_float)] = None
        self.last_truncated = False

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int, int]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, int, int]:
        self._release_held()
        buf = ctypes.POINTER(ctypes.c_float)()
        npts = ctypes.c_int()
        idx = ctypes.c_int()
        trunc = ctypes.c_int()
        rc = self._lib.ppk_loader_acquire(
            self._handle, ctypes.byref(buf), ctypes.byref(npts),
            ctypes.byref(idx), ctypes.byref(trunc),
        )
        if rc != 0:
            raise StopIteration
        self._held = buf
        self.last_truncated = bool(trunc.value)
        view = np.ctypeslib.as_array(buf, shape=(self.capacity, 4))
        return view, int(npts.value), int(idx.value)

    def _release_held(self) -> None:
        if self._held is not None:
            rc = self._lib.ppk_loader_release(self._handle, self._held)
            self._held = None
            if rc != 0:
                raise RuntimeError(
                    "ppk_loader_release rejected the held buffer (foreign "
                    "pointer) — loader/slot bookkeeping bug"
                )

    @property
    def io_errors(self) -> int:
        """Unreadable files seen so far (their scans yield npts == 0)."""
        return int(self._lib.ppk_loader_io_errors(self._handle))

    @property
    def truncations(self) -> int:
        """Scans longer than `capacity` seen so far. Such a scan is staged
        with npts == capacity and its tail DROPPED; `last_truncated` flags
        whether the most recently acquired scan was one. A pipeline that
        must never lose points should size `capacity` to its sensor and
        assert this stays 0."""
        return int(self._lib.ppk_loader_truncations(self._handle))

    def close(self) -> None:
        if self._handle:
            # Destroy the loader even if releasing the held buffer reports a
            # bookkeeping error: skipping destroy would leak worker threads
            # and slots until __del__ retries. The release error still
            # propagates to the caller (see __exit__ for the with-body case).
            try:
                self._release_held()
            finally:
                self._lib.ppk_loader_destroy(self._handle)
                self._handle = None

    def __enter__(self) -> "NativeScanLoader":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.close()
            return
        # An exception is already in flight from the with-body: still tear
        # down, but do not let a release-bookkeeping RuntimeError REPLACE it
        # as the surfaced exception.
        try:
            self.close()
        except Exception:
            pass

    def __del__(self) -> None:  # best-effort
        try:
            self.close()
        except Exception:
            pass
