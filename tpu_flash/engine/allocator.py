"""Physical-page allocator for the paged KV cache.

Backed by the native C++ free-list allocator (csrc/page_allocator.cpp,
compiled on first use and loaded over ctypes); a pure-Python implementation
with identical semantics is the fallback when no toolchain is present.
Allocation is all-or-nothing per request, pages are tracked per sequence,
and release is O(pages).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc" / "page_allocator.cpp"
_LIB_DIR = Path(__file__).resolve().parent / "_native"
_LIB_PATH = _LIB_DIR / "libpagealloc.so"
_build_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load_native():
    """Compile (once) and load the native allocator; None on any failure."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    with _build_lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        try:
            if not _LIB_PATH.exists() or (
                _CSRC.exists()
                and _CSRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            ):
                _LIB_DIR.mkdir(exist_ok=True)
                subprocess.run(
                    [
                        os.environ.get("CXX", "g++"),
                        "-O2", "-shared", "-fPIC", "-std=c++17",
                        str(_CSRC), "-o", str(_LIB_PATH),
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.pa_create.restype = ctypes.c_void_p
            lib.pa_create.argtypes = [ctypes.c_int32]
            lib.pa_destroy.argtypes = [ctypes.c_void_p]
            lib.pa_num_free.restype = ctypes.c_int32
            lib.pa_num_free.argtypes = [ctypes.c_void_p]
            lib.pa_num_seqs.restype = ctypes.c_int32
            lib.pa_num_seqs.argtypes = [ctypes.c_void_p]
            lib.pa_alloc.restype = ctypes.c_int
            lib.pa_alloc.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.pa_alloc_exact.restype = ctypes.c_int
            lib.pa_alloc_exact.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.pa_share.restype = ctypes.c_int
            lib.pa_share.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.pa_retain.restype = ctypes.c_int
            lib.pa_retain.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.pa_release_pages.restype = ctypes.c_int32
            lib.pa_release_pages.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.pa_page_refcount.restype = ctypes.c_int32
            lib.pa_page_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib.pa_release.restype = ctypes.c_int32
            lib.pa_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.pa_get_pages.restype = ctypes.c_int32
            lib.pa_get_pages.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.warning("native page allocator unavailable (%s); "
                           "using Python fallback", e)
            _lib = None
    return _lib


class _NativeAllocator:
    def __init__(self, num_pages: int, lib):
        self._lib = lib
        self._h = lib.pa_create(num_pages)
        self._num_pages = num_pages

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pa_destroy(self._h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.pa_num_free(self._h)

    @property
    def num_seqs(self) -> int:
        return self._lib.pa_num_seqs(self._h)

    def alloc(self, seq_id: int, n: int) -> Optional[List[int]]:
        out = (ctypes.c_int32 * max(n, 1))()
        rc = self._lib.pa_alloc(self._h, seq_id, n, out)
        if rc != 0:
            return None
        return list(out[:n])

    def alloc_exact(self, seq_id: int, pages: List[int]) -> bool:
        """Bind seq_id to exactly these (currently free) pages — the
        checkpoint-restore path."""
        arr = (ctypes.c_int32 * max(len(pages), 1))(*pages)
        return (
            self._lib.pa_alloc_exact(self._h, seq_id, arr, len(pages)) == 0
        )

    def share(self, seq_id: int, pages: List[int]) -> bool:
        """Bind seq_id to live pages owned elsewhere (prefix sharing)."""
        arr = (ctypes.c_int32 * max(len(pages), 1))(*pages)
        return self._lib.pa_share(self._h, seq_id, arr, len(pages)) == 0

    def retain(self, pages: List[int]) -> bool:
        """Refcount++ with no sequence binding (prefix-index retention)."""
        arr = (ctypes.c_int32 * max(len(pages), 1))(*pages)
        return self._lib.pa_retain(self._h, arr, len(pages)) == 0

    def release_pages(self, pages: List[int]) -> int:
        """Drop one reference per page; returns pages actually freed."""
        arr = (ctypes.c_int32 * max(len(pages), 1))(*pages)
        return self._lib.pa_release_pages(self._h, arr, len(pages))

    def refcount(self, page: int) -> int:
        return self._lib.pa_page_refcount(self._h, page)

    def release(self, seq_id: int) -> int:
        return self._lib.pa_release(self._h, seq_id)

    def pages_of(self, seq_id: int) -> List[int]:
        cap = self._num_pages
        out = (ctypes.c_int32 * cap)()
        n = self._lib.pa_get_pages(self._h, seq_id, out, cap)
        return list(out[:n])


class _PythonAllocator:
    """Reference semantics; used when the native library can't be built."""

    def __init__(self, num_pages: int):
        self._free = list(range(num_pages - 1, -1, -1))
        self._refs = [0] * num_pages
        self._seq_pages: dict[int, List[int]] = {}

    @property
    def num_free(self) -> int:
        return len(self._free)

    @property
    def num_seqs(self) -> int:
        return len(self._seq_pages)

    def alloc(self, seq_id: int, n: int) -> Optional[List[int]]:
        if n < 0 or n > len(self._free):
            return None
        got = [self._free.pop() for _ in range(n)]
        for p in got:
            self._refs[p] = 1
        self._seq_pages.setdefault(seq_id, []).extend(got)
        return got

    def alloc_exact(self, seq_id: int, pages: List[int]) -> bool:
        if len(set(pages)) != len(pages):
            return False
        free = set(self._free)
        if not all(p in free for p in pages):
            return False
        wanted = set(pages)
        self._free = [p for p in self._free if p not in wanted]
        for p in pages:
            self._refs[p] = 1
        self._seq_pages.setdefault(seq_id, []).extend(pages)
        return True

    def share(self, seq_id: int, pages: List[int]) -> bool:
        if not all(0 <= p < len(self._refs) and self._refs[p] >= 1
                   for p in pages):
            return False
        for p in pages:
            self._refs[p] += 1
        self._seq_pages.setdefault(seq_id, []).extend(pages)
        return True

    def retain(self, pages: List[int]) -> bool:
        if not all(0 <= p < len(self._refs) and self._refs[p] >= 1
                   for p in pages):
            return False
        for p in pages:
            self._refs[p] += 1
        return True

    def release_pages(self, pages: List[int]) -> int:
        freed = 0
        for p in pages:
            if 0 <= p < len(self._refs) and self._refs[p] >= 1:
                self._refs[p] -= 1
                if self._refs[p] == 0:
                    self._free.append(p)
                    freed += 1
        return freed

    def refcount(self, page: int) -> int:
        if not 0 <= page < len(self._refs):
            return -1
        return self._refs[page]

    def release(self, seq_id: int) -> int:
        pages = self._seq_pages.pop(seq_id, [])
        self.release_pages(pages)
        return len(pages)

    def pages_of(self, seq_id: int) -> List[int]:
        return list(self._seq_pages.get(seq_id, []))


def PageAllocator(num_pages: int, prefer_native: bool = True):
    """Factory: native C++ allocator when available, Python otherwise."""
    if prefer_native:
        lib = _load_native()
        if lib is not None:
            return _NativeAllocator(num_pages, lib)
    return _PythonAllocator(num_pages)
