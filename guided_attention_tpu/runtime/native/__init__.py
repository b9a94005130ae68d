"""ctypes bindings + on-demand build of the native async artifact writer."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "artifact_writer.cpp"
_LIB = _DIR / "libartifact_writer.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        [
            "g++",
            "-O2",
            "-shared",
            "-fPIC",
            "-std=c++17",
            str(_SRC),
            "-o",
            str(_LIB),
            "-lz",
            "-pthread",
        ],
        check=True,
        capture_output=True,
    )


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the shared library; None if no toolchain."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
        except Exception:
            return None
        lib.aw_create.restype = ctypes.c_void_p
        lib.aw_create.argtypes = [ctypes.c_int]
        lib.aw_destroy.argtypes = [ctypes.c_void_p]
        lib.aw_submit_gray.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.aw_submit_rgb8.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.aw_pending.restype = ctypes.c_int
        lib.aw_pending.argtypes = [ctypes.c_void_p]
        lib.aw_flush.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class AsyncArtifactWriter:
    """Thread-pooled native PNG writer; falls back to matplotlib/PIL when
    the native library is unavailable."""

    def __init__(self, n_threads: int = 2):
        self._lib = load_library()
        self._handle = self._lib.aw_create(n_threads) if self._lib else None

    @property
    def native(self) -> bool:
        return self._handle is not None

    def submit_map(self, map2d: np.ndarray, path, viridis: bool = True) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arr = np.ascontiguousarray(map2d, dtype=np.float32)
        if self._handle is not None:
            self._lib.aw_submit_gray(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                arr.shape[0],
                arr.shape[1],
                str(path).encode(),
                1 if viridis else 0,
            )
        else:
            from guided_attention_tpu.runtime.artifacts import save_viridis

            save_viridis(arr, path)

    def submit_image(self, image01: np.ndarray, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arr = (np.clip(np.asarray(image01, np.float32), 0, 1) * 255).round().astype(np.uint8)
        arr = np.ascontiguousarray(arr)
        if self._handle is not None:
            self._lib.aw_submit_rgb8(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                arr.shape[0],
                arr.shape[1],
                str(path).encode(),
            )
        else:
            from guided_attention_tpu.runtime.artifacts import to_pil

            to_pil(arr / 255.0).save(path)

    def pending(self) -> int:
        return self._lib.aw_pending(self._handle) if self._handle else 0

    def flush(self) -> None:
        if self._handle is not None:
            self._lib.aw_flush(self._handle)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.aw_flush(self._handle)
            self._lib.aw_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
