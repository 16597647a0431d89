"""ctypes binding for the native preprocessing library (``native/``).

Builds ``libvtc_preproc.so`` on first use (g++, cached next to the source)
and exposes batched, multi-threaded CLIP preprocessing and antialiased
resizing. Falls back transparently to the PIL path when a compiler is
unavailable — callers use :func:`clip_preprocess_frames_fast`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
SRC = NATIVE_DIR / "vtc_preproc.cpp"
SO = NATIVE_DIR / "libvtc_preproc.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(SO), str(SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        import logging

        logging.getLogger(__name__).warning(
            "native preproc build failed (%s); using the PIL path", e
        )
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # a prebuilt .so without the .cpp source is usable as-is (deployed
        # artifact); only rebuild when the source exists and is newer
        stale = SRC.exists() and (
            not SO.exists() or SO.stat().st_mtime < SRC.stat().st_mtime
        )
        if stale and not _build():
            return None
        if not SO.exists():
            return None
        lib = ctypes.CDLL(str(SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vtc_clip_preprocess_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vtc_resize_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def clip_preprocess_frames_fast(
    frames: np.ndarray, size: int = 224, num_threads: Optional[int] = None
) -> np.ndarray:
    """uint8 [t, h, w, 3] -> float32 [t, 3, size, size] via the native
    threaded path; PIL fallback otherwise."""
    lib = get_lib()
    if lib is None:
        from .preprocess import clip_preprocess_frames

        return clip_preprocess_frames(frames, size)

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    out = np.empty((t, 3, size, size), np.float32)
    nthreads = num_threads or min(t, len(os.sched_getaffinity(0)) or 1)
    lib.vtc_clip_preprocess_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, 0, nthreads,
    )
    return out


def resize_batch_fast(
    frames: np.ndarray, out_h: int, out_w: int, bilinear: bool = True,
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Antialiased uint8 batch resize (native); PIL fallback."""
    lib = get_lib()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    if lib is None:
        from PIL import Image

        interp = Image.BILINEAR if bilinear else Image.BICUBIC
        return np.stack(
            [
                np.asarray(Image.fromarray(f).resize((out_w, out_h), interp))
                for f in frames
            ]
        )
    out = np.empty((t, out_h, out_w, 3), np.uint8)
    nthreads = num_threads or min(t, len(os.sched_getaffinity(0)) or 1)
    lib.vtc_resize_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, 1 if bilinear else 0, nthreads,
    )
    return out
