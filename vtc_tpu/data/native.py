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
DECODE_SRC = NATIVE_DIR / "vtc_decode.cpp"
DECODE_SO = NATIVE_DIR / "libvtc_decode.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_decode_lib: Optional[ctypes.CDLL] = None
_decode_tried = False


def _build(src: Path, so: Path, extra_flags=()) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(so), str(src), "-lpthread", *extra_flags,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        import logging

        logging.getLogger(__name__).warning(
            "native build of %s failed (%s); using the fallback path",
            src.name, e,
        )
        return False


def _load(
    src: Path, so: Path, extra_flags=(), allow_build: bool = True
) -> Optional[ctypes.CDLL]:
    # a prebuilt .so without the .cpp source is usable as-is (deployed
    # artifact); only rebuild when the source exists and is newer.
    # allow_build=False (e.g. a forced-cv2 user's metadata probe) loads an
    # existing .so — even a stale one — but never invokes the compiler.
    stale = src.exists() and (
        not so.exists() or so.stat().st_mtime < src.stat().st_mtime
    )
    if stale and allow_build and not _build(src, so, extra_flags):
        return None
    if not so.exists():
        return None
    try:
        return ctypes.CDLL(str(so))
    except OSError as e:  # missing runtime dep (e.g. libav .so at load)
        import logging

        logging.getLogger(__name__).warning("cannot load %s (%s)", so.name, e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = _load(SRC, SO)
        if lib is None:
            return None
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


def get_decode_lib(allow_build: bool = True) -> Optional[ctypes.CDLL]:
    """The first-party libav decode worker (``native/vtc_decode.cpp``).

    Links against the system libav (-lavformat -lavcodec -lavutil
    -lswscale); returns None when the toolchain or libav is unavailable —
    callers fall back to the OpenCV path. ``allow_build=False`` loads an
    already-built .so but never invokes the compiler (and does NOT memoize
    a miss, so a later allow_build=True call still gets its build)."""
    global _decode_lib, _decode_tried
    with _lock:
        if _decode_lib is not None or _decode_tried:
            return _decode_lib
        lib = _load(
            DECODE_SRC, DECODE_SO,
            ("-lavformat", "-lavcodec", "-lavutil", "-lswscale"),
            allow_build=allow_build,
        )
        if lib is None:
            if allow_build:
                _decode_tried = True  # a real build attempt failed: memoize
            return None
        _decode_tried = True
        u8p = ctypes.POINTER(ctypes.c_uint8)
        info_ptrs = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ]
        lib.vtc_probe.argtypes = [ctypes.c_char_p] + info_ptrs
        lib.vtc_probe.restype = ctypes.c_int
        lib.vtc_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vtc_open.restype = ctypes.c_void_p
        lib.vtc_handle_info.argtypes = [ctypes.c_void_p] + info_ptrs
        lib.vtc_handle_info.restype = ctypes.c_int
        lib.vtc_handle_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int,
        ]
        lib.vtc_handle_decode.restype = ctypes.c_int
        lib.vtc_close.argtypes = [ctypes.c_void_p]
        lib.vtc_close.restype = None
        lib.vtc_decode_segment.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int,
        ]
        lib.vtc_decode_segment.restype = ctypes.c_int
        _decode_lib = lib
        return _decode_lib


def decode_available() -> bool:
    return get_decode_lib() is not None


def _unpack_info(getter) -> Optional[tuple]:
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    dur = ctypes.c_double()
    nbf = ctypes.c_int64()
    t0 = ctypes.c_double()
    rc = getter(
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps),
        ctypes.byref(dur), ctypes.byref(nbf), ctypes.byref(t0),
    )
    if rc != 0:
        return None
    return w.value, h.value, fps.value, dur.value, nbf.value, t0.value


def probe_video(path: str, allow_build: bool = True):
    """(width, height, fps, duration_sec, nb_frames, start_sec) or None on
    failure. Metadata only — no decoder is initialized. ``start_sec`` is
    the container/stream start offset (absolute-pts segment endpoints minus
    this give the cv2 CAP_PROP_POS_MSEC domain). ``allow_build=False``
    (forced-cv2 callers) never invokes the compiler for metadata."""
    lib = get_decode_lib(allow_build=allow_build)
    if lib is None:
        return None
    return _unpack_info(
        lambda *ptrs: lib.vtc_probe(str(path).encode(), *ptrs)
    )


class VideoHandle:
    """Open demuxer+decoder for one file: probe and decode segments without
    re-paying avformat open/stream-info/codec init per call (the host
    pipeline is single-core; per-item re-opens were 2-3× pure overhead).
    Use as a context manager."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    def info(self) -> Optional[tuple]:
        """Same tuple as :func:`probe_video`."""
        return _unpack_info(
            lambda *ptrs: self._lib.vtc_handle_info(self._handle, *ptrs)
        )

    def decode(
        self,
        start_sec: float,
        end_sec: Optional[float],
        out_w: int,
        out_h: int,
        subsample_to: Optional[int] = None,
        max_frames: Optional[int] = None,
        cap_frames: Optional[int] = None,
    ) -> Optional[np.ndarray]:
        """Segment decode -> uint8 [t, out_h, out_w, 3] RGB, or None on any
        failure (caller falls back to OpenCV). Endpoints are absolute stream
        pts. Repeatable on one handle. ``cap_frames`` bounds the output
        allocation when neither ``subsample_to`` nor ``max_frames`` is given
        (the caller estimates it from ``info()``)."""
        cap = subsample_to or max_frames or cap_frames
        if not cap or cap <= 0:
            return None
        out = np.empty((cap, out_h, out_w, 3), np.uint8)
        n = self._lib.vtc_handle_decode(
            self._handle, float(start_sec),
            -1.0 if end_sec is None else float(end_sec),
            out_w, out_h, subsample_to or 0, max_frames or 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        )
        if n < 0:
            return None
        # n == 0 is a SUCCESSFUL decode with no frames in [start, end]
        # (e.g. a segment before the stream start): an empty array, not
        # None — re-decoding with the fallback backend would find the same
        # nothing and the single-core host would pay a full extra open+decode
        return out[:n]

    def close(self):
        if self._handle:
            self._lib.vtc_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()


def open_video(path: str, num_threads: Optional[int] = None) -> Optional[VideoHandle]:
    """Open a :class:`VideoHandle`, or None when the native worker is
    unavailable or the file cannot be demuxed/decoded."""
    lib = get_decode_lib()
    if lib is None:
        return None
    nthreads = num_threads or min(4, len(os.sched_getaffinity(0)) or 1)
    handle = lib.vtc_open(str(path).encode(), nthreads)
    if not handle:
        return None
    return VideoHandle(lib, handle)


def decode_segment(
    path: str,
    start_sec: float,
    end_sec: Optional[float],
    out_w: int,
    out_h: int,
    subsample_to: Optional[int] = None,
    max_frames: Optional[int] = None,
    cap_frames: Optional[int] = None,
    num_threads: Optional[int] = None,
) -> Optional[np.ndarray]:
    """One-shot segment decode (open → decode → close); prefer
    :func:`open_video` when info + decode (or retries) hit the same file."""
    lib = get_decode_lib()
    if lib is None:
        return None
    cap = subsample_to or max_frames or cap_frames
    if not cap or cap <= 0:
        return None
    out = np.empty((cap, out_h, out_w, 3), np.uint8)
    nthreads = num_threads or min(4, len(os.sched_getaffinity(0)) or 1)
    n = lib.vtc_decode_segment(
        str(path).encode(), float(start_sec),
        -1.0 if end_sec is None else float(end_sec),
        out_w, out_h, subsample_to or 0, max_frames or 0, nthreads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        return None
    return out[:n]  # n == 0: successful decode, empty segment (see above)


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
