"""Host-side video decoding.

The reference decodes through a custom-built torchvision/ffmpeg private API
with ffmpeg-side resize and segment seek (``dataset_loaders.py:405-424``).
The first-party equivalent is the native libav worker
(``native/vtc_decode.cpp``, bound in ``native.py``): avformat keyframe seek
to the segment start, decode to native YUV, and swscale convert/resize of
ONLY the linspace-selected frames — the per-frame YUV→RGB conversion that
``cv2.VideoCapture.read`` forces on every decoded frame is the biggest
avoidable share of the decode wall (receipts: PERFORMANCE.md, video host
pipeline). Segment endpoints are ABSOLUTE stream pts, matching the
reference's torchvision reader. OpenCV's bundled ffmpeg remains the
fallback with identical frame-selection semantics — its start_time-relative
position domain is re-based using the probed container offset
(``VTC_DECODE=cv2`` forces it). The native C++
preprocessing stage (resize/normalize) lives in ``native/vtc_preproc.cpp``
and is used downstream of decode.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

logger = logging.getLogger(__name__)

FALLBACK_SHAPE = (8, 300, 300, 3)


def _resize_dims(w: int, h: int, target_w: int, target_h: int) -> Tuple[int, int]:
    """ffmpeg-style: a 0 dimension preserves aspect ratio."""
    if target_w == 0 and target_h == 0:
        return w, h
    if target_w == 0:
        return max(1, round(w * target_h / h)), target_h
    if target_h == 0:
        return target_w, max(1, round(h * target_w / w))
    return target_w, target_h


def _read_segment_native(
    path: str,
    start_sec: float,
    end_sec: Optional[float],
    resize_width: int,
    resize_height: int,
    max_frames: Optional[int],
    subsample_to: Optional[int],
) -> Optional[np.ndarray]:
    """libav decode via native/vtc_decode.cpp; None -> use the cv2 path.

    One demuxer/decoder open serves the metadata query and every decode
    attempt (``native.VideoHandle``) — the single-core host pipeline paid
    2-3 avformat/codec inits per segment before."""
    from . import native

    handle = native.open_video(path)
    if handle is None:
        return None
    with handle:
        info = handle.info()
        if info is None:
            return None
        w, h, fps, duration, nb_frames, _ = info
        if w <= 0 or h <= 0:
            return None
        nw, nh = _resize_dims(w, h, resize_width, resize_height)
        cap = None
        if subsample_to is None and max_frames is None:
            # unbounded decode (read_video_full): size the buffer from the
            # container's frame count when recorded, else fps×duration,
            # growing on the rare VFR/bad-metadata miss
            span = (
                duration if end_sec is None
                else min(duration, end_sec) - start_sec
            )
            est = (fps or 30.0) * max(span, 1.0) * 1.15
            if end_sec is None and nb_frames > 0:
                est = max(est, float(nb_frames))
            cap = max(64, int(est) + 16)
        for _ in range(3):
            out = handle.decode(
                start_sec, end_sec, nw, nh,
                subsample_to=subsample_to, max_frames=max_frames,
                cap_frames=cap,
            )
            if out is None:
                return None
            if cap is None or len(out) < cap:
                return out
            cap *= 2  # buffer filled to the brim: frames may be truncated
    logger.warning(
        "native decode filled a %d-frame buffer after growth; the video may "
        "be truncated (bad fps/duration metadata?): %s", cap // 2, path,
    )
    return out


def read_video_segment(
    path: str,
    start_sec: float = 0.0,
    end_sec: Optional[float] = None,
    resize_width: int = 0,
    resize_height: int = 0,
    max_frames: Optional[int] = None,
    subsample_to: Optional[int] = None,
) -> np.ndarray:
    """Decode [start_sec, end_sec] -> uint8 [t, h, w, 3] RGB. Empty array on
    failure (callers implement the reference's fallback chain).

    ``subsample_to=n``: return only the floor-linspace selection of n frames
    over the decoded range (identical frames to decoding everything and then
    ``linspace_subsample``), but resize/color-convert ONLY the selected
    frames — the segment reader keeps 8 of up to 256 decoded frames, and
    per-frame resize of the discarded ones dominated the host pipeline
    (measured 1.5 s/item -> see scripts/bench_video_pipeline.py).

    Decode backend: the native libav worker when built (see module
    docstring), else OpenCV. ``VTC_DECODE=cv2`` / ``VTC_DECODE=native``
    force a backend.
    """
    backend = os.environ.get("VTC_DECODE", "auto")
    if backend != "cv2":
        out = _read_segment_native(
            path, start_sec, end_sec, resize_width, resize_height,
            max_frames, subsample_to,
        )
        if out is not None:
            return out
        if backend == "native":
            return np.zeros((0,) + FALLBACK_SHAPE[1:], np.uint8)
    if not _HAS_CV2:
        return np.zeros((0,) + FALLBACK_SHAPE[1:], np.uint8)
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        return np.zeros((0,) + FALLBACK_SHAPE[1:], np.uint8)

    # Segment endpoints are ABSOLUTE stream pts (reference semantics:
    # torchvision's `_read_video_from_file(video_pts_range=...)` — the
    # reddit 1.4 s container offset is compensated in dataset code,
    # `dataset_loaders.py:362-372`), but cv2's CAP_PROP_POS_MSEC domain is
    # start_time-RELATIVE. Align by probing the container start offset when
    # the native worker is available; pure-cv2 environments keep the
    # relative domain (the offset is zero for most containers).
    t0 = 0.0
    if start_sec > 0 or end_sec is not None:
        from . import native

        # A forced-cv2 user opted out of the native worker (broken
        # toolchain/libav, or avoiding the g++ build): the probe may use an
        # already-built lib but never triggers a compile for metadata.
        info = native.probe_video(path, allow_build=backend != "cv2")
        if info is not None:
            t0 = info[5]

    def _process(frame):
        w, h = frame.shape[1], frame.shape[0]
        nw, nh = _resize_dims(w, h, resize_width, resize_height)
        if (nw, nh) != (w, h):
            frame = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_AREA)
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    try:
        if start_sec - t0 > 0:
            cap.set(cv2.CAP_PROP_POS_MSEC, (start_sec - t0) * 1000.0)
        frames = []
        # deferring resize/convert to the selected frames only pays when
        # buffering RAW frames is cheap; for high-res sources (>~720p) a
        # 256-frame raw buffer reaches GBs, so process as we go instead —
        # per-frame processing commutes with frame selection (same pixels)
        defer = subsample_to is not None
        while True:
            if end_sec is not None:
                pos = cap.get(cv2.CAP_PROP_POS_MSEC)
            ok, frame = cap.read()
            if not ok:
                break
            if end_sec is not None and pos > (end_sec - t0) * 1000.0:
                break
            if defer and not frames and frame.shape[0] * frame.shape[1] > 1_000_000:
                defer = False
            frames.append(frame if defer else _process(frame))
            if max_frames is not None and len(frames) >= max_frames:
                break
        if not frames:
            return np.zeros((0,) + FALLBACK_SHAPE[1:], np.uint8)
        if subsample_to is not None:
            idxs = np.floor(
                np.linspace(0, len(frames) - 1, subsample_to)
            ).astype(np.int64)
            return np.stack(
                [_process(frames[i]) if defer else frames[i] for i in idxs]
            )
        return np.stack(frames)
    finally:
        cap.release()


def read_video_full(path: str) -> np.ndarray:
    return read_video_segment(path)


def video_duration_sec(path: str) -> float:
    if os.environ.get("VTC_DECODE", "auto") != "cv2":
        from . import native

        info = native.probe_video(path)
        if info is not None:
            _, _, fps, duration, nb_frames, _ = info
            # prefer the frame-count-derived duration (matches the cv2
            # FRAME_COUNT/FPS computation); container duration otherwise
            if nb_frames > 0 and fps > 0:
                return float(nb_frames / fps)
            if duration > 0:
                return float(duration)
    if not _HAS_CV2:
        return 0.0
    cap = cv2.VideoCapture(str(path))
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 0
        n = cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0
        return float(n / fps) if fps > 0 else 0.0
    finally:
        cap.release()


def linspace_subsample(vid: np.ndarray, nframes: int) -> np.ndarray:
    """floor-linspace frame selection (``dataset_loaders.py:430-433``)."""
    idxs = np.floor(np.linspace(0, len(vid) - 1, nframes)).astype(np.int64)
    return vid[idxs]


def read_segment_with_fallbacks(
    path: str,
    *,
    video_length: float,
    nframes: int = 8,
    frame_strides=(4, 8, 16, 32),
    reference_fps: float = 30.0,
    is_reddit: bool = True,
    train: bool = True,
    resize_width: int = 0,
    resize_height: int = 300,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """The reference's segment reader (``dataset_loaders.py:353-437``):
    random stride, reddit 1.4s start offset, random (train) or zero start,
    two-stage fallback, floor-linspace subsample to ``nframes``."""
    rng = rng or np.random.default_rng()
    video_length = min(60, video_length)
    frame_stride = frame_strides[int(rng.integers(0, len(frame_strides)))]
    segment_duration = nframes / (reference_fps / frame_stride)

    # reddit videos commonly have a 1.4s container start offset
    # (dataset_loaders.py:362-372)
    start_time = 1.4 if is_reddit else 0.0

    if train:
        start_lower = start_time
        start_upper = max(0.0, video_length - segment_duration)
        segment_start = (start_lower - start_upper) * float(
            rng.random()
        ) + start_upper
    else:
        segment_start = 0.0
    segment_end = segment_start + segment_duration

    vid = read_video_segment(
        path, segment_start, segment_end,
        resize_width=resize_width, resize_height=resize_height,
        subsample_to=nframes,
    )
    if vid.shape[0] == 0:
        logger.warning("zero-length segment, retrying [0, 5]s: %s", path)
        vid = read_video_segment(
            path, 0, 5, resize_width=resize_width, resize_height=resize_height,
            subsample_to=nframes,
        )
    if vid.shape[0] == 0:
        logger.warning("decode fallback failed, emitting black frames: %s", path)
        vid = np.zeros(FALLBACK_SHAPE, np.uint8)

    return linspace_subsample(vid, nframes)
