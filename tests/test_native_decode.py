"""First-party libav decode worker (native/vtc_decode.cpp): builds, probes,
and matches the OpenCV fallback path frame-for-frame.

The two backends decode the same bitstream with the same upstream decoder
(OpenCV bundles ffmpeg), so frame *selection* must match exactly and pixels
must match up to colorspace/resize arithmetic differences (swscale SWS_AREA
vs cv2 INTER_AREA on already-converted BGR)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vtc_tpu.data import native
from vtc_tpu.data.video import (
    read_segment_with_fallbacks,
    read_video_full,
    read_video_segment,
    video_duration_sec,
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    """Synthetic 6 s, 30 fps, 96x64 clip with a frame-index gradient so
    frame identity is recoverable from pixel content."""
    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    w, h, fps, n = 96, 64, 30, 180
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = np.full((h, w, 3), int(i * 255 / n), np.uint8)
        frame[:16] = rng.integers(0, 255, (16, w, 3), dtype=np.uint8)
        vw.write(frame)
    vw.release()
    return path, w, h, fps, n


def _force(backend):
    os.environ["VTC_DECODE"] = backend


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    os.environ.pop("VTC_DECODE", None)


def test_decode_lib_builds():
    assert native.decode_available(), "g++/libav build of libvtc_decode.so failed"


def test_probe(video):
    path, w, h, fps, n = video
    info = native.probe_video(path)
    assert info is not None
    pw, ph, pfps, dur, nbf, t0 = info
    assert (pw, ph) == (w, h)
    assert abs(pfps - fps) < 0.5
    assert abs(dur - n / fps) < 0.5
    assert nbf in (0, n)
    assert abs(t0) < 0.5  # no container start offset in this clip


def test_handle_reuse(video):
    """One open handle serves info + repeated segment decodes."""
    path, w, h, fps, n = video
    with native.open_video(path) as handle:
        assert handle.info()[:2] == (w, h)
        a = handle.decode(0.0, 1.0, w, h, max_frames=4)
        b = handle.decode(2.0, 3.0, w, h, max_frames=4)
        a2 = handle.decode(0.0, 1.0, w, h, max_frames=4)
    assert a.shape == b.shape == (4, h, w, 3)
    # re-seek reproduces the first segment exactly; the later segment differs
    assert np.array_equal(a, a2)
    assert not np.array_equal(a, b)


def test_subsample_to_one_matches_cv2(video):
    """np.linspace(0, n-1, 1) == [0]: both backends pick the FIRST frame."""
    path, w, h, fps, n = video
    _force("native")
    nat = read_video_segment(path, end_sec=4.0, subsample_to=1)
    _force("cv2")
    ref = read_video_segment(path, end_sec=4.0, subsample_to=1)
    assert nat.shape == ref.shape == (1, h, w, 3)
    lvl_nat = nat[:, 32:].mean()
    lvl_ref = ref[:, 32:].mean()
    assert abs(lvl_nat - lvl_ref) < 3.0
    # the first frame's gradient level is ~0 (i=0), not the segment tail
    assert lvl_nat < 10.0


def test_full_decode_matches_cv2(video):
    path, w, h, fps, n = video
    _force("native")
    nat = read_video_full(path)
    _force("cv2")
    ref = read_video_full(path)
    assert nat.shape == ref.shape == (n, h, w, 3)
    # same decoder lineage; only the YUV->RGB arithmetic may differ
    assert np.abs(nat.astype(np.int16) - ref.astype(np.int16)).mean() < 2.0


def test_segment_subsample_selection_matches_cv2(video):
    path, w, h, fps, n = video
    kwargs = dict(
        start_sec=1.0, end_sec=4.0, resize_height=48, subsample_to=8
    )
    _force("native")
    nat = read_video_segment(path, **kwargs)
    _force("cv2")
    ref = read_video_segment(path, **kwargs)
    assert nat.shape == ref.shape == (8, 48, 72, 3)
    # selection parity: the gradient band encodes the frame index; the
    # selected frames must be the same ones (resize arithmetic differs, so
    # compare the per-frame gradient level, which survives any resampler)
    lvl_nat = nat[:, 32:, :, :].mean(axis=(1, 2, 3))
    lvl_ref = ref[:, 32:, :, :].mean(axis=(1, 2, 3))
    assert np.abs(lvl_nat - lvl_ref).max() < 3.0
    # resampler-arithmetic bound only (SWS_AREA on YUV vs INTER_AREA on
    # BGR over the random-noise band); selection correctness is the level
    # check above
    assert np.abs(nat.astype(np.int16) - ref.astype(np.int16)).mean() < 16.0


def test_segment_max_frames(video):
    path, w, h, fps, n = video
    _force("native")
    out = read_video_segment(path, max_frames=5)
    assert out.shape == (5, h, w, 3)


def test_duration(video):
    path, w, h, fps, n = video
    _force("native")
    d_nat = video_duration_sec(path)
    _force("cv2")
    d_ref = video_duration_sec(path)
    assert abs(d_nat - d_ref) < 0.2


def test_fallbacks_reader_native(video):
    path, w, h, fps, n = video
    _force("native")
    vid = read_segment_with_fallbacks(
        path, video_length=n / fps, nframes=8, train=False, is_reddit=False,
        resize_height=48, rng=np.random.default_rng(0),
    )
    assert vid.shape == (8, 48, 72, 3)
    assert vid.any()


def test_cv2_rebases_absolute_pts_by_start_offset(video, monkeypatch):
    """Segment endpoints are absolute stream pts; the cv2 path must subtract
    the container start offset before entering CAP_PROP_POS_MSEC's relative
    domain (the reference's reddit 1.4 s case). Synthesizing an offset
    container needs a muxer this image lacks, so fake the probe instead."""
    path, w, h, fps, n = video
    from vtc_tpu.data import native as native_mod

    _force("cv2")
    ref = read_video_segment(path, start_sec=1.0, end_sec=3.0, subsample_to=4)

    real_probe = native_mod.probe_video

    def offset_probe(p, **kw):
        info = real_probe(p, **kw)
        assert info is not None and abs(info[5]) < 1e-6
        return info[:5] + (1.0,)

    monkeypatch.setattr("vtc_tpu.data.native.probe_video", offset_probe)
    shifted = read_video_segment(
        path, start_sec=2.0, end_sec=4.0, subsample_to=4
    )
    # absolute [2, 4] on a start_time=1 stream == relative [1, 3]
    assert np.array_equal(shifted, ref)


def test_native_forced_on_garbage_returns_empty(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    _force("native")
    out = read_video_segment(str(bad), subsample_to=8)
    assert out.shape[0] == 0


def test_handle_decode_empty_segment_returns_empty_not_none(video):
    """n == 0 from the C worker is a SUCCESSFUL decode of an empty range —
    an empty array, distinct from None (decode failure -> cv2 fallback)."""
    path, w, h, fps, n = video
    handle = native.open_video(path)
    assert handle is not None
    with handle:
        out = handle.decode(n / fps + 30.0, n / fps + 32.0, w, h,
                            subsample_to=4)
    assert out is not None
    assert out.shape == (0, h, w, 3)


def test_auto_mode_empty_segment_skips_cv2_redecode(video, monkeypatch):
    """A legitimately empty segment must not pay a second full cv2 open+decode
    on the single-core host (the [0, 5] caller-level fallback still runs)."""
    from vtc_tpu.data import video as vmod

    calls = []
    orig = vmod.cv2.VideoCapture

    def spy(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(vmod.cv2, "VideoCapture", spy)
    path, w, h, fps, n = video
    out = read_video_segment(path, n / fps + 30.0, n / fps + 32.0,
                             subsample_to=4)
    assert out.shape[0] == 0
    assert not calls


def test_forced_cv2_probe_never_builds(video, monkeypatch):
    """VTC_DECODE=cv2 is an opt-out of the native worker: the start-offset
    probe may use an already-built lib but must never trigger a g++ build."""
    _force("cv2")
    built = []
    monkeypatch.setattr(native, "_build", lambda *a, **kw: built.append(a) or False)
    monkeypatch.setattr(native, "DECODE_SO", native.DECODE_SO.parent / "nonexistent.so")
    # reset the memoized lib so get_decode_lib would attempt a (re)build
    monkeypatch.setattr(native, "_decode_lib", None)
    monkeypatch.setattr(native, "_decode_tried", False)
    path, w, h, fps, n = video
    out = read_video_segment(path, 1.0, 2.0, subsample_to=4)
    assert out.shape[0] > 0  # cv2 decoded it
    assert not built


def test_load_stale_so_without_build_permission(tmp_path, monkeypatch):
    """allow_build=False loads an existing (even stale) .so but never
    invokes the compiler — the forced-cv2 probe path."""
    import shutil

    assert native.DECODE_SO.exists()
    src = tmp_path / "vtc_decode.cpp"
    so = tmp_path / "lib.so"
    shutil.copy(native.DECODE_SRC, src)
    shutil.copy(native.DECODE_SO, so)
    # make the source newer than the .so (stale artifact)
    os.utime(src, (so.stat().st_mtime + 100, so.stat().st_mtime + 100))

    built = []
    monkeypatch.setattr(native, "_build", lambda *a, **kw: built.append(a) or False)
    lib = native._load(src, so, allow_build=False)
    assert lib is not None and not built
    # with permission, the same staleness triggers the build
    native._load(src, so, allow_build=True)
    assert built
