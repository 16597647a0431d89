"""Native preprocessing library: builds, matches the PIL reference path, and
is faster on batches."""

import time

import numpy as np
import pytest

from vtc_tpu.data.native import (
    clip_preprocess_frames_fast,
    native_available,
    resize_batch_fast,
)
from vtc_tpu.data.preprocess import clip_preprocess_frames


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (8, 300, 400, 3), dtype=np.uint8)


def test_native_builds():
    assert native_available(), "g++ build of libvtc_preproc.so failed"


def test_native_matches_pil(frames):
    if not native_available():
        pytest.skip("no native lib")
    ref = clip_preprocess_frames(frames)
    fast = clip_preprocess_frames_fast(frames)
    assert fast.shape == ref.shape == (8, 3, 224, 224)
    # bit-exact with PIL (the native resampler replicates PIL's fixed-point
    # two-pass arithmetic), up to float32 normalize rounding
    assert np.abs(fast - ref).max() < 1e-5


def test_native_resize_matches_pil(frames):
    if not native_available():
        pytest.skip("no native lib")
    from PIL import Image

    ref = np.stack(
        [
            np.asarray(Image.fromarray(f).resize((256, 256), Image.BILINEAR))
            for f in frames
        ]
    )
    fast = resize_batch_fast(frames, 256, 256, bilinear=True)
    assert fast.shape == ref.shape
    np.testing.assert_array_equal(fast, ref)  # bit-exact


def test_native_faster_than_pil():
    if not native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 255, (32, 360, 640, 3), dtype=np.uint8)

    clip_preprocess_frames_fast(batch[:2])  # warm the lib
    t0 = time.perf_counter()
    clip_preprocess_frames(batch)
    t_pil = time.perf_counter() - t0
    t0 = time.perf_counter()
    clip_preprocess_frames_fast(batch)
    t_native = time.perf_counter() - t0
    # threaded native path should win comfortably; assert a modest margin to
    # stay robust on loaded CI machines
    assert t_native < t_pil, (t_native, t_pil)
