"""Pre-patchified (uint8 patch) input path ≡ the NCHW float path.

The patch fast path moves patch extraction to the host
(``data/preprocess.py:extract_patches``) and folds CLIP normalization into
the conv weights + positional embedding on device
(``models/clip_model.py:VisionTransformer``). These tests pin:

* host extraction produces (ph, pw, c)-ordered patch vectors;
* uint8 patches through the tower match host-normalized NCHW input;
* the retrieval models dispatch 3-D (image) / 4-D (video) patch inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.data.preprocess import CLIP_MEAN, CLIP_STD, extract_patches
from vtc_tpu.models import create_model
from vtc_tpu.models.clip_model import (
    CLIP_VARIANTS,
    VisionTransformer,
    hwc_col_perm,
    patch_input_dim,
)

VARIANT = CLIP_VARIANTS["test-tiny"]  # 32x32 images, patch 8 -> 16 patches


def _rand_uint8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _normalize_nchw(u8_hwc):
    x = u8_hwc.astype(np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return np.moveaxis(x, -1, -3)


def test_extract_patches_layout():
    img = _rand_uint8((1, 16, 16, 3))
    p = extract_patches(img, 8)
    assert p.shape == (1, 4, 192)
    # patch 1 is the top-right 8x8 block; vector order is (ph, pw, c)
    manual = img[0, :8, 8:16, :].reshape(-1)
    np.testing.assert_array_equal(p[0, 1], manual)


def test_hwc_col_perm_roundtrip():
    # applying the perm to a channel-major patch vector yields the hwc vector
    patch = 8
    u8 = _rand_uint8((patch, patch, 3))
    chan_major = u8.transpose(2, 0, 1).reshape(-1)  # (c, ph, pw)
    hwc = u8.reshape(-1)  # (ph, pw, c)
    np.testing.assert_array_equal(chan_major[hwc_col_perm(patch)], hwc)


def test_uint8_patches_match_nchw_tower():
    u8 = _rand_uint8((4,) + (VARIANT.input_resolution,) * 2 + (3,))
    tower = VisionTransformer(variant=VARIANT)
    variables = tower.init(
        jnp.asarray(np.random.default_rng(1).integers(0, 2**31 - 1, 2, np.uint32)),
        jnp.asarray(_normalize_nchw(u8)),
    )
    ref = tower.apply(variables, jnp.asarray(_normalize_nchw(u8)))
    got = tower.apply(
        variables, jnp.asarray(extract_patches(u8, VARIANT.patch_size))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    # float patches (already normalized, hwc order) also match
    f_patches = extract_patches(
        np.moveaxis(_normalize_nchw(u8), -3, -1), VARIANT.patch_size
    )
    got_f = tower.apply(variables, jnp.asarray(f_patches))
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref), atol=1e-5)


@pytest.fixture(scope="module")
def finaltf():
    return create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", seed=0
    )


def _tokens(shape, seed=3):
    rng = np.random.default_rng(seed)
    toks = np.zeros(shape + (8,), np.int32)
    toks[..., 0] = 49406
    toks[..., 1:4] = rng.integers(1, 49405, shape + (3,))
    toks[..., 4] = 49407
    return jnp.asarray(toks)


@pytest.mark.slow
def test_retrieval_dispatch_image_patches(finaltf):
    module, variables = finaltf
    u8 = _rand_uint8((3,) + (VARIANT.input_resolution,) * 2 + (3,), seed=5)
    title, comments = _tokens((3,)), _tokens((3, 2))
    ref = module.apply(
        variables, jnp.asarray(_normalize_nchw(u8)), title, comments
    )
    got = module.apply(
        variables,
        jnp.asarray(extract_patches(u8, VARIANT.patch_size)),
        title,
        comments,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_retrieval_dispatch_video_patches(finaltf):
    module, variables = finaltf
    u8 = _rand_uint8((2, 4) + (VARIANT.input_resolution,) * 2 + (3,), seed=7)
    title, comments = _tokens((2,)), _tokens((2, 2))
    ref = module.apply(
        variables, jnp.asarray(_normalize_nchw(u8)), title, comments
    )
    patches = extract_patches(u8, VARIANT.patch_size)
    assert patches.shape[-1] == patch_input_dim(VARIANT)
    got = module.apply(variables, jnp.asarray(patches), title, comments)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_timesformer_patch_input_matches_video():
    from vtc_tpu.models import create_model

    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type="test-tiny",
        nframes=4, seed=11,
    )
    u8 = _rand_uint8((2, 4) + (VARIANT.input_resolution,) * 2 + (3,), seed=13)
    title, comments = _tokens((2,)), _tokens((2, 2))
    ref = module.apply(
        variables, jnp.asarray(_normalize_nchw(u8)), title, comments
    )
    got = module.apply(
        variables,
        jnp.asarray(extract_patches(u8, VARIANT.patch_size)),
        title,
        comments,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_imtext_dataset_patch_images(tmp_path):
    """ImTextDataset(patch_images=...) ships host-extracted uint8 patches."""
    import pandas as pd
    from PIL import Image

    from vtc_tpu.data import ImTextDataset

    root = tmp_path / "media"
    (root / "vids").mkdir(parents=True)
    rng = np.random.default_rng(0)
    base36 = "0123456789abcdefghijklmnopqrstuvwxyz"
    rows = []
    for i in range(12):
        rid_str = "zz" + base36[i] + base36[(i * 5) % 36]
        rows.append({
            "reddit_id": int(rid_str, 36),
            "video_path": f"results/vids/{rid_str}.mp4",
            "title": f"t {i}",
            "video_length": 3.0,
            "comments": str(["a", "b", "c"]),
        })
        Image.fromarray(
            rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
        ).save(root / "vids" / f"{rid_str}.jpg")
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    ds = ImTextDataset(
        str(csv), str(root), train=False, test=True, add_comments="never",
        image_size=32, patch_images=8,
    )
    im = ds[0][0]
    assert im.dtype == np.uint8
    assert im.shape == ((32 // 8) ** 2, 8 * 8 * 3)
