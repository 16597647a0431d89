"""Tokenizer / RAKE / preprocessing tests."""

import numpy as np
import pytest
from PIL import Image

from vtc_tpu.data import tokenizer as tk
from vtc_tpu.data.rake import Rake


def test_special_token_ids():
    tok = tk.get_tokenizer()
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407
    assert len(tok.encoder) == tk.VOCAB_SIZE


def test_empty_string_invariant():
    # Empty string must tokenize to [sot, eot, 0, ...]: position 1 == 49407
    # drives the CAM mask-embedding substitution (model/model.py:207-212).
    out = tk.tokenize("")
    assert out.shape == (1, 77)
    assert out[0, 0] == 49406 and out[0, 1] == 49407
    assert (out[0, 2:] == 0).all()


def test_roundtrip_decode():
    tok = tk.get_tokenizer()
    ids = tok.encode("hello world")
    assert len(ids) > 0
    text = tok.decode(ids)
    assert "hello" in text and "world" in text


def test_tokenize_overlong_raises_and_truncates():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tk.tokenize(long_text)
    out = tk.tokenize(long_text, truncate=True)
    assert out.shape == (1, 77)
    assert out[0, -1] == 49407


def test_tokenize_max_len_always_truncates():
    long_text = "word " * 200
    out = tk.tokenize_max_len([long_text, "short"])
    assert out.shape == (2, 77)
    assert out[0, -1] == 49407
    assert out[1, 0] == 49406


def test_tokenize_batch_and_determinism():
    a = tk.tokenize(["a cat", "a dog"])
    b = tk.tokenize(["a cat", "a dog"])
    assert (a == b).all()
    assert a.shape == (2, 77)
    assert (a[0] != a[1]).any()


def test_rake_extracts_content_phrases():
    r = Rake()
    r.extract_keywords_from_text(
        "The quick brown fox jumps over the lazy dog while eating delicious "
        "red apples in the garden"
    )
    phrases = r.get_ranked_phrases()
    assert len(phrases) > 0
    joined = " ".join(phrases)
    assert "fox" in joined or "quick brown" in joined
    # stopwords never appear as phrases
    assert all(p not in ("the", "over", "while", "in") for p in phrases)


def test_clip_preprocess_shapes_and_norm():
    from vtc_tpu.data.preprocess import CLIP_MEAN, CLIP_STD, clip_preprocess

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (320, 480, 3), dtype=np.uint8)
    )
    out = clip_preprocess(img)
    assert out.shape == (3, 224, 224)
    assert out.dtype == np.float32
    # a uniform white image maps exactly to (1-mean)/std
    white = Image.fromarray(np.full((300, 300, 3), 255, dtype=np.uint8))
    out_w = clip_preprocess(white)
    expected = ((1.0 - CLIP_MEAN) / CLIP_STD).astype(np.float32)
    np.testing.assert_allclose(out_w[:, 0, 0], expected, rtol=1e-5)


def test_clip_preprocess_device_matches_host_on_square():
    import jax

    from vtc_tpu.data.preprocess import clip_preprocess_device, clip_preprocess_frames

    frames = np.random.default_rng(1).integers(
        0, 255, (2, 224, 224, 3), dtype=np.uint8
    )
    host = clip_preprocess_frames(frames)
    dev = np.asarray(jax.jit(clip_preprocess_device)(frames))
    np.testing.assert_allclose(host, dev, atol=1e-2)


def test_augment_frames_shared_across_time():
    from vtc_tpu.data.preprocess import augment_frames

    rng = np.random.default_rng(7)
    frames = np.tile(
        np.random.default_rng(2).integers(0, 255, (1, 300, 400, 3), dtype=np.uint8),
        (8, 1, 1, 1),
    )
    out = augment_frames(frames, rng)
    assert out.shape == (8, 256, 256, 3)
    # identical input frames stay identical after the shared transform
    assert (out[0] == out[5]).all()


def test_truncate_to_eot_bucket_preserves_embeddings():
    import jax.numpy as jnp

    from vtc_tpu.models import create_model

    toks = tk.tokenize(["a short text", "slightly longer text about things"])
    trunc = tk.truncate_to_eot_bucket(toks)
    assert trunc.shape[-1] < 77  # (exact bucket depends on the vocab)
    assert (trunc[:, 0] == 49406).all()

    module, variables = create_model("PretrainedCLIP", model_type="test-tiny")
    full = module.apply(
        variables, jnp.asarray(toks), method="encode_text"
    )
    short = module.apply(
        variables, jnp.asarray(trunc), method="encode_text"
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(short), atol=1e-5
    )


def test_truncate_batch_tokens_common_bucket():
    from vtc_tpu.data.tokenizer import truncate_batch_tokens

    title = np.zeros((4, 77), np.int32)
    title[:, 0] = 49406
    title[:, 5] = 49407  # EOT at 5 -> needs 6
    comments = np.zeros((4, 3, 77), np.int32)
    comments[..., 0] = 49406
    comments[..., 20] = 49407  # needs 21 -> bucket 32
    vis = np.zeros((4, 3, 8, 8), np.float32)

    out = truncate_batch_tokens([vis, title, comments])
    assert out[0].shape == vis.shape  # non-token member untouched
    # one COMMON bucket across all token arrays
    assert out[1].shape == (4, 32) and out[2].shape == (4, 3, 32)
    np.testing.assert_array_equal(out[1], title[:, :32])


def test_trainer_eot_truncation_is_exact():
    """A train step on truncated tokens must produce the same loss as on the
    full 77-token batch (causal tower + EOT pooling never read past EOT)."""
    import jax
    import jax.numpy as jnp

    from vtc_tpu.data.tokenizer import truncate_batch_tokens
    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", seed=0,
        random_skip_adapter=False,
    )
    rng = np.random.default_rng(3)
    vis = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    title = np.zeros((4, 77), np.int32)
    title[:, 0] = 49406
    title[:, 1:9] = rng.integers(1, 49000, (4, 8))
    title[:, 9] = 49407
    comments = np.zeros((4, 2, 77), np.int32)
    comments[..., 0] = 49406
    comments[..., 1] = 49407

    def loss_of(data):
        out = module.apply(variables, *[jnp.asarray(d) for d in data])
        return float(clip_loss(out, {}))

    full = loss_of([vis, title, comments])
    trunc = loss_of(truncate_batch_tokens([vis, title, comments]))
    np.testing.assert_allclose(trunc, full, rtol=1e-6)


def test_rand_resized_crop_fallback_clamps_to_ratio_range():
    """torchvision RandomResizedCrop's 10-attempt fallback crops the largest
    region CLAMPED to the ratio range, not a square (extreme-aspect video)."""
    from vtc_tpu.data.preprocess import _rand_resized_crop_params

    rng = np.random.default_rng(0)
    # 2.87:1 source with scale>=0.999: every attempt fails
    top, left, ch, cw = _rand_resized_crop_params(
        rng, 300, 860, scale=(0.999, 1.0)
    )
    assert (ch, cw) == (300, 400)  # 4/3-clamped, not 300x300
    assert top == 0 and left == (860 - 400) // 2


def test_color_jitter_each_op_uses_current_grayscale():
    """At saturation->0 the output must collapse to the grayscale of the
    CURRENT image at that point in the op order, never cancel an adjustment
    that ran before it (the stale-gray bug collapsed to the PRE-contrast
    grayscale, partially undoing contrast)."""
    from vtc_tpu.data.preprocess import _apply_color_jitter

    rng = np.random.default_rng(5)
    img = np.linspace(0, 1, 4 * 4 * 3, dtype=np.float32).reshape(1, 4, 4, 3)
    out = _apply_color_jitter(img.copy(), rng, hue=0.0)
    assert out.shape == img.shape and (0 <= out).all() and (out <= 1).all()
    # property: with per-op gray, a saturated-to-gray image has all three
    # channels equal wherever saturation was the LAST op; we can't control
    # the order draw, so instead verify the op algebra directly:
    luma = np.array([0.299, 0.587, 0.114], np.float32)
    a = np.clip(img * 1.4, 0, 1)  # post-brightness image
    g = (a @ luma)[..., None]
    sat0 = np.clip((a - g) * 0.0 + g, 0, 1)
    # collapsing to gray of the CURRENT (post-brightness) image keeps the
    # brightness shift; the stale-gray version would return the
    # pre-brightness grayscale
    pre_g = (img @ luma)[..., None]
    assert not np.allclose(sat0, np.broadcast_to(pre_g, sat0.shape))
    np.testing.assert_allclose(
        sat0, np.broadcast_to(g, sat0.shape), atol=1e-6
    )
