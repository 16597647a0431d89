"""Image / frame preprocessing.

Host side: CLIP's canonical transform (bicubic resize of the short side to
224, center crop, scale to [0,1], normalize with the CLIP mean/std) matching
``CLIP_TRANSFORM`` in the reference (``dataset_loaders/dataset_loaders.py:40-49``),
plus the train-time augmentations ``IMG_AUG``/``VIDEO_AUG``
(``dataset_loaders.py:51-80``): random resized crop to 256, horizontal flip,
color jitter — applied identically across the frames of a video.

Device side: a batched jax version of the deterministic transform for the
TPU eval fast path (decode on host, resize/normalize fused on device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)
IG65M_MEAN = np.array([0.43216, 0.394666, 0.37645], dtype=np.float32)
IG65M_STD = np.array([0.22803, 0.22145, 0.216989], dtype=np.float32)


def _resize_short_side(img: Image.Image, size: int) -> Image.Image:
    # torchvision's Resize computes the long side with int() truncation
    # (functional_pil.resize: oh = int(size * h / w)); rounding instead
    # shifts the resample grid by 1px on ~half of all aspect ratios and
    # changes every pixel of the crop vs the reference CLIP_TRANSFORM
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(h * size / w))
    else:
        new_w, new_h = max(1, int(w * size / h)), size
    return img.resize((new_w, new_h), Image.BICUBIC)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def clip_preprocess(img: Image.Image, size: int = 224) -> np.ndarray:
    """PIL image -> float32 [3, size, size] CLIP-normalized tensor."""
    img = img.convert("RGB")
    img = _resize_short_side(img, size)
    img = _center_crop(img, size)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)


def clip_resize_uint8(img: Image.Image, size: int = 224) -> np.ndarray:
    """PIL image -> uint8 [size, size, 3]: the host half of the uint8
    transfer path (resize+crop here, normalize on device via
    ``normalize_uint8_images``)."""
    img = img.convert("RGB")
    img = _resize_short_side(img, size)
    img = _center_crop(img, size)
    return np.asarray(img, dtype=np.uint8)


def clip_preprocess_frames(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [t, h, w, c] -> float32 [t, 3, size, size] via per-frame PIL path
    (matches the reference's frame loop, ``dataset_loaders.py:540-541``)."""
    return np.stack(
        [clip_preprocess(Image.fromarray(frame)) for frame in frames]
    )


def extract_patches(images: np.ndarray, patch: int) -> np.ndarray:
    """[..., H, W, 3] -> [..., (H//p)·(W//p), p·p·3] pixel patches.

    Host half of the patch-input fast path: the ViT's patch embedding is a
    stride-p conv, i.e. a matmul over flattened patches — extracting the
    patches on host hands the device an operand that is *already* in matmul
    layout, so the NCHW relayout `copy` and the 6-D `transpose` disappear
    from the device trace entirely (they were 26% of the eval step,
    PERFORMANCE.md round 2). Works on uint8 (preferred: 4x fewer transfer
    bytes; the device folds CLIP normalization into the conv weights) or
    float. Patch vectors are in (ph, pw, c) pixel order — the device side
    (``models/clip_model.py:hwc_col_perm``) permutes the conv columns to
    match, not the data.
    """
    *lead, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(*lead, gh, patch, gw, patch, c)
    x = np.moveaxis(x, -3, -4)  # [..., gh, gw, p, p, c]
    return np.ascontiguousarray(
        x.reshape(*lead, gh * gw, patch * patch * c)
    )


# --------------------------------------------------------------------------
# Train-time augmentations (host side, numpy RNG for reproducibility)
# --------------------------------------------------------------------------


def _rand_resized_crop_params(
    rng: np.random.Generator,
    h: int,
    w: int,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
):
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    # fallback (torchvision RandomResizedCrop): center crop CLAMPED to the
    # ratio range — extreme-aspect sources crop the largest in-ratio region,
    # not a square
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = min(h, int(round(cw / ratio[0])))
    elif in_ratio > ratio[1]:
        ch = h
        cw = min(w, int(round(ch * ratio[1])))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def _apply_color_jitter(
    arr: np.ndarray, rng: np.random.Generator, hue: float
) -> np.ndarray:
    """Brightness/contrast/saturation (0.4) + optional hue jitter on float
    [*, h, w, 3] in [0,1]; one draw shared across frames.

    torchvision ColorJitter semantics: the enabled adjustments run in a
    RANDOM order per call (the ops don't commute — each clips and
    contrast/saturation depend on the current image), and each computes its
    grayscale target from the CURRENT image, not a cached one."""
    b = rng.uniform(0.6, 1.4)
    c = rng.uniform(0.6, 1.4)
    s = rng.uniform(0.6, 1.4)
    luma = np.array([0.299, 0.587, 0.114], dtype=np.float32)

    def _brightness(a):
        return np.clip(a * b, 0, 1)

    def _contrast(a):
        mean = (a @ luma).mean()
        return np.clip((a - mean) * c + mean, 0, 1)

    def _saturation(a):
        g = (a @ luma)[..., None]
        return np.clip((a - g) * s + g, 0, 1)

    def _hue(a):
        dh = rng.uniform(-hue, hue)
        # cheap hue rotation in YIQ space
        cos_h, sin_h = np.cos(2 * np.pi * dh), np.sin(2 * np.pi * dh)
        t_yiq = np.array(
            [[0.299, 0.587, 0.114], [0.596, -0.274, -0.321], [0.211, -0.523, 0.311]],
            dtype=np.float32,
        )
        t_rgb = np.linalg.inv(t_yiq)
        rot = np.array(
            [[1, 0, 0], [0, cos_h, -sin_h], [0, sin_h, cos_h]], dtype=np.float32
        )
        arr = np.clip(a @ (t_rgb @ rot @ t_yiq).T, 0, 1)
        return arr

    ops = [_brightness, _contrast, _saturation]
    if hue > 0:
        ops.append(_hue)
    for i in rng.permutation(len(ops)):
        arr = ops[int(i)](arr)
    return arr


def augment_frames(
    frames: np.ndarray,
    rng: Optional[np.random.Generator] = None,
    out_size: int = 256,
) -> np.ndarray:
    """VIDEO_AUG equivalent: uint8 [t, h, w, c] -> uint8 [t, out, out, c].

    One random resized crop / flip / jitter draw applied identically to every
    frame (torchvision batch-transform semantics, ``dataset_loaders.py:64-80``).
    """
    rng = rng or np.random.default_rng()
    t, h, w, c = frames.shape
    top, left, ch, cw = _rand_resized_crop_params(rng, h, w)
    cropped = frames[:, top : top + ch, left : left + cw]
    resized = np.stack(
        [
            np.asarray(
                Image.fromarray(f).resize((out_size, out_size), Image.BILINEAR)
            )
            for f in cropped
        ]
    )
    if rng.random() < 0.5:
        resized = resized[:, :, ::-1]
    hue = 0.1 if rng.random() < 0.5 else 0.0
    arr = resized.astype(np.float32) / 255.0
    arr = _apply_color_jitter(arr, rng, hue)
    return (arr * 255.0).astype(np.uint8)


def augment_image(
    img: Image.Image, rng: Optional[np.random.Generator] = None
) -> Image.Image:
    """IMG_AUG equivalent for a single PIL image (``dataset_loaders.py:51-62``)."""
    rng = rng or np.random.default_rng()
    arr = np.asarray(img.convert("RGB"))[None]
    out = augment_frames(arr, rng)[0]
    return Image.fromarray(out)


# --------------------------------------------------------------------------
# Device-side batched transform (jax)
# --------------------------------------------------------------------------


def normalize_uint8_images(x, mean=CLIP_MEAN, std=CLIP_STD):
    """Pass-through for non-image-like inputs; uint8 [..., h, w, 3] frames
    become CLIP-normalized float32 [..., 3, h, w] on device.

    This is the device half of the uint8-transfer path: datasets resize on
    host but keep uint8 HWC (4x fewer host->device bytes than fp32 CHW),
    and the jitted step normalizes — same arithmetic as ``clip_preprocess``
    on the already-resized frame, so results are bit-identical.
    """
    import jax.numpy as jnp

    if not (
        hasattr(x, "dtype")
        and x.dtype == jnp.uint8
        and x.ndim >= 3
        and x.shape[-1] == 3
    ):
        return x
    y = x.astype(jnp.float32) / 255.0
    y = (y - jnp.asarray(mean)) / jnp.asarray(std)
    return jnp.moveaxis(y, -1, -3)


def clip_preprocess_device(frames, size: int = 224):
    """Batched CLIP transform on device: uint8 [..., h, w, 3] -> float32
    [..., 3, size, size]. Short-side resize is approximated by a direct
    bicubic resize when aspect ratio is square (the host decode path already
    produces near-square frames); otherwise crop-to-square then resize.

    Runs under jit: resize + normalize fuse into one XLA kernel.
    """
    import jax.numpy as jnp
    from jax import image as jimage

    x = frames.astype(jnp.float32) / 255.0
    h, w = x.shape[-3], x.shape[-2]
    if h != w:
        side = min(h, w)
        top = (h - side) // 2
        left = (w - side) // 2
        x = x[..., top : top + side, left : left + side, :]
    batch_shape = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    x = jimage.resize(
        x, (x.shape[0], size, size, 3), method="bicubic", antialias=True
    )
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    x = jnp.moveaxis(x, -1, -3)
    return x.reshape(batch_shape + (3, size, size))
