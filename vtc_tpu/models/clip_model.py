"""CLIP dual encoder (ViT image tower + causal text tower) in JAX/flax.

Architecture matches openai CLIP ViT-B/32|B/16|L/14 (the reference consumes
it via ``clip.load``, ``model/model.py:317,392``): patch embedding as a
strided conv — implemented here as reshape + one MXU matmul, which is the
TPU-native lowering — class/positional embeddings, pre-LN transformer with
QuickGELU, ln_post + projection on the image side; token/positional
embeddings, causally-masked transformer, ln_final + EOT pooling + projection
on the text side; learned ``logit_scale``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm32, Transformer, causal_mask, ln_dense, use_fused_ln


@dataclasses.dataclass(frozen=True)
class ClipVariant:
    input_resolution: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408


CLIP_VARIANTS = {
    "ViT-B/32": ClipVariant(),
    "ViT-B/16": ClipVariant(patch_size=16),
    "ViT-L/14": ClipVariant(
        patch_size=14,
        vision_width=1024,
        vision_layers=24,
        vision_heads=16,
        embed_dim=768,
    ),
    # miniature variant for CPU tests and multi-chip dry runs
    "test-tiny": ClipVariant(
        input_resolution=32,
        patch_size=8,
        vision_width=64,
        vision_layers=2,
        vision_heads=4,
        embed_dim=32,
        text_width=64,
        text_layers=2,
        text_heads=4,
        vocab_size=49408,
    ),
}


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """[B, 3, H, W] -> [B, gh*gw, 3*p*p] with channel-major patch vectors,
    matching a torch Conv2d(OIHW) weight flattened as ``W.reshape(out, -1)``."""
    b, c, h, w = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # b gh gw c p p
    return x.reshape(b, gh * gw, c * patch * patch)


def hwc_col_perm(patch: int) -> np.ndarray:
    """Column permutation taking the channel-major (c, ph, pw) conv1 weight
    to the (ph, pw, c) pixel order of host-extracted patches
    (``data/preprocess.py:extract_patches``). Permuting the loop-invariant
    weight instead of the per-batch activations keeps the device trace free
    of data relayouts."""
    idx = np.arange(3 * patch * patch).reshape(3, patch, patch)
    return idx.transpose(1, 2, 0).reshape(-1)


def patch_input_dim(variant: "ClipVariant") -> int:
    return 3 * variant.patch_size * variant.patch_size


def embed_patches(x, conv1, patch: int, dtype):
    """Pre-patchified input [..., N, p·p·3] (hwc pixel order, uint8 or
    normalized float) -> ([..., N, width] embeddings, bias_or_None).

    uint8 pixels get CLIP normalization folded into the conv weights: the
    per-position-constant bias is returned for the caller to fold into its
    positional-embedding add (zero extra elementwise passes). Shared by the
    image tower and the TimeSformer."""
    from ..data.preprocess import CLIP_MEAN, CLIP_STD

    w = conv1[:, jnp.asarray(hwc_col_perm(patch))]  # [width, pd]
    patch_bias = None
    if jnp.issubdtype(x.dtype, jnp.integer):
        # normalized = u·a + b with a = 1/(255·std), b = -mean/std per
        # column; fold a into the weight and b@Wᵀ into the bias. uint8
        # values 0..255 are exact in bf16.
        std_vec = jnp.asarray(np.tile(CLIP_STD, patch * patch))
        mean_vec = jnp.asarray(np.tile(CLIP_MEAN, patch * patch))
        a = 1.0 / (255.0 * std_vec)
        b = -mean_vec / std_vec
        patch_bias = b @ w.T  # fp32 [width], loop-invariant
        w = w * a[None, :]
    out = jnp.matmul(
        x.astype(dtype), w.astype(dtype).T,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return out, patch_bias


class VisionTransformer(nn.Module):
    """CLIP visual tower.

    Accepts either NCHW images ``[B, 3, H, W]`` (CLIP-normalized float) or
    pre-patchified input ``[B, N, p·p·3]`` from
    ``data/preprocess.py:extract_patches`` — uint8 raw pixels (CLIP
    normalization is folded into the conv weights and positional embedding,
    so the whole patch embed is ONE matmul with no elementwise pass) or
    float already-normalized patches. The patch path removes the NCHW
    relayout copies and the patchify transpose from the device trace.
    """

    variant: ClipVariant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        v = self.variant
        width, patch = v.vision_width, v.patch_size
        scale = width**-0.5

        # Patch embedding: conv(stride=kernel) == reshape + matmul on the MXU.
        conv1 = self.param(
            "conv1",
            nn.initializers.normal(scale),
            (width, 3 * patch * patch),
            jnp.float32,
        )
        patch_bias = None  # folded-normalization bias, rides the pos-embed add
        if x.ndim == 3:
            # pre-patchified [B, N, p·p·3] in (ph, pw, c) pixel order: permute
            # the loop-invariant WEIGHT columns to match (never the data)
            x, patch_bias = embed_patches(x, conv1, patch, self.dtype)
        else:
            x = patchify(x.astype(self.dtype), patch)
            x = jnp.matmul(
                x, conv1.astype(self.dtype).T, preferred_element_type=jnp.float32
            ).astype(self.dtype)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,), jnp.float32
        )
        n_pos = (v.input_resolution // patch) ** 2 + 1
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (n_pos, width),
            jnp.float32,
        )

        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (x.shape[0], 1, width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        pos = positional_embedding
        if patch_bias is not None:
            # the normalization bias is constant per patch position — fold it
            # into the positional embedding (row 0 is CLS: no patch bias)
            pos = pos.at[1:].add(patch_bias[None, :])
        x = x + pos.astype(self.dtype)

        x = LayerNorm32(name="ln_pre")(x)
        x = Transformer(
            width, v.vision_layers, v.vision_heads, dtype=self.dtype,
            name="transformer",
        )(x)

        proj = self.param(
            "proj", nn.initializers.normal(scale), (width, v.embed_dim), jnp.float32
        )
        if use_fused_ln(self.dtype):
            ln_scale, ln_bias = LayerNorm32(name="ln_post")(
                x, return_params=True
            )
            return ln_dense(x[:, 0, :], ln_scale, ln_bias, proj, None)
        x = LayerNorm32(name="ln_post")(x[:, 0, :])
        return jnp.matmul(
            x, proj.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)


class TextTransformer(nn.Module):
    """CLIP text tower with causal masking and EOT pooling."""

    variant: ClipVariant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text):
        v = self.variant
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (v.vocab_size, v.text_width),
            jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (v.context_length, v.text_width),
            jnp.float32,
        )

        # jnp.take handles numpy-backed params indexed by traced token ids
        x = jnp.take(
            jnp.asarray(token_embedding), text, axis=0
        ).astype(self.dtype)
        x = x + positional_embedding[: text.shape[-1]].astype(self.dtype)
        mask = causal_mask(text.shape[-1])
        x = Transformer(
            v.text_width, v.text_layers, v.text_heads, dtype=self.dtype,
            name="transformer",
        )(x, mask)

        # EOT pooling BEFORE ln_final: LayerNorm is per-token, so gathering
        # the EOT row first is mathematically identical and skips normalizing
        # the L-1 unused positions. (EOT = highest id in the vocab.)
        eot_idx = jnp.argmax(text, axis=-1)
        x = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]

        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(v.text_width**-0.5),
            (v.text_width, v.embed_dim),
            jnp.float32,
        )
        if use_fused_ln(self.dtype):
            ln_scale, ln_bias = LayerNorm32(name="ln_final")(
                x, return_params=True
            )
            return ln_dense(x, ln_scale, ln_bias, text_projection, None)
        x = LayerNorm32(name="ln_final")(x)
        return jnp.matmul(
            x, text_projection.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)


class ClipModel(nn.Module):
    """Dual encoder. ``visual_module`` may be overridden (the TimeSformer
    models swap the visual tower, ``model/model.py:488,557``)."""

    variant: ClipVariant
    dtype: jnp.dtype = jnp.float32
    visual_module: Optional[type] = None
    visual_kwargs: Optional[dict] = None

    def setup(self):
        vis_cls = self.visual_module or VisionTransformer
        kwargs = dict(self.visual_kwargs or {})
        self.visual = vis_cls(variant=self.variant, dtype=self.dtype, **kwargs)
        self.text = TextTransformer(variant=self.variant, dtype=self.dtype)
        # CLIP init: log(1/0.07)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1 / 0.07), jnp.float32),
            (),
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, text):
        return self.text(text)

    def __call__(self, images, text):
        return self.encode_image(images), self.encode_text(text), self.logit_scale
