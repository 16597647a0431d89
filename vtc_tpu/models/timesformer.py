"""TimeSformer video tower: divided space-time attention over CLIP ViT.

Faithful to the reference's primary ("alt") variant
(``model/timesformer_clip_alt.py:98-330``), which itself follows the official
TimeSformer: per block, temporal attention over the ``t`` frames at each
patch location (zero-initialized ``temporal_fc`` so the block starts as a
no-op), then spatial attention within each frame with the CLS token
replicated per frame and mean-reduced back, then the MLP.

Token layout after embedding matches the reference: ``[CLS, (patch_0 t_0..T),
(patch_1 t_0..T), ...]`` i.e. token index = 1 + n*T + t
(``timesformer_clip_alt.py:268-275``).

The divided attention is O(t^2·n + n^2·t) instead of O((tn)^2); both
attention phases are plain batched MHA reshapes, so XLA maps them straight
onto the MXU (t=8 temporal sequences batch as [b·n, t, m], spatial as
[b·t, n+1, m]).

Weight surgery: :func:`timesformer_params_from_clip_visual` copies a CLIP
visual tower's parameters and fresh-initializes only the ``time``/``temporal``
parameters, asserting exactly that key set is new — the JAX equivalent of the
reference's ``load_state_dict(strict=False)`` checks
(``timesformer_clip_alt.py:322-330``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_model import ClipVariant, embed_patches, patchify
from .layers import LayerNorm32, MLPBlock, MultiHeadAttention, use_fused_ln


class TimeSformerBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nframes: int):
        b, L, m = x.shape
        t = nframes
        n = (L - 1) // t

        fused_ln = use_fused_ln(self.dtype)
        patches = x[:, 1:].reshape(b, n, t, m)

        # Temporal attention per patch location (timesformer_clip_alt.py:141-149)
        xt = patches.reshape(b * n, t, m)
        # t=8 leaves 94% of the attention matmul lanes idle; auto batch-fold
        # packs 16 patch locations per call (layers.pick_seq_fold)
        timeattn = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, name="timeattn",
            seq_fold=0,
        )
        ln_time = LayerNorm32(name="ln_time")
        if fused_ln:
            res_t = timeattn(xt, ln_params=ln_time(xt, return_params=True))
        else:
            res_t = timeattn(ln_time(xt))
        res_t = res_t.reshape(b, n, t, m)
        # temporal_fc is zero-initialized UNCONDITIONALLY (the reference
        # zeroes weight+bias in VisualTransformer.__init__,
        # timesformer_clip_alt.py:246-250) so the divided block starts as a
        # no-op even without CLIP weight surgery
        res_t = nn.Dense(
            m, dtype=self.dtype, param_dtype=jnp.float32, name="temporal_fc",
            kernel_init=nn.initializers.zeros,
        )(res_t)
        xt = patches + res_t

        # Spatial attention per frame with replicated CLS
        # (timesformer_clip_alt.py:152-168)
        init_cls = x[:, :1]  # [b, 1, m]
        cls_rep = jnp.broadcast_to(init_cls[:, None], (b, t, 1, m)).reshape(
            b * t, 1, m
        )
        xs = jnp.swapaxes(xt, 1, 2).reshape(b * t, n, m)  # [(b t), n, m]
        xs = jnp.concatenate([cls_rep, xs], axis=1)
        spatial_attn = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, name="attn"
        )
        ln_1 = LayerNorm32(name="ln_1")
        if fused_ln:
            res_s = spatial_attn(xs, ln_params=ln_1(xs, return_params=True))
        else:
            res_s = spatial_attn(ln_1(xs))

        cls_out = res_s[:, 0].reshape(b, t, m)
        cls_out = jnp.mean(cls_out, axis=1, keepdims=True)  # averaged over frames
        res_s = res_s[:, 1:].reshape(b, t, n, m)
        res_s = jnp.swapaxes(res_s, 1, 2)  # [b, n, t, m]

        x = jnp.concatenate(
            [init_cls, xt.reshape(b, n * t, m)], axis=1
        ) + jnp.concatenate([cls_out, res_s.reshape(b, n * t, m)], axis=1)
        mlp = MLPBlock(self.width, dtype=self.dtype, name="mlp")
        ln_2 = LayerNorm32(name="ln_2")
        if fused_ln:
            x = x + mlp(x, ln_params=ln_2(x, return_params=True))
        else:
            x = x + mlp(ln_2(x))
        return x


class TimeSformer(nn.Module):
    """Drop-in visual tower: video [B, F, 3, H, W] or pre-patchified frames
    [B, F, N, p·p·3] (the uint8 patch fast path, see
    ``clip_model.embed_patches``) -> [B, embed_dim]."""

    variant: ClipVariant
    nframes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        v = self.variant
        width, patch = v.vision_width, v.patch_size
        scale = width**-0.5

        conv1 = self.param(
            "conv1", nn.initializers.normal(scale), (width, 3 * patch * patch),
            jnp.float32,
        )
        patch_bias = None
        if x.ndim == 4:  # pre-patchified [B, F, N, pd]
            B, F = x.shape[0], x.shape[1]
            xf, patch_bias = embed_patches(
                x.reshape((B * F,) + x.shape[2:]), conv1, patch, self.dtype
            )
        else:
            B, F, C, H, W = x.shape
            xf = patchify(x.reshape(B * F, C, H, W).astype(self.dtype), patch)
            xf = jnp.matmul(
                xf, conv1.astype(self.dtype).T,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)  # [(b f), n, width]
        n = xf.shape[1]

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,), jnp.float32
        )
        n_pos = (v.input_resolution // patch) ** 2 + 1
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale), (n_pos, width),
            jnp.float32,
        )
        temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros, (self.nframes, width),
            jnp.float32,
        )

        # Per-frame positional embedding on the patch tokens (the uint8
        # patch path's folded-normalization bias rides the same add)
        pos_patches = positional_embedding[1:]
        if patch_bias is not None:
            pos_patches = pos_patches + patch_bias[None, :]
        xf = xf + pos_patches.astype(self.dtype)

        # CLS token (content-independent at this point, so one per sample):
        # class_embedding + positional_embedding[0]
        # (timesformer_clip_alt.py:262-269)
        cls = (class_embedding + positional_embedding[0]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, width))

        # Temporal embedding; layout becomes [B, n*T + 1, m] with index
        # 1 + patch*T + frame (timesformer_clip_alt.py:268-275)
        xf = xf.reshape(B, F, n, width)
        xf = xf + temporal_embed[None, :, None, :].astype(self.dtype)
        xf = jnp.swapaxes(xf, 1, 2).reshape(B, n * F, width)
        xx = jnp.concatenate([cls, xf], axis=1)

        from .layers import use_remat

        xx = LayerNorm32(name="ln_pre")(xx)
        pp_out = None
        if not self.is_initializing():
            # config-selected pipeline stages over the divided-attention
            # stack (train.py --pp -> parallel.stack.set_stack_parallel)
            from ..parallel.stack import (
                stack_parallel_mode,
                timesformer_stack_override,
            )

            if stack_parallel_mode() is not None:
                pp_out = timesformer_stack_override(self, xx, F)
        if pp_out is not None:
            xx = pp_out
        else:
            block_cls = TimeSformerBlock
            if use_remat():
                block_cls = nn.remat(TimeSformerBlock, static_argnums=(2,))
            for i in range(v.vision_layers):
                xx = block_cls(
                    width, v.vision_heads, dtype=self.dtype,
                    name=f"transformer_resblocks_{i}",
                )(xx, F)
        xx = LayerNorm32(name="ln_post")(xx[:, 0])

        proj = self.param(
            "proj", nn.initializers.normal(scale), (width, v.embed_dim), jnp.float32
        )
        return jnp.matmul(
            xx, proj.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)


def _trunc_normal(rng, shape, std=0.02):
    """torch.nn.init.trunc_normal_(std=std): the default [a, b] = [-2, 2]
    bounds are ABSOLUTE values, not sigmas — at std=0.02 that is ±100σ,
    i.e. an effectively untruncated normal. jax's truncated_normal takes
    σ-unit bounds, so divide by std."""
    bound = 2.0 / std
    return std * jax.random.truncated_normal(rng, -bound, bound, shape).astype(
        np.float32
    )


def timesformer_params_from_clip_visual(
    clip_visual_params: dict,
    variant: ClipVariant,
    nframes: int = 8,
    seed: int = 0,
) -> dict:
    """CLIP -> TimeSformer weight surgery (``timesformer_clip_alt.py:289-330``).

    Copies every CLIP visual parameter; the only new parameters are the
    time/temporal ones: ``timeattn`` (trunc-normal weights, zero biases, like
    the reference's ``Attention.__init__``), ``ln_time`` (identity),
    ``temporal_fc`` (zeros — the divided block starts as a no-op) and
    ``temporal_embed`` (zeros).
    """
    rng = jax.random.PRNGKey(seed)
    src = jax.tree_util.tree_map(np.asarray, clip_visual_params)
    out = {
        "conv1": src["conv1"],
        "class_embedding": src["class_embedding"],
        "positional_embedding": src["positional_embedding"],
        "temporal_embed": np.zeros((nframes, variant.vision_width), np.float32),
        "ln_pre": src["ln_pre"],
        "ln_post": src["ln_post"],
        "proj": src["proj"],
    }
    width = variant.vision_width
    new_keys = {"temporal_embed"}
    for i in range(variant.vision_layers):
        blk = src["transformer"][f"resblocks_{i}"]
        rng, k1, k2 = jax.random.split(rng, 3)
        out[f"transformer_resblocks_{i}"] = {
            "attn": blk["attn"],
            "ln_1": blk["ln_1"],
            "mlp": blk["mlp"],
            "ln_2": blk["ln_2"],
            "timeattn": {
                "in_proj_weight": np.asarray(
                    _trunc_normal(k1, (3, width, width))
                ),
                "in_proj_bias": np.zeros((3, width), np.float32),
                "out_proj": {
                    "kernel": np.asarray(_trunc_normal(k2, (width, width))),
                    "bias": np.zeros((width,), np.float32),
                },
            },
            "ln_time": {
                "scale": np.ones((width,), np.float32),
                "bias": np.zeros((width,), np.float32),
            },
            "temporal_fc": {
                "kernel": np.zeros((width, width), np.float32),
                "bias": np.zeros((width,), np.float32),
            },
        }
        new_keys |= {
            f"transformer_resblocks_{i}/{k}"
            for k in ("timeattn", "ln_time", "temporal_fc")
        }
    # the reference asserts all missing keys are time/temporal ones
    # (timesformer_clip_alt.py:325-328); the construction above guarantees it
    assert all("time" in k or "temporal" in k for k in new_keys)
    return out
