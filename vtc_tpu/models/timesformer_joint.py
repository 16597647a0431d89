"""TimeSformer, joint-token-layout variant (the reference's *first*
factorization, ``model/timesformer_clip.py:55-467`` — kept in the codebase
but not used by any exported model; provided here for capability parity).

Token layout: ``[CLS, f1p1..f1pP, f2p1..f2pP, ...]`` (frame-major). Each
block runs, pre-LN residual style:

1. **TimeAttention**: patch tokens attend across time at their own patch
   position, plus the CLS token; CLS attends to everything. Zero/identity
   init (in_proj zero, out_proj weight = all-ones matrix) so the block starts
   as a scaled passthrough of v=0 -> exact no-op.
2. **SpaceAttention**: patch tokens attend within their frame plus CLS; CLS
   attends to everything.
3. MLP.

Positional embedding is tiled over time; the temporal embedding is
interleaved over space (``timesformer_clip.py:405-423``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_model import ClipVariant, patchify
from .layers import LayerNorm32, MLPBlock


def _attn(q, k, v):
    logits = jnp.matmul(q, jnp.swapaxes(k, -1, -2),
                        preferred_element_type=jnp.float32)
    a = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.matmul(a, v, preferred_element_type=jnp.float32).astype(q.dtype)


class _FactorizedAttention(nn.Module):
    """Shared space/time factorized attention; ``mode`` picks which axis the
    patch tokens attend over."""

    embed_dim: int
    num_heads: int
    nframes: int
    mode: str  # "space" | "time"
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        e, h, t = self.embed_dim, self.num_heads, self.nframes
        head_dim = e // h
        b, L, _ = x.shape
        n = (L - 1) // t  # patches per frame

        if self.zero_init:
            w_init = nn.initializers.zeros
            out_init = nn.initializers.ones  # constant_(out_proj.weight, 1.0)
        else:
            # torch applies xavier_uniform_ to the FLAT [3E, E] matrix
            # (fan_in=E, fan_out=3E -> bound sqrt(6/4E),
            # timesformer_clip.py:233-236); flax's xavier on the explicit
            # (3, E, E) shape would treat the 3 as receptive field
            # (fan=3E both ways -> bound sqrt(6/6E), ~18% smaller)
            def w_init(key, shape, dtype=jnp.float32):
                fan_in, fan_out = shape[-1], 3 * shape[-1]
                bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            out_init = nn.initializers.lecun_normal()

        in_proj_weight = self.param(
            "in_proj_weight", w_init, (3, e, e), jnp.float32
        )
        in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3, e), jnp.float32
        )

        from .layers import qkv_project

        q, k, v = qkv_project(
            x, in_proj_weight, in_proj_bias, self.dtype, num_heads=h
        )

        def heads(z):  # [b, L, e] -> [b*h, L, hd]
            z = z.reshape(b, L, h, head_dim)
            return jnp.moveaxis(z, 2, 1).reshape(b * h, L, head_dim)

        q = heads(q) * (head_dim**-0.5)
        k = heads(k)
        v = heads(v)

        q_cls = q[:, :1]
        k_cls = k[:, :1]
        v_cls = v[:, :1]

        cls_out = _attn(q_cls, k, v)  # CLS attends to all tokens

        def group(z):
            z = z[:, 1:].reshape(b * h, t, n, head_dim)
            if self.mode == "space":
                return z.reshape(b * h * t, n, head_dim)
            z = jnp.swapaxes(z, 1, 2)  # [b*h, n, t, hd]
            return z.reshape(b * h * n, t, head_dim)

        rows = b * h * (t if self.mode == "space" else n)
        qg = group(q)
        kg = group(k)
        vg = group(v)

        rep = rows // (b * h)
        k_cls_r = jnp.repeat(k_cls, rep, axis=0)
        v_cls_r = jnp.repeat(v_cls, rep, axis=0)
        kg = jnp.concatenate([k_cls_r, kg], axis=1)
        vg = jnp.concatenate([v_cls_r, vg], axis=1)

        out = _attn(qg, kg, vg)  # [rows, n|t, hd]

        if self.mode == "space":
            out = out.reshape(b * h, t, n, head_dim)
        else:
            out = jnp.swapaxes(out.reshape(b * h, n, t, head_dim), 1, 2)
        out = out.reshape(b * h, t * n, head_dim)
        out = jnp.concatenate([cls_out, out], axis=1)  # [b*h, L, hd]

        out = out.reshape(b, h, L, head_dim)
        out = jnp.moveaxis(out, 1, 2).reshape(b, L, e)

        out = nn.Dense(
            e, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj",
            kernel_init=out_init,
        )(out)
        return out


class JointBlock(nn.Module):
    width: int
    heads: int
    nframes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + _FactorizedAttention(
            self.width, self.heads, self.nframes, "time", zero_init=True,
            dtype=self.dtype, name="timeattn",
        )(LayerNorm32(name="ln_time")(x))
        x = x + _FactorizedAttention(
            self.width, self.heads, self.nframes, "space",
            dtype=self.dtype, name="attn",
        )(LayerNorm32(name="ln_1")(x))
        x = x + MLPBlock(self.width, dtype=self.dtype, name="mlp")(
            LayerNorm32(name="ln_2")(x)
        )
        return x


class TimeSformerJoint(nn.Module):
    """[B, F, 3, H, W] -> [B, embed_dim], joint token layout."""

    variant: ClipVariant
    nframes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        v = self.variant
        width, patch = v.vision_width, v.patch_size
        scale = width**-0.5
        B, F, C, H, W = x.shape

        conv1 = self.param(
            "conv1", nn.initializers.normal(scale), (width, 3 * patch * patch),
            jnp.float32,
        )
        xf = patchify(x.reshape(B * F, C, H, W).astype(self.dtype), patch)
        xf = jnp.matmul(
            xf, conv1.astype(self.dtype).T, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        n = xf.shape[1]
        xf = xf.reshape(B, F * n, width)  # frame-major joint layout

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (width,),
            jnp.float32,
        )
        n_pos = (v.input_resolution // patch) ** 2 + 1
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (n_pos, width), jnp.float32,
        )
        temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros, (self.nframes, width),
            jnp.float32,
        )

        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (B, 1, width)
        )
        xx = jnp.concatenate([cls, xf], axis=1)

        # pos embed tiled over time + temporal embed interleaved over space
        cls_pos = positional_embedding[:1]
        tile_pos = jnp.tile(positional_embedding[1:], (F, 1))
        tile_temporal = jnp.repeat(temporal_embed, n, axis=0)
        total = jnp.concatenate([cls_pos, tile_pos + tile_temporal], axis=0)
        xx = xx + total.astype(self.dtype)

        from .layers import use_remat

        block_cls = nn.remat(JointBlock) if use_remat() else JointBlock
        xx = LayerNorm32(name="ln_pre")(xx)
        for i in range(v.vision_layers):
            xx = block_cls(
                width, v.vision_heads, self.nframes, dtype=self.dtype,
                name=f"transformer_resblocks_{i}",
            )(xx)
        xx = LayerNorm32(name="ln_post")(xx[:, 0])

        proj = self.param(
            "proj", nn.initializers.normal(scale), (width, v.embed_dim),
            jnp.float32,
        )
        return jnp.matmul(
            xx, proj.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)


def joint_timesformer_params_from_clip_visual(
    clip_visual_params: dict, variant: ClipVariant, nframes: int = 8,
) -> dict:
    """CLIP -> joint TimeSformer surgery (``timesformer_clip.py:436-466``):
    attn weights copy into SpaceAttention; TimeAttention starts as an exact
    no-op (zero in_proj, all-ones out_proj over zero values)."""
    src = jax.tree_util.tree_map(np.asarray, clip_visual_params)
    width = variant.vision_width
    out = {
        "conv1": src["conv1"],
        "class_embedding": src["class_embedding"],
        "positional_embedding": src["positional_embedding"],
        "temporal_embed": np.zeros((nframes, width), np.float32),
        "ln_pre": src["ln_pre"],
        "ln_post": src["ln_post"],
        "proj": src["proj"],
    }
    for i in range(variant.vision_layers):
        blk = src["transformer"][f"resblocks_{i}"]
        out[f"transformer_resblocks_{i}"] = {
            "attn": blk["attn"],
            "ln_1": blk["ln_1"],
            "mlp": blk["mlp"],
            "ln_2": blk["ln_2"],
            "timeattn": {
                "in_proj_weight": np.zeros((3, width, width), np.float32),
                "in_proj_bias": np.zeros((3, width), np.float32),
                "out_proj": {
                    "kernel": np.ones((width, width), np.float32),
                    "bias": np.zeros((width,), np.float32),
                },
            },
            "ln_time": {
                "scale": np.ones((width,), np.float32),
                "bias": np.zeros((width,), np.float32),
            },
        }
    return out
