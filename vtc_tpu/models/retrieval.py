"""Retrieval model wrappers — the framework's model zoo.

Mirrors the architectures exported by the reference's ``model/__init__.py``:
``PretrainedCLIP`` (``model/model.py:308-371``), ``PretrainedCLIP_finaltf``
(``:374-480``), ``PretrainedCLIP_TimeSformer`` (``:483-506``),
``PretrainedCLIP_TimeSformer_finaltf`` (``:539-623``), plus the simple
baselines ``MLP`` (``:80-94``), ``JointEmbedding`` (``:97-119``) and the
from-scratch ``CLIP`` joint embedding (``:122-130``).

Every retrieval model keeps the reference's forward contract:
``forward(vis, title[, comments]) -> (feats_vis, feats_text, sim)`` with
L2-normalized features and ``sim = logit_scale.exp() * feats_vis @ feats_text.T``.

JAX specifics: ``train`` and ``branch_to_adapt`` are call arguments (the
reference mutates ``model.branch_to_adapt_val`` at runtime,
``trainer/trainer.py:170-182``; here the trainer passes the override
explicitly). Stochastic switches consume named PRNG streams. The manual
2-GPU model-parallel split of the reference (``model/model.py:590-613``) is
subsumed by mesh sharding — see ``vtc_tpu.parallel``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cam import ContextAdapter
from .clip_model import CLIP_VARIANTS, ClipModel
from .layers import TorchBatchNorm, l2_normalize
from .timesformer import TimeSformer


class MLP(nn.Module):
    """Dropout -> Linear -> BatchNorm -> ReLU -> Linear (``model/model.py:80-94``)."""

    num_classes: int = 512
    num_features: int = 512
    p: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.p, deterministic=not train)(x)
        x = nn.Dense(self.num_features, dtype=self.dtype, name="fc1")(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn"
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x


class _EmbeddingBranch(nn.Module):
    """Linear -> BatchNorm -> ReLU -> Linear (``model/model.py:104-111``)."""

    num_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.num_features, dtype=self.dtype, name="fc1")(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn"
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_features, dtype=self.dtype, name="fc2")(x)
        return x


class JointEmbedding(nn.Module):
    """Two-branch MLP joint embedding (``model/model.py:97-119``)."""

    input_dims_a: int = 512
    input_dims_b: int = 512
    embedding_dims: int = 512
    normalize: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.branch_a = _EmbeddingBranch(self.embedding_dims, dtype=self.dtype)
        self.branch_b = _EmbeddingBranch(self.embedding_dims, dtype=self.dtype)

    def __call__(self, x_a, x_b, train: bool = False):
        feats_a = self.branch_a(x_a, train)
        feats_b = self.branch_b(x_b, train)
        if self.normalize:
            # reference uses F.normalize (model/model.py:117-118), whose
            # eps=1e-12 denominator clamp keeps an all-zero feature row
            # (degenerate relu output) at zeros instead of NaN
            def norm(f):
                n = jnp.linalg.norm(f, axis=-1, keepdims=True)
                return f / jnp.maximum(n, 1e-12)

            feats_a = norm(feats_a)
            feats_b = norm(feats_b)
        return feats_a, feats_b


class CLIP(JointEmbedding):
    """From-scratch joint embedding with learned temperature
    (``model/model.py:122-130``)."""

    def setup(self):
        super().setup()
        self.temperature = self.param(
            "temperature", nn.initializers.ones, (), jnp.float32
        )

    def __call__(self, x_a, x_b, train: bool = False):
        feats_a, feats_b = JointEmbedding.__call__(self, x_a, x_b, train)
        sim = jnp.einsum("id,jd->ij", feats_a, feats_b) * self.temperature
        return feats_a, feats_b, sim


class _ClipRetrievalBase(nn.Module):
    """Shared CLIP-backed behavior: visual shape dispatch and similarity."""

    model_type: str = "ViT-B/32"
    dtype: jnp.dtype = jnp.float32

    @property
    def variant(self):
        return CLIP_VARIANTS[self.model_type]

    @property
    def feature_dim(self):
        return self.variant.embed_dim

    def _encode_vis(self, vis):
        """Precomputed [b,d] passthrough | image [b,3,h,w] | video [b,t,3,h,w]
        frame-mean (``model/model.py:326-338``) | pre-patchified image
        [b,n,p·p·3] or video [b,t,n,p·p·3] (the uint8 patch fast path,
        ``data/preprocess.py:extract_patches``)."""
        from .clip_model import patch_input_dim

        shp = vis.shape
        pd = patch_input_dim(self.variant)
        if len(shp) == 2 and shp[1] == self.feature_dim:
            return vis.astype(jnp.float32)
        if len(shp) == 3 and shp[-1] == pd:
            return self.clip.encode_image(vis).astype(jnp.float32)
        if len(shp) == 4 and shp[-1] == pd:
            b, t = shp[0], shp[1]
            feats = self.clip.encode_image(vis.reshape((b * t,) + shp[2:]))
            return feats.reshape(b, t, -1).mean(axis=1).astype(jnp.float32)
        if len(shp) == 4:
            return self.clip.encode_image(vis).astype(jnp.float32)
        if len(shp) == 5:
            b, t = shp[0], shp[1]
            feats = self.clip.encode_image(vis.reshape((b * t,) + shp[2:]))
            return feats.reshape(b, t, -1).mean(axis=1).astype(jnp.float32)
        raise ValueError(f"Unsupported visual input shape {shp}")

    def _sim(self, feats_vis, feats_text):
        scale = jnp.exp(self.clip.logit_scale)
        return scale * jnp.matmul(
            feats_vis, feats_text.T, preferred_element_type=jnp.float32
        )

    def _encode_comments(self, comments):
        """[b, ncomms, ntoks] -> [b, ncomms, d] via the text tower."""
        b, ncomms, ntoks = comments.shape
        feats = self.clip.encode_text(comments.reshape(b * ncomms, ntoks))
        return feats.reshape(b, ncomms, self.feature_dim).astype(jnp.float32)


class PretrainedCLIP(_ClipRetrievalBase):
    """CLIP dual-encoder wrapper with optional "averaging" comment fusion
    (``model/model.py:308-371``)."""

    freeze: object = False
    residual_activation: Optional[str] = None
    comment_fusion: Optional[str] = None

    def setup(self):
        self.clip = ClipModel(variant=self.variant, dtype=self.dtype)

    def __call__(self, vis, title, comments=None, train: bool = False):
        feats_vis = self._encode_vis(vis)

        if comments is None or self.comment_fusion in (None, "None"):
            feats_text = self.clip.encode_text(title).astype(jnp.float32)
        elif self.comment_fusion == "averaging":
            # one fused text-tower pass over [title; comments] — identical
            # math (the tower is per-sequence), one launch instead of two
            # (same trick as _CamRetrievalBase._encode_title_and_comments;
            # averaging needs no empty-comment substitution first)
            b, ncomms, ntoks = comments.shape
            if title.shape[-1] == ntoks:
                joint = jnp.concatenate(
                    [title, comments.reshape(b * ncomms, ntoks)], axis=0
                )
                feats = self.clip.encode_text(joint).astype(jnp.float32)
                feats_title = feats[: title.shape[0]]
                feats_comm = feats[title.shape[0]:].reshape(b, ncomms, -1)
            else:  # different truncation buckets: separate passes
                feats_title = self.clip.encode_text(title).astype(jnp.float32)
                feats_comm = self._encode_comments(comments)
            stacked = jnp.concatenate(
                [feats_title[:, None], feats_comm], axis=1
            )
            feats_text = jnp.mean(stacked, axis=1)
        else:
            raise ValueError("Comment fusion method not specified.")

        feats_text = l2_normalize(feats_text)
        feats_vis = l2_normalize(feats_vis)
        return feats_vis, feats_text, self._sim(feats_vis, feats_text)

    def encode_image(self, vis):
        return self._encode_vis(vis)

    def encode_text(self, text):
        return self.clip.encode_text(text)


class _CamRetrievalBase(_ClipRetrievalBase):
    """Shared CAM plumbing for the *_finaltf models
    (``model/model.py:207-266``)."""

    freeze: object = False
    branch_to_adapt: str = "text"
    branch_to_adapt_val: str = "text"
    residual_activation: Optional[str] = None
    n_layers: int = 2
    n_heads: int = 8
    init_from_avg: bool = True
    random_comment_masking: bool = False
    random_skip_adapter: bool = True
    init_audio_model: bool = False
    audio_model_ckpt: Optional[str] = None
    clip_audio_ckpt: Optional[str] = None
    # >0: mixture-of-experts FFNs in the adapter transformer (beyond
    # reference; experts shard over an "expert" mesh axis, parallel/expert.py)
    moe_experts: int = 0
    moe_top_k: int = 1

    def _make_cam(self):
        return ContextAdapter(
            feature_dim=self.feature_dim,
            n_layers=int(self.n_layers),
            n_heads=int(self.n_heads),
            init_from_avg=self.init_from_avg,
            residual_activation=self.residual_activation,
            random_skip_adapter=self.random_skip_adapter,
            dtype=self.dtype,
            moe_experts=int(self.moe_experts),
            moe_top_k=int(self.moe_top_k),
            name="cam",
        )

    @property
    def finaltf_frozen(self):
        return isinstance(self.freeze, str) and "finaltf" in self.freeze

    def _load_comment_features(self, comments):
        """``_load_comment_features`` (``model/model.py:207-214``):
        encode, substitute empties with the mask embedding, -> [nc, b, d]."""
        feats = self._encode_comments(comments)
        feats = self.cam.substitute_empty(feats, comments)
        return jnp.swapaxes(feats, 0, 1)

    def _encode_title_and_comments(self, title, comments):
        """One fused text-tower pass over [title; comments] — identical math
        to separate encodes (the tower is per-sequence), bigger GEMMs on the
        MXU, one launch instead of two."""
        b, ncomms, ntoks = comments.shape
        if title.shape[-1] == ntoks:
            joint = jnp.concatenate(
                [title, comments.reshape(b * ncomms, ntoks)], axis=0
            )
            feats = self.clip.encode_text(joint).astype(jnp.float32)
            feats_title = feats[: title.shape[0]]
            feats_comm = feats[title.shape[0]:].reshape(
                b, ncomms, self.feature_dim
            )
        else:  # different truncation buckets: separate passes
            feats_title = self.clip.encode_text(title).astype(jnp.float32)
            feats_comm = self._encode_comments(comments)
        feats_comm = self.cam.substitute_empty(feats_comm, comments)
        return feats_title, jnp.swapaxes(feats_comm, 0, 1)

    def _encode_with_comments(
        self, feats_vis, feats_title, comments, train, branch_override,
        audio_feats=None, feats_comm=None,
    ):
        """``_encode_with_comments`` (``model/model.py:216-266``)."""
        if feats_comm is None:
            feats_comm = self._load_comment_features(comments)

        if audio_feats is not None:
            # cached GDT audio clip embeddings [b, nclips, da] through the
            # trainable MLP head, concatenated to the comment stack
            # (model/model.py:220-230); python loop over the (static, ~5)
            # clips mirrors the reference's sequential BatchNorm updates
            fa = jnp.swapaxes(audio_feats, 0, 1)  # [nclips, b, da]
            fa = jnp.stack(
                [self.audio_mlp(fa[i], train=train) for i in range(fa.shape[0])]
            )
            feats_comm = jnp.concatenate([feats_comm, fa], axis=0)

        if train:
            if self.random_comment_masking:
                feats_comm = self.cam.random_mask_comments(feats_comm)
            branch = self.branch_to_adapt
        else:
            branch = (
                branch_override
                if branch_override is not None
                else self.branch_to_adapt_val
            )

        # shared comments: a size-1 comment batch broadcasts across the
        # adapted branch (the transfer-eval case — every caption/chunk of a
        # video shares its 5 comments; encoding them once instead of
        # per-row removes the dominant duplicated text-tower work there).
        # EVAL-ONLY: in training the reference's torch.stack would raise on
        # the batch mismatch; silently broadcasting would train every sample
        # on one shared comment set (and one shared mask draw).
        def _bcast(fc, target_b):
            if fc.shape[1] == 1 and target_b != 1:
                if train:
                    raise ValueError(
                        f"comment batch 1 vs feature batch {target_b} in "
                        f"training: shared-comment broadcast is an eval-only "
                        f"optimization (model/model.py:216-266 would error)"
                    )
                return jnp.broadcast_to(
                    fc, (fc.shape[0], target_b, fc.shape[2])
                )
            return fc

        if branch == "text":
            feats_vis_out = feats_vis
            feats_text_out = self.cam.adapt(
                feats_title, _bcast(feats_comm, feats_title.shape[0]),
                train, self.finaltf_frozen,
            )
        elif branch == "image":
            feats_vis_out = self.cam.adapt(
                feats_vis, _bcast(feats_comm, feats_vis.shape[0]),
                train, self.finaltf_frozen,
            )
            feats_text_out = feats_title
        elif branch == "skip":
            feats_vis_out = feats_vis
            feats_text_out = feats_title
        else:
            raise ValueError(f"Unknown branch_to_adapt {branch!r}")

        return l2_normalize(feats_vis_out), l2_normalize(feats_text_out)


class PretrainedCLIP_finaltf(_CamRetrievalBase):
    """CLIP + CAM image/text retrieval model (``model/model.py:374-480``)."""

    def setup(self):
        self.clip = ClipModel(variant=self.variant, dtype=self.dtype)
        self.cam = self._make_cam()
        if self.init_audio_model:
            # GDT clip embeddings (512-d) -> CLIP feature space
            # (model/model.py:438: MLP(512, 512) for ViT-B/32)
            self.audio_mlp = MLP(
                num_classes=self.feature_dim, num_features=512,
                dtype=self.dtype, name="audio_mlp",
            )

    def __call__(
        self,
        vis,
        title,
        comments,
        audio_feats=None,
        train: bool = False,
        branch_override: Optional[str] = None,
    ):
        feats_vis = self._encode_vis(vis)
        feats_title, feats_comm = self._encode_title_and_comments(
            title, comments
        )
        feats_vis, feats_text = self._encode_with_comments(
            feats_vis, feats_title, comments, train, branch_override,
            audio_feats, feats_comm=feats_comm,
        )
        return feats_vis, feats_text, self._sim(feats_vis, feats_text)


class PretrainedCLIP_TimeSformer(_ClipRetrievalBase):
    """CLIP with the TimeSformer visual tower, no CAM
    (``model/model.py:483-506``)."""

    freeze: object = False
    residual_activation: Optional[str] = None
    nframes: int = 8

    def setup(self):
        self.clip = ClipModel(
            variant=self.variant,
            dtype=self.dtype,
            visual_module=TimeSformer,
            visual_kwargs={"nframes": self.nframes},
        )

    def __call__(self, vis, title, comments=None, train: bool = False):
        feats_vis = self.clip.encode_image(vis).astype(jnp.float32)
        feats_text = self.clip.encode_text(title).astype(jnp.float32)
        feats_vis = l2_normalize(feats_vis)
        feats_text = l2_normalize(feats_text)
        return feats_vis, feats_text, self._sim(feats_vis, feats_text)


class PretrainedCLIP_TimeSformer_finaltf(_CamRetrievalBase):
    """TimeSformer video tower + CAM (``model/model.py:539-623``).

    The reference's ``visual_device`` manual model split is realized here by
    mesh sharding instead (``vtc_tpu/parallel``); the argument is accepted for
    config compatibility and ignored.
    """

    visual_device: Optional[str] = None
    nframes: int = 8

    def setup(self):
        self.clip = ClipModel(
            variant=self.variant,
            dtype=self.dtype,
            visual_module=TimeSformer,
            visual_kwargs={"nframes": self.nframes},
        )
        self.cam = self._make_cam()

    def __call__(
        self,
        vis,
        title,
        comments,
        train: bool = False,
        branch_override: Optional[str] = None,
    ):
        feats_vis = self.clip.encode_image(vis).astype(jnp.float32)
        feats_title, feats_comm = self._encode_title_and_comments(
            title, comments
        )
        feats_vis, feats_text = self._encode_with_comments(
            feats_vis, feats_title, comments, train, branch_override,
            feats_comm=feats_comm,
        )
        return feats_vis, feats_text, self._sim(feats_vis, feats_text)
