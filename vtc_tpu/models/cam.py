"""Context Adapter Module (CAM) — the paper's core contribution.

A small transformer attends over the stack ``[main_embedding,
comment_embedding_1..N(, audio_embedding_1..M)]`` and produces a residual
that adapts the main embedding (``model/model.py:141-205``):

1. stack + L2-normalize each embedding;
2. run the 2-layer/8-head adapter transformer over the stack axis;
3. residual = mean of the normalized outputs (``init_from_avg``) or a linear
   head over the main-token output;
4. apply the configured residual activation (normalize / squash* / tanh /
   none / sub_mean / bn — the last two carry BatchNorm running stats,
   ``model/model.py:42-77``);
5. optionally zero the residual for a random 50% of the batch during
   training (``random_skip_adapter``, ``model/model.py:199-201``);
6. ``adapted = normalize(normalize(main) + residual)``.

Empty comments (EOT at position 1) are replaced by a learned
``mask_embedding`` (``model/model.py:207-214``); train-time random comment
masking swaps comments for the mask embedding per-sample
(``model/model.py:236-246``).

TPU notes: the stack axis is tiny (1+N), so the adapter rides the MXU as one
batched attention over [b, 1+N, 512]; all stochastic switches take explicit
jax PRNG streams ("adapter_skip", "comment_mask") to stay reproducible under
jit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Transformer, l2_normalize, l2_normalize_eps

NEEDS_STATE = ("sub_mean", "bn")


def squash(s):
    """Capsule-style squashing (``model/model.py:34-39``)."""
    s = s + 1e-9
    mag_sq = jnp.sum(s**2, axis=-1, keepdims=True)
    mag = jnp.sqrt(mag_sq)
    return (mag_sq / (1.0 + mag_sq)) * (s / mag)


RESIDUAL_ACTIVATIONS = {
    "normalize": l2_normalize_eps,
    "squash": squash,
    "squash10": lambda x: 10 * squash(x),
    "squash1p2": lambda x: 1.2 * squash(x),
    "squash1p5": lambda x: 1.5 * squash(x),
    "squash1p8": lambda x: 1.8 * squash(x),
    "tanh": jnp.tanh,
    "none": lambda x: x,
    None: lambda x: x,
}


class ContextAdapter(nn.Module):
    """CAM: adapter transformer + residual head + mask embedding."""

    feature_dim: int = 512
    n_layers: int = 2
    n_heads: int = 8
    init_from_avg: bool = True
    residual_activation: Optional[str] = None
    random_skip_adapter: bool = True
    dtype: jnp.dtype = jnp.float32
    # >0: MoE FFNs in the adapter transformer (beyond reference — the
    # "scale the adapter" lever; experts shard over an "expert" mesh axis)
    moe_experts: int = 0
    moe_top_k: int = 1
    # NOTE: comment masking is the retrieval wrapper's policy — it gates the
    # random_mask_comments call (retrieval.py); the adapter holds no copy of
    # that flag so the two cannot drift.

    def setup(self):
        self.final_transformer = Transformer(
            self.feature_dim, int(self.n_layers), int(self.n_heads),
            dtype=self.dtype,
            moe_experts=int(self.moe_experts), moe_top_k=int(self.moe_top_k),
        )
        # bias-free linear head, stored directly so the parameter exists even
        # when init_from_avg bypasses it (reference always creates it and
        # zero-inits the weight, model/model.py:399,452)
        self.final_linear = self.param(
            "final_linear",
            nn.initializers.zeros,
            (self.feature_dim, self.feature_dim),
            jnp.float32,
        )
        self.mask_embedding = self.param(
            "mask_embedding", nn.initializers.normal(1.0), (1, self.feature_dim),
            jnp.float32,
        )
        if self.residual_activation in NEEDS_STATE:
            # Running stats of torch BatchNorm1d(affine=False, momentum=0.2):
            # running = 0.8*running + 0.2*batch.
            self.bn_mean = self.variable(
                "batch_stats", "mean", jnp.zeros, (self.feature_dim,)
            )
            self.bn_var = self.variable(
                "batch_stats", "var", jnp.ones, (self.feature_dim,)
            )

    def _update_bn_stats(self, s):
        s = jax.lax.stop_gradient(s).astype(jnp.float32)
        n = s.shape[0]
        if n < 2 and not self.is_initializing():
            # torch BatchNorm1d raises 'Expected more than 1 value per
            # channel' — failing loudly beats decaying the running var
            # toward 0 (rsqrt(var+1e-5) would amplify eval residuals ~300x)
            raise ValueError(
                f"{self.residual_activation!r} residual activation needs "
                f"batch >= 2 in training (got {n}); drop 1-element batches "
                f"(drop_last) or freeze the adapter"
            )
        batch_mean = jnp.mean(s, axis=0)
        # torch updates the running var with the unbiased batch variance
        batch_var = jnp.var(s, axis=0) * (n / max(n - 1, 1))
        if not self.is_initializing():
            self.bn_mean.value = 0.8 * self.bn_mean.value + 0.2 * batch_mean
            self.bn_var.value = 0.8 * self.bn_var.value + 0.2 * batch_var

    def _residual_activation(self, s, train: bool, finaltf_frozen: bool):
        act = self.residual_activation
        eps = 1e-5
        if act == "sub_mean":
            # model/model.py:42-51: fake BN forward to store running stats,
            # subtract the batch mean while training, else the running mean.
            if train and not finaltf_frozen:
                self._update_bn_stats(s)
                return s - jnp.mean(s, axis=0)
            return s - self.bn_mean.value.astype(s.dtype)
        if act == "bn":
            # model/model.py:54-61: running stats forced when finaltf frozen
            if train and not finaltf_frozen:
                batch_mean = jnp.mean(s, axis=0)
                batch_var = jnp.var(s, axis=0)  # biased var for normalization
                self._update_bn_stats(s)
                return (s - batch_mean) * jax.lax.rsqrt(batch_var + eps)
            mean = self.bn_mean.value.astype(s.dtype)
            var = self.bn_var.value.astype(s.dtype)
            return (s - mean) * jax.lax.rsqrt(var + eps)
        return RESIDUAL_ACTIVATIONS[act](s)

    def adapt(
        self,
        feature_main: jax.Array,  # [b, d]
        features_aux: jax.Array,  # [n_aux, b, d]
        train: bool = False,
        finaltf_frozen: bool = False,
    ) -> jax.Array:
        """``_adapt_feature`` (``model/model.py:141-205``)."""
        assert feature_main.ndim == 2
        b = feature_main.shape[0]

        concat = jnp.concatenate([feature_main[None], features_aux], axis=0)
        concat = l2_normalize(concat)

        # reference layout is [seq, batch, d]; batch-major for the MXU here
        x = jnp.swapaxes(concat, 0, 1)  # [b, 1+n_aux, d]
        out = self.final_transformer(x)

        if self.init_from_avg:
            res = l2_normalize(jnp.mean(l2_normalize(out), axis=1))
        else:
            res = jnp.matmul(
                out[:, 0], self.final_linear.astype(out.dtype),
                preferred_element_type=jnp.float32,
            ).astype(out.dtype)

        res = self._residual_activation(res, train, finaltf_frozen)

        if train and self.random_skip_adapter:
            skip = jax.random.uniform(self.make_rng("adapter_skip"), (b, 1)) > 0.5
            res = jnp.where(skip, 0.0, res)

        return l2_normalize(l2_normalize(feature_main) + res)

    def substitute_empty(
        self, feats_comm: jax.Array, comment_tokens: jax.Array
    ) -> jax.Array:
        """Replace embeddings of empty comments with the mask embedding.

        feats_comm: [b, ncomms, d]; comment_tokens: [b, ncomms, ntoks].
        Empty string == EOT (49407) at token position 1
        (``model/model.py:207-212``).
        """
        empty = comment_tokens[..., 1] == 49407  # [b, ncomms]
        return jnp.where(
            empty[..., None], self.mask_embedding[0].astype(feats_comm.dtype),
            feats_comm,
        )

    def random_mask_comments(self, feats_comm: jax.Array) -> jax.Array:
        """Train-time random comment masking (``model/model.py:236-246``):
        per (comment, sample) bernoulli(0.5) swap with the mask embedding.
        feats_comm: [n_aux, b, d]."""
        n_aux, b, _ = feats_comm.shape
        mask = jax.random.randint(
            self.make_rng("comment_mask"), (n_aux, b, 1), 0, 2
        ).astype(feats_comm.dtype)
        return feats_comm * mask + self.mask_embedding[0].astype(
            feats_comm.dtype
        ) * (1 - mask)

    def __call__(self, feature_main, features_aux, train=False,
                 finaltf_frozen=False):
        return self.adapt(feature_main, features_aux, train, finaltf_frozen)


def zero_init_cam_params(cam_params: dict, n_layers: int, init_from_avg: bool):
    """Reproduce the reference's zero-init scheme (``model/model.py:440-452``):
    with ``init_from_avg`` the adapter starts as an exact average (c_proj and
    attn.out_proj zeroed per block); ``final_linear`` starts at zero so the
    non-avg head starts as the identity residual."""
    # structural copy, leaves untouched (and kept on device — no host sync)
    p = jax.tree_util.tree_map(lambda x: x, cam_params)
    if init_from_avg:
        for i in range(int(n_layers)):
            blk = p["final_transformer"][f"resblocks_{i}"]
            if "mlp_moe" in blk:
                # MoE adapter: every expert's output projection zeroed —
                # same starts-as-average semantics per routed token
                blk["mlp_moe"]["w_proj"] = jnp.zeros_like(
                    blk["mlp_moe"]["w_proj"]
                )
                blk["mlp_moe"]["bias_proj"] = jnp.zeros_like(
                    blk["mlp_moe"]["bias_proj"]
                )
            else:
                blk["mlp"]["c_proj"]["kernel"] = jnp.zeros_like(
                    blk["mlp"]["c_proj"]["kernel"]
                )
                blk["mlp"]["c_proj"]["bias"] = jnp.zeros_like(
                    blk["mlp"]["c_proj"]["bias"]
                )
            blk["attn"]["out_proj"]["kernel"] = jnp.zeros_like(
                blk["attn"]["out_proj"]["kernel"]
            )
    p["final_linear"] = jnp.zeros_like(p["final_linear"])
    return p
