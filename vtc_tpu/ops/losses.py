"""Loss functions (``model/loss.py:1-22``), as pure jax functions.

``clip_loss`` is the symmetric InfoNCE over the in-batch dense similarity
matrix: cross-entropy against the diagonal in both directions
(``model/loss.py:18-22``). Computed in fp32 with log-softmax fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softmax_xent(logits, labels):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def clip_loss(output, meta=None):
    """Symmetric InfoNCE. ``output`` is the model's (feats_a, feats_b, sim)."""
    sim = output[2]
    labels = jnp.arange(sim.shape[0])
    return 0.5 * (_softmax_xent(sim, labels) + _softmax_xent(sim.T, labels))


def cross_entropy(output, meta):
    logits = output if not isinstance(output, (tuple, list)) else output[-1]
    return _softmax_xent(logits, meta["target"])


def binary_cross_entropy(output, meta):
    logits = output if not isinstance(output, (tuple, list)) else output[-1]
    target = meta["target"].reshape(logits.shape).astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    # numerically-stable BCE-with-logits
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return loss.mean()


def mse_loss(output, meta, reduction="mean"):
    pred = output if not isinstance(output, (tuple, list)) else output[0]
    err = (pred - meta["target"]) ** 2
    return err.mean() if reduction == "mean" else err.sum()


LOSSES = {
    "clip_loss": clip_loss,
    "cross_entropy": cross_entropy,
    "binary_cross_entropy": binary_cross_entropy,
    "mse_loss": mse_loss,
}
