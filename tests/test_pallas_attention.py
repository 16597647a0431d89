"""Fused attention kernel (interpret mode on CPU): forward parity with the
XLA reference, causal masking, gradient parity through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.models.layers import causal_mask
from vtc_tpu.ops.pallas_attention import _reference_attention, fused_attention


def _qkv(b=6, l=50, d=64, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
        for _ in range(3)
    )


@pytest.mark.parametrize("l,d", [(50, 64), (77, 64), (8, 64), (13, 32)])
def test_forward_parity(l, d):
    q, k, v = _qkv(l=l, d=d)
    ref = _reference_attention(q, k, v, None, d**-0.5)
    out = fused_attention(q, k, v, None, None, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_causal_mask():
    l, d = 77, 64
    q, k, v = _qkv(l=l, d=d, seed=1)
    mask = causal_mask(l)
    ref = _reference_attention(q, k, v, mask, d**-0.5)
    out = fused_attention(q, k, v, mask, None, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_match_reference():
    q, k, v = _qkv(b=4, l=16, d=32, seed=2)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, None, None, 8, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, None, 32**-0.5) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_batch_not_multiple_of_block():
    q, k, v = _qkv(b=5, l=10, d=16, seed=3)
    ref = _reference_attention(q, k, v, None, 16**-0.5)
    out = fused_attention(q, k, v, None, None, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mha_module_seq_fold_matches_unfolded():
    """MultiHeadAttention with batch folding must match the plain path
    exactly (same params, same inputs) — folding is a pure layout
    optimization, not an approximation."""
    from vtc_tpu.models.layers import MultiHeadAttention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 16, 64)).astype(np.float32))
    plain = MultiHeadAttention(64, 4, seq_fold=1)
    variables = plain.init(jax.random.PRNGKey(0), x)

    ref = np.asarray(plain.apply(variables, x))
    folded = np.asarray(
        MultiHeadAttention(64, 4, seq_fold=4).apply(variables, x)
    )
    np.testing.assert_allclose(folded, ref, atol=2e-5)

    # causal-masked (text tower) path, auto fold
    mask = causal_mask(16)
    ref_m = np.asarray(plain.apply(variables, x, mask))
    auto_m = np.asarray(
        MultiHeadAttention(64, 4, seq_fold=0).apply(variables, x, mask)
    )
    np.testing.assert_allclose(auto_m, ref_m, atol=2e-5)


def test_pick_seq_fold_policy():
    from vtc_tpu.models.layers import pick_seq_fold

    assert pick_seq_fold(768, 16) == 8      # 8*16 = 128 packed rows
    assert pick_seq_fold(1568, 8) == 16     # timesformer temporal
    assert pick_seq_fold(128, 50) == 1      # long seq: logits cost dominates
    assert pick_seq_fold(7, 16) == 7        # divisor of batch required
    assert pick_seq_fold(1, 16) == 1


@pytest.mark.parametrize(
    "b,l,e,h,causal",
    [(8, 50, 128, 2, False), (16, 16, 128, 2, True), (5, 8, 64, 1, False)],
)
def test_fused_mha_kernel_parity(b, l, e, h, causal):
    """The packed supertile kernel (interpret mode on CPU) matches the XLA
    reference. Kept as a reference implementation: measured on v5e it loses
    to XLA at these shapes (PERFORMANCE.md, Pallas kernel exploration)."""
    from vtc_tpu.ops.pallas_attention import _mha_reference, fused_mha

    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))
        for _ in range(3)
    )
    ref = _mha_reference(q, k, v, h, causal, (e // h) ** -0.5)
    out = fused_mha(q, k, v, h, causal, None, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mha_gradients():
    from vtc_tpu.ops.pallas_attention import _mha_reference, fused_mha

    rng = np.random.default_rng(8)
    q, k, v = (
        jnp.asarray(rng.normal(size=(4, 8, 64)).astype(np.float32))
        for _ in range(3)
    )

    g1 = jax.grad(
        lambda q, k, v: jnp.sum(fused_mha(q, k, v, 2, False, None, 2, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(_mha_reference(q, k, v, 2, False, 32 ** -0.5) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_mha_rejects_long_sequences_clearly():
    """L > 128 cannot pack into the 128-row supertiles; the precondition
    must fail with a clear message, not a negative-pad ValueError."""
    from vtc_tpu.ops.pallas_attention import fused_mha

    q = jnp.zeros((2, 197, 64), jnp.float32)
    with pytest.raises(ValueError, match="L <= 128"):
        fused_mha(q, q, q, heads=4)
