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


def test_mha_module_fused_matches_xla(monkeypatch):
    """MultiHeadAttention with the fused kernel enabled must match the XLA
    path exactly (same params, same inputs)."""
    import os

    from vtc_tpu.models.layers import MultiHeadAttention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 50, 64)).astype(np.float32))
    mha = MultiHeadAttention(64, 4)
    variables = mha.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("VTC_FUSED_ATTENTION", "0")
    ref = np.asarray(mha.apply(variables, x))
    monkeypatch.setenv("VTC_FUSED_ATTENTION", "1")
    fused = np.asarray(mha.apply(variables, x))
    np.testing.assert_allclose(fused, ref, atol=2e-5)

    # causal-masked (text tower) path
    mask = causal_mask(50)
    monkeypatch.setenv("VTC_FUSED_ATTENTION", "0")
    ref_m = np.asarray(mha.apply(variables, x, mask))
    monkeypatch.setenv("VTC_FUSED_ATTENTION", "1")
    fused_m = np.asarray(mha.apply(variables, x, mask))
    np.testing.assert_allclose(fused_m, ref_m, atol=2e-5)
