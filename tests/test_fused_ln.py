"""Fused LN→Dense path (layers.ln_dense, opt-in via VTC_FUSED_LN=1).

Folds every pre-LN LayerNorm into the matmul it feeds (MXU lane reductions
instead of XLA's VPU cross-lane reduce). Benched as a wash end-to-end on
v5e, so it ships default-off — see PERFORMANCE.md "LayerNorm exploration".
These tests pin:

* ln_dense ≡ Dense(LayerNorm32(x)) in fp32 (pure re-association, ~1e-5)
* bf16 fused model ≡ bf16 unfused model within a bf16-ulp-scale tolerance
* large-mean residual streams stay finite and accurate (the E[x²]-E[x]²
  one-pass formulation this replaced went NaN there)
* param tree is identical with the fused path on and off
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.models import create_model
from vtc_tpu.models.layers import LayerNorm32, ln_dense


def _ref_ln_dense(x, scale, bias, kernel, dbias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * scale + bias).astype(x.dtype)
    out = jnp.matmul(y, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    if dbias is not None:
        out = out + dbias
    return out.astype(x.dtype)


def test_ln_dense_matches_reference_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    scale = jnp.asarray((1 + 0.1 * rng.normal(size=256)).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.normal(size=256)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(256, 128)) * 0.05).astype(np.float32))
    b = jnp.asarray((0.05 * rng.normal(size=128)).astype(np.float32))

    ref = _ref_ln_dense(x, scale, bias, k, b)
    got = ln_dense(x, scale, bias, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ln_dense_large_mean_stream_stays_accurate():
    """Centered two-pass stats: no cancellation blow-up on shifted streams.

    d=384 deliberately non-power-of-two: 1/d is not bf16-representable, so
    this also pins that the reduction divides by d in fp32 (a bf16 1/d
    matrix scales the stats by ≈1.002 and mis-centers shifted streams)."""
    rng = np.random.default_rng(1)
    d = 384
    base = rng.normal(size=(32, d)).astype(np.float32) + 30.0
    x = jnp.asarray(base).astype(jnp.bfloat16)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    k = jnp.asarray((rng.normal(size=(d, 128)) * 0.05).astype(np.float32))

    ref = np.asarray(_ref_ln_dense(x, scale, bias, k, None), np.float32)
    got = np.asarray(ln_dense(x, scale, bias, k, None), np.float32)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, atol=0.12)  # ~bf16 ulp at |out|<=8


def test_ln_dense_handles_3d_inputs():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 7, 256)).astype(np.float32))
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    k = jnp.asarray((rng.normal(size=(256, 128)) * 0.05).astype(np.float32))
    got = ln_dense(x, scale, bias, k, None)
    assert got.shape == (4, 7, 128)
    ref = _ref_ln_dense(x, scale, bias, k, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.fixture()
def flagship_inputs():
    rng = np.random.default_rng(3)
    vis = rng.normal(size=(4, 3, 224, 224)).astype(np.float32)
    toks = np.zeros((4, 16), np.int32)
    toks[:, 0] = 49406
    toks[:, 1:8] = rng.integers(1, 49405, (4, 7))
    toks[:, 8] = 49407
    comments = np.zeros((4, 2, 16), np.int32)
    comments[..., 0] = 49406
    comments[..., 1:6] = rng.integers(1, 49405, (4, 2, 5))
    comments[..., 6] = 49407
    return vis, toks, comments


@pytest.mark.slow
def test_bf16_model_fused_vs_unfused(flagship_inputs, monkeypatch):
    vis, toks, comments = flagship_inputs
    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VTC_FUSED_LN", flag)
        module, variables = create_model(
            "PretrainedCLIP_finaltf", model_type="test-tiny", seed=0,
            dtype=jnp.bfloat16,
        )
        fv, ft, sim = module.apply(
            variables, jnp.asarray(vis[:, :, :32, :32]).astype(jnp.bfloat16),
            jnp.asarray(toks), jnp.asarray(comments),
        )
        outs[flag] = (np.asarray(fv, np.float32), np.asarray(ft, np.float32))

    # embeddings are L2-normalized; bf16 rounding differences only
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=0.04)
    np.testing.assert_allclose(outs["1"][1], outs["0"][1], atol=0.04)


def test_param_tree_identical_fused_unfused(monkeypatch):
    trees = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VTC_FUSED_LN", flag)
        _, variables = create_model(
            "PretrainedCLIP", model_type="test-tiny", seed=0,
            dtype=jnp.bfloat16 if flag == "1" else jnp.float32,
        )
        trees[flag] = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(variables["params"])
        }
    assert trees["1"] == trees["0"]


def test_eot_before_ln_final_is_identity_refactor():
    """fp32 text tower must be unchanged by the gather-then-normalize
    reorder (LayerNorm is per-token): rebuild the reference order — run the
    transformer, LayerNorm ALL positions, then gather the EOT row — from
    the same parameters and compare."""
    from vtc_tpu.models.clip_model import CLIP_VARIANTS
    from vtc_tpu.models.layers import Transformer, causal_mask

    module, variables = create_model(
        "PretrainedCLIP", model_type="test-tiny", seed=0
    )
    rng = np.random.default_rng(4)
    toks = np.zeros((3, 12), np.int32)
    toks[:, 0] = 49406
    toks[:, 1:5] = rng.integers(1, 49405, (3, 4))
    toks[:, 5] = 49407
    toks_j = jnp.asarray(toks)

    out = module.apply(
        variables, toks_j, method=lambda mdl, t: mdl.clip.encode_text(t)
    )

    # reference order: embed -> transformer -> LN over every position ->
    # gather EOT -> project, straight from the stored parameters
    v = CLIP_VARIANTS["test-tiny"]
    p = variables["params"]["clip"]["text"]
    x = jnp.take(jnp.asarray(p["token_embedding"]), toks_j, axis=0)
    x = x + p["positional_embedding"][: toks.shape[-1]]
    x = Transformer(v.text_width, v.text_layers, v.text_heads).apply(
        {"params": p["transformer"]}, x, causal_mask(toks.shape[-1])
    )
    scale, bias = p["ln_final"]["scale"], p["ln_final"]["bias"]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    eot = jnp.argmax(toks_j, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    ref = x @ p["text_projection"]

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_pallas_layernorm_kernel_interpret_matches_xla():
    """The Pallas LN kernel (reference implementation, not wired in —
    PERFORMANCE.md 'LayerNorm exploration') must match the XLA fp32-stats
    LayerNorm; runs in interpret mode so CI covers it on CPU."""
    from vtc_tpu.ops import pallas_layernorm as pln

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    scale = jnp.asarray((1 + 0.1 * rng.normal(size=256)).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.normal(size=256)).astype(np.float32))

    pln._INTERPRET = True
    try:
        out = pln.layernorm(x, scale, bias)
        ref = pln._xla_layernorm(x, scale, bias, 1e-5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )
        # gradients route through the XLA reference formulation
        g = jax.grad(
            lambda xx: jnp.sum(pln.layernorm(xx, scale, bias) ** 2)
        )(x)
        gref = jax.grad(
            lambda xx: jnp.sum(pln._xla_layernorm(xx, scale, bias, 1e-5) ** 2)
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-4)
    finally:
        pln._INTERPRET = False


def test_fused_ln_yields_to_tensor_parallelism(monkeypatch):
    """Under tp the [3,E,E]->[3E,E] merge inside ln_dense would force GSPMD
    to gather the model-sharded E axis; the tp-qkv policy wins over the
    VTC_FUSED_LN opt-in."""
    from vtc_tpu.models import layers

    monkeypatch.setenv("VTC_FUSED_LN", "1")
    assert layers.use_fused_ln(jnp.bfloat16)
    layers.set_tp_qkv(True)
    try:
        assert not layers.use_fused_ln(jnp.bfloat16)
    finally:
        layers.set_tp_qkv(False)
    assert layers.use_fused_ln(jnp.bfloat16)
