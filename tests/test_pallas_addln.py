"""Fused residual-add + LayerNorm kernel (``ops/pallas_addln.py``): the
VERDICT-r3 "one remaining pass-removal receipt". Exactness in interpret
mode (CI covers the kernel on CPU), custom-VJP gradients, and the opt-in
wiring into ``ResidualAttentionBlock`` staying output-identical."""

import jax
import jax.numpy as jnp
import numpy as np


def test_addln_kernel_interpret_matches_xla():
    from vtc_tpu.ops import pallas_addln as pal

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(48, 256)).astype(np.float32))
    # large-mean branch stream: the stats must be centered (the naive
    # E[x^2]-E[x]^2 formulation NaNs here — test_fused_ln.py's lesson)
    b = jnp.asarray((100.0 + rng.normal(size=(48, 256))).astype(np.float32))
    scale = jnp.asarray((1 + 0.1 * rng.normal(size=256)).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.normal(size=256)).astype(np.float32))

    pal._INTERPRET = True
    try:
        s, y = pal.add_layernorm(a, b, scale, bias)
        s_ref, y_ref = pal._xla_add_layernorm(a, b, scale, bias, 1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

        # bf16 activations, fp32 stats
        s16, y16 = pal.add_layernorm(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), scale, bias
        )
        assert s16.dtype == jnp.bfloat16 and y16.dtype == jnp.bfloat16

        # gradients (custom VJP through the XLA formulation) for BOTH
        # outputs and all four inputs
        def loss_pal(aa, bb, sc, bi):
            s_, y_ = pal.add_layernorm(aa, bb, sc, bi)
            return jnp.sum(s_ * y_)

        def loss_ref(aa, bb, sc, bi):
            s_, y_ = pal._xla_add_layernorm(aa, bb, sc, bi, 1e-5)
            return jnp.sum(s_ * y_)

        g = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(a, b, scale, bias)
        gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(a, b, scale, bias)
        for got, want in zip(g, gref):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4
            )
    finally:
        pal._INTERPRET = False


def test_addln_unsupported_width_falls_back():
    """d % 128 != 0 (e.g. the tiny test variant's 64) must route to XLA
    without touching Pallas."""
    from vtc_tpu.ops import pallas_addln as pal

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    s, y = pal.add_layernorm(a, b, scale, bias)
    s_ref, y_ref = pal._xla_add_layernorm(a, b, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_block_addln_wiring_is_output_identical(monkeypatch):
    """VTC_PALLAS_ADDLN=1 must not change ResidualAttentionBlock outputs or
    its parameter tree (the kernel falls back to the identical XLA math on
    CPU; this pins the wiring, not the kernel)."""
    from vtc_tpu.models.layers import ResidualAttentionBlock

    width, heads = 128, 4
    block = ResidualAttentionBlock(width, heads)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 10, width)).astype(np.float32))

    monkeypatch.delenv("VTC_PALLAS_ADDLN", raising=False)
    variables = block.init(jax.random.PRNGKey(0), x)
    base = block.apply(variables, x)

    monkeypatch.setenv("VTC_PALLAS_ADDLN", "1")
    variables_on = block.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        variables_on
    ) == jax.tree_util.tree_structure(variables)
    fused = block.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), atol=1e-5
    )

    # gradient path (the custom VJP) stays equivalent too
    def loss(v, flag):
        monkeypatch.setenv("VTC_PALLAS_ADDLN", flag)
        return jnp.sum(block.apply(v, x) ** 2)

    g_on = jax.grad(lambda v: loss(v, "1"))(variables)
    g_off = jax.grad(lambda v: loss(v, "0"))(variables)
    for got, want in zip(
        jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4
        )
