"""Sequence parallelism (parallel/sequence.py): the ring-attention block
stack with the sequence axis sharded must be exact vs the sequential
Transformer — forward and gradients — on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vtc_tpu.models.layers import Transformer, causal_mask
from vtc_tpu.parallel.pipeline import stack_layer_params
from vtc_tpu.parallel.sequence import (
    SEQ_AXIS,
    create_sp_mesh,
    pad_for_sp,
    sp_transformer,
)

WIDTH, LAYERS, HEADS = 64, 4, 4


@pytest.fixture(scope="module")
def tower():
    # seq_fold=1: the sequential oracle without batch-fold packing (the
    # fold is itself exact, but keep the comparison one-variable)
    module = Transformer(WIDTH, LAYERS, HEADS, seq_fold=1)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16, WIDTH)).astype(np.float32)
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    return module, variables["params"], x


@pytest.mark.parametrize("n_seq", [2, 4])
def test_sp_matches_sequential(tower, n_seq):
    module, params, x = tower
    seq = module.apply({"params": params}, x)
    mesh = create_sp_mesh(8 // n_seq, n_seq)
    out = sp_transformer(
        stack_layer_params(params, LAYERS), x, None, mesh=mesh, heads=HEADS
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_sp_matches_sequential_causal(tower):
    """Text-tower configuration: the causal mask tiles correctly across the
    ring steps (each step adds its [rows(me), cols(src)] slice)."""
    module, params, x = tower
    mask = causal_mask(x.shape[1])
    seq = module.apply({"params": params}, x, mask)
    out = sp_transformer(
        stack_layer_params(params, LAYERS),
        x,
        mask,
        mesh=create_sp_mesh(2, 4),
        heads=HEADS,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_sp_gradients_match(tower):
    """Autodiff through the scan+ppermute ring IS the backward ring; grads
    wrt params and activations must match the sequential stack."""
    module, params, x = tower
    stacked = stack_layer_params(params, LAYERS)
    mask = causal_mask(x.shape[1])
    mesh = create_sp_mesh(2, 4)

    def seq_loss(params, x):
        out = module.apply({"params": params}, x, mask)
        return jnp.sum(out * out)

    def sp_loss(stacked, x):
        out = sp_transformer(stacked, x, mask, mesh=mesh, heads=HEADS)
        return jnp.sum(out * out)

    g_seq_p, g_seq_x = jax.grad(seq_loss, argnums=(0, 1))(params, x)
    g_sp_p, g_sp_x = jax.grad(sp_loss, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(np.asarray(g_sp_x), np.asarray(g_seq_x),
                               atol=2e-4, rtol=1e-4)
    g_seq_stacked = stack_layer_params(g_seq_p, LAYERS)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_seq_stacked),
        jax.tree_util.tree_leaves(g_sp_p),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


def test_sp_pad_for_clip_text_length(tower):
    """L=77 (CLIP text) doesn't divide any sp degree: pad_for_sp pads with
    self-attending dummy rows; real rows are exact, padding is dropped."""
    module, params, _ = tower
    length = 7  # prime, like 77; pad to 8 over 4 shards
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, length, WIDTH)).astype(np.float32)
    )
    mask = causal_mask(length)
    seq = module.apply({"params": params}, x, mask)

    xp, maskp, orig = pad_for_sp(x, mask, 4)
    assert xp.shape[1] == 8 and orig == length
    out = sp_transformer(
        stack_layer_params(params, LAYERS),
        xp,
        maskp,
        mesh=create_sp_mesh(2, 4),
        heads=HEADS,
    )[:, :orig]
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sp_composes_with_dp(tower):
    """dp2×sp4: batch sharded over data, sequence over seq, same numbers;
    the output keeps the input's (data, seq) sharding."""
    module, params, x = tower
    seq = module.apply({"params": params}, x)
    mesh = create_sp_mesh(2, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", SEQ_AXIS, None)))
    out = sp_transformer(
        stack_layer_params(params, LAYERS), xs, None, mesh=mesh, heads=HEADS
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)
    assert out.sharding.spec == P("data", SEQ_AXIS, None)


def test_sp_validation():
    mesh = create_sp_mesh(2, 4)
    x = jnp.zeros((2, 10, WIDTH))  # 10 doesn't divide over 4 shards
    with pytest.raises(ValueError, match="pad_for_sp"):
        sp_transformer({"w": jnp.zeros((2, 1))}, x, None, mesh=mesh, heads=HEADS)
    with pytest.raises(ValueError, match="devices"):
        create_sp_mesh(8, 2)


def test_sp_collective_profile():
    """The compiled sp program's only collectives are the K/V neighbor
    permutes — no all-to-alls, no all-gathers of activations."""
    module = Transformer(WIDTH, 2, HEADS, seq_fold=1)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 16, WIDTH)).astype(np.float32)
    )
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x)["params"]
    mesh = create_sp_mesh(2, 4)
    stacked = stack_layer_params(params, 2)

    fn = jax.jit(
        lambda p, x: sp_transformer(p, x, None, mesh=mesh, heads=HEADS)
    )
    hlo = fn.lower(stacked, x).compile().as_text()
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo  # activations must never be gathered
    assert "collective-permute" in hlo
