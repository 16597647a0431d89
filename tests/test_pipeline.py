"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over the CLIP block stack must be exact vs the sequential Transformer —
forward and gradients — on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vtc_tpu.models.layers import Transformer, causal_mask
from vtc_tpu.parallel.pipeline import (
    PIPE_AXIS,
    clip_block_apply,
    create_pipeline_mesh,
    pipeline_blocks,
    stack_layer_params,
)

WIDTH, LAYERS, HEADS = 64, 4, 4


@pytest.fixture(scope="module")
def tower():
    module = Transformer(WIDTH, LAYERS, HEADS)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 10, WIDTH)).astype(np.float32)
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    return module, variables["params"], x


def _mesh(n_data, n_pipe):
    devices = np.array(jax.devices()[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(devices, ("data", PIPE_AXIS))


def test_pipeline_matches_sequential(tower):
    module, params, x = tower
    seq = module.apply({"params": params}, x)

    stacked = stack_layer_params(params, LAYERS)
    mesh = _mesh(2, 4)
    out = pipeline_blocks(
        clip_block_apply(WIDTH, HEADS),
        stacked,
        x,
        mesh=mesh,
        n_micro=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_pipeline_matches_sequential_causal(tower):
    """Text-tower configuration: causal mask closed over the block apply."""
    module, params, x = tower
    mask = causal_mask(x.shape[1])
    seq = module.apply({"params": params}, x, mask)

    stacked = stack_layer_params(params, LAYERS)
    out = pipeline_blocks(
        clip_block_apply(WIDTH, HEADS, mask=mask),
        stacked,
        x,
        mesh=_mesh(2, 4),
        n_micro=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_pipeline_gradients_match(tower):
    """Autodiff through the scan+ppermute schedule IS the backward pipeline;
    grads wrt params and activations must match the sequential stack."""
    _, params, x = tower
    stacked = stack_layer_params(params, LAYERS)
    apply = clip_block_apply(WIDTH, HEADS)

    def seq_loss(stacked, x):
        def one(h, p):
            return apply(p, h), None

        out = jax.lax.scan(one, x, stacked)[0]
        return jnp.sum(out * out)

    def pipe_loss(stacked, x):
        out = pipeline_blocks(apply, stacked, x, mesh=_mesh(2, 4), n_micro=4)
        return jnp.sum(out * out)

    g_seq = jax.grad(seq_loss, argnums=(0, 1))(stacked, x)
    g_pipe = jax.grad(pipe_loss, argnums=(0, 1))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq), jax.tree_util.tree_leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4)


def test_single_stage_degenerates_to_scan(tower):
    module, params, x = tower
    seq = module.apply({"params": params}, x)
    stacked = stack_layer_params(params, LAYERS)
    out = pipeline_blocks(
        clip_block_apply(WIDTH, HEADS), stacked, x, mesh=_mesh(8, 1), n_micro=2
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_pipeline_validation(tower):
    _, params, x = tower
    stacked = stack_layer_params(params, LAYERS)
    apply = clip_block_apply(WIDTH, HEADS)
    with pytest.raises(ValueError, match="pipeline stages"):
        # 4 layers over 8 stages
        pipeline_blocks(apply, stacked, x, mesh=_mesh(1, 8), n_micro=2)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_blocks(apply, stacked, x, mesh=_mesh(2, 4), n_micro=3)
    with pytest.raises(KeyError):
        stack_layer_params({"resblocks_0": params["resblocks_0"]}, 2)
    with pytest.raises(ValueError, match="devices"):
        create_pipeline_mesh(8, 2)


def test_create_pipeline_mesh():
    mesh = create_pipeline_mesh(4, 2)
    assert mesh.shape == {"data": 4, PIPE_AXIS: 2}


def test_pipeline_timesformer_blocks():
    """The divided space-time block stack (the tower where pipeline stages
    matter — its activations force VTC_REMAT on one chip) pipelines exactly."""
    from vtc_tpu.models.timesformer import TimeSformerBlock
    from vtc_tpu.parallel.pipeline import timesformer_block_apply

    nframes, npatch = 2, 4
    x = jnp.asarray(
        np.random.default_rng(1)
        .normal(size=(8, 1 + npatch * nframes, WIDTH))
        .astype(np.float32)
    )
    block = TimeSformerBlock(WIDTH, HEADS)
    params = [
        jax.jit(block.init, static_argnums=2)(jax.random.PRNGKey(i), x, nframes)[
            "params"
        ]
        for i in range(LAYERS)
    ]
    seq = x
    for p in params:
        seq = block.apply({"params": p}, seq, nframes)

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params)
    out = pipeline_blocks(
        timesformer_block_apply(WIDTH, HEADS, nframes),
        stacked,
        x,
        mesh=_mesh(2, 4),
        n_micro=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)
