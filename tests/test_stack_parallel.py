"""Config-reachable stack parallelism (parallel/stack.py): the train.py
``--pp`` / ``--sp`` switches must route every ``layers.Transformer`` (text
tower, CAM) and the TimeSformer block stack through the pipeline/ring
schedules with EXACT results, and silently fall back for ineligible stacks.

This is the user-reachable surface generalizing the reference's manual
2-GPU visual split (``model/model.py:590-613``, ``train.py:270``
``--visual_device``); the kernels themselves are pinned by
``test_pipeline.py`` / ``test_sequence.py``.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.models import create_model
from vtc_tpu.models.layers import Transformer, causal_mask
from vtc_tpu.parallel.pipeline import create_pipeline_mesh
from vtc_tpu.parallel.sequence import create_sp_mesh
from vtc_tpu.parallel.stack import (
    set_stack_parallel,
    stack_parallel_mode,
    transformer_stack_override,
)

TINY = "test-tiny"
WIDTH, LAYERS, HEADS = 64, 4, 4


@pytest.fixture(autouse=True)
def _reset_stack_ctx():
    """The mode is process-global trace-time state (the set_tp_qkv idiom):
    never leak it into other tests."""
    yield
    set_stack_parallel(None)


@pytest.fixture(scope="module")
def tower():
    module = Transformer(WIDTH, LAYERS, HEADS)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 10, WIDTH)).astype(np.float32)
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    return module, variables, x


def _collectives(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    return {
        op: len(re.findall(rf"\b{op}(?:-start)?\.", txt))
        + len(re.findall(rf" {op}\(", txt))
        for op in ("collective-permute", "all-to-all")
    }


def test_set_stack_parallel_validation(tower):
    with pytest.raises(ValueError, match="unknown stack-parallel mode"):
        set_stack_parallel("tensor", create_pipeline_mesh(2, 2))
    with pytest.raises(ValueError, match="needs the mesh"):
        set_stack_parallel("pipe")
    with pytest.raises(ValueError, match="mesh axis"):
        # a pipe request on a seq mesh (wrong second axis)
        set_stack_parallel("pipe", create_sp_mesh(2, 2))
    assert stack_parallel_mode() is None
    set_stack_parallel("pipe", create_pipeline_mesh(2, 2))
    assert stack_parallel_mode() == "pipe"
    set_stack_parallel(None)
    assert stack_parallel_mode() is None


def test_transformer_routes_through_pipeline(tower):
    module, variables, x = tower
    seq = module.apply(variables, x)

    set_stack_parallel("pipe", create_pipeline_mesh(2, 2), n_micro=2)
    out = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)

    # proof the pipeline path actually ran: the GPipe schedule's ppermute
    # ring shows up as collective-permutes; the sequential loop has none
    routed = _collectives(lambda v, x: module.apply(v, x), variables, x)
    assert routed["collective-permute"] > 0, routed
    set_stack_parallel(None)
    plain = _collectives(lambda v, x: module.apply(v, x), variables, x)
    assert plain["collective-permute"] == 0, plain


def test_transformer_routes_through_sequence(tower):
    """Ring attention with padding (L=10 over 2 shards -> pad) and a causal
    mask — the text-tower configuration."""
    module, variables, x = tower
    mask = causal_mask(x.shape[1])
    seq = module.apply(variables, x, mask)

    set_stack_parallel("seq", create_sp_mesh(2, 2))
    out = module.apply(variables, x, mask)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


def test_ineligible_stacks_fall_back(tower):
    module, variables, x = tower

    # layer count not divisible by the stage count -> sequential loop
    mesh3 = create_pipeline_mesh(1, 3)
    set_stack_parallel("pipe", mesh3)
    assert transformer_stack_override(module.bind(variables), x, None) is None
    seq = module.apply(variables, x)  # falls back, still exact
    set_stack_parallel(None)
    np.testing.assert_allclose(
        np.asarray(module.apply(variables, x)), np.asarray(seq)
    )

    # MoE FFNs (expert-sharded separately) and non-3D inputs are ineligible
    moe = Transformer(WIDTH, 2, HEADS, moe_experts=2)
    mv = jax.jit(moe.init)(jax.random.PRNGKey(0), x)
    want = moe.apply(mv, x)
    set_stack_parallel("pipe", create_pipeline_mesh(2, 2))
    assert transformer_stack_override(moe.bind(mv), x, None) is None
    np.testing.assert_allclose(
        np.asarray(moe.apply(mv, x)), np.asarray(want)
    )


def test_batch_not_divisible_replicates(tower):
    """A batch that doesn't divide the data axis replicates instead of
    failing (eval tails); still exact."""
    module, variables, x = tower
    x5 = x[:5]
    seq = module.apply(variables, x5)
    set_stack_parallel("pipe", create_pipeline_mesh(2, 2), n_micro=4)
    out = module.apply(variables, x5)  # 5 % 2 != 0 -> replicated batch,
    # n_micro clamped to a divisor of 5
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-5)


@pytest.mark.slow
def test_flagship_video_model_pipelined_exact():
    """The FULL flagship forward (TimeSformer tower + text tower + CAM, all
    three stacks routed) under --pp 2 equals the sequential model."""
    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=4,
        seed=0, random_skip_adapter=False,
    )
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(4, 4, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(rng.integers(1, 49405, size=(4, 77)).astype(np.int32))
    comments = jnp.asarray(
        rng.integers(1, 49405, size=(4, 2, 77)).astype(np.int32)
    )
    want = module.apply(variables, vis, title, comments)[2]

    set_stack_parallel("pipe", create_pipeline_mesh(2, 2), n_micro=2)
    got = module.apply(variables, vis, title, comments)[2]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_flagship_video_model_sequence_sharded_exact():
    """Under --sp the text/CAM stacks ring-shard while the TimeSformer tower
    (per-block alternating token layouts) falls back to data parallel —
    results identical either way."""
    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=4,
        seed=0, random_skip_adapter=False,
    )
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(4, 4, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(rng.integers(1, 49405, size=(4, 77)).astype(np.int32))
    comments = jnp.asarray(
        rng.integers(1, 49405, size=(4, 2, 77)).astype(np.int32)
    )
    want = module.apply(variables, vis, title, comments)[2]

    set_stack_parallel("seq", create_sp_mesh(2, 2))
    got = module.apply(variables, vis, title, comments)[2]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_sharded_steps_no_involuntary_remat(capfd):
    """Dryrun-tail hygiene (round-5 item 3): with batch-SHARDED inputs, the
    sp2 train step and the accumulated dp step must not trip GSPMD's
    replicate-then-partition fallback ("Involuntary full rematerialization").
    Round 4's dryrun tail carried exactly this warning for the s32 token
    input (op data[1]): the sp shard_map's (data, seq) layout back-propagated
    through the embedding gather onto the raw tokens. stack.py now pins the
    pre-shard_map activations; the accumulation split is strided + sharding-
    constrained. capfd sees the C++ absl stderr, where the SPMD partitioner
    prints the warning (verified against the round-4 reproduction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.parallel.mesh import create_mesh, tree_shardings
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=4,
        seed=0,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-3}},
        None, steps_per_epoch=4,
    )
    rng = np.random.default_rng(0)
    vis_h = rng.normal(size=(8, 4, 3, 32, 32)).astype(np.float32)
    title_h = rng.integers(1, 49405, size=(8, 77)).astype(np.int32)
    comments_h = rng.integers(1, 49405, size=(8, 3, 77)).astype(np.int32)

    def run(mesh, **step_kw):
        step, _ = make_step_fns(module, clip_loss, tx, donate=False,
                                mesh=step_kw.pop("step_mesh", None), **step_kw)
        p = jax.device_put(
            variables["params"], tree_shardings(variables["params"], mesh)
        )
        st = TrainState(
            step=jnp.zeros((), jnp.int32), params=p, opt_state=tx.init(p),
            batch_stats=variables.get("batch_stats", {}),
        )
        ds = NamedSharding(mesh, P("data"))
        b = tuple(jax.device_put(a, ds) for a in (vis_h, title_h, comments_h))
        with mesh:
            _, loss, _ = step(st, b, {}, jax.random.PRNGKey(0))
            return float(loss)

    capfd.readouterr()  # drain anything earlier
    sp_mesh = create_sp_mesh(4, 2)
    set_stack_parallel("seq", sp_mesh)
    sp_loss = run(sp_mesh)
    set_stack_parallel(None)

    dp_mesh = create_mesh(4, 2)
    accum_loss = run(dp_mesh, accum_steps=2, step_mesh=dp_mesh)

    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err
    assert np.isfinite(sp_loss) and np.isfinite(accum_loss)
