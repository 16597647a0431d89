"""Mesh / sharding tests on the 8-device virtual CPU mesh: TP param specs,
dp+tp train step parity with single-device, and the graft-entry dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vtc_tpu.models import create_model
from vtc_tpu.ops.losses import clip_loss
from vtc_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    param_pspec,
    tree_shardings,
)
from vtc_tpu.training.optim import build_optimizer
from vtc_tpu.training.trainer import TrainState, make_step_fns

TINY = "test-tiny"


def test_param_pspec_rules():
    assert param_pspec(
        "clip/visual/transformer/resblocks_0/attn/in_proj_weight"
    ) == P(None, "model", None)
    assert param_pspec("clip/visual/transformer/resblocks_0/mlp/c_fc/kernel") == P(
        None, "model"
    )
    assert param_pspec("clip/visual/transformer/resblocks_0/mlp/c_proj/kernel") == P(
        "model", None
    )
    assert param_pspec("clip/text/token_embedding") == P("model", None)
    assert param_pspec("clip/visual/ln_pre/scale") == P()
    assert param_pspec("clip/logit_scale") == P()


def _data(batch=8, seed=0):
    rng = np.random.default_rng(seed)
    vis = rng.normal(size=(batch, 3, 32, 32)).astype(np.float32)
    title = rng.integers(1, 49405, size=(batch, 77)).astype(np.int32)
    comments = rng.integers(1, 49405, size=(batch, 2, 77)).astype(np.int32)
    return vis, title, comments


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """One dp=4 x tp=2 training step must produce the same loss and params
    as the unsharded step (GSPMD correctness of our shardings)."""
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        random_skip_adapter=False,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}}, None, 1
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)

    def make_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats", {}),
        )

    vis, title, comments = _data()
    rng = jax.random.PRNGKey(7)

    # single device
    state1 = make_state(variables["params"])
    new1, loss1, _ = train_step(
        state1, (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)),
        {}, rng,
    )

    # dp=4 x tp=2
    mesh = create_mesh(4, 2)
    shardings = tree_shardings(variables["params"], mesh)
    params = jax.device_put(variables["params"], shardings)
    state2 = make_state(params)
    ds = NamedSharding(mesh, P(DATA_AXIS))
    with mesh:
        new2, loss2, _ = train_step(
            state2,
            (
                jax.device_put(vis, ds),
                jax.device_put(title, ds),
                jax.device_put(comments, ds),
            ),
            {},
            rng,
        )

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p1 = np.asarray(jax.device_get(new1.params["cam"]["final_linear"]))
    p2 = np.asarray(jax.device_get(new2.params["cam"]["final_linear"]))
    np.testing.assert_allclose(p1, p2, atol=1e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_dryrun_driver_call_path():
    """Replicate the DRIVER's exact invocation: a fresh process where the
    default (possibly TPU) backend initializes first and conftest's CPU-mesh
    bootstrap never runs — dryrun_multichip must self-bootstrap. Round-1
    shipped with this path broken (MULTICHIP_r01.json ok=false) because only
    the conftest-forced path was tested."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            # pre-initialize the default backend before calling dryrun, as
            # the driver process does (sitecustomize + any jax use)
            "import jax; jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout


def test_entry_compiles_tiny():
    """entry() builds the full ViT-B/32 model — too heavy for unit tests —
    so compile-check the same forward at the tiny variant here."""
    module, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY)
    vis, title, comments = _data(4)

    fn = jax.jit(
        lambda v, t, c: module.apply(variables, v, t, c)[2]
    )
    sim = fn(jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments))
    assert sim.shape == (4, 4)
    assert np.isfinite(np.asarray(sim)).all()


@pytest.mark.slow
def test_collective_profile_is_pinned():
    """Audit the GSPMD collectives of the compiled dp/dp×tp train step on
    the CPU mesh (the multichip comms contract this framework ships).

    * pure data-parallel must need NO resharding collectives — only
      gradient/loss all-reduces and the contrastive loss's embedding
      all-gathers (in-batch InfoNCE is global by construction);
    * dp×tp must need NO resharding collectives either: the fused qkv is
      stored [3, E, E] (layers.MultiHeadAttention), so the model-axis row
      split shards each projection on head boundaries and the only TP comms
      are the Megatron all-reduces. Round 2 pinned a2a=64 / cp=22 from the
      flat torch-ordered [3E, E] split; the explicit qkv axis drives both
      to zero.
    """
    import re

    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.parallel.mesh import tree_shardings

    def counts(n_data, n_model):
        mesh = create_mesh(n_data, n_model)
        module, variables = create_model(
            "PretrainedCLIP", model_type="test-tiny", seed=0
        )
        params = jax.device_put(
            variables["params"], tree_shardings(variables["params"], mesh)
        )
        rng = np.random.default_rng(0)
        vis = jax.device_put(
            rng.normal(size=(8, 3, 32, 32)).astype(np.float32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
        toks = jax.device_put(
            rng.integers(1, 49000, (8, 12)).astype(np.int32),
            NamedSharding(mesh, P(DATA_AXIS)),
        )

        def loss_fn(params, vis, toks):
            return clip_loss(module.apply({"params": params}, vis, toks), {})

        with mesh:
            txt = (
                jax.jit(jax.value_and_grad(loss_fn))
                .lower(params, vis, toks)
                .compile()
                .as_text()
            )
        out = {}
        for op in (
            "all-reduce", "all-gather", "reduce-scatter",
            "collective-permute", "all-to-all",
        ):
            out[op] = len(re.findall(rf"\b{op}(?:-start)?\.", txt)) + len(
                re.findall(rf" {op}\(", txt)
            )
        return out

    dp = counts(8, 1)
    assert dp["all-to-all"] == 0 and dp["collective-permute"] == 0, dp
    assert dp["all-reduce"] > 0  # gradient psums exist

    dptp = counts(4, 2)
    # measured profile at pin time (head-major qkv): ar=213 ag=44 cp=0 a2a=0
    assert dptp["all-to-all"] == 0, dptp
    assert dptp["collective-permute"] == 0, dptp
    assert dptp["all-reduce"] <= 260, dptp
    assert dptp["all-gather"] <= 60, dptp


def test_tp_qkv_flag_tracks_newest_mesh():
    """create_mesh(tp>1) switches attention to the per-projection qkv dots;
    a later tp=1 mesh switches BACK (the flag must not latch on and degrade
    subsequent single-chip traces)."""
    from vtc_tpu.models import layers

    devs = jax.devices()
    try:
        create_mesh(4, 2, devices=devs)
        assert layers.use_tp_qkv()
    finally:
        create_mesh(8, 1, devices=devs)
    assert not layers.use_tp_qkv()


def test_tree_shardings_rejects_indivisible_tp():
    """tp=3 does not divide the text tower's E=512 qkv rows: GSPMD would pad
    and reshard, voiding the pinned zero-collective profile — reject it at
    the point where params meet the mesh."""
    import pytest

    mesh = create_mesh(2, 3, devices=jax.devices()[:6])
    try:
        tree = {"attn": {"in_proj_weight": jnp.zeros((3, 512, 512))}}
        with pytest.raises(ValueError, match="does not divide"):
            tree_shardings(tree, mesh)
    finally:
        create_mesh(8, 1, devices=jax.devices())


def test_tp_degree_must_divide_head_count():
    """Parameter-dim divisibility alone cannot catch tp=8 on a 4-head tiny
    tower (dims 32/128 all divide by 8); the trace-time check in
    qkv_project must (zero-collective contract, parallel/mesh.py:15-18)."""
    from vtc_tpu.models import layers

    create_mesh(1, 8)  # sets the tp-qkv policy to degree 8
    try:
        with pytest.raises(ValueError, match="head count"):
            create_model("PretrainedCLIP", model_type="test-tiny", seed=0)
    finally:
        layers.set_tp_qkv(False)


def test_multislice_mesh_axes():
    """--slices builds a ("replica","data","model") mesh: replica (the only
    DCN-crossing axis) outermost, tp innermost — the scaling-book layout."""
    from vtc_tpu.parallel.mesh import batch_pspec, create_mesh as cm

    mesh = cm(2, 2, n_replica=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "replica": 2, "data": 2, "model": 2,
    }
    assert batch_pspec(mesh) == P(("replica", "data"))
    # single-slice meshes and their batch spec are unchanged
    mesh1 = cm(4, 2)
    assert mesh1.axis_names == ("data", "model")
    assert batch_pspec(mesh1) == P(DATA_AXIS)


@pytest.mark.slow
def test_multislice_train_step_matches_single_device():
    """One replica=2 x dp=2 x tp=2 training step ≡ the unsharded step: the
    replica axis is pure cross-slice data parallelism, so adding it must
    not change loss or updates (GSPMD inserts the extra gradient psum)."""
    from vtc_tpu.parallel.mesh import batch_pspec, create_mesh as cm

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        random_skip_adapter=False,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}}, None, 1
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)

    def make_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats", {}),
        )

    vis, title, comments = _data()
    rng = jax.random.PRNGKey(7)

    state1 = make_state(variables["params"])
    new1, loss1, _ = train_step(
        state1, (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)),
        {}, rng,
    )

    mesh = cm(2, 2, n_replica=2)
    params = jax.device_put(
        variables["params"], tree_shardings(variables["params"], mesh)
    )
    state2 = make_state(params)
    ds = NamedSharding(mesh, batch_pspec(mesh))
    with mesh:
        new2, loss2, _ = train_step(
            state2,
            tuple(jax.device_put(a, ds) for a in (vis, title, comments)),
            {}, rng,
        )

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p1 = np.asarray(jax.device_get(new1.params["cam"]["final_linear"]))
    p2 = np.asarray(jax.device_get(new2.params["cam"]["final_linear"]))
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    # the batch really is sharded over replica x data (8 rows / 4 shards,
    # replicated over tp): every device holds 2 rows
    b = jax.device_put(vis, ds)
    assert b.addressable_shards[0].data.shape[0] == vis.shape[0] // 4


@pytest.mark.slow
def test_multislice_composes_with_fsdp():
    """fsdp on a multi-slice mesh shards weights/moments over the INTRA-
    slice data axis only (weight all-gathers stay on ICI; only the gradient
    psum crosses the replica/DCN axis) — and stays exact."""
    from vtc_tpu.parallel.mesh import batch_pspec, create_mesh as cm

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        random_skip_adapter=False,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}}, None, 1
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)

    def make_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats", {}),
        )

    vis, title, comments = _data()
    rng = jax.random.PRNGKey(7)
    state1 = make_state(variables["params"])
    _, loss1, _ = train_step(
        state1, (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)),
        {}, rng,
    )

    mesh = cm(4, 1, n_replica=2)
    params = jax.device_put(
        variables["params"], tree_shardings(variables["params"], mesh, fsdp=True)
    )
    emb = params["clip"]["text"]["token_embedding"]
    # sharded over data(4) only, REPLICATED over replica(2): 8 addressable
    # shards but only a 1/4 reduction per shard
    assert emb.addressable_shards[0].data.size == emb.size // 4
    state2 = make_state(params)
    ds = NamedSharding(mesh, batch_pspec(mesh))
    with mesh:
        _, loss2, _ = train_step(
            state2,
            tuple(jax.device_put(a, ds) for a in (vis, title, comments)),
            {}, rng,
        )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
