"""Trainer / optimizer tests: 4-group param classification, freeze masks,
the minimum end-to-end training slice (cached features + frozen CLIP + CAM,
the ``pretrained_clip_comments_attn_frozen.jsonc`` path), checkpoint
save/resume, and image->video warm start."""

import json
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from vtc_tpu.config import ConfigParser
from vtc_tpu.data import DataLoader, FeaturesDataset
from vtc_tpu.data import tokenizer as tk
from vtc_tpu.models import create_model
from vtc_tpu.ops.losses import clip_loss
from vtc_tpu.training.checkpoints import (
    assert_warm_start_keys,
    graft_params,
    load_checkpoint,
    save_checkpoint,
)
from vtc_tpu.training.metrics import RecallAtK
from vtc_tpu.models.torch_import import qkv_to_torch
from vtc_tpu.training.optim import (
    build_optimizer,
    classify_param,
    frozen_predicate,
    param_labels,
)
from vtc_tpu.training.trainer import Trainer

TINY = "test-tiny"
DIM = 32
BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def test_classify_param_groups():
    assert classify_param("clip/text/text_projection") == "fc"
    assert classify_param("clip/visual/proj") == "fc"
    assert classify_param("cam/final_transformer/resblocks_0/attn/in_proj_weight") == "adapter"
    assert classify_param("cam/final_linear") == "adapter"
    assert classify_param("cam/mask_embedding") == "adapter"
    assert classify_param("clip/visual/transformer_resblocks_0/timeattn/in_proj_weight") == "time"
    assert classify_param("clip/visual/temporal_embed") == "time"
    assert classify_param("clip/visual/transformer/resblocks_0/mlp/c_fc/kernel") == "rest"
    assert classify_param("clip/text/token_embedding") == "rest"


def test_param_labels_partition_complete():
    """Every trainable param lands in exactly one group — the JAX analogue
    of the completeness assert at train.py:145-150."""
    _, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY)
    labels = param_labels(variables["params"])
    leaves = jax.tree_util.tree_leaves(labels)
    valid = {
        f"{g}_{d}" for g in ("rest", "adapter", "fc", "time")
        for d in ("decay", "nodecay")
    } | {"frozen"}
    assert all(l in valid for l in leaves)
    # no-decay for biases / LN / embeddings
    flat = dict(
        (("/".join(str(getattr(p, 'key', p)) for p in path)), l)
        for path, l in jax.tree_util.tree_leaves_with_path(labels)
    )
    assert flat["clip/text/token_embedding"].endswith("nodecay")
    assert flat["clip/visual/ln_pre/scale"].endswith("nodecay")
    assert flat["cam/final_transformer/resblocks_0/attn/out_proj/bias"].endswith("nodecay")
    assert flat["cam/final_transformer/resblocks_0/attn/in_proj_weight"] == "adapter_decay"


def test_frozen_predicate_variants():
    frozen_all = frozen_predicate("all")
    assert frozen_all("clip/visual/proj")
    assert frozen_all("clip/text/token_embedding")
    assert not frozen_all("cam/final_linear")

    frozen_text = frozen_predicate("text")
    # reference freezes only the text transformer (model/model.py:282-285)
    assert frozen_text("clip/text/transformer/resblocks_0/ln_1/scale")
    assert not frozen_text("clip/text/token_embedding")
    assert not frozen_text("clip/text/text_projection")

    frozen_ft = frozen_predicate("finaltf")
    assert frozen_ft("cam/final_linear")
    assert not frozen_ft("clip/visual/proj")

    assert not frozen_predicate(False)("clip/visual/proj")
    assert not frozen_predicate("none")("clip/visual/proj")


def _make_features_fixture(tmp_path, n=72, d=DIM, seed=0):
    """Synthetic correlated vis/text features so InfoNCE has signal."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rid_str = "ab" + BASE36[(i * 7) % 36] + BASE36[i % 36]
        rows.append(
            {
                "reddit_id": int(rid_str, 36),
                "video_path": f"results/v/{rid_str}.mp4",
                "title": f"t {i}",
                "video_length": 5.0,
                "comments": str(["c"]),
            }
        )
    df = pd.DataFrame(rows).drop_duplicates("reddit_id")
    csv = tmp_path / "posts.csv"
    df.to_csv(csv, index=False)

    latent = rng.normal(size=(len(df), d)).astype(np.float32)
    vis = latent + 0.1 * rng.normal(size=latent.shape).astype(np.float32)
    txt = latent + 0.1 * rng.normal(size=latent.shape).astype(np.float32)
    np.savez(tmp_path / "vis.npz", reddit_ids=df.reddit_id.to_numpy(np.int64), embeddings=vis)
    np.savez(tmp_path / "txt.npz", reddit_ids=df.reddit_id.to_numpy(np.int64), embeddings=txt)
    return csv


class _FeatureCommentDataset:
    """vis-features + tokenized title + comments: the frozen-CLIP CAM slice."""

    def __init__(self, csv, vis_path, train=True):
        from vtc_tpu.data.partition import partition_dataframe

        df = pd.read_csv(csv)
        df = partition_dataframe(df, split="train" if train else "val")
        from vtc_tpu.data.partition import load_features

        self.vis = load_features(df, vis_path)
        self.titles = [f"title {i} words" for i in range(len(df))]
        self.n = len(df)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        title = tk.tokenize(self.titles[i])[0]
        comments = tk.tokenize([f"comment {i}", ""])
        return self.vis[i], title, comments, {"id": i}


def _min_config(tmp_path, epochs=2):
    cfg = {
        "name": "slice",
        "batch_size": 8,
        "arch": {"type": "PretrainedCLIP_finaltf", "args": {"model_type": TINY, "freeze": "all"}},
        "optimizer": {"type": "Adam", "args": {"lr": 0.01, "weight_decay": 0, "amsgrad": True}},
        "loss": "clip_loss",
        "lr_scheduler": {"type": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        "trainer": {
            "epochs": epochs,
            "save_dir": str(tmp_path / "saved"),
            "save_period": 1,
            "verbosity": 2,
            "monitor": "max val_titles_from_visual-recall_at_10",
            "early_stop": 10,
            "tensorboard": False,
        },
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    from vtc_tpu.utils import read_json

    return ConfigParser(read_json(p))


def test_end_to_end_training_slice(tmp_path):
    """config -> data -> frozen-CLIP CAM model -> loss -> metrics -> ckpt in
    one pass (build plan stage 5)."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    val_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=False)
    train_loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True, num_workers=0)
    val_loader = DataLoader(val_ds, batch_size=len(val_ds), num_workers=0)

    tx = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(train_loader), branch_to_freeze="all",
    )
    trainer = Trainer(
        module, variables, clip_loss,
        [RecallAtK("visual", "titles", [1, 10])],
        tx, config, train_loader, val_loader,
        arch_name="PretrainedCLIP_finaltf",
    )
    log = trainer.train()

    assert "loss" in log and np.isfinite(log["loss"])
    assert "val_titles_from_visual-recall_at_10" in log

    params1 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    # frozen CLIP params unchanged
    np.testing.assert_array_equal(
        params0["clip"]["visual"]["proj"], params1["clip"]["visual"]["proj"]
    )
    np.testing.assert_array_equal(
        params0["clip"]["text"]["token_embedding"],
        params1["clip"]["text"]["token_embedding"],
    )
    # CAM params did train
    assert not np.array_equal(
        params0["cam"]["mask_embedding"], params1["cam"]["mask_embedding"]
    )

    # checkpoints written with the reference's naming
    assert (config.save_dir / "checkpoint-epoch1").exists()
    assert (config.save_dir / "checkpoint-epoch2").exists()
    assert (config.save_dir / "model_best").exists()

    # resume restores epoch and params
    ckpt = load_checkpoint(config.save_dir / "checkpoint-epoch2")
    assert int(ckpt["epoch"]) == 2
    np.testing.assert_array_equal(
        np.asarray(ckpt["params"]["cam"]["mask_embedding"]),
        params1["cam"]["mask_embedding"],
    )


def test_empty_validation_loader_warns_root_cause(tmp_path):
    """drop_last validation (reference parity) with a (per-host) val split
    smaller than batch_size yields zero batches; monitoring then silently
    turns off with a misleading 'Metric not found' symptom. The trainer must
    name the ROOT CAUSE loudly (found by the real 2-process multihost test:
    each host's sharded val split undershot the batch size)."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    val_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=False)
    train_loader = DataLoader(
        train_ds, batch_size=8, shuffle=True, drop_last=True, num_workers=0
    )
    # batch_size larger than the val split + drop_last -> zero batches
    val_loader = DataLoader(
        val_ds, batch_size=len(val_ds) + 1, drop_last=True, num_workers=0
    )
    assert len(val_loader) == 0

    tx = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(train_loader), branch_to_freeze="all",
    )
    trainer = Trainer(
        module, variables, clip_loss,
        [RecallAtK("visual", "titles", [1, 10])],
        tx, config, train_loader, val_loader,
        arch_name="PretrainedCLIP_finaltf",
    )
    # collect records straight off the trainer's logger: the run-dir logging
    # dictConfig replaces root handlers, so pytest's caplog can miss these
    records = []

    class _Collect(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = _Collect(level=logging.WARNING)
    trainer.logger.addHandler(handler)
    try:
        log = trainer.train()
    finally:
        trainer.logger.removeHandler(handler)
    assert "val_titles_from_visual-recall_at_10" not in log
    zero_warn = [m for m in records if "ZERO batches" in m]
    assert zero_warn, "missing the zero-val-batches root-cause warning"


def test_loss_decreases_with_training(tmp_path):
    """Direct sanity: adapter-only training on correlated features reduces
    the InfoNCE loss."""
    csv = _make_features_fixture(tmp_path)
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all",
        random_skip_adapter=False, seed=0,
    )
    ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True, num_workers=0)

    from vtc_tpu.training.trainer import TrainState, make_step_fns

    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 0.02}},
        None, steps_per_epoch=1, branch_to_freeze="all",
    )
    train_step, _ = make_step_fns(module, clip_loss, tx)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )
    losses = []
    rng = jax.random.PRNGKey(0)
    for epoch in range(6):
        for (vis, title, comments, meta) in loader:
            state, loss, _ = train_step(
                state, (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)),
                {}, jax.random.fold_in(rng, int(state.step)),
            )
            losses.append(float(loss))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 0.05


@pytest.mark.slow  # two full step-fn compiles (~100 s on the 1-core CPU mesh)
def test_accum_steps_exact_large_batch():
    """`trainer.accum_steps` (beyond reference): the scanned/rematerialized
    accumulation step must reproduce the UNaccumulated step exactly on a
    deterministic model — same loss AND same updated params — because the
    InfoNCE is computed over the FULL batch's similarity matrix (GradCache
    semantics), not averaged over per-microbatch losses. A naive
    grad-averaging implementation fails this test (different negatives)."""
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all",
        random_skip_adapter=False, seed=0,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}},
        None, steps_per_epoch=1, branch_to_freeze="all",
    )
    plain, _ = make_step_fns(module, clip_loss, tx, donate=False)
    accum, _ = make_step_fns(
        module, clip_loss, tx, donate=False, accum_steps=4
    )

    rng = np.random.default_rng(3)
    batch = 8
    vis = jnp.asarray(rng.normal(size=(batch, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(rng.integers(1, 100, (batch, 77)).astype(np.int32))
    comments = jnp.asarray(
        rng.integers(1, 100, (batch, 3, 77)).astype(np.int32)
    )

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
        )

    key = jax.random.PRNGKey(0)
    s_p, loss_p, out_p = plain(fresh_state(), (vis, title, comments), {}, key)
    s_a, loss_a, out_a = accum(fresh_state(), (vis, title, comments), {}, key)

    np.testing.assert_allclose(float(loss_a), float(loss_p), rtol=1e-5)
    # full-batch sim matrix reconstructed identically
    np.testing.assert_allclose(
        np.asarray(out_a[2]), np.asarray(out_p[2]), atol=1e-4
    )
    for (kp, lp), (ka, la) in zip(
        jax.tree_util.tree_leaves_with_path(s_p.params),
        jax.tree_util.tree_leaves_with_path(s_a.params),
    ):
        assert kp == ka
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lp), atol=1e-5, err_msg=str(kp)
        )


def test_accum_steps_refuses_batchnorm_models():
    """Per-microbatch BatchNorm statistics would silently change training
    semantics — the accumulating step must raise, not deviate."""
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all",
        residual_activation="bn", random_skip_adapter=False, seed=0,
    )
    assert "batch_stats" in variables
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}},
        None, 1, branch_to_freeze="all",
    )
    accum, _ = make_step_fns(
        module, clip_loss, tx, donate=False, accum_steps=2
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables["batch_stats"],
    )
    rng = np.random.default_rng(0)
    data = (
        jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32)),
        jnp.asarray(tk.tokenize([f"t {i}" for i in range(8)])),
        jnp.asarray(np.stack([tk.tokenize(["c", ""]) for _ in range(8)])),
    )
    with pytest.raises(ValueError, match="BatchNorm"):
        accum(state, data, {}, jax.random.PRNGKey(0))


def test_accum_steps_validates_divisibility():
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all",
        random_skip_adapter=False, seed=0,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}},
        None, steps_per_epoch=1, branch_to_freeze="all",
    )
    accum, _ = make_step_fns(
        module, clip_loss, tx, donate=False, accum_steps=3
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(8, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(rng.integers(1, 100, (8, 77)).astype(np.int32))
    comments = jnp.asarray(rng.integers(1, 100, (8, 3, 77)).astype(np.int32))
    with pytest.raises(ValueError, match="accum_steps"):
        accum(state, (vis, title, comments), {}, jax.random.PRNGKey(0))


def test_fsdp_multihost_accepted(tmp_path, monkeypatch):
    """fsdp + multihost is a supported combination (round 4): checkpoints
    go down the distributed path — save_checkpoint hands non-addressable
    global jax.Arrays straight to orbax instead of bulk-device_get'ing
    (test_fsdp.py::test_fsdp_distributed_checkpoint_roundtrip pins that
    path) — so Trainer init must accept it rather than refuse."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path)
    config.config["fsdp"] = True
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(ds, batch_size=8, drop_last=True, num_workers=0)
    tx = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    trainer = Trainer(module, variables, clip_loss, [], tx, config, loader,
                      arch_name="PretrainedCLIP_finaltf")
    assert trainer.fsdp


def test_checkpoint_multihost_write_contract(tmp_path, monkeypatch):
    """Multihost checkpoint contract: the orbax save is COLLECTIVE — every
    rank must call it (orbax's primary writes, the rest barrier; a rank-0
    `if` would deadlock the barrier) — while the plain-file meta sidecar is
    rank-0-only (same-path writes race on a shared filesystem)."""
    from vtc_tpu.training import checkpoints as C

    saves = []

    class FakeCkptr:
        def save(self, path, payload, force=False):
            saves.append(str(path))

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(C.ocp, "StandardCheckpointer", FakeCkptr)
    params = {"w": np.zeros(2, np.float32)}

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    save_checkpoint(tmp_path, "ck", arch="A", epoch=1, params=params,
                    opt_state=None)
    assert len(saves) == 1  # nonzero rank still participates in the save
    assert not (tmp_path / "ck.meta.json").exists()  # but no sidecar

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    save_checkpoint(tmp_path, "ck", arch="A", epoch=1, params=params,
                    opt_state=None)
    assert len(saves) == 2
    assert (tmp_path / "ck.meta.json").exists()


def test_recall_metric_gathers_global_arrays(monkeypatch):
    """RecallAtK.update must route non-fully-addressable (multi-host
    global) arrays through process_allgather — plain np.asarray raises on
    them, and the local shard alone would shrink the gallery."""
    from vtc_tpu.training import metrics as M

    calls = []

    class FakeGlobal:
        is_fully_addressable = False

        def __init__(self, v):
            self.v = v

    def fake_allgather(x, tiled=False):
        assert tiled
        calls.append(x)
        return x.v

    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    m = RecallAtK("a", "b", [1])
    feats = np.eye(4, dtype=np.float32)
    m.update(0.0, (FakeGlobal(feats), feats), {})
    assert len(calls) == 1  # the ordinary ndarray went straight to asarray
    res = m.result()
    assert res["b_from_a-recall_at_1"] == 1.0


@pytest.mark.slow
def test_warm_start_image_to_video(tmp_path):
    """Image CAM checkpoint -> TimeSformer video model: missing keys must be
    time/temporal, unexpected none (base_trainer.py:165-176)."""
    _, img_vars = create_model("PretrainedCLIP_finaltf", model_type=TINY, seed=0)
    _, vid_vars = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=4, seed=1
    )

    # the visual towers have different layouts (ViT vs TimeSformer); the
    # shared CLIP text tower, CAM, and logit_scale must graft
    img_params = jax.tree_util.tree_map(np.asarray, img_vars["params"])
    vid_params = jax.tree_util.tree_map(np.asarray, vid_vars["params"])

    # simulate the reference's warm start: load image ckpt into video model
    from vtc_tpu.models.timesformer import timesformer_params_from_clip_visual
    from vtc_tpu.models.clip_model import CLIP_VARIANTS

    img_params["clip"]["visual"] = timesformer_params_from_clip_visual(
        img_params["clip"]["visual"], CLIP_VARIANTS[TINY], nframes=4
    )
    merged, missing, unexpected = graft_params(vid_params, img_params)
    assert missing == [] and unexpected == []
    assert_warm_start_keys(missing, unexpected)

    # the warm-start guard must ACCEPT time/temporal-only mismatches and
    # REJECT anything else (base_trainer.py:165-176's asserted patterns)
    assert_warm_start_keys(
        ["clip/visual/temporal_embed", "clip/visual/x/timeattn/in_proj_weight"],
        ["cam/final_linear", "cam/mask_embedding"],
    )
    with pytest.raises(AssertionError):
        assert_warm_start_keys(["clip/visual/conv1"], [])
    with pytest.raises(AssertionError):
        assert_warm_start_keys([], ["clip/text/token_embedding"])


def test_checkpoint_roundtrip_orbax(tmp_path):
    _, variables = create_model("PretrainedCLIP", model_type=TINY, seed=0)
    params = variables["params"]
    path = save_checkpoint(
        tmp_path, "checkpoint-epoch1", arch="PretrainedCLIP", epoch=1,
        params=params, opt_state=None, monitor_best=0.5,
        config={"name": "x"},
    )
    restored = load_checkpoint(path)
    assert int(restored["epoch"]) == 1
    assert float(restored["monitor_best"]) == 0.5
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["clip"]["visual"]["proj"]),
        np.asarray(params["clip"]["visual"]["proj"]),
    )


def test_async_checkpoint_roundtrip(tmp_path):
    """`trainer.async_checkpoint` (beyond reference): the save returns after
    the device→host copy and commits in the background; a subsequent load —
    even an immediate in-process one — must see the full committed payload
    (load_checkpoint waits on pending async saves)."""
    from vtc_tpu.training.checkpoints import wait_for_checkpoints

    _, variables = create_model("PretrainedCLIP", model_type=TINY, seed=4)
    params = variables["params"]
    path = save_checkpoint(
        tmp_path, "checkpoint-epoch1", arch="PretrainedCLIP", epoch=1,
        params=params, opt_state=None, monitor_best=0.25,
        config={"name": "x"}, async_save=True,
    )
    restored = load_checkpoint(path)  # waits internally
    assert int(restored["epoch"]) == 1
    assert float(restored["monitor_best"]) == 0.25
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["clip"]["visual"]["proj"]),
        np.asarray(params["clip"]["visual"]["proj"]),
    )
    # back-to-back saves serialize (no pending-save error)
    save_checkpoint(
        tmp_path, "model_best", arch="PretrainedCLIP", epoch=1,
        params=params, opt_state=None, monitor_best=0.25,
        config={"name": "x"}, async_save=True,
    )
    wait_for_checkpoints()
    assert (tmp_path / "model_best").exists()


def test_import_reference_torch_checkpoint(tmp_path):
    """A torch .pth in the reference's exact format loads into our model and
    produces identical CAM behavior (structure-level parity; real-weight
    parity is covered by the HF tests)."""
    import torch

    module, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY, seed=3)
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        sd[key] = torch.from_numpy(a.T.copy() if transpose else a.copy())

    # CLIP under "model." prefix (visual)
    v = p["clip"]["visual"]
    sd["model.visual.conv1.weight"] = torch.from_numpy(
        np.asarray(v["conv1"]).reshape(64, 3, 8, 8).copy()
    )
    put("model.visual.class_embedding", v["class_embedding"])
    put("model.visual.positional_embedding", v["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        put(f"model.visual.{ln}.weight", v[ln]["scale"])
        put(f"model.visual.{ln}.bias", v[ln]["bias"])
    put("model.visual.proj", v["proj"])

    def put_block(prefix, blk):
        put(f"{prefix}.attn.in_proj_weight",
            qkv_to_torch(blk["attn"]["in_proj_weight"]))
        put(f"{prefix}.attn.in_proj_bias",
            qkv_to_torch(blk["attn"]["in_proj_bias"]))
        put(f"{prefix}.attn.out_proj.weight", blk["attn"]["out_proj"]["kernel"], True)
        put(f"{prefix}.attn.out_proj.bias", blk["attn"]["out_proj"]["bias"])
        for ln in ("ln_1", "ln_2"):
            put(f"{prefix}.{ln}.weight", blk[ln]["scale"])
            put(f"{prefix}.{ln}.bias", blk[ln]["bias"])
        for fc in ("c_fc", "c_proj"):
            put(f"{prefix}.mlp.{fc}.weight", blk["mlp"][fc]["kernel"], True)
            put(f"{prefix}.mlp.{fc}.bias", blk["mlp"][fc]["bias"])

    for i in range(2):
        put_block(
            f"model.visual.transformer.resblocks.{i}",
            v["transformer"][f"resblocks_{i}"],
        )
    t = p["clip"]["text"]
    put("model.token_embedding.weight", t["token_embedding"])
    put("model.positional_embedding", t["positional_embedding"])
    put("model.ln_final.weight", t["ln_final"]["scale"])
    put("model.ln_final.bias", t["ln_final"]["bias"])
    put("model.text_projection", t["text_projection"])
    for i in range(2):
        put_block(
            f"model.transformer.resblocks.{i}", t["transformer"][f"resblocks_{i}"]
        )
    put("model.logit_scale", p["clip"]["logit_scale"])
    # CAM
    for i in range(2):
        put_block(
            f"final_transformer.resblocks.{i}",
            p["cam"]["final_transformer"][f"resblocks_{i}"],
        )
    put("final_linear.weight", p["cam"]["final_linear"], True)
    put("mask_embedding", p["cam"]["mask_embedding"])

    ckpt_path = tmp_path / "model_best.pth"
    torch.save(
        {"arch": "PretrainedCLIP_finaltf", "epoch": 3, "state_dict": sd,
         "monitor_best": 0.4,
         "config": {"arch": {"type": "PretrainedCLIP_finaltf"}}},
        ckpt_path,
    )

    restored = load_checkpoint(ckpt_path)
    assert int(restored["epoch"]) == 3
    merged, missing, unexpected = graft_params(p, restored["params"])
    assert missing == [] and unexpected == []

    # forward parity: restored params reproduce the original model exactly
    vis = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32)
    title = jnp.asarray(tk.tokenize(["a", "b"]))
    comments = jnp.asarray(np.stack([tk.tokenize(["x", "y"])] * 2))
    out1 = module.apply({"params": p}, vis, title, comments)
    out2 = module.apply({"params": merged}, vis, title, comments)
    np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out2[2]), atol=1e-5)


def test_import_reference_timesformer_checkpoint(tmp_path):
    """A torch .pth in the reference's TimeSformer format (timeattn/ln_time/
    temporal_fc/temporal_embed keys under model.visual) loads into
    PretrainedCLIP_TimeSformer_finaltf with forward parity."""
    import torch

    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=4, seed=5
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        sd[key] = torch.from_numpy(a.T.copy() if transpose else a.copy())

    def put_attn(prefix, attn):
        put(f"{prefix}.in_proj_weight", qkv_to_torch(attn["in_proj_weight"]))
        put(f"{prefix}.in_proj_bias", qkv_to_torch(attn["in_proj_bias"]))
        put(f"{prefix}.out_proj.weight", attn["out_proj"]["kernel"], True)
        put(f"{prefix}.out_proj.bias", attn["out_proj"]["bias"])

    def put_block(prefix, blk, time=False):
        put_attn(f"{prefix}.attn", blk["attn"])
        for ln in ("ln_1", "ln_2"):
            put(f"{prefix}.{ln}.weight", blk[ln]["scale"])
            put(f"{prefix}.{ln}.bias", blk[ln]["bias"])
        for fc in ("c_fc", "c_proj"):
            put(f"{prefix}.mlp.{fc}.weight", blk["mlp"][fc]["kernel"], True)
            put(f"{prefix}.mlp.{fc}.bias", blk["mlp"][fc]["bias"])
        if time:
            put_attn(f"{prefix}.timeattn", blk["timeattn"])
            put(f"{prefix}.ln_time.weight", blk["ln_time"]["scale"])
            put(f"{prefix}.ln_time.bias", blk["ln_time"]["bias"])
            put(f"{prefix}.temporal_fc.weight", blk["temporal_fc"]["kernel"], True)
            put(f"{prefix}.temporal_fc.bias", blk["temporal_fc"]["bias"])

    v = p["clip"]["visual"]
    sd["model.visual.conv1.weight"] = torch.from_numpy(
        np.asarray(v["conv1"]).reshape(64, 3, 8, 8).copy()
    )
    put("model.visual.class_embedding", v["class_embedding"])
    put("model.visual.positional_embedding", v["positional_embedding"])
    put("model.visual.temporal_embed", v["temporal_embed"])
    for ln in ("ln_pre", "ln_post"):
        put(f"model.visual.{ln}.weight", v[ln]["scale"])
        put(f"model.visual.{ln}.bias", v[ln]["bias"])
    put("model.visual.proj", v["proj"])
    for i in range(2):
        put_block(
            f"model.visual.transformer.resblocks.{i}",
            v[f"transformer_resblocks_{i}"], time=True,
        )

    t = p["clip"]["text"]
    put("model.token_embedding.weight", t["token_embedding"])
    put("model.positional_embedding", t["positional_embedding"])
    put("model.ln_final.weight", t["ln_final"]["scale"])
    put("model.ln_final.bias", t["ln_final"]["bias"])
    put("model.text_projection", t["text_projection"])
    for i in range(2):
        put_block(
            f"model.transformer.resblocks.{i}", t["transformer"][f"resblocks_{i}"]
        )
    put("model.logit_scale", p["clip"]["logit_scale"])
    for i in range(2):
        put_block(
            f"final_transformer.resblocks.{i}",
            p["cam"]["final_transformer"][f"resblocks_{i}"],
        )
    put("final_linear.weight", p["cam"]["final_linear"], True)
    put("mask_embedding", p["cam"]["mask_embedding"])

    ckpt_path = tmp_path / "video_best.pth"
    torch.save(
        {"arch": "PretrainedCLIP_TimeSformer_finaltf", "epoch": 7,
         "state_dict": sd, "monitor_best": 0.4, "config": {}},
        ckpt_path,
    )

    restored = load_checkpoint(ckpt_path)
    merged, missing, unexpected = graft_params(p, restored["params"])
    assert missing == [] and unexpected == [], (missing[:3], unexpected[:3])

    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32))
    from vtc_tpu.data import tokenizer as tk2

    title = jnp.asarray(tk2.tokenize(["a", "b"]))
    comments = jnp.asarray(np.stack([tk2.tokenize(["x", "y"])] * 2))
    out1 = module.apply({"params": p}, vis, title, comments)
    out2 = module.apply({"params": merged}, vis, title, comments)
    np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out2[2]), atol=1e-5)


@pytest.mark.slow
def test_training_determinism(tmp_path):
    """Two runs from the same seed produce bitwise-identical parameters —
    the reproducibility the reference approximates with global seeding
    (train.py:34-40) is exact here (explicit PRNG threading)."""
    csv = _make_features_fixture(tmp_path)

    def run():
        module, variables = create_model(
            "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
        )
        ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
        loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                            num_workers=0, seed=11)
        tx = build_optimizer(
            variables["params"], {"type": "Adam", "args": {"lr": 0.01}},
            None, steps_per_epoch=1, branch_to_freeze="all",
        )
        from vtc_tpu.training.trainer import TrainState, make_step_fns

        train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            opt_state=tx.init(variables["params"]), batch_stats={},
        )
        rng = jax.random.PRNGKey(7)
        for vis, title, comments, meta in loader:
            state, loss, _ = train_step(
                state,
                (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)),
                {}, jax.random.fold_in(rng, int(state.step)),
            )
        return jax.tree_util.tree_map(np.asarray, state.params)

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_trainer_resume_roundtrip(tmp_path):
    """Resume semantics: epoch pointer, monitor best, params restored
    (base_trainer.py:147-219)."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=0)
    tx = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    t1 = Trainer(module, variables, clip_loss, [], tx, config, loader,
                 arch_name="PretrainedCLIP_finaltf")
    t1.train()
    ckpt = config.save_dir / "checkpoint-epoch1"
    assert ckpt.exists()

    config2 = _min_config(tmp_path, epochs=3)
    config2.resume = ckpt
    module2, variables2 = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=99
    )
    t2 = Trainer(module2, variables2, clip_loss, [], tx, config2, loader,
                 arch_name="PretrainedCLIP_finaltf")
    assert t2.start_epoch == 2
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["cam"]["mask_embedding"]),
        np.asarray(t1.state.params["cam"]["mask_embedding"]),
    )
    # the optimizer moments actually came back (Orbax returns lists/dicts,
    # so this is restored by flattened-leaf-order graft — a structural
    # tree_map silently fails and would restart Adam from zeros)
    l1 = jax.tree_util.tree_leaves(t1.state.opt_state)
    l2 = jax.tree_util.tree_leaves(t2.state.opt_state)
    assert len(l1) == len(l2) and len(l1) > 0
    moment_norms = 0.0
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, atol=1e-6)
        if a.ndim > 0:
            moment_norms += float(np.abs(a).sum())
    assert moment_norms > 0.0  # trained moments are nonzero, so a zeroed
    # fresh state could not have passed the equality above


@pytest.mark.slow
def test_trainer_iteration_based_mode(tmp_path):
    """len_epoch (inf_loop) mode: an epoch is len_epoch batches regardless of
    dataset size (trainer/trainer.py:37-43)."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=0)
    tx = build_optimizer(
        variables["params"], config["optimizer"], None, 1,
        branch_to_freeze="all",
    )
    t = Trainer(module, variables, clip_loss, [], tx, config, loader,
                len_epoch=7, arch_name="x")
    assert t.len_epoch == 7
    log = t.train()
    assert int(t.state.step) >= 7  # ran past one natural epoch (3 batches)


def test_train_step_with_stateful_bn_activation(tmp_path):
    """residual_activation='bn' carries BatchNorm running stats through the
    compiled train step (mutable batch_stats collection)."""
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all",
        residual_activation="bn", random_skip_adapter=False, seed=0,
    )
    assert "batch_stats" in variables

    from vtc_tpu.training.trainer import TrainState, make_step_fns

    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-2}},
        None, 1, branch_to_freeze="all",
    )
    train_step, eval_step = make_step_fns(module, clip_loss, tx, donate=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables["batch_stats"],
    )
    rng = np.random.default_rng(0)
    data = (
        jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32)),
        jnp.asarray(tk.tokenize([f"t {i}" for i in range(8)])),
        jnp.asarray(np.stack([tk.tokenize(["c", ""]) for _ in range(8)])),
    )
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, loss, _ = train_step(state, data, {}, jax.random.PRNGKey(0))
    stats1 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    # running stats moved
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(stats0)[0]),
        np.asarray(jax.tree_util.tree_leaves(stats1)[0]),
    )
    # eval uses the running stats, deterministic
    l1, out1 = eval_step(state, data, {})
    l2, out2 = eval_step(state, data, {})
    np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out2[2]))


@pytest.mark.slow
def test_uint8_image_path_is_exact(tmp_path):
    """uint8 HWC batch through the jitted step == fp32 host-preprocessed
    batch (the device normalize is the same arithmetic on the same resized
    frame), at 1/4 the host->device bytes."""
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from vtc_tpu.data.preprocess import (
        clip_preprocess,
        clip_resize_uint8,
        normalize_uint8_images,
    )
    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    rng = np.random.default_rng(0)
    pil = PILImage.fromarray(
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    )
    f32 = clip_preprocess(pil, 32)
    u8 = clip_resize_uint8(pil, 32)
    np.testing.assert_allclose(
        np.asarray(normalize_uint8_images(jnp.asarray(u8))), f32, atol=1e-6
    )

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", seed=0,
        random_skip_adapter=False,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-3}}, None, 1
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)

    def state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
        )

    batch_u8 = np.stack([u8] * 4)
    batch_f32 = np.stack([f32] * 4)
    title = np.zeros((4, 77), np.int32); title[:, 0] = 49406; title[:, 1] = 49407
    comments = np.tile(title[:, None], (1, 2, 1))
    key = jax.random.PRNGKey(0)

    _, loss_u8, _ = train_step(
        state(), (jnp.asarray(batch_u8), title, comments), {}, key
    )
    _, loss_f32, _ = train_step(
        state(), (jnp.asarray(batch_f32), title, comments), {}, key
    )
    np.testing.assert_allclose(float(loss_u8), float(loss_f32), rtol=1e-6)


def test_graft_params_migrates_flat_qkv():
    """Checkpoints written before the [3, E, E] qkv storage hold torch's
    flat fused layout ([3E, E] weight / [3E] bias); graft_params migrates
    them with an exact reshape (models/layers.py:173)."""
    _, variables = create_model("PretrainedCLIP", model_type=TINY, seed=0)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def to_legacy(path, leaf):
        name = getattr(path[-1], "key", None)
        if name == "in_proj_weight":
            return leaf.reshape(-1, leaf.shape[-1])
        if name == "in_proj_bias":
            return leaf.reshape(-1)
        return leaf

    legacy = jax.tree_util.tree_map_with_path(to_legacy, params)
    assert any(  # fixture sanity: at least one leaf actually went flat
        l.ndim == 2 for l in jax.tree_util.tree_leaves(legacy)
        if l.shape[:1] != (3,)
    )
    _, fresh = create_model("PretrainedCLIP", model_type=TINY, seed=7)
    merged, missing, unexpected = graft_params(fresh["params"], legacy)
    assert not missing and not unexpected
    for a, b in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_across_optimizer_layout_recovers_schedule_step(tmp_path):
    """A checkpoint holding the optax-chain optimizer state resumed into the
    fused optimizer (leaf-layout mismatch): the moments reset, but the
    lr-schedule position is recovered from the chain's step counter —
    resuming a StepLR run at the undecayed base lr is the divergence risk."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=0)
    tx_chain = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all", fused=False,
    )
    t1 = Trainer(module, variables, clip_loss, [], tx_chain, config, loader,
                 arch_name="PretrainedCLIP_finaltf")
    t1.train()
    ckpt = config.save_dir / "checkpoint-epoch1"
    assert ckpt.exists()

    config2 = _min_config(tmp_path, epochs=3)
    config2.resume = ckpt
    module2, variables2 = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=99
    )
    tx_fused = build_optimizer(
        variables2["params"], config2["optimizer"], config2["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    t2 = Trainer(module2, variables2, clip_loss, [], tx_fused, config2, loader,
                 arch_name="PretrainedCLIP_finaltf")
    assert t2.start_epoch == 2
    assert int(np.asarray(t2.state.opt_state.count)) == len(loader)


def test_graft_params_rejects_transposed_qkv():
    """Only the exact legacy flat layout migrates; a same-size but
    differently-laid-out export ([E, 3E] transposed) must fail loudly, not
    be scrambled by reinterpretation."""
    _, variables = create_model("PretrainedCLIP", model_type=TINY, seed=0)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def transpose_qkv(path, leaf):
        name = getattr(path[-1], "key", None)
        if name == "in_proj_weight":
            return leaf.reshape(-1, leaf.shape[-1]).T.copy()  # [E, 3E]
        return leaf

    bad = jax.tree_util.tree_map_with_path(transpose_qkv, params)
    with pytest.raises(ValueError, match="shape mismatch"):
        graft_params(variables["params"], bad)


def test_resume_fused_into_chain_recovers_schedule_step(tmp_path):
    """The reverse direction (fused checkpoint -> optax-chain trainer) also
    recovers the schedule position: every scalar-int counter in the chain
    state is set to the recovered step."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=0)
    tx_fused = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    t1 = Trainer(module, variables, clip_loss, [], tx_fused, config, loader,
                 arch_name="PretrainedCLIP_finaltf")
    t1.train()

    config2 = _min_config(tmp_path, epochs=3)
    config2.resume = config.save_dir / "checkpoint-epoch1"
    # fresh variables: t1's train step donated the originals
    module2, variables2 = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=99
    )
    tx_chain = build_optimizer(
        variables2["params"], config2["optimizer"], config2["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all", fused=False,
    )
    t2 = Trainer(module2, variables2, clip_loss, [], tx_chain, config2, loader,
                 arch_name="PretrainedCLIP_finaltf")
    counts = [
        int(np.asarray(leaf))
        for leaf in jax.tree_util.tree_leaves(t2.state.opt_state)
        if np.ndim(leaf) == 0
        and np.issubdtype(np.asarray(leaf).dtype, np.integer)
    ]
    assert counts and all(c == len(loader) for c in counts)


def test_resume_with_changed_lr_does_not_restore_optimizer(tmp_path):
    """base_trainer.py:178-194 — a changed optimizer lr (or type) means the
    checkpoint's optimizer state is NOT resumed (stale Adam moments and
    never-decaying amsgrad maxima under a new lr change the dynamics)."""
    csv = _make_features_fixture(tmp_path)
    config = _min_config(tmp_path, epochs=1)

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=0
    )
    train_ds = _FeatureCommentDataset(csv, str(tmp_path / "vis.npz"), train=True)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=0)
    tx = build_optimizer(
        variables["params"], config["optimizer"], config["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    t1 = Trainer(module, variables, clip_loss, [], tx, config, loader,
                 arch_name="PretrainedCLIP_finaltf")
    t1.train()

    config2 = _min_config(tmp_path, epochs=3)
    config2["optimizer"]["args"]["lr"] = 0.0001  # changed vs 0.01
    config2.resume = config.save_dir / "checkpoint-epoch1"
    module2, variables2 = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, freeze="all", seed=99
    )
    tx2 = build_optimizer(
        variables2["params"], config2["optimizer"], config2["lr_scheduler"],
        steps_per_epoch=len(loader), branch_to_freeze="all",
    )
    t2 = Trainer(module2, variables2, clip_loss, [], tx2, config2, loader,
                 arch_name="PretrainedCLIP_finaltf")
    # params restored, but the optimizer state is FRESH (count 0, zero moments)
    assert t2.start_epoch == 2
    assert int(np.asarray(t2.state.opt_state.count)) == 0
    assert not any(
        np.asarray(leaf).any()
        for leaf in jax.tree_util.tree_leaves(t2.state.opt_state.mu)
    )


def test_global_truncate_tokens_multihost_lockstep(monkeypatch):
    """EOT buckets stay ACTIVE under multihost (round-5 item 4): hosts with
    different local max-EOT positions allgather one int32 and all pick the
    bucket of the GLOBAL max — identical traced shapes, lever retained
    (round 4 disabled truncation wholesale on pods)."""
    from jax.experimental import multihost_utils

    from vtc_tpu.data.tokenizer import synthetic_tokens
    from vtc_tpu.training.trainer import global_truncate_tokens

    imgs = np.zeros((4, 3, 8, 8), np.float32)
    short = synthetic_tokens((4,), ntoks=77, n_real=5)    # need = 7
    longer = synthetic_tokens((4,), ntoks=77, n_real=40)  # need = 42

    gathered = []

    def fake_allgather(x, **kw):
        gathered.append(int(np.asarray(x)))
        return np.array([7, 42], np.int32)

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    out0 = global_truncate_tokens([imgs, short], True)
    out1 = global_truncate_tokens([imgs, longer], True)
    # both hosts land on the bucket covering the GLOBAL max (42 -> 48)
    assert out0[1].shape[-1] == 48
    assert out1[1].shape[-1] == 48
    assert out0[1].shape[-1] < 77  # the lever is genuinely active
    assert gathered == [7, 42]    # each host contributed its local need
    # non-token members pass through untouched
    assert out0[0].shape == imgs.shape

    # single-host: local bucket, no collective
    gathered.clear()
    assert global_truncate_tokens([imgs, short], False)[1].shape[-1] == 16
    assert gathered == []

    # a batch with no token arrays never reaches the collective
    assert global_truncate_tokens([imgs], True)[0].shape == imgs.shape
    assert gathered == []
