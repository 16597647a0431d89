"""torch_export: vtc_tpu params -> reference-format state_dict, proven by
exact round-trip through ``torch_import.import_vtc_state_dict`` (the two are
inverses by construction) and through the real ``.pth`` file format.

Reference anchors: ``trainer/base_trainer.py:123-140`` (the save layout the
export mirrors) and ``:165-176`` (the load that must accept it)."""

import jax
import numpy as np
import pytest

from vtc_tpu.models import create_model
from vtc_tpu.models.torch_export import (
    export_vtc_state_dict,
    save_torch_checkpoint,
)
from vtc_tpu.models.torch_import import import_vtc_state_dict

TINY = "test-tiny"


def _leaves(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def _assert_trees_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert set(la) == set(lb), (
        sorted(set(la) - set(lb))[:5], sorted(set(lb) - set(la))[:5]
    )
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg=k)


def test_roundtrip_image_cam():
    _, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY, seed=0)
    sd = export_vtc_state_dict(variables["params"])
    back = import_vtc_state_dict(sd)
    _assert_trees_equal(back["params"], variables["params"])


def test_roundtrip_timesformer():
    _, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type=TINY, nframes=2, seed=0
    )
    sd = export_vtc_state_dict(variables["params"])
    assert any("timeattn" in k for k in sd)
    back = import_vtc_state_dict(sd, timesformer=True)
    _assert_trees_equal(back["params"], variables["params"])


def test_roundtrip_bn_running_stats():
    _, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        residual_activation="bn",
    )
    sd = export_vtc_state_dict(variables["params"], variables["batch_stats"])
    assert "mean_center_bn.running_mean" in sd
    assert sd["mean_center_bn.num_batches_tracked"].dtype == np.int64
    back = import_vtc_state_dict(sd)
    _assert_trees_equal(back["params"], variables["params"])
    _assert_trees_equal(back["batch_stats"], variables["batch_stats"])


def test_roundtrip_audio_head():
    _, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        init_audio_model=True,
    )
    sd = export_vtc_state_dict(
        variables["params"], variables.get("batch_stats")
    )
    assert "audio_model.mlp.layers.1.weight" in sd
    back = import_vtc_state_dict(sd)
    _assert_trees_equal(back["params"], variables["params"])
    if variables.get("batch_stats"):
        _assert_trees_equal(back["batch_stats"], variables["batch_stats"])


def test_moe_adapter_refused():
    """A MoE adapter has no reference-side representation — exporting must
    raise, never silently drop expert weights."""
    _, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0,
        moe_experts=2, moe_top_k=2,
    )
    with pytest.raises(ValueError, match="torch"):
        export_vtc_state_dict(variables["params"])


def test_pth_file_roundtrip(tmp_path):
    """Through the real file format: save_torch_checkpoint writes a .pth in
    the reference trainer's layout; the framework's own .pth loader
    (checkpoints.load_checkpoint) restores an identical tree + metadata."""
    from vtc_tpu.training.checkpoints import load_checkpoint

    _, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY, seed=0)
    out = tmp_path / "exported.pth"
    save_torch_checkpoint(
        out, variables["params"], arch="PretrainedCLIP_finaltf", epoch=3,
        monitor_best=0.5, config={"name": "x"},
    )
    restored = load_checkpoint(out)
    assert restored["arch"] == "PretrainedCLIP_finaltf"
    assert restored["epoch"] == 3
    assert float(np.asarray(restored["monitor_best"])) == 0.5
    _assert_trees_equal(restored["params"], variables["params"])


def test_export_cli(tmp_path):
    """scripts/export_torch_checkpoint.py: orbax checkpoint dir -> .pth."""
    import sys

    from vtc_tpu.training.checkpoints import load_checkpoint, save_checkpoint

    sys.path.insert(0, "scripts")
    try:
        from export_torch_checkpoint import main
    finally:
        sys.path.pop(0)

    _, variables = create_model("PretrainedCLIP_finaltf", model_type=TINY, seed=0)
    save_checkpoint(
        tmp_path, "ck", arch="PretrainedCLIP_finaltf", epoch=2,
        params=variables["params"], opt_state=None,
    )
    out = tmp_path / "out.pth"
    assert main([str(tmp_path / "ck"), str(out)]) == 0
    restored = load_checkpoint(out)
    assert restored["epoch"] == 2
    _assert_trees_equal(restored["params"], variables["params"])
