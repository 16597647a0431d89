"""Config-system tests: JSONC parsing, ;-path overrides, run-dir scheme,
reflective init_obj. Covers the surface of the reference's
utils/parse_config.py + utils/util.py JSONC reading."""

import argparse
import json

import pytest

from vtc_tpu.config import ConfigParser, CustomArgs
from vtc_tpu.utils import jsonc


def test_jsonc_comments_and_trailing_commas():
    text = """
    {
        // line comment
        "name": "exp", /* block comment */
        "list": [1, 2, 3,],
        "nested": {"a": "http://not//a//comment", "b": 2,},
    }
    """
    obj = jsonc.loads(text)
    assert obj["name"] == "exp"
    assert obj["list"] == [1, 2, 3]
    assert obj["nested"]["a"] == "http://not//a//comment"
    assert obj["nested"]["b"] == 2


def test_jsonc_parses_reference_style_config(tmp_path):
    cfg = tmp_path / "c.jsonc"
    cfg.write_text(
        '{"name": "n", "metrics": [{"type": "RecallAtK", '
        '"args": {"k_vals": [1, 10]},},], "trainer": {"tensorboard": true,}}'
    )
    obj = jsonc.read_json(cfg)
    assert obj["metrics"][0]["args"]["k_vals"] == [1, 10]
    assert obj["trainer"]["tensorboard"] is True


def _write_min_config(tmp_path, name="testexp"):
    cfg = {
        "name": name,
        "batch_size": 4,
        "arch": {"type": "Dummy", "args": {"width": 3}},
        "optimizer": {"type": "adam", "args": {"lr": 0.001}},
        "trainer": {"save_dir": str(tmp_path / "saved"), "verbosity": 2},
    }
    p = tmp_path / "config.jsonc"
    p.write_text(json.dumps(cfg))
    return p


def test_from_args_and_override(tmp_path):
    cfg_path = _write_min_config(tmp_path)
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("-r", "--resume", default=None)
    options = [
        CustomArgs(["--lr"], type=float, target="optimizer;args;lr"),
        CustomArgs(["--bs", "--batch_size"], type=int, target="batch_size"),
    ]
    import sys

    argv = sys.argv
    sys.argv = ["prog", "-c", str(cfg_path), "--lr", "0.5", "--bs", "16"]
    try:
        config = ConfigParser.from_args(parser, options)
    finally:
        sys.argv = argv

    assert config["optimizer"]["args"]["lr"] == 0.5
    assert config["batch_size"] == 16
    # run dir created with NNN_MonDD_HH:MM scheme and config.json written back
    assert config.save_dir.exists()
    assert (config.save_dir / "config.json").exists()
    import re

    assert re.match(r"^\d\d\d_\w\w\w\d\d_\d\d:\d\d$", config.save_dir.name)
    saved = json.loads((config.save_dir / "config.json").read_text())
    assert saved["optimizer"]["args"]["lr"] == 0.5


def test_run_id_sequence_increments(tmp_path):
    cfg_path = _write_min_config(tmp_path)
    from vtc_tpu.utils import read_json

    c1 = ConfigParser(read_json(cfg_path))
    c2 = ConfigParser(read_json(cfg_path))
    n1 = int(c1.save_dir.name.split("_")[0])
    n2 = int(c2.save_dir.name.split("_")[0])
    assert n2 == n1 + 1


def test_init_obj_reflection(tmp_path):
    cfg_path = _write_min_config(tmp_path)
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))

    class Registry:
        class Dummy:
            def __init__(self, width, extra=None):
                self.width = width
                self.extra = extra

    obj = config.init_obj("arch", Registry, extra="x")
    assert obj.width == 3 and obj.extra == "x"

    with pytest.raises(AssertionError):
        config.init_obj("arch", Registry, width=7)  # can't overwrite cfg args


def test_resume_reads_run_config(tmp_path):
    cfg_path = _write_min_config(tmp_path)
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    ckpt = config.save_dir / "checkpoint-epoch1.ckpt"
    ckpt.write_text("fake")

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("-r", "--resume", default=None)
    import sys

    argv = sys.argv
    sys.argv = ["prog", "-r", str(ckpt)]
    try:
        config2 = ConfigParser.from_args(parser, [])
    finally:
        sys.argv = argv
    assert config2["name"] == "testexp"
    assert str(config2.resume) == str(ckpt)


def test_resume_does_not_inherit_multihost(tmp_path):
    """multihost is a per-launch topology property: a run dir written by a
    pod training run persists "multihost": 1, but a later single-host
    eval/resume must NOT inherit it (it would call
    jax.distributed.initialize() off-pod and crash). The CLI flag re-enables
    it explicitly."""
    import json
    import sys

    from vtc_tpu.config import CustomArgs
    from vtc_tpu.utils import read_json

    cfg_path = _write_min_config(tmp_path)
    cfg = read_json(cfg_path)
    cfg["multihost"] = 1  # as written into a pod run's config.json
    run_dir = tmp_path / "podrun"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(json.dumps(cfg))
    ckpt = run_dir / "checkpoint-epoch1"
    ckpt.write_text("fake")

    def parse(argv_tail):
        parser = argparse.ArgumentParser()
        parser.add_argument("-c", "--config", default=None)
        parser.add_argument("-r", "--resume", default=None)
        argv = sys.argv
        sys.argv = ["prog", "-r", str(ckpt)] + argv_tail
        try:
            return ConfigParser.from_args(
                parser, [CustomArgs(["--multihost"], type=int,
                                    target="multihost")]
            )
        finally:
            sys.argv = argv

    assert not parse([]).get("multihost")  # stripped on resume
    assert parse(["--multihost", "1"]).get("multihost") == 1  # explicit wins


def test_device_flag_sets_mesh_device_count(tmp_path):
    """-d/--device selects the number of mesh devices (the TPU analogue of
    the reference's CUDA_VISIBLE_DEVICES flag); --n_devices wins when both
    are given; the reference's id-list form counts entries."""
    import argparse

    from vtc_tpu.config import ConfigParser, CustomArgs

    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"name": "x", "trainer": {"save_dir": str(tmp_path)}}))

    def parse(argv):
        p = argparse.ArgumentParser()
        p.add_argument("-c", "--config", default=None, type=str)
        p.add_argument("-r", "--resume", default=None, type=str)
        p.add_argument("-d", "--device", default=None, type=str)
        import sys

        old = sys.argv
        sys.argv = ["t"] + argv
        try:
            return ConfigParser.from_args(
                p, [CustomArgs(["--n_devices"], type=int, target="n_devices")]
            )
        finally:
            sys.argv = old

    assert parse(["-c", str(cfg), "-d", "4"])["n_devices"] == 4
    assert parse(["-c", str(cfg), "-d", "0,1"])["n_devices"] == 2
    assert parse(
        ["-c", str(cfg), "-d", "4", "--n_devices", "2"]
    )["n_devices"] == 2


def test_multihost_run_dir_rank_coordinated(tmp_path, monkeypatch):
    """Under --multihost, run-dir creation is deferred and rank-coordinated
    (round-5 item 2): rank 0 picks the id and is the only writer; every rank
    resolves the SAME save_dir, so there is no mkdir race and orbax's
    collective save has one directory pod-wide."""
    import jax
    from jax.experimental import multihost_utils

    import vtc_tpu.config.parse_config as pc
    from vtc_tpu.utils import read_json

    cfg_path = _write_min_config(tmp_path, name="mh")
    cfg = read_json(cfg_path)
    cfg["multihost"] = 1

    # deferred: no dir yet, save_dir refuses loudly
    c0 = ConfigParser(dict(cfg))
    assert c0._run_dir is None
    with pytest.raises(RuntimeError, match="finalize_run_dir"):
        c0.save_dir

    # fake the 2-host broadcast: rank 0 sends, rank 1 receives rank 0's id
    sent = {}

    def fake_broadcast(s, length=64):
        if s is not None:
            sent["id"] = s
        return sent["id"]

    monkeypatch.setattr(pc, "_broadcast_str", fake_broadcast)
    monkeypatch.setattr(
        multihost_utils, "sync_global_devices", lambda *a, **k: None
    )

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    d0 = c0.finalize_run_dir()
    assert d0.exists() and (d0 / "config.json").exists()

    # rank 1 (same or different minute — irrelevant: it never scans the
    # filesystem) resolves the identical dir and writes nothing
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    c1 = ConfigParser(dict(cfg))
    d1 = c1.finalize_run_dir()
    assert d1 == d0
    exp_dir = d0.parent
    assert len(list(exp_dir.iterdir())) == 1  # no second dir, no race

    # repeated finalize is a no-op returning the same dir
    assert c0.finalize_run_dir() == d0


def test_broadcast_str_single_process_roundtrip():
    import vtc_tpu.config.parse_config as pc

    assert pc._broadcast_str("007_Aug19_12:34") == "007_Aug19_12:34"
