"""REAL two-process multihost integration receipts.

Every other multihost test monkeypatches ``process_index``/``process_count``
or the embedding gather — which is exactly how the round-4 run-dir race
shipped undetected. These tests launch TWO actual OS processes connected
through ``jax.distributed`` (CPU collectives) and drive the real entry
points end to end, pinning the contracts the monkeypatched tier cannot:

* train (``train.py main``): both ranks resolve the SAME rank-0-broadcast
  run dir (no mkdir race, one ``config.json``), the orbax checkpoint save is
  collective, and both ranks restore identical parameters from it.
* eval (the actual ``evaluation/eval.py`` CLI with ``--multihost 1``): each
  process encodes a disjoint strided test-set subset, the varlen allgather
  merges the blocks, both ranks log identical recalls, exactly one result
  json is written, and the numbers equal a single-process run of the same
  CLI bit-for-bit (same seed, same platform).

Launch recipe (mirrors a non-TPU-pod pod launcher): the workers run WITHOUT
the axon sitecustomize (``PYTHONPATH`` unset) so ``JAX_PLATFORMS=cpu`` is
honored, and ``utils.util.init_distributed`` picks the topology up from
``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``.
Reference anchor: the reference launches one process per GPU host via
torch.distributed env vars (``train.py:211-280``); this is the JAX
multi-controller analogue.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"

pytestmark = pytest.mark.slow  # two concurrent compiles on the 1-core box


def _make_corpus(tmp_path: Path):
    """Synthetic image+title+comments corpus (same shape as test_cli's)."""
    rng = np.random.default_rng(0)
    root = tmp_path / "media"
    (root / "vids").mkdir(parents=True)
    rows = []
    for i in range(72):
        rid_str = "ab" + BASE36[(i * 7) % 36] + BASE36[i % 36]
        rid = int(rid_str, 36)
        if any(r["reddit_id"] == rid for r in rows):
            continue
        rows.append(
            {
                "reddit_id": rid,
                "video_path": f"results/vids/{rid_str}.mp4",
                "title": f"a video about topic {i}",
                "video_length": 10.0,
                "comments": str([f"this is about topic {i}", f"great {i}"]),
            }
        )
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(root / "vids" / f"{rid_str}.jpg")
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv, root


def _config(tmp_path: Path, csv: Path, root: Path, name: str):
    return {
        "name": name,
        "n_devices": 2,  # one local device per process -> 2-device dp mesh
        "batch_size": 4,
        "num_workers": 0,
        "multihost": 1,
        "arch": {
            "type": "PretrainedCLIP_finaltf",
            "args": {
                "model_type": "test-tiny",
                "freeze": "all",
                "branch_to_adapt": "text",
                "branch_to_adapt_val": "text",
            },
        },
        "dataset": {
            "type": "ImTextDataset",
            "args": {
                "root": str(root),
                "csv_file": str(csv),
                "add_comments": "always",
                "comment_sampling": "random",
                "num_comms": 2,
                "image_size": 32,
            },
        },
        "optimizer": {
            "type": "Adam",
            "args": {"lr": 0.001, "weight_decay": 0, "amsgrad": True},
        },
        "loss": "clip_loss",
        "loss_args": {},
        "metrics": [
            {
                "type": "RecallAtK",
                "args": {"name_a": "visual", "name_b": "titles", "k_vals": [1, 10]},
            }
        ],
        "lr_scheduler": {"type": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        "trainer": {
            "epochs": 1,
            "save_dir": str(tmp_path / "saved"),
            "save_period": 1,
            "verbosity": 2,
            "monitor": "max val_titles_from_visual-recall_at_10",
            "early_stop": 10,
            "tensorboard": False,
        },
    }


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(port: int, pid: int, nproc: int = 2) -> dict:
    env = dict(os.environ)
    # no sitecustomize -> plain JAX; env var platform selection works
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["JAX_NUM_PROCESSES"] = str(nproc)
    env["JAX_PROCESS_ID"] = str(pid)
    return env


def _run_pair(cmds, envs, cwds, timeout=540):
    """Launch both ranks, wait for both, return (stdout+stderr) per rank."""
    procs = [
        subprocess.Popen(
            cmd, env=env, cwd=str(cwd),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for cmd, env, cwd in zip(cmds, envs, cwds)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
    return outs


_TRAIN_WORKER = """
import sys
cfg_path, repo = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
from vtc_tpu.config import ConfigParser
from vtc_tpu.utils import read_json
import train as train_cli

config = ConfigParser(read_json(cfg_path))
train_cli.main(config)
print("RUN_DIR::" + str(config.save_dir), flush=True)

import numpy as np
from vtc_tpu.training.checkpoints import load_checkpoint

restored = load_checkpoint(str(config.save_dir / "checkpoint-epoch1"))
tot = 0.0
for leaf in jax.tree_util.tree_leaves(restored["params"]):
    tot += float(np.asarray(leaf, np.float64).sum())
print("PARAM_SUM::%.10e" % tot, flush=True)
"""


def _tagged(out: str, tag: str) -> str:
    lines = [l for l in out.splitlines() if l.startswith(tag + "::")]
    assert lines, f"no {tag}:: line in:\n{out[-4000:]}"
    return lines[-1].split("::", 1)[1]


def test_real_two_process_train(tmp_path):
    """2 actual controllers: coordinated run dir, collective checkpoint,
    identical restored params on both ranks."""
    csv, root = _make_corpus(tmp_path)
    cfg = _config(tmp_path, csv, root, "mh_real_train")
    cfg_path = tmp_path / "cfg.jsonc"
    cfg_path.write_text(json.dumps(cfg))
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)

    port = _free_port()
    cmd = [sys.executable, str(worker), str(cfg_path), str(REPO)]
    outs = _run_pair(
        [cmd, cmd],
        [_worker_env(port, 0), _worker_env(port, 1)],
        [tmp_path, tmp_path],
    )

    run_dirs = [_tagged(o, "RUN_DIR") for o in outs]
    assert run_dirs[0] == run_dirs[1], "ranks resolved different run dirs"
    param_sums = [float(_tagged(o, "PARAM_SUM")) for o in outs]
    assert np.isfinite(param_sums[0])
    assert param_sums[0] == param_sums[1], (
        "ranks restored different params from the collective checkpoint"
    )

    # no mkdir race: rank 0 is the only writer -> exactly one run dir,
    # one config.json, and the checkpoint lives inside it
    exp_dir = tmp_path / "saved" / "models" / "mh_real_train"
    children = [c for c in exp_dir.iterdir() if c.is_dir()]
    assert len(children) == 1, f"expected one run dir, got {children}"
    assert (children[0] / "config.json").exists()
    assert (children[0] / "checkpoint-epoch1").exists()
    assert str(children[0]) == run_dirs[0]


def test_real_two_process_eval_cli(tmp_path):
    """The actual evaluation/eval.py CLI under --multihost 1 on 2 real
    processes: disjoint per-host encode, allgathered embeddings, identical
    recalls on both ranks, one writer — equal to the single-process CLI."""
    csv, root = _make_corpus(tmp_path)
    cfg = _config(tmp_path, csv, root, "mh_real_eval")
    cfg["batch_size"] = 2
    del cfg["multihost"]  # exercised via the CLI flag instead
    cfg_path = tmp_path / "cfg.jsonc"
    cfg_path.write_text(json.dumps(cfg))
    eval_py = str(REPO / "evaluation" / "eval.py")

    # single-process reference run of the same CLI (same seed/platform);
    # distinct experiment name so its eagerly created run dir doesn't land
    # in the multihost experiment's tree
    single_cfg = dict(cfg, name="mh_real_eval_single")
    single_cfg_path = tmp_path / "cfg_single.jsonc"
    single_cfg_path.write_text(json.dumps(single_cfg))
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    env1 = _worker_env(_free_port(), 0, 1)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env1.pop(k)
    out = subprocess.run(
        [sys.executable, eval_py, "-c", str(single_cfg_path)],
        env=env1, cwd=str(single_dir), capture_output=True, text=True,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    single = json.loads((single_dir / "zero_shot_res_None.json").read_text())

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    port = _free_port()
    cmd = [sys.executable, eval_py, "-c", str(cfg_path), "--multihost", "1"]
    outs = _run_pair(
        [cmd, cmd],
        [_worker_env(port, 0), _worker_env(port, 1)],
        [multi_dir, multi_dir],
        timeout=420,
    )

    # every rank logs the recalls it computed from the gathered embeddings;
    # the disjoint subsets must merge to rank-identical metrics (log PREFIX
    # differs: rank 0's setup_logging reformats the root logger)
    recalls = [
        sorted(l[l.index("Recall"):] for l in o.splitlines() if "Recall" in l)
        for o in outs
    ]
    assert recalls[0] and recalls[0] == recalls[1], (recalls, outs[0][-2000:])

    multi = json.loads((multi_dir / "zero_shot_res_None.json").read_text())
    assert multi == pytest.approx(single, abs=1e-5)

    # the CLI's deferred run-dir path: rank 0 created exactly one run dir
    exp_dir = tmp_path / "saved" / "models" / "mh_real_eval"
    children = [c for c in exp_dir.iterdir() if c.is_dir()]
    assert len(children) == 1, f"expected one run dir, got {children}"
    assert (children[0] / "config.json").exists()
