"""End-to-end CLI tests: train.py main() and evaluation/eval.py main() on a
synthetic image+title+comments corpus with the tiny model variant."""

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "evaluation"))

BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("corpus")
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
    return tmp_path, csv, root


def _config(tmp_path, csv, root):
    return {
        "name": "cli_smoke",
        "n_gpu": 1,
        "batch_size": 4,
        "num_workers": 0,
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
        "optimizer": {"type": "Adam", "args": {"lr": 0.001, "weight_decay": 0, "amsgrad": True}},
        "loss": "clip_loss",
        "loss_args": {},
        "metrics": [
            {"type": "RecallAtK", "args": {"name_a": "visual", "name_b": "titles", "k_vals": [1, 10]}}
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


def test_train_cli_main(corpus):
    tmp_path, csv, root = corpus
    cfg_path = tmp_path / "cfg.jsonc"
    cfg_path.write_text(json.dumps(_config(tmp_path, csv, root)))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    train_cli.main(config)

    run_dir = config.save_dir
    assert (run_dir / "checkpoint-epoch1").exists()
    assert (run_dir / "config.json").exists()


@pytest.mark.slow
@pytest.mark.parametrize("axis_key", ["pp", "sp"])
def test_train_cli_stack_parallel(corpus, axis_key):
    """--pp / --sp are real training configurations: the SAME train.py main()
    builds the ("data","pipe"/"seq") mesh, routes the block stacks through
    parallel/stack.py, trains, and checkpoints (generalizes the reference's
    --visual_device split, train.py:270)."""
    from vtc_tpu.parallel.stack import set_stack_parallel, stack_parallel_mode

    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = f"cli_{axis_key}"
    cfg["n_devices"] = 2
    cfg[axis_key] = 2
    if axis_key == "pp":
        cfg["n_micro"] = 2
    cfg_path = tmp_path / f"cfg_{axis_key}.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    try:
        train_cli.main(config)
        assert stack_parallel_mode() == {"pp": "pipe", "sp": "seq"}[axis_key]
    finally:
        set_stack_parallel(None)  # process-global: never leak past the test

    run_dir = config.save_dir
    assert (run_dir / "checkpoint-epoch1").exists()
    log = json.loads((run_dir / "config.json").read_text())
    assert log[axis_key] == 2


@pytest.mark.slow
def test_train_cli_expert_parallel(corpus):
    """--ep is a real training configuration: the SAME train.py main()
    builds the ("data","expert") mesh, the MoE adapter's expert stacks (and
    their Adam moments) shard over it, and the run trains + checkpoints.
    Completes the config-reachable axis set dp/tp/pp/sp/fsdp/ep."""
    from vtc_tpu.parallel.expert import current_expert_mesh, set_expert_mesh

    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_ep"
    cfg["arch"]["args"]["moe_experts"] = 2
    cfg["arch"]["args"]["moe_top_k"] = 2
    cfg["n_devices"], cfg["ep"] = 2, 2
    cfg_path = tmp_path / "cfg_ep.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    try:
        train_cli.main(config)
        mesh = current_expert_mesh()
        assert mesh is not None and dict(
            zip(mesh.axis_names, mesh.devices.shape)
        ) == {"data": 2, "expert": 2}
    finally:
        set_expert_mesh(None)  # process-global: never leak past the test

    run_dir = config.save_dir
    assert (run_dir / "checkpoint-epoch1").exists()
    assert json.loads((run_dir / "config.json").read_text())["ep"] == 2


@pytest.mark.slow
def test_train_cli_multislice(corpus):
    """--slices is a real training configuration: train.py builds the
    ("replica","data","model") mesh (replica = cross-slice data
    parallelism; only the gradient psum crosses DCN) and trains +
    checkpoints through it."""
    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_slices"
    cfg["n_devices"], cfg["slices"] = 2, 2
    cfg_path = tmp_path / "cfg_slices.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    train_cli.main(config)

    run_dir = config.save_dir
    assert (run_dir / "checkpoint-epoch1").exists()
    assert json.loads((run_dir / "config.json").read_text())["slices"] == 2


def test_train_cli_slices_rejects_stack_axes(corpus):
    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_slices_pp"
    cfg["n_devices"], cfg["slices"], cfg["pp"] = 2, 2, 2

    import train as train_cli
    from vtc_tpu.config import ConfigParser

    with pytest.raises(ValueError, match="slices"):
        train_cli.main(ConfigParser(cfg))


def test_train_cli_ep_requires_moe(corpus):
    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_ep_dense"
    cfg["n_devices"], cfg["ep"] = 2, 2  # dense arch: no moe_experts

    import train as train_cli
    from vtc_tpu.config import ConfigParser

    with pytest.raises(ValueError, match="moe_experts"):
        train_cli.main(ConfigParser(cfg))


@pytest.mark.slow
def test_train_cli_accum_steps(corpus):
    """trainer.accum_steps is a real training configuration: the same
    train.py main() builds the accumulating (GradCache-semantics) step and
    trains/checkpoints end to end."""
    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_accum"
    cfg["trainer"]["accum_steps"] = 2
    cfg_path = tmp_path / "cfg_accum.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    train_cli.main(config)
    run_dir = config.save_dir
    assert (run_dir / "checkpoint-epoch1").exists()
    log = json.loads((run_dir / "config.json").read_text())
    assert log["trainer"]["accum_steps"] == 2


@pytest.mark.slow
def test_train_cli_multihost_plumbing(corpus, monkeypatch):
    """--multihost initializes the JAX distributed runtime before device use
    and turns on per-process loader sharding; with one process the run is
    the single-host run (sharding is a no-op slice) and must train and
    checkpoint end to end."""
    import jax

    init_calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: init_calls.append(1)
    )

    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["name"] = "cli_multihost"
    cfg["multihost"] = 1
    cfg_path = tmp_path / "cfg_mh.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))
    train_cli.main(config)
    assert init_calls == [1]
    assert (config.save_dir / "checkpoint-epoch1").exists()


def test_train_cli_rejects_conflicting_mesh_axes(corpus):
    tmp_path, csv, root = corpus
    cfg = _config(tmp_path, csv, root)
    cfg["n_devices"], cfg["pp"], cfg["sp"] = 2, 2, 2
    cfg_path = tmp_path / "cfg_conflict.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    with pytest.raises(ValueError, match="at most one non-data mesh axis"):
        train_cli.main(ConfigParser(read_json(cfg_path)))


def test_eval_cli_main(corpus, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # eval writes its result json to cwd
    tmp_path, csv, root = corpus
    cfg_path = tmp_path / "cfg_eval.jsonc"
    cfg_path.write_text(json.dumps(_config(tmp_path, csv, root)))

    import importlib

    eval_cli = importlib.import_module("eval")
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    config = ConfigParser(read_json(cfg_path))

    class Args:
        num_irrelevant_comments = 0

    out = eval_cli.main(config, Args(), None)
    assert set(out) == {
        "R1_title_from_im", "R5_title_from_im", "R10_title_from_im",
        "R1_im_from_title", "R5_im_from_title", "R10_im_from_title",
    }
    for v in out.values():
        assert 0.0 <= v <= 1.0
    assert Path("zero_shot_res_None.json").exists()
    Path("zero_shot_res_None.json").unlink()


@pytest.mark.slow
def test_eval_cli_sharded_mesh_matches_single_device(corpus, monkeypatch,
                                                     tmp_path):
    """--n_devices/--n_model on the eval CLI: params laid out by the tp
    rules, batches data-sharded with tail repeat-padding (eval has no
    drop_last) — results must be byte-identical to the single-device run."""
    monkeypatch.chdir(tmp_path)
    tmp_path2, csv, root = corpus
    cfg = _config(tmp_path2, csv, root)
    cfg["batch_size"] = 3  # 4 test items -> tail batch of 1: repeat-pads to 2
    cfg_path = tmp_path2 / "cfg_eval_mesh.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import importlib

    eval_cli = importlib.import_module("eval")
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    class Args:
        num_irrelevant_comments = 0

    single = eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None)

    cfg["n_devices"], cfg["n_model"] = 2, 2
    cfg_path.write_text(json.dumps(cfg))
    sharded = eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None)
    assert sharded == pytest.approx(single, abs=1e-5)
    Path("zero_shot_res_None.json").unlink()


def test_eval_cli_irrelevant_probe_fails_fast_on_one_element_tail(
    corpus, monkeypatch, tmp_path
):
    """--num_irrelevant_comments with a batch size that leaves a 1-element
    tail must raise BEFORE encoding, on every host (the in-loop raise fired
    on one host only and left the others hung in the embedding allgather)."""
    monkeypatch.chdir(tmp_path)
    tmp_path2, csv, root = corpus
    cfg = _config(tmp_path2, csv, root)
    cfg["batch_size"] = 3  # 4 test items -> 4 % 3 == 1
    cfg_path = tmp_path2 / "cfg_eval_tail.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import importlib

    eval_cli = importlib.import_module("eval")
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json

    class Args:
        num_irrelevant_comments = 2

    with pytest.raises(ValueError, match="1-element batch"):
        eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None)

    # multihost: 4 items over 3 hosts = 2 + 1 + 1; hosts 1 and 2 have
    # 1-element (tail) batches at batch_size 2 -> EVERY host must reach the
    # same verdict, including host 0 whose local split is clean
    cfg["batch_size"] = 2
    cfg_path.write_text(json.dumps(cfg))
    for pidx in (0, 1, 2):
        with pytest.raises(ValueError, match="1-element batch"):
            eval_cli.main(
                ConfigParser(read_json(cfg_path)), Args(), None,
                process_index=pidx, process_count=3,
            )


def test_init_distributed_partial_env_names_contract(monkeypatch):
    """A partially-exported off-pod topology must fail with the contract
    named, not a bare KeyError."""
    from vtc_tpu.utils.util import init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:9911")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        init_distributed()


def test_eval_cli_multihost_empty_host_joins_gather(corpus, monkeypatch,
                                                    tmp_path):
    """More hosts than test items: a host with an EMPTY strided subset must
    contribute empty blocks to the gathers (raising pre-gather would
    deadlock the pod) and still return the globally-merged metrics."""
    monkeypatch.chdir(tmp_path)
    tmp_path2, csv, root = corpus
    cfg = _config(tmp_path2, csv, root)
    cfg_path = tmp_path2 / "cfg_eval_empty.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import importlib

    import jax.experimental.multihost_utils as mhu_mod

    eval_cli = importlib.import_module("eval")
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json
    from vtc_tpu.utils import util as util_mod

    D = 8
    fake = np.random.default_rng(0).normal(size=(4, D)).astype(np.float32)
    # the width gather: the other hosts contribute D, this host 0
    monkeypatch.setattr(
        mhu_mod, "process_allgather",
        lambda x, **k: np.asarray([D], np.int64),
    )
    monkeypatch.setattr(
        util_mod, "allgather_varlen",
        lambda arr: np.concatenate([np.asarray(arr), fake]),
    )

    class Args:
        num_irrelevant_comments = 0

    # the corpus test split has 4 items; rank 4 of 5 gets none of them
    out = eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None,
                        process_index=4, process_count=5)
    assert set(out) == {
        "R1_title_from_im", "R5_title_from_im", "R10_title_from_im",
        "R1_im_from_title", "R5_im_from_title", "R10_im_from_title",
    }

    # all hosts empty -> the loud failure, raised consistently post-gather
    monkeypatch.setattr(
        mhu_mod, "process_allgather",
        lambda x, **k: np.asarray([0], np.int64),
    )
    with pytest.raises(RuntimeError, match="ANY of 5 processes"):
        eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None,
                      process_index=4, process_count=5)


def test_eval_cli_irrelevant_comments(corpus):
    tmp_path, csv, root = corpus
    import importlib

    eval_cli = importlib.import_module("eval")

    comments = np.random.default_rng(0).integers(
        1, 49405, size=(6, 2, 77)
    ).astype(np.int32)
    out = eval_cli.add_irrelevant_comms(comments, 3)
    assert out.shape == (6, 5, 77)
    # original comments preserved, every row populated (the reference bug
    # left rows 1..n zeroed)
    np.testing.assert_array_equal(out[:, :2], comments)
    assert (np.abs(out[1:, 2:]).sum(axis=(1, 2)) > 0).all()


def test_eval_cli_irrelevant_comments_rejects_singleton_batch(corpus):
    """A 1-element batch has no other element to draw from; silently
    appending the item's OWN comments would dilute the robustness probe."""
    import importlib

    eval_cli = importlib.import_module("eval")
    comments = np.ones((1, 2, 77), np.int32)
    with pytest.raises(ValueError, match=">= 2"):
        eval_cli.add_irrelevant_comms(comments, 3)


def test_eval_cli_irrelevant_comments_never_self(corpus):
    """No appended comment may come from the item itself."""
    import importlib

    eval_cli = importlib.import_module("eval")
    # give each batch element a unique constant token id so provenance of
    # every appended comment is recoverable
    bs, ncomms = 5, 2
    comments = np.stack(
        [np.full((ncomms, 77), i + 1, np.int32) for i in range(bs)]
    )
    out = eval_cli.add_irrelevant_comms(comments, 4, seed=3)
    for i in range(bs):
        appended = out[i, ncomms:]
        assert (appended != i + 1).all(), f"row {i} drew its own comments"


@pytest.mark.slow
def test_eval_cli_multihost_disjoint_matches_single(corpus, monkeypatch,
                                                    tmp_path):
    """Multihost eval (round 5): each process encodes the strided DISJOINT
    subset ``pidx::pcount`` of the test set and the embedding blocks merge
    via the varlen allgather; the final R@K equal the single-host run (the
    row permutation is shared by queries and gallery, so ranks are
    unchanged). Host 1's contribution is recorded by running main() as rank
    1 with an identity gather — exactly what process_allgather returns for
    that rank's slot."""
    monkeypatch.chdir(tmp_path)
    tmp_path2, csv, root = corpus
    cfg = _config(tmp_path2, csv, root)
    cfg["batch_size"] = 5
    cfg_path = tmp_path2 / "cfg_eval_mh.jsonc"
    cfg_path.write_text(json.dumps(cfg))

    import importlib

    eval_cli = importlib.import_module("eval")
    from vtc_tpu.config import ConfigParser
    from vtc_tpu.utils import read_json
    from vtc_tpu.utils import util as util_mod

    class Args:
        num_irrelevant_comments = 0

    single = eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None)

    rank1 = []
    monkeypatch.setattr(
        util_mod, "allgather_varlen",
        lambda arr: (rank1.append(np.asarray(arr)), np.asarray(arr))[1],
    )
    eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None,
                  process_index=1, process_count=2)
    assert len(rank1) == 2  # res_vis, res_text gathered once each
    # rank 1 saw the 1::2 half of the test split, rank 0 the 0::2 half
    n_test = rank1[0].shape[0]
    assert n_test > 0

    blocks = iter(rank1)
    monkeypatch.setattr(
        util_mod, "allgather_varlen",
        lambda arr: np.concatenate([np.asarray(arr), next(blocks)]),
    )
    multi = eval_cli.main(ConfigParser(read_json(cfg_path)), Args(), None,
                          process_index=0, process_count=2)
    assert multi == pytest.approx(single, abs=1e-6)
    Path("zero_shot_res_None.json").unlink()
