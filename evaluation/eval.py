"""VTC test-set evaluation CLI — mirrors ``evaluation/eval.py`` of the
reference (``:50-196``): config-driven test-split eval, bidirectional
R@1/5/10, JSON results named by the experiment combo, and the
``add_irrelevant_comms`` robustness probe.

Embeddings stay on device; recall runs via the on-device top-k kernel
instead of FAISS.
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.append(str(Path(__file__).parent.parent))

import numpy as np

from vtc_tpu import data as module_data
from vtc_tpu.config import ConfigParser, CustomArgs
from vtc_tpu.data import DataLoader
from vtc_tpu.models import create_model
from vtc_tpu.ops.retrieval import recall_at_k
from vtc_tpu.training.checkpoints import graft_params, load_checkpoint

logging.getLogger().setLevel(logging.INFO)


def add_irrelevant_comms(
    comments: np.ndarray, num_irrelevant_comments: int, seed: int = 0
) -> np.ndarray:
    """Append comments randomly drawn from *other* batch elements
    (``evaluation/eval.py:23-47``; the reference's early-return-in-loop bug —
    only the first row was ever populated — is fixed here)."""
    rng = np.random.default_rng(seed)
    bs, ncomms, ntoks = comments.shape
    if bs < 2:
        # a 1-element batch (e.g. the last batch without drop_last) has no
        # *other* element to draw from — (i + 1) % 1 == i would silently
        # append the item's OWN comments and dilute the robustness probe
        raise ValueError(
            "add_irrelevant_comms needs batches of >= 2 items to draw "
            "irrelevant comments from; use a batch size that avoids "
            "1-element remainders (or drop_last)"
        )
    total = ncomms + num_irrelevant_comments
    updated = np.zeros((bs, total, ntoks), dtype=comments.dtype)
    for i in range(bs):
        new_comms = []
        comm_indices = rng.integers(0, ncomms, size=num_irrelevant_comments)
        for comm_ind in comm_indices:
            batch_ind = int(rng.integers(0, bs))
            if batch_ind == i:
                batch_ind = (batch_ind + 1) % bs
            new_comms.append(comments[batch_ind, comm_ind])
        updated[i] = np.concatenate([comments[i], np.stack(new_comms)], axis=0)
    return updated


class _StridedSubset:
    """View of every ``count``-th item starting at ``index`` — the per-host
    disjoint eval split under multihost. The strided splits cover the whole
    dataset exactly once across hosts; uneven tails are fine because the
    per-host embedding blocks merge through the varlen allgather."""

    def __init__(self, dataset, index: int, count: int):
        self.dataset = dataset
        self.index = int(index)
        self.count = int(count)

    def __len__(self):
        return len(range(self.index, len(self.dataset), self.count))

    def __getitem__(self, i):
        return self.dataset[self.index + i * self.count]


def main(config: ConfigParser, args, checkpoint_path,
         process_index=None, process_count=None):
    """Run the test-split eval. Under multihost (``jax.process_count() > 1``,
    or the explicit ``process_index``/``process_count`` test overrides) each
    process encodes the DISJOINT strided subset ``pidx::pcount`` of the test
    set and the embedding blocks are allgathered before ranking — R@K is
    invariant to the row permutation (queries and gallery permute together).
    The ``add_irrelevant_comms`` probe draws within each (per-host) batch, so
    its results match the probe's semantics but not the single-host batch
    composition bit-for-bit."""
    import jax
    import jax.numpy as jnp

    logger = config.get_logger("test")

    dataset = config.init_obj("dataset", module_data, train=False, test=True)

    pidx = jax.process_index() if process_index is None else int(process_index)
    pcount = jax.process_count() if process_count is None else int(process_count)
    if pcount > 1:
        dataset = _StridedSubset(dataset, pidx, pcount)
        logger.info(
            "multihost eval: process %d/%d evaluates %d of the %d items",
            pidx, pcount, len(dataset), len(dataset.dataset),
        )

    arch_args = dict(config["arch"]["args"])
    branch_to_adapt = arch_args.get("branch_to_adapt_val", None)
    comment_fusion = arch_args.get("comment_fusion", None)
    num_comms = config["dataset"]["args"].get("num_comms", None)
    add_comments = config["dataset"]["args"]["add_comments"]
    num_irrelevant_comments = args.num_irrelevant_comments

    if branch_to_adapt is None:
        if add_comments != "always":
            exp_combo = "title_only"
        else:
            exp_combo = f"{comment_fusion}_{num_comms}_comms"
    else:
        exp_combo = f"adapted_{branch_to_adapt}_{num_comms}_comms"

    if checkpoint_path is not None:
        ckpt = Path(checkpoint_path)
        save_path = f"{ckpt.absolute().as_posix()}_res_{exp_combo}.json"
    else:
        save_path = f"zero_shot_res_{comment_fusion}.json"
    logging.info("Saving results to %s", save_path)

    data_loader = DataLoader(
        dataset, batch_size=config["batch_size"], num_workers=10, shuffle=False
    )

    module, variables = create_model(config["arch"]["type"], **arch_args)
    if checkpoint_path is not None:
        restored = load_checkpoint(checkpoint_path)
        params, missing, unexpected = graft_params(
            variables["params"], restored["params"], strict=False
        )
        assert not missing and not unexpected, (missing, unexpected)
        variables = dict(variables)
        variables["params"] = params
        if restored.get("batch_stats"):
            variables["batch_stats"], _, _ = graft_params(
                variables.get("batch_stats", {}), restored["batch_stats"]
            )
    logger.info("Model: %s", config["arch"]["type"])

    needs_comments = hasattr(module, "branch_to_adapt_val")

    if num_irrelevant_comments and needs_comments:
        # fail FAST (before minutes of encoding) and on EVERY host: a
        # 1-element tail batch makes add_irrelevant_comms raise mid-loop —
        # under multihost only on the host that drew the bad tail, leaving
        # the others hung in the embedding allgather. Per-host subset sizes
        # are deterministic, so all hosts reach the same verdict here.
        bs = int(config["batch_size"])
        n_total = len(dataset.dataset) if pcount > 1 else len(dataset)
        tails = [
            len(range(p, n_total, pcount)) % bs for p in range(pcount)
        ] if pcount > 1 else [n_total % bs]
        if bs < 2 or any(t == 1 for t in tails):
            raise ValueError(
                f"--num_irrelevant_comments with batch_size={bs} yields a "
                f"1-element batch (per-host split sizes "
                f"{[len(range(p, n_total, pcount)) for p in range(pcount)]}); "
                f"add_irrelevant_comms needs >= 2 items per batch — use "
                f"batch_size >= 2 without 1-element remainders"
            )

    # mesh-sharded eval (--n_devices/--n_model, like train.py): params laid
    # out by the tp rules, batches sharded over the data axis — the
    # "sharded all-gather over ICI" eval path, user-reachable from this CLI
    # (single-device when the flags are absent, byte-identical results).
    # Under multihost the mesh is built over THIS process's devices: the
    # data split is already per-host (disjoint subsets), so the encode mesh
    # must be local — a global mesh would need every host to feed it the
    # same batches, the opposite of the disjoint schedule.
    mesh = None
    n_dev = int(config.get("n_devices", 1) or 1)
    n_model = int(config.get("n_model", 1) or 1)
    mesh_devices = jax.local_devices() if pcount > 1 else jax.devices()
    if n_dev * n_model > 1:
        if len(mesh_devices) >= n_dev * n_model:
            from vtc_tpu.parallel.mesh import create_mesh, tree_shardings

            mesh = create_mesh(n_dev, n_model, devices=mesh_devices)
            variables = dict(variables)
            variables["params"] = jax.device_put(
                variables["params"],
                tree_shardings(variables["params"], mesh),
            )
            logger.info("Eval mesh: %s", mesh)
        else:
            logger.warning(
                "Requested a %dx%d mesh but only %d %sdevice(s); "
                "evaluating on one device.",
                n_dev, n_model, len(mesh_devices),
                "host-local " if pcount > 1 else "",
            )

    @jax.jit
    def _fwd(variables, *data):
        out = module.apply(variables, *data)
        return out[0], out[1]

    def fwd(*data):
        if mesh is None:
            return _fwd(variables, *[jnp.asarray(d) for d in data])
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vtc_tpu.parallel.mesh import DATA_AXIS

        # eval has no drop_last: repeat-pad the tail batch to the data-axis
        # multiple (identical per-row math), slice the pads back off
        n_shard = mesh.shape[DATA_AXIS]
        bs = data[0].shape[0]
        pad = (-bs) % n_shard

        def put(d):
            if pad:
                d = np.concatenate([d, np.repeat(d[-1:], pad, axis=0)])
            return jax.device_put(d, NamedSharding(mesh, P(DATA_AXIS)))

        with mesh:
            fv, ft = _fwd(variables, *[put(d) for d in data])
        return fv[:bs], ft[:bs]

    from vtc_tpu.data.tokenizer import truncate_batch_tokens

    res_vis, res_text, ids = [], [], []
    for items in data_loader:
        *data, meta = items
        data = [np.asarray(d) for d in data]
        if num_irrelevant_comments and needs_comments:
            assert num_irrelevant_comments <= config["batch_size"], (
                "Number of irrelevant comments needs to be smaller than batch size."
            )
            data[2] = add_irrelevant_comms(data[2], num_irrelevant_comments)
        # exactness-preserving text truncation (causal mask + EOT pooling:
        # tokens after EOT never influence the embedding). One SHARED bucket
        # across title+comments — per-array buckets usually differ, which
        # forces the model's separate-passes fallback instead of the fused
        # joint text-tower pass and multiplies the compiled variants.
        data = truncate_batch_tokens(data)
        feats_vis, feats_text = fwd(*data)
        res_vis.append(np.asarray(feats_vis))
        res_text.append(np.asarray(feats_text))
        ids.extend(np.asarray(meta["id"]).tolist())

    if res_vis:
        res_vis = np.concatenate(res_vis)
        res_text = np.concatenate(res_text)
    elif pcount == 1:
        raise RuntimeError(
            f"eval produced no embeddings: the test split of "
            f"{len(dataset)} items is empty or smaller than expected"
        )
    else:
        # a host whose strided subset is EMPTY (more hosts than test items)
        # must still join the gathers below with empty blocks — raising here
        # while the other hosts proceed would deadlock the pod on the counts
        # collective (same contract as the transfer-eval path)
        res_vis = res_text = None

    if pcount > 1:
        # merge the per-host embedding blocks (uneven tails allowed); the
        # row permutation vs a single-host run is shared by queries and
        # gallery, so the recall ranks are unchanged
        from jax.experimental import multihost_utils as mhu

        from vtc_tpu.utils import util as _util

        dim = 0 if res_vis is None else int(res_vis.shape[1])
        dim = int(np.max(mhu.process_allgather(np.asarray(dim, np.int64))))
        if dim == 0:
            raise RuntimeError(
                f"eval produced no embeddings on ANY of {pcount} processes: "
                f"the test split is empty (check the data root paths)"
            )
        if res_vis is None:
            res_vis = np.zeros((0, dim), np.float32)
            res_text = np.zeros((0, dim), np.float32)
        else:
            # one dtype on every host (incl. empty-block hosts)
            res_vis = np.asarray(res_vis, np.float32)
            res_text = np.asarray(res_text, np.float32)
        res_vis = _util.allgather_varlen(res_vis)
        res_text = _util.allgather_varlen(res_text)

    recall_title_from_im = recall_at_k(res_vis, res_text, [1, 5, 10])
    recall_im_from_title = recall_at_k(res_text, res_vis, [1, 5, 10])

    logging.info("Recall im from title: %s", recall_im_from_title)
    logging.info("Recall title from im: %s", recall_title_from_im)

    out = {
        "R1_title_from_im": recall_title_from_im[0][1],
        "R5_title_from_im": recall_title_from_im[1][1],
        "R10_title_from_im": recall_title_from_im[2][1],
        "R1_im_from_title": recall_im_from_title[0][1],
        "R5_im_from_title": recall_im_from_title[1][1],
        "R10_im_from_title": recall_im_from_title[2][1],
    }
    if pidx == 0:  # every host computes identical metrics; one writer
        with open(save_path, "w") as f:
            json.dump(out, f)
    return out


if __name__ == "__main__":
    args = argparse.ArgumentParser(description="vtc_tpu evaluation")
    args.add_argument("-c", "--config", default="configs/pretrained_clip.jsonc",
                      type=str)
    args.add_argument("-r", "--resume", default=None, type=str)
    args.add_argument("-d", "--device", default=None, type=str)
    args.add_argument("--num_irrelevant_comments", default=0, type=int)
    options = [
        # --multihost is a config target (not a plain argparse flag) so
        # ConfigParser DEFERS run-dir creation: with every pod process
        # running this CLI, eagerly picking a wall-clock run id races the
        # mkdir / diverges across a minute boundary exactly like train.py's
        # case — rank 0 must pick the id AFTER jax.distributed.initialize()
        # and broadcast it (finalize_run_dir below).
        CustomArgs(["--multihost"], type=int, target="multihost"),
        CustomArgs(["--lr", "--learning_rate"], type=float, target="optimizer;args;lr"),
        CustomArgs(["--bs", "--batch_size"], type=int, target="batch_size"),
        CustomArgs(["--n_devices"], type=int, target="n_devices"),
        CustomArgs(["--n_model"], type=int, target="n_model"),
        CustomArgs(["--bv", "--branch_to_adapt_val"], type=str,
                   target="arch;args;branch_to_adapt_val"),
        CustomArgs(["--nc", "--num_comms"], type=int, target="dataset;args;num_comms"),
        CustomArgs(["--am", "--comment_fusion"], type=str,
                   target="arch;args;comment_fusion"),
        CustomArgs(["--ac", "--add_comments"], type=str,
                   target="dataset;args;add_comments"),
    ]
    config = ConfigParser.from_args(args, options)
    args = args.parse_args()
    if config.get("multihost"):
        from vtc_tpu.utils.util import init_distributed

        init_distributed()
        config.finalize_run_dir()
    main(config, args, config.resume)
