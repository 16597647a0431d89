"""Training CLI — mirrors the reference's ``train.py`` surface
(``/root/reference/train.py:211-280``): same config files, same flags, same
``;``-path overrides; TPU-native execution underneath (mesh sharding instead
of DataParallel, optax groups instead of torch param groups, Orbax
checkpoints instead of .pth).
"""

import argparse
import os
import random

import numpy as np

from vtc_tpu import data as module_data
from vtc_tpu.config import ConfigParser, CustomArgs
from vtc_tpu.data import DataLoader
from vtc_tpu.models import create_model
from vtc_tpu.ops.losses import LOSSES
from vtc_tpu.parallel.mesh import create_mesh
from vtc_tpu.training.metrics import METRICS
from vtc_tpu.training.optim import build_optimizer
from vtc_tpu.training.trainer import Trainer

try:
    import wandb

    _HAS_WANDB = True
except ImportError:
    _HAS_WANDB = False


def _make_probe(config):
    """Per-epoch MSRVTT full-val probe (``trainer/trainer.py:152-182``),
    active when the MSRVTT root exists."""
    root = config.get("msrvtt_root", "/data/MSRVTT")
    if not os.path.exists(os.path.join(root, "train_val_videodatainfo.json")):
        return None

    from vtc_tpu.evaluation import retrieval_evaluation

    def probe(trainer, branch_override=None):
        # TPU-first probe: batches + ranking shard over the trained mesh
        # (the state is already laid out there), and under --multihost each
        # process decodes a disjoint strided video subset with one embedding
        # allgather at the end (retrieval_eval handles both automatically)
        outdf = retrieval_evaluation(
            trainer.module,
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            "MSRVTT_videos",
            "full-val",
            branch_override=branch_override,
            data_roots={"MSRVTT": {"root": root}},
            mesh=trainer.mesh,
        )
        r10 = outdf.loc["R@10"].tolist()
        return {"msrvtt_val_vtt": r10[0], "msrvtt_val_ttv": r10[1]}

    return probe


def main(config: ConfigParser):
    if config.get("multihost"):
        # multi-controller pod run (one process per host): initialize the
        # JAX distributed runtime BEFORE any device use so jax.devices()
        # sees the whole slice. No-args form auto-detects coordinator and
        # process topology on TPU pods; loaders shard the input per host
        # (shard_by_process) and parallel.mesh.shard_batch assembles global
        # batches from the per-host slices.
        from vtc_tpu.utils.util import init_distributed

        init_distributed()
        # rank-coordinated run dir: rank 0 picks the id, broadcasts it, and
        # is the only writer of config.json/logs; all ranks resolve the SAME
        # save_dir (orbax collective saves need one directory pod-wide)
        config.finalize_run_dir()

    seed_value = int(config.get("random_seed_value", 1023))
    os.environ["PYTHONHASHSEED"] = str(seed_value)
    random.seed(seed_value)
    np.random.seed(seed_value)

    logger = config.get_logger("train")

    dataset = config.init_obj("dataset", module_data)
    valid_dataset = config.init_obj("dataset", module_data, train=False)

    loader_cls = DataLoader
    if config.get("loader", "threads") == "grain":
        from vtc_tpu.data.loader import GrainDataLoader

        loader_cls = GrainDataLoader
    # on a pod each process loads its disjoint slice of every batch
    # (tested: test_loader_sharding.py); single-host this is a no-op.
    # batch_size is PER HOST under --multihost (global = bs x n_processes).
    shard_hosts = bool(config.get("multihost"))
    data_loader = loader_cls(
        dataset,
        batch_size=config["batch_size"],
        num_workers=config.get("num_workers", 4),
        shuffle=True,
        drop_last=True,
        seed=seed_value,
        shard_by_process=shard_hosts,
    )
    valid_data_loader = loader_cls(
        valid_dataset,
        batch_size=config["batch_size"],
        num_workers=config.get("num_workers", 4),
        shuffle=False,
        drop_last=True,
        shard_by_process=shard_hosts,
    )

    arch_cfg = config["arch"]
    module, variables = create_model(
        arch_cfg["type"], seed=seed_value, **dict(arch_cfg["args"])
    )
    logger.info("Model: %s", arch_cfg["type"])

    # mesh: n_devices data-parallel x ONE of {n_model tensor-parallel,
    # pp pipeline stages, sp sequence shards, ep expert shards} on the
    # second axis (config key n_gpu kept for config compatibility)
    n_devices = int(config.get("n_devices", config.get("n_gpu", 1)) or 1)
    n_model = int(config.get("n_model", 1) or 1)
    n_pp = int(config.get("pp", 1) or 1)
    n_sp = int(config.get("sp", 1) or 1)
    n_ep = int(config.get("ep", 1) or 1)
    n_replica = int(config.get("slices", 1) or 1)
    if sum(n > 1 for n in (n_model, n_pp, n_sp, n_ep)) > 1:
        raise ValueError(
            f"pick at most one non-data mesh axis per run: "
            f"n_model={n_model}, pp={n_pp}, sp={n_sp}, ep={n_ep}"
        )
    if n_replica > 1 and (n_pp > 1 or n_sp > 1 or n_ep > 1):
        raise ValueError(
            "--slices composes with dp/tp/fsdp (replica = data parallelism "
            "across slices; only the gradient psum crosses DCN) — not with "
            f"pp/sp/ep (got pp={n_pp}, sp={n_sp}, ep={n_ep})"
        )
    if n_ep > 1 and not dict(arch_cfg["args"]).get("moe_experts"):
        raise ValueError(
            "--ep shards mixture-of-experts stacks over an expert mesh "
            "axis, but this arch has no MoE (set arch;args;moe_experts, "
            "e.g. configs/pretrained_clip_comments_attn_moe.jsonc)"
        )
    n_second = max(n_model, n_pp, n_sp, n_ep)
    mesh = None
    import jax

    from vtc_tpu.parallel.expert import set_expert_mesh
    from vtc_tpu.parallel.stack import set_stack_parallel

    set_stack_parallel(None)  # newest run wins over any prior process state
    set_expert_mesh(None)
    if n_devices * n_second * n_replica > 1:
        if len(jax.devices()) >= n_devices * n_second * n_replica:
            if n_pp > 1:
                from vtc_tpu.parallel.pipeline import create_pipeline_mesh

                mesh = create_pipeline_mesh(n_devices, n_pp)
                set_stack_parallel(
                    "pipe", mesh, n_micro=int(config.get("n_micro", 4) or 4)
                )
            elif n_sp > 1:
                from vtc_tpu.parallel.sequence import create_sp_mesh

                mesh = create_sp_mesh(n_devices, n_sp)
                set_stack_parallel("seq", mesh)
            elif n_ep > 1:
                from vtc_tpu.parallel.expert import create_ep_mesh

                # registers itself as the mesh MoE layers constrain their
                # expert shardings to (set_expert_mesh); tree_shardings
                # shards the expert-stacked params + moments over it
                mesh = create_ep_mesh(n_devices, n_ep)
            else:
                # dp×tp — with --slices, replica-across-slices dp on the
                # outermost axis (gradient psum over DCN; tp/fsdp on ICI)
                mesh = create_mesh(n_devices, n_model, n_replica=n_replica)
            logger.info("Mesh: %s", mesh)
        else:
            # the reference warns on a device shortfall (utils/util.py:78-98)
            # — a misconfigured multi-chip run should be diagnosed, not
            # silently slow
            logger.warning(
                "Requested a %dx%dx%d (slices x data x second-axis) mesh "
                "but only %d device(s) are available; training UNSHARDED "
                "on one device.",
                n_replica, n_devices, n_second, len(jax.devices()),
            )

    criterion = LOSSES[config["loss"]]
    # the reference forwards config["loss_args"] to every criterion call
    # (trainer/trainer.py:47,78)
    loss_args = dict(config.get("loss_args") or {})
    if loss_args:
        import functools

        criterion = functools.partial(criterion, **loss_args)
    metrics = [
        METRICS[met["type"]](**dict(met["args"])) for met in config["metrics"]
    ]

    tx = build_optimizer(
        variables["params"],
        config["optimizer"],
        config.get("lr_scheduler"),
        steps_per_epoch=len(data_loader),
        fc_lr=config.get("fc_lr"),
        time_lr=config.get("time_lr"),
        adapter_lr=config.get("adapter_lr"),
        branch_to_freeze=dict(arch_cfg["args"]).get("freeze", False),
    )

    trainer = Trainer(
        module,
        variables,
        criterion,
        metrics,
        tx,
        config=config,
        data_loader=data_loader,
        valid_data_loader=valid_data_loader,
        mesh=mesh,
        seed=seed_value,
        probe_fn=_make_probe(config),
        branch_to_adapt_val=None,
        arch_name=arch_cfg["type"],
    )
    trainer.train()


if __name__ == "__main__":
    args = argparse.ArgumentParser(description="vtc_tpu training")
    args.add_argument("-c", "--config", default=None, type=str,
                      help="config file path (default: None)")
    args.add_argument("-r", "--resume", default=None, type=str,
                      help="path to latest checkpoint (default: None)")
    args.add_argument("-d", "--device", default=None, type=str,
                      help="number of devices (data axis) to use")

    options = [
        CustomArgs(["--lr", "--learning_rate"], type=float, target="optimizer;args;lr"),
        CustomArgs(["--fc_lr"], type=float, target="fc_lr"),
        CustomArgs(["--time_lr"], type=float, target="time_lr"),
        CustomArgs(["--adapter_lr"], type=float, target="adapter_lr"),
        CustomArgs(["--bs", "--batch_size"], type=int, target="batch_size"),
        CustomArgs(["--n_gpu"], type=int, target="n_gpu"),
        CustomArgs(["--n_devices"], type=int, target="n_devices"),
        CustomArgs(["--n_model"], type=int, target="n_model"),
        CustomArgs(["--fsdp"], type=int, target="fsdp"),
        CustomArgs(["--pp"], type=int, target="pp"),
        CustomArgs(["--sp"], type=int, target="sp"),
        CustomArgs(["--ep"], type=int, target="ep"),
        CustomArgs(["--slices"], type=int, target="slices"),
        CustomArgs(["--n_micro"], type=int, target="n_micro"),
        CustomArgs(["--accum_steps"], type=int, target="trainer;accum_steps"),
        CustomArgs(["--async_checkpoint"], type=int,
                   target="trainer;async_checkpoint"),
        CustomArgs(["--multihost"], type=int, target="multihost"),
        CustomArgs(["--moe_aux_loss_weight"], type=float,
                   target="moe_aux_loss_weight"),
        CustomArgs(["--b", "--branch_to_adapt"], type=str, target="arch;args;branch_to_adapt"),
        CustomArgs(["--bv", "--branch_to_adapt_val"], type=str, target="arch;args;branch_to_adapt_val"),
        CustomArgs(["--nc", "--num_comms"], type=int, target="dataset;args;num_comms"),
        CustomArgs(["--nl", "--num_imlabels"], type=int, target="dataset;args;num_imlabels"),
        CustomArgs(["--cached_vision_features"], type=str, target="dataset;args;cached_vision_features"),
        CustomArgs(["--add_comments"], type=str, target="dataset;args;add_comments"),
        CustomArgs(["--e", "--exp_name"], type=str, target="name"),
        CustomArgs(["--freeze"], type=str, target="arch;args;freeze"),
        CustomArgs(["--residual_activation"], type=str, target="arch;args;residual_activation"),
        CustomArgs(["--comment_fusion"], type=str, target="arch;args;comment_fusion"),
        CustomArgs(["--save_dir"], type=str, target="trainer;save_dir"),
        CustomArgs(["--epochs"], type=int, target="trainer;epochs"),
        CustomArgs(["--visual_device"], type=str, target="arch;args;visual_device"),
        CustomArgs(["--random_seed_value"], type=int, target="random_seed_value"),
    ]
    config = ConfigParser.from_args(args, options)
    _args = args.parse_args()

    if _HAS_WANDB:
        wandb.init(config=_args)
        wandb.run.name = config["name"]
        wandb.run.save()

    main(config)
