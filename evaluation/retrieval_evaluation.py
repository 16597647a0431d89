"""Standalone transfer-eval CLI — mirrors the reference's
``evaluation/retrieval_evaluation.py:271-363``. The heavy lifting lives in
``vtc_tpu.evaluation.retrieval_eval``.
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.append(str(Path(__file__).parent.parent))

from vtc_tpu.evaluation import retrieval_evaluation
from vtc_tpu.models import create_model
from vtc_tpu.training.checkpoints import graft_params, load_checkpoint

logging.getLogger().setLevel("INFO")

MODEL_TYPES = {
    "pretrained_clip": "PretrainedCLIP",
    "clip_timesformer": "PretrainedCLIP_TimeSformer",
    "pretrained_clip_finaltf": "PretrainedCLIP_finaltf",
    "clip_timesformer_finaltf": "PretrainedCLIP_TimeSformer_finaltf",
}


def load_model(checkpoint_path, model_type, branch_to_adapt="text",
               residual_activation="none"):
    """``retrieval_evaluation.py:65-105``."""
    init_from_avg = False
    restored = None
    if checkpoint_path is not None:
        restored = load_checkpoint(checkpoint_path)
        cfg = restored.get("config") or restored.get("torch_config") or {}
        try:
            init_from_avg = cfg["arch"]["args"].get("init_from_avg", False)
        except (KeyError, TypeError):
            init_from_avg = False

    arch = MODEL_TYPES[model_type]
    kwargs = {"residual_activation": residual_activation}
    if "finaltf" in model_type:
        kwargs.update(
            branch_to_adapt_val=branch_to_adapt, init_from_avg=init_from_avg
        )
    module, variables = create_model(arch, **kwargs)

    if restored is not None:
        params, missing, unexpected = graft_params(
            variables["params"], restored["params"]
        )
        assert not missing and not unexpected, (missing[:3], unexpected[:3])
        variables = dict(variables)
        variables["params"] = params
        if restored.get("batch_stats"):
            variables["batch_stats"], _, _ = graft_params(
                variables.get("batch_stats", {}), restored["batch_stats"]
            )
    return module, variables


def main(argv=None, dataset=None):
    """CLI entry (``argv`` and ``dataset`` injectable for tests)."""
    args = argparse.ArgumentParser()
    args.add_argument(
        "-c", "--dataset", default="MSRVTT_videos",
        choices=["MSRVTT_videos", "MSVD_videos", "K700_videos",
                 "Reddit_videos", "livebot"],
        type=str,
    )
    args.add_argument("-r", "--checkpoint", default=None, type=str)
    args.add_argument("-m", "--model_type", default=None, type=str)
    args.add_argument("-d", "--device", default=None, type=str)
    args.add_argument("-s", "--split", default="full-test", type=str)
    args.add_argument(
        "--branch_to_adapt", default="text",
        choices=["text", "image", "random", "skip"], type=str,
    )
    args.add_argument("--residual_activation", default="none", type=str)
    args.add_argument("--out_csv", default=None, type=str)
    args.add_argument("--frame_stride", default=16, type=int)
    args.add_argument("--first_frame_only", action="store_true")
    args.add_argument("--first_chunk_only", action="store_true")
    args.add_argument("--n_devices", default=1, type=int,
                      help="shard eval batches + ranking over a data mesh")
    args = args.parse_args(argv)

    if args.device:
        # the TPU analogue of the reference's device selection: "-d cpu"
        # forces the host platform (must happen before first device use;
        # the env sitecustomize may pre-select a TPU backend), anything
        # else selects the default accelerator
        import jax

        if args.device.lower() == "cpu":
            jax.config.update("jax_platforms", "cpu")
        elif args.device.lower() not in ("tpu", "axon", "default"):
            print(f"warning: unknown -d {args.device!r}; using the default "
                  "backend", file=sys.stderr)

    module, variables = load_model(
        args.checkpoint, args.model_type,
        branch_to_adapt=args.branch_to_adapt,
        residual_activation=args.residual_activation,
    )

    # --n_devices shards the per-video batches AND the final ranking over a
    # data mesh (retrieval_eval places the params by the tp rules); results
    # are identical to single-device (tests/test_transfer_eval_sharded.py)
    mesh = None
    if args.n_devices > 1:
        import jax

        if len(jax.devices()) >= args.n_devices:
            from vtc_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(args.n_devices, 1)
        else:
            print(
                f"warning: requested {args.n_devices} devices but only "
                f"{len(jax.devices())} available; evaluating on one device",
                file=sys.stderr,
            )

    return retrieval_evaluation(
        module, variables, args.dataset, args.split,
        out_csv=args.out_csv,
        frame_stride=args.frame_stride,
        first_frame_only=args.first_frame_only,
        first_chunk_only=args.first_chunk_only,
        mesh=mesh,
        dataset=dataset,
    )


if __name__ == "__main__":
    main()
