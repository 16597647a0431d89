"""Deployable retrieval server: checkpoint + embedding gallery -> HTTP.

The reference has no serving story (its pipeline ends at offline eval,
``evaluation/eval.py``); this CLI completes the production path: the same
model a training run checkpoints serves text->video / image->video
retrieval over HTTP, with the gallery HBM-resident (optionally sharded over
a mesh) and query batches bucketed to power-of-two shapes so a live service
never recompiles on ragged request sizes (`vtc_tpu/serving/`).

    python scripts/serve.py -c configs/pretrained_clip.jsonc \
        -r saved/models/run/0821_.../model_best \
        --index clip_vit_embeddings.npz --port 8000

``--index`` takes the npz the feature-caching script writes
(``scripts/get_clip_vit_embeddings.py``: ``reddit_ids`` + ``embeddings``)
or a ``RetrievalIndex.save`` file. Endpoints: see
``vtc_tpu/serving/server.py``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_server(config, checkpoint, index_path, *, n_devices=1, n_model=1,
                 host="127.0.0.1", port=8000, bucket_queries=True):
    """Assemble the RetrievalHTTPServer (separated from main() so tests can
    drive it in-process on an ephemeral port)."""
    from vtc_tpu.data.tokenizer import tokenize
    from vtc_tpu.models import create_model
    from vtc_tpu.serving import ClipRetrievalService, RetrievalIndex
    from vtc_tpu.serving.server import RetrievalHTTPServer
    from vtc_tpu.training.checkpoints import graft_params, load_checkpoint

    arch = config["arch"]
    module, variables = create_model(
        arch["type"], seed=0, **dict(arch["args"])
    )
    if checkpoint is not None:
        ckpt = load_checkpoint(checkpoint)
        params, missing, unexpected = graft_params(
            variables["params"], ckpt["params"]
        )
        if missing or unexpected:
            print(f"warm-start: {len(missing)} missing / "
                  f"{len(unexpected)} unexpected keys", file=sys.stderr)
        variables = dict(variables)
        variables["params"] = params
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]

    mesh = None
    if n_devices * n_model > 1:
        from vtc_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(n_devices, n_model)

    index = RetrievalIndex.load(index_path, mesh=mesh)
    service = ClipRetrievalService(
        module, variables, index, bucket_queries=bucket_queries
    )
    return RetrievalHTTPServer(service, tokenizer=tokenize, host=host,
                               port=port)


def main():
    ap = argparse.ArgumentParser(description="vtc_tpu retrieval server")
    ap.add_argument("-c", "--config", required=True,
                    help="training config (arch section is used)")
    ap.add_argument("-r", "--resume", default=None,
                    help="checkpoint (orbax dir or reference .pth)")
    ap.add_argument("--index", required=True,
                    help="gallery npz (reddit_ids + embeddings)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--n_devices", type=int, default=1)
    ap.add_argument("--n_model", type=int, default=1)
    ap.add_argument("--no_warmup", action="store_true")
    args = ap.parse_args()

    from vtc_tpu.utils import read_json

    config = read_json(args.config)
    server = build_server(
        config, args.resume, args.index,
        n_devices=args.n_devices, n_model=args.n_model,
        host=args.host, port=args.port,
    )
    if not args.no_warmup:
        print("warming up query buckets ...", file=sys.stderr)
        server.warmup()
    print(f"serving on {args.host}:{server.port}", file=sys.stderr)
    server.serve()


if __name__ == "__main__":
    main()
