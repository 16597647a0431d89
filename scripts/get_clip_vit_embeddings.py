"""Feature-cache precompute: CLIP image embeddings for every thumbnail.

Mirrors ``scripts/get_clip_vit_embeddings.py`` of the reference: CSV ->
thumbnails -> batched ``encode_image`` -> ``{"reddit_ids", "embeddings"}``
table. Runs jitted and sharded over the mesh's data axis; output is ``.npz``
(plus optional ``.pth`` for torch interop).
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--root", default="")
    ap.add_argument("--out", default="clip_vit_embeddings.npz")
    ap.add_argument("--batch_size", type=int, default=96)
    ap.add_argument("--num_workers", type=int, default=13)
    ap.add_argument("--model_type", default="ViT-B/32")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--clip_weights", default=None)
    ap.add_argument("--fp32", action="store_true",
                    help="encode in float32 (default: bfloat16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vtc_tpu.data.loader import DataLoader
    from vtc_tpu.data.preprocess import clip_preprocess
    from vtc_tpu.models import create_model
    from vtc_tpu.parallel.mesh import create_mesh, shard_batch

    df = pd.read_csv(args.csv)
    files = [x[len("results/"):-4] + ".jpg" for x in df.video_path]
    filenames = [os.path.join(args.root, x) for x in files]

    module, variables = create_model(
        "PretrainedCLIP",
        model_type=args.model_type,
        clip_weights=args.clip_weights,
        dtype=jnp.bfloat16 if (not args.fp32) else jnp.float32,
    )

    mesh = create_mesh() if len(jax.devices()) > 1 else None

    @jax.jit
    def _encode(variables, imgs):
        return module.apply(
            variables, imgs, method="encode_image"
        ).astype(jnp.float32)

    def encode(imgs):
        return _encode(variables, imgs)

    class DS:
        def __len__(self):
            return len(filenames)

        def __getitem__(self, i):
            return clip_preprocess(Image.open(filenames[i]), args.image_size)

    loader = DataLoader(
        DS(), batch_size=args.batch_size, num_workers=args.num_workers
    )

    out = []
    tic = time.time()
    for bi, imgs in enumerate(loader):
        n = imgs.shape[0]
        if n % (mesh.shape["data"] if mesh else 1) != 0 and mesh is not None:
            pad = (-n) % mesh.shape["data"]
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        batch = shard_batch(imgs, mesh) if mesh else jnp.asarray(imgs)
        y = np.asarray(encode(batch))[:n]
        out.append(y)
        toc = time.time() - tic
        tic = time.time()
        print(bi, "/", len(loader), "%.1fHz" % (args.batch_size / toc), y.shape)

    stacked = np.vstack(out)
    reddit_ids = df.reddit_id.to_numpy(np.int64)
    np.savez(args.out, reddit_ids=reddit_ids, embeddings=stacked)
    if args.out.endswith(".pth"):
        import torch

        torch.save(
            {"reddit_ids": torch.tensor(reddit_ids),
             "embeddings": torch.tensor(stacked)},
            args.out,
        )
    print("saved", args.out, stacked.shape)


if __name__ == "__main__":
    main()
