"""Feature-cache precompute: GDT-style audio embeddings.

Mirrors ``scripts/get_audio_embeddings.py`` of the reference: for each video,
5 two-second log-spectrogram clips at relative time points
[0.15, 0.3, 0.45, 0.6, 0.85] through the ResNet-9 audio tower -> per-clip
512-d embeddings; all-ones spectrogram fallback for missing audio. Output
``{"reddit_ids", "embeddings" [N, 5, 512]}``.
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd

NUM_CLIPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--root", default="")
    ap.add_argument("--out", default="audio_embeddings_no_aug_5clip_5embeds_2sec.npz")
    ap.add_argument("--batch_size", type=int, default=96)
    ap.add_argument("--num_workers", type=int, default=13)
    ap.add_argument("--gdt_weights", default=None,
                    help="gdt_IG65M.pth to initialize the audio tower")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vtc_tpu.audio import AudioResNet9, import_gdt_audio_weights, video_audio_clips
    from vtc_tpu.data.loader import DataLoader

    model = AudioResNet9()
    if args.gdt_weights:
        from vtc_tpu.models.torch_import import load_torch_file

        ckpt = load_torch_file(args.gdt_weights)
        variables = import_gdt_audio_weights(ckpt.get("model", ckpt))
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 257, 199), jnp.float32)
        )
        print("warning: random audio-tower init (no --gdt_weights given)")

    @jax.jit
    def _encode(variables, spectrograms):  # [b, nclips, 257, 199]
        b, c = spectrograms.shape[:2]
        x = spectrograms.reshape(b * c, 1, 257, 199)
        y = model.apply(variables, x)
        return y.reshape(b, c, -1)

    def encode(spectrograms):
        return _encode(variables, spectrograms)

    df = pd.read_csv(args.csv)
    files = [x[len("results/"):-4] + ".mp4" for x in df.video_path]
    filenames = [os.path.join(args.root, x) for x in files]

    class DS:
        def __len__(self):
            return len(filenames)

        def __getitem__(self, i):
            return video_audio_clips(filenames[i], NUM_CLIPS)

    loader = DataLoader(
        DS(), batch_size=args.batch_size, num_workers=args.num_workers
    )

    out = []
    tic = time.time()
    for bi, batch in enumerate(loader):
        y = np.asarray(encode(jnp.asarray(batch)))
        out.append(y)
        toc = time.time() - tic
        tic = time.time()
        print(bi, "/", len(loader), "%.1fHz" % (args.batch_size / toc), y.shape)

    stacked = np.vstack(out)
    np.savez(
        args.out,
        reddit_ids=df.reddit_id.to_numpy(np.int64),
        embeddings=stacked,
    )
    print("saved", args.out, stacked.shape)


if __name__ == "__main__":
    main()
