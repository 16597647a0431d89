"""End-to-end video input pipeline benchmark.

The reference's training bottleneck was ffmpeg-side decode in DataLoader
workers (``dataset_loaders.py:405-424`` — the reason its cached-feature paths
exist). This measures OUR host pipeline on a synthetic corpus:

  decode (OpenCV) -> native C++ resize+normalize -> threaded loader
  -> device prefetch -> [optionally] the video train step

and reports videos/s for the host side alone, the device step alone, and the
overlapped end-to-end rate.

Usage: python scripts/bench_video_pipeline.py [--videos 48] [--workers 8]
       [--batch 8] [--device-step]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def make_corpus(root, n_videos=48, frames=240, w=480, h=360, fps=30):
    import cv2
    import pandas as pd

    vids = os.path.join(root, "media", "vids")
    os.makedirs(vids, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_videos):
        # two base36 digits of i: unique for n_videos <= 1296 (a single
        # mixed digit collided with period 36 and silently shrank the
        # corpus the throughput was measured on)
        rid_str = "vd" + BASE36[(i // 36) % 36] + BASE36[i % 36]
        rid = int(rid_str, 36)
        assert not any(r["reddit_id"] == rid for r in rows), rid_str
        path = os.path.join(vids, f"{rid_str}.mp4")
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        base = rng.integers(0, 255, (h, w, 3), np.uint8)
        for f in range(frames):
            frame = np.roll(base, f * 3, axis=1)
            vw.write(frame)
        vw.release()
        rows.append({
            "reddit_id": rid,
            "video_path": f"results/vids/{rid_str}.mp4",
            "title": f"synthetic video {i}",
            "video_length": frames / fps,
            "comments": str([f"comment {i} alpha", f"comment {i} beta"]),
        })
    csv = os.path.join(root, "posts.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv, os.path.join(root, "media")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=48)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--device-step", action="store_true",
                    help="also run the full train step per batch (real chip)")
    args = ap.parse_args()

    from vtc_tpu.data.loader import DataLoader
    from vtc_tpu.data.native import native_available

    tmp = tempfile.mkdtemp(prefix="vtc_video_bench_")
    print(f"corpus: {args.videos} videos (240f 480x360) in {tmp}")
    csv, root = make_corpus(tmp, args.videos)

    from vtc_tpu.data import VideoDatasetSegments

    ds = VideoDatasetSegments(
        csv, root, train=True, add_comments="always", num_comms=5,
        comment_sampling="random",
    )
    print(f"dataset: {len(ds)} videos | native preproc: {native_available()}")
    loader = DataLoader(
        ds, batch_size=args.batch, shuffle=True, drop_last=True,
        num_workers=args.workers,
    )

    # host pipeline alone: decode -> 8-frame segment -> augment -> native
    # resize+normalize -> collate
    cores = len(os.sched_getaffinity(0))
    n = 0
    tic = time.perf_counter()
    for _ in range(args.epochs):
        for batch in loader:
            n += batch[0].shape[0]
    host_dt = time.perf_counter() - tic
    host_vps = n / host_dt
    print(f"host pipeline: {host_vps:7.1f} videos/s "
          f"({n} clips in {host_dt:.1f}s, {args.workers} workers, "
          f"{cores} visible cores)")
    print(f"  -> {host_dt * cores / n:.2f} core-seconds/clip; the pipeline "
          f"is embarrassingly parallel across dataloader workers, so "
          f"videos/s scales with host cores ({cores} here; production TPU "
          f"hosts have 100+)")

    if not args.device_step:
        return

    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns
    from vtc_tpu.data.loader import prefetch_to_device

    os.environ.setdefault("VTC_REMAT", "1")
    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type="ViT-B/32",
        seed=0, dtype=jnp.bfloat16, nframes=8,
    )
    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 1e-4}}, None, 10
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )
    key = jax.random.PRNGKey(0)

    def gen():
        for _ in range(args.epochs):
            for *data, meta in loader:
                yield tuple(data), {}

    # warm-up compile on one batch
    first = next(gen())
    state, loss, _ = train_step(state, first[0], {}, key)
    float(loss)

    n, tic = 0, time.perf_counter()
    for data, meta in prefetch_to_device(gen(), None, size=2):
        state, loss, _ = train_step(state, data, {}, key)
        n += data[0].shape[0]
    float(loss)
    e2e_dt = time.perf_counter() - tic
    e2e_vps = n / e2e_dt
    overlap = 100.0 * min(1.0, e2e_vps / host_vps)
    print(f"end-to-end train: {e2e_vps:7.1f} videos/s "
          f"(host-pipeline utilization {overlap:.0f}%)")


if __name__ == "__main__":
    main()
