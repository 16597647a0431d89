"""Data-layer tests on synthetic fixtures: base36 partitioning, bot filter,
comment sampling, cached features, ImTextDataset / FeaturesDataset /
VideoDatasetSegments end-to-end, DataLoader collation."""

import json

import numpy as np
import pandas as pd
import pytest

from vtc_tpu.data import (
    VideoDatasetFirst32,
    DataLoader,
    FeaturesDataset,
    ImTextDataset,
    VideoDatasetSegments,
    load_features,
    partition_dataframe,
    preprocess_comments,
)

BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _make_csv(tmp_path, n=36, make_jpgs=False, make_mp4s=False):
    """One reddit id per base36 last digit -> deterministic 4/4/28 split."""
    rows = []
    root = tmp_path / "media"
    root.mkdir(exist_ok=True)
    for i in range(n):
        rid_str = "abc" + BASE36[i % 36]
        rid = int(rid_str, 36)
        rows.append(
            {
                "reddit_id": rid,
                "video_path": f"results/vids/{rid_str}.mp4",
                "title": f"title number {i} with words",
                "video_length": 10.0,
                "comments": str(
                    [f"comment {i}a", "i am a bot, ignore", f"comment {i}b"]
                ),
            }
        )
        if make_jpgs:
            from PIL import Image

            (root / "vids").mkdir(exist_ok=True)
            Image.fromarray(
                np.random.default_rng(i).integers(0, 255, (64, 80, 3), dtype=np.uint8)
            ).save(root / "vids" / f"{rid_str}.jpg")
        if make_mp4s:
            import cv2

            (root / "vids").mkdir(exist_ok=True)
            vw = cv2.VideoWriter(
                str(root / "vids" / f"{rid_str}.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"),
                30,
                (64, 48),
            )
            for f in range(90):
                vw.write(
                    np.full((48, 64, 3), (f * 2) % 255, dtype=np.uint8)
                )
            vw.release()
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv, root


def test_partition_deterministic(tmp_path):
    csv, _ = _make_csv(tmp_path)
    df = pd.read_csv(csv)
    test = partition_dataframe(df, split="test")
    val = partition_dataframe(df, split="val")
    train = partition_dataframe(df, split="train")
    assert len(test) == 4 and len(val) == 4 and len(train) == 28
    # disjoint and exhaustive
    all_ids = set(test.reddit_id) | set(val.reddit_id) | set(train.reddit_id)
    assert len(all_ids) == 36


def test_preprocess_comments_bot_filter_and_padding():
    comments = ["good video", "i am a bot, beep", "nice"]
    out = preprocess_comments(comments, sampling=None, num_comms=4)
    assert len(out) == 4
    assert "i am a bot, beep" not in out
    assert out[2:] == ["", ""]
    assert preprocess_comments(comments, num_comms=0) == []


def test_load_features_npz(tmp_path):
    csv, _ = _make_csv(tmp_path)
    df = pd.read_csv(csv)
    ids = df.reddit_id.to_numpy()[::-1].copy()  # deliberately scrambled order
    emb = np.arange(len(ids) * 4, dtype=np.float32).reshape(len(ids), 4)
    path = tmp_path / "feats.npz"
    np.savez(path, reddit_ids=ids.astype(np.int64), embeddings=emb)

    feats = load_features(df, str(path))
    assert feats.shape == (36, 4)
    # row alignment follows df order, not storage order
    np.testing.assert_array_equal(feats[0], emb[np.where(ids == df.reddit_id.iloc[0])[0][0]])


def test_load_features_torch_pth(tmp_path):
    import torch

    csv, _ = _make_csv(tmp_path)
    df = pd.read_csv(csv)
    ids = torch.tensor(df.reddit_id.to_numpy(), dtype=torch.int64)
    emb = torch.randn(len(ids), 8)
    path = tmp_path / "feats.pth"
    torch.save({"reddit_ids": ids, "embeddings": emb}, path)
    feats = load_features(df, str(path))
    np.testing.assert_allclose(feats, emb.numpy(), atol=0)


def test_features_dataset_comment_format(tmp_path):
    csv, _ = _make_csv(tmp_path)
    df = pd.read_csv(csv)
    train_df = partition_dataframe(df, split="train")

    # plain vision features
    ids = df.reddit_id.to_numpy().astype(np.int64)
    emb = np.random.default_rng(0).normal(size=(36, 16)).astype(np.float32)
    vis_path = tmp_path / "vis.npz"
    np.savez(vis_path, reddit_ids=ids, embeddings=emb)

    # comment-format features (ragged)
    mapping = {int(r): ["c0", "c1"] for r in ids}
    comment_emb = np.empty(36, dtype=object)
    for i in range(36):
        comment_emb[i] = [
            np.full(16, i, np.float32),
            np.full(16, i + 0.5, np.float32),
        ]
    comm_path = tmp_path / "comm.npz"
    np.savez(
        comm_path,
        reddit_id_to_comment_id=np.asarray(mapping, dtype=object),
        embeddings=comment_emb,
    )

    ds = FeaturesDataset(
        str(csv),
        input_features=[str(vis_path), str(comm_path)],
        train=True,
        train_comment_sampling="first",
    )
    assert len(ds) == len(train_df)
    vis, comm, meta = ds[0]
    assert vis.shape == (16,) and comm.shape == (16,)
    assert meta == {}


def test_imtext_dataset(tmp_path):
    csv, root = _make_csv(tmp_path, make_jpgs=True)
    ds = ImTextDataset(
        str(csv), str(root), train=True, add_comments="always", num_comms=2,
        comment_sampling=None,
    )
    im, title_tok, comments_tok, meta = ds[0]
    assert im.shape == (3, 224, 224)
    assert title_tok.shape == (77,)
    assert comments_tok.shape == (2, 77)
    assert "id" in meta
    # add_comments='train_only' at eval -> single empty comment
    ds_eval = ImTextDataset(
        str(csv), str(root), train=False, add_comments="train_only", num_comms=2
    )
    _, _, ctok, _ = ds_eval[0]
    assert ctok.shape == (1, 77)
    assert ctok[0, 1] == 49407  # empty


def test_video_dataset_segments(tmp_path):
    cv2 = pytest.importorskip("cv2")
    del cv2
    csv, root = _make_csv(tmp_path, make_mp4s=True)
    ds = VideoDatasetSegments(
        str(csv), str(root), train=True, add_comments="always", num_comms=2,
    )
    vid, title_tok, comments_tok, meta = ds[0]
    assert vid.shape == (8, 3, 224, 224)
    assert title_tok.shape == (77,)
    assert comments_tok.shape == (2, 77)

    ds_ff = VideoDatasetSegments(
        str(csv), str(root), train=False, first_frame_only=True,
    )
    vid_ff, _, _, _ = ds_ff[0]
    assert vid_ff.shape == (3, 224, 224)


def test_dataloader_batching(tmp_path):
    csv, root = _make_csv(tmp_path, make_jpgs=True)
    ds = ImTextDataset(
        str(csv), str(root), train=True, add_comments="always", num_comms=2,
        comment_sampling=None,
    )
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2)
    assert len(loader) == len(ds) // 8
    batches = list(loader)
    assert len(batches) == len(loader)
    vis, title, comments, meta = batches[0]
    assert vis.shape == (8, 3, 224, 224)
    assert title.shape == (8, 77)
    assert comments.shape == (8, 2, 77)
    assert np.asarray(meta["id"]).shape == (8,)

    # shuffling differs across epochs but is seeded-deterministic per loader
    ids0 = [tuple(np.asarray(b[3]["id"])) for b in batches]  # epoch 1
    ids1 = [tuple(np.asarray(b[3]["id"])) for b in loader]   # epoch 2
    assert ids0 != ids1  # re-shuffled between epochs (not a fixed perm)
    loader2 = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=0)
    _ = list(loader2)
    ids2 = [tuple(np.asarray(b[3]["id"])) for b in loader2]
    assert ids1 == ids2  # epoch 2 of equal-seed loaders matches


def test_video_dataset_first32(tmp_path):
    cv2 = pytest.importorskip("cv2")
    del cv2
    csv, root = _make_csv(tmp_path, make_mp4s=True)
    df = pd.read_csv(csv)
    feats_path = tmp_path / "txt.npz"
    np.savez(
        feats_path,
        reddit_ids=df.reddit_id.to_numpy(np.int64),
        embeddings=np.random.default_rng(0)
        .normal(size=(len(df), 12))
        .astype(np.float32),
    )
    ds = VideoDatasetFirst32(str(csv), str(root), train=True,
                             text_features=str(feats_path),
                             should_partition_dataframe=False)
    vid, text, meta = ds[0]
    # ig65m layout [c, t, h, w], 32 frames at 128x171
    assert vid.shape == (3, 32, 128, 171)
    assert text.shape == (12,)
    assert "id" in meta
    # clip_preprocess mode: [t, 3, 224, 224] + tokenized title
    ds2 = VideoDatasetFirst32(str(csv), str(root), train=True,
                              should_partition_dataframe=False,
                              clip_preprocess=True)
    vid2, text2, _ = ds2[0]
    assert vid2.shape == (32, 3, 224, 224)
    assert text2.shape == (1, 77)


def test_video_dataset_first1800(tmp_path):
    cv2 = pytest.importorskip("cv2")
    del cv2
    csv, root = _make_csv(tmp_path, make_mp4s=True)
    from vtc_tpu.data import VideoDatasetFirst1800

    ds = VideoDatasetFirst1800(str(csv), str(root), train=True,
                               should_partition_dataframe=False)
    vid, meta = ds[0]
    # [c, t, 112, 112] with at least min_nframes frames
    assert vid.shape[0] == 3 and vid.shape[2:] == (112, 112)
    assert vid.shape[1] >= 32


def test_kinetics_and_howto100m_mixing(tmp_path):
    """VideoDatasetSegments kinetics/howto100m training mix: split filters,
    description-sentence pseudo-comments (dataset_loaders.py:294-351)."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    csv, root = _make_csv(tmp_path, make_mp4s=True)

    kroot = tmp_path / "kinetics"
    (kroot / "train").mkdir(parents=True)
    import cv2 as _cv2

    long_desc = "x" * 61
    krows = []
    for i, (k7, k4, path_part) in enumerate(
        [
            ("train", "train", "vids/train/a.mp4"),   # kept
            ("train", None, "vids/train/b.mp4"),       # kept (k400 nan)
            ("test", "train", "vids/train/c.mp4"),     # dropped (k700 test)
            ("train", "train", "vids/test/d.mp4"),     # dropped (path not /train/)
        ]
    ):
        vp = kroot / path_part
        vp.parent.mkdir(exist_ok=True, parents=True)
        vw = _cv2.VideoWriter(str(vp), _cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
        for f in range(30):
            vw.write(np.full((32, 32, 3), 100, np.uint8))
        vw.release()
        krows.append(
            {
                "video_path": path_part,
                "split_k700": k7,
                "split_k400": k4,
                "title_en": f"kinetics video {i}",
                "video_length": 1.0,
                "comments": '["a comment"]',
                "description_en": f"{long_desc}. short",
            }
        )
    kcsv = tmp_path / "kinetics.csv"
    pd.DataFrame(krows).to_csv(kcsv, index=False)

    ds = VideoDatasetSegments(
        str(csv), str(root), train=True, use_kinetics_train="combine",
        kinetics_csv=str(kcsv), kinetics_root=str(kroot),
        add_comments="always", num_comms=2,
    )
    n_reddit = 28  # train split of the 36-row corpus
    assert len(ds) == n_reddit + 2
    # kinetics entries carry id -1 and description pseudo-comments
    assert ds.ids[-1] == -1
    assert any(long_desc in c for c in ds.comments[-1])


def test_grain_loader_matches_interface(tmp_path):
    pytest.importorskip("grain")
    from vtc_tpu.data.loader import GrainDataLoader

    csv, root = _make_csv(tmp_path, make_jpgs=True)
    ds = ImTextDataset(
        str(csv), str(root), train=True, add_comments="always", num_comms=2,
        comment_sampling=None,
    )
    loader = GrainDataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                             num_workers=0)
    assert len(loader) == len(ds) // 8
    batches = list(loader)
    assert len(batches) == len(loader)
    vis, title, comments, meta = batches[0]
    assert np.asarray(vis).shape == (8, 3, 224, 224)
    assert np.asarray(title).shape == (8, 77)
    assert np.asarray(comments).shape == (8, 2, 77)


def test_threaded_loader_producer_exits_when_iteration_abandoned():
    """Abandoning a threaded DataLoader mid-epoch (early break / exception
    in the training loop) must release the producer thread even while it is
    blocked in the bounded queue — a put() that ignores the stop event
    would leak num_workers+1 threads per abandoned epoch."""
    import threading
    import time as _time

    from vtc_tpu.data.loader import DataLoader as _DL

    class _DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.full((4,), i, np.float32)

    loader = _DL(_DS(), batch_size=4, shuffle=False, num_workers=2)
    baseline = threading.active_count()
    it = iter(loader)
    next(it)  # producer running; prefetch queue fills and put() blocks
    _time.sleep(0.3)
    it.close()  # abandon mid-epoch -> finally sets the stop event
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        if threading.active_count() <= baseline:
            break
        _time.sleep(0.05)
    assert threading.active_count() <= baseline, (
        threading.active_count(), baseline
    )
