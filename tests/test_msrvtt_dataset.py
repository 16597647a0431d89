"""VideoDatasetMSRVTT on a synthetic MSRVTT-format corpus: split lists,
caption indices, augment (fake-comments) mode, and the full
retrieval_evaluation path over it."""

import json
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vtc_tpu.data.video_retrieval import VideoDatasetMSRVTT
from vtc_tpu.evaluation import retrieval_evaluation
from vtc_tpu.models import create_model


@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    (root / "TrainValVideo").mkdir()
    (root / "TestVideo").mkdir()
    meta = root / "meta"
    meta.mkdir()

    n = 8
    sentences = []
    train_ids, val_ids = [], []
    rng = np.random.default_rng(0)
    for i in range(n):
        vid = f"video{i}"
        folder = "TrainValVideo"
        vw = cv2.VideoWriter(
            str(root / folder / f"{vid}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48),
        )
        base = rng.integers(0, 200)
        for f in range(60):
            vw.write(np.full((48, 64, 3), (base + f) % 255, dtype=np.uint8))
        vw.release()
        for c in range(3):
            sentences.append(
                {"video_id": vid, "caption": f"video number {i} caption {c}"}
            )
        (train_ids if i < 5 else val_ids).append(vid)

    json.dump(
        {"sentences": sentences}, open(root / "train_val_videodatainfo.json", "w")
    )
    json.dump({"sentences": []}, open(root / "test_videodatainfo.json", "w"))

    (meta / "train_list_full.txt").write_text("\n".join(train_ids))
    (meta / "val_list_full.txt").write_text("\n".join(val_ids))
    (meta / "train_list_jsfusion.txt").write_text("\n".join(train_ids))
    (meta / "val_list_jsfusion.txt").write_text("\n".join(val_ids))
    with open(meta / "jsfusion_val_caption_idx.pkl", "wb") as f:
        pickle.dump({v: 1 for v in val_ids}, f)
    return root, meta


def test_full_val_split(msrvtt_root):
    root, meta = msrvtt_root
    ds = VideoDatasetMSRVTT(
        root=str(root), train=False, split="full-val", meta_dir=str(meta)
    )
    assert len(ds) == 3
    frames, text, vid_id = ds[0]
    # decode-only contract (round 2): raw uint8 HWC; retrieval_eval
    # preprocesses only the stride-selected frames
    assert frames.ndim == 4 and frames.shape[-1] == 3
    assert frames.dtype == np.uint8
    assert text.shape == (3, 77)  # all captions on the full splits
    assert vid_id.startswith("video")


def test_jsfusion_caption_index(msrvtt_root):
    root, meta = msrvtt_root
    ds = VideoDatasetMSRVTT(
        root=str(root), train=False, split="jsfusion", meta_dir=str(meta)
    )
    frames, text, vid_id = ds[0]
    assert text.shape == (1, 77)  # single indexed caption per video


def test_augment_fake_comments(msrvtt_root):
    root, meta = msrvtt_root
    ds = VideoDatasetMSRVTT(
        root=str(root), train=True, split="full-val", augment=True,
        meta_dir=str(meta),
    )
    assert len(ds) == 5 * 5  # fake 5x epoch length
    # needs >= 6 captions for 5 fake comments; our corpus has 3 -> the
    # reference asserts len==5, ours should too
    with pytest.raises(AssertionError):
        _ = ds[0]


def test_retrieval_evaluation_on_msrvtt(msrvtt_root):
    root, meta = msrvtt_root
    ds = VideoDatasetMSRVTT(
        root=str(root), train=False, split="full-val", meta_dir=str(meta)
    )
    module, variables = create_model("PretrainedCLIP_finaltf", model_type="test-tiny")
    # tiny model takes 32x32 inputs; rescale dataset output via wrapper
    class Resized:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            frames, text, vid_id = ds[i]  # raw uint8 [t, h, w, 3]
            frames = frames[:, ::2, ::2][:, :32, :32]  # [t, 24, 32, 3]; retrieval_eval's _ensure_preprocessed resizes/crops to image_size
            return frames, text, vid_id

    outdf = retrieval_evaluation(
        module, variables, "MSRVTT_videos", "full-val", dataset=Resized(),
        frame_stride=8, image_size=32,
    )
    assert outdf.shape == (3, 2)
    assert np.isfinite(outdf.to_numpy()).all()


def test_augment_path_preprocesses_frames(tmp_path):
    """augment(train) must return CLIP-preprocessed [8, 3, 224, 224] frames
    — the reference chains CLIP_TRANSFORM after VIDEO_AUG
    (video_retrieval_videodatasets.py:213-224). Raw 256x256 augmented
    frames would patchify to 64 patches against the ViT's 49+1 positional
    embedding."""
    root = tmp_path / "msrvtt6"
    (root / "TrainValVideo").mkdir(parents=True)
    (root / "TestVideo").mkdir()
    meta = root / "meta"
    meta.mkdir()

    vid = "video0"
    vw = cv2.VideoWriter(
        str(root / "TrainValVideo" / f"{vid}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48),
    )
    for f in range(60):
        vw.write(np.full((48, 64, 3), f * 4 % 255, dtype=np.uint8))
    vw.release()

    sentences = [
        {"video_id": vid, "caption": f"caption number {c}"} for c in range(6)
    ]
    (root / "train_val_videodatainfo.json").write_text(
        json.dumps({"sentences": sentences})
    )
    (root / "test_videodatainfo.json").write_text(
        json.dumps({"sentences": []})
    )
    (meta / "train_list_full.txt").write_text(vid + "\n")
    (meta / "val_list_full.txt").write_text("")

    ds = VideoDatasetMSRVTT(
        root=str(root), train=True, split="full-val", augment=True,
        meta_dir=str(meta),
    )
    frames, title, comments, _ = ds[0]
    assert frames.shape == (8, 3, 224, 224), frames.shape
    assert frames.dtype == np.float32
    assert title.shape == (77,)
    assert comments.shape == (5, 77)
