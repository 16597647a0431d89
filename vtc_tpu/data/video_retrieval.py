"""Transfer-eval video retrieval datasets: MSR-VTT, MSVD, ActivityNet,
Kinetics-700-comments.

Mirrors ``dataset_loaders/video_retrieval_videodatasets.py:113-554``. Split
metadata ships under ``vtc_tpu/data/meta/`` (public evaluation-protocol
lists). ActivityNet gets configurable paths instead of the reference's
hardcoded cluster paths (documented defect, ``:407-419``).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import warnings
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from .preprocess import augment_frames
from .tokenizer import tokenize, tokenize_max_len
from .video import (
    linspace_subsample,
    read_video_full,
    read_video_segment,
    video_duration_sec,
)

META_DIR = Path(__file__).parent / "meta"


def _read_video_train(video_path, rng: Optional[np.random.Generator] = None):
    """Stride-randomized augmented train reader
    (``video_retrieval_videodatasets.py:65-110``)."""
    rng = rng or np.random.default_rng()
    frame_strides = (8, 16, 16, 24)
    reference_fps = 30
    nframes = 8

    video_length = video_duration_sec(video_path)
    frame_stride = frame_strides[int(rng.integers(0, len(frame_strides)))]
    segment_duration = nframes / (reference_fps / frame_stride)

    start_upper = max(0.0, video_length - segment_duration)
    segment_start = (0.0 - start_upper) * float(rng.random()) + start_upper

    vid = read_video_segment(
        video_path, segment_start, segment_start + segment_duration,
        resize_width=300, resize_height=0, subsample_to=nframes,
    )
    if vid.shape[0] == 0:
        print("Video read failed", video_path)
        vid = np.zeros((nframes, 300, 300, 3), np.uint8)
    if vid.shape[0] != nframes:
        vid = linspace_subsample(vid, nframes)
    return augment_frames(vid, rng)


class VideoDatasetMSRVTT:
    """MSR-VTT with the four standard splits (jsfusion/1k-A, miech/1k-B,
    full-val, full-test); augment mode turns extra captions into 5 fake
    comments (``video_retrieval_videodatasets.py:113-255``)."""

    def __init__(self, root="/data/MSRVTT", train=True, split=None, augment=False,
                 meta_dir=None, seed=0):
        self.train = train
        self.augment = augment
        self.rng = np.random.default_rng(seed)

        ce_meta_dir = Path(meta_dir) if meta_dir else META_DIR / "msrvtt_meta"
        json_files = ["train_val_videodatainfo.json", "test_videodatainfo.json"]
        video_folders = ["TrainValVideo", "TestVideo"]

        caption_indices_file = None
        if split == "miech":
            txt_file = "train_list_miech.txt" if train else "test_list_miech.txt"
        elif split == "jsfusion":
            txt_file = "train_list_jsfusion.txt" if train else "val_list_jsfusion.txt"
            if not train:
                caption_indices_file = "jsfusion_val_caption_idx.pkl"
        elif split == "full-val":
            txt_file = "train_list_full.txt" if train else "val_list_full.txt"
        elif split == "full-test":
            txt_file = "train_list_full.txt" if train else "test_list_full.txt"
        else:
            raise ValueError("Unknown MSRVTT split")

        with open(ce_meta_dir / txt_file, "r") as f:
            video_ids = [x.strip() for x in f.read().split("\n") if x.strip()]
        print("MSRVTT split %s, %d files" % (split, len(video_ids)))

        sent_dict = defaultdict(list)
        for json_file in json_files:
            path = os.path.join(root, json_file)
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            metadata = json.load(open(path))
            for s in metadata["sentences"]:
                sent_dict[s["video_id"]].append(s["caption"])

        video_file_dict = {}
        for vf in video_folders:
            vf_abs = os.path.join(root, vf)
            for m in os.listdir(vf_abs):
                if m.endswith(".mp4"):
                    video_file_dict[m.split(".")[0]] = os.path.join(vf_abs, m)

        if caption_indices_file is not None:
            with open(ce_meta_dir / caption_indices_file, "rb") as f:
                caption_indices = pickle.load(f)
            for c, i in caption_indices.items():
                sent_dict[c] = [sent_dict[c][i]]

        if not train and split == "miech":
            for k in sent_dict:
                sent_dict[k] = [sent_dict[k][0]]

        self.video_files = [video_file_dict[v] for v in video_ids]
        self.captions = sent_dict

    def __len__(self):
        if self.augment and self.train:
            return 5 * len(self.video_files)
        return len(self.video_files)

    def __getitem__(self, idx):
        video_path = self.video_files[idx % len(self.video_files)]
        vid_id = video_path.split("/")[-1][:-4]

        if self.augment:
            # augmented train path: the reference applies CLIP_TRANSFORM
            # after VIDEO_AUG (video_retrieval_videodatasets.py:213-224) —
            # the 256x256 augmented frames must be resized/cropped for the
            # ViT, unlike the decode-only eval path below
            from .datasets import clip_preprocess_batch

            frames = clip_preprocess_batch(_read_video_train(video_path, self.rng))
        else:
            frames = read_video_full(video_path)
            # raw uint8 [t, h, w, 3]; retrieval_eval preprocesses only the
            # stride-selected frames (~16x less host work than
            # preprocessing everything before striding)

        if self.augment:
            if not self.train:
                warnings.warn("MSRVTT: augment with eval set is nondeterministic")
            captions = self.captions[vid_id]
            idxs = self.rng.permutation(len(captions))
            captions = [captions[i] for i in idxs[:6]]
            title = captions[0]
            fake_comments = captions[1:]
            assert len(fake_comments) == 5
            return frames, tokenize(title, truncate=True)[0], tokenize(
                fake_comments, truncate=True
            ), {}

        title = self.captions[vid_id]
        try:
            text = tokenize(title)
        except RuntimeError as e:
            print(f"Failed to tokenize {title}", str(e))
            # truncate only over-length captions (BPE-truncate keeps the
            # other captions of the video intact)
            text = tokenize(title, truncate=True)
        return frames, text, vid_id


class VideoDatasetMSVD:
    """MSVD val/test splits (``video_retrieval_videodatasets.py:258-368``).
    Requires ``raw-captions.pkl`` placed in the meta dir (absent upstream)."""

    def __init__(self, root="/data/MSVD", train=True, split=None, augment=False,
                 meta_dir=None, seed=0):
        root = Path(root)
        self.train = train
        self.augment = augment
        self.rng = np.random.default_rng(seed)

        ce_meta_dir = Path(meta_dir) if meta_dir else META_DIR / "msvd_meta"
        if split == "val":
            txt_file = "train_list.txt" if train else "val_list.txt"
        elif split == "test":
            txt_file = "train_list.txt" if train else "test_list.txt"
        else:
            raise ValueError("Unknown MSVD split")

        caption_file = ce_meta_dir / "raw-captions.pkl"
        if not caption_file.exists():
            raise FileNotFoundError(
                f"{caption_file} — MSVD captions must be provided (the file is "
                "also missing from the reference repo; see data/meta/README.md)"
            )
        with open(caption_file, "rb") as f:
            self.captions = pickle.load(f)

        with open(ce_meta_dir / txt_file, "r") as t:
            self.video_ids = [
                l.strip() for l in t.read().split("\n") if l.strip()
            ]

        self.video_files = []
        nmissing = 0
        for v in self.video_ids:
            vfile = root / "YouTubeClips" / (v + ".avi")
            if vfile.exists():
                self.video_files.append(str(vfile))
            else:
                nmissing += 1
        print(len(self.video_files), "loaded files", nmissing, "missing files")
        assert nmissing == 0

    def __len__(self):
        if self.augment and self.train:
            return 5 * len(self.video_files)
        return len(self.video_files)

    def __getitem__(self, idx):
        video_path = self.video_files[idx % len(self.video_files)]
        vid_id = video_path.split("/")[-1][:-4]

        if self.augment:
            # reference: CLIP_TRANSFORM after VIDEO_AUG (see MSRVTT above)
            from .datasets import clip_preprocess_batch

            frames = clip_preprocess_batch(_read_video_train(video_path, self.rng))
        else:
            frames = read_video_full(video_path)
            # raw uint8 [t, h, w, 3]; retrieval_eval preprocesses only the
            # stride-selected frames

        captions = [" ".join(s) for s in self.captions[vid_id]]
        if self.augment:
            if not self.train:
                warnings.warn("MSVD: augment with eval set is nondeterministic")
            idxs = self.rng.permutation(len(captions))
            captions = [captions[i] for i in idxs[:6]]
            title = captions[0]
            fake_comments = captions[1:]
            assert len(fake_comments) == 5
            return frames, tokenize(title, truncate=True)[0], tokenize(
                fake_comments, truncate=True
            ), {}

        try:
            text = tokenize(captions)
        except RuntimeError as e:
            print(f"Failed to tokenize {captions}", str(e))
            text = tokenize(captions, truncate=True)
        return frames, text, vid_id


class VideoDatasetActivityNet:
    """ActivityNet retrieval (``video_retrieval_videodatasets.py:371-475``;
    upstream dead code with hardcoded cluster paths — here path-configurable
    and exported)."""

    def __init__(self, root, train=True, split=None, meta_dir=None):
        root = Path(root)
        self.root = root
        self.train = train
        ce_meta_dir = Path(meta_dir) if meta_dir else META_DIR / "activitynet_meta"

        if split == "val":
            txt_file = "train_list.txt" if train else "val_1_list.txt"
        elif split == "test":
            txt_file = "train_list.txt" if train else "val_2_list.txt"
        else:
            raise ValueError("Unknown ActivityNet split")

        with open(ce_meta_dir / "raw-captions.pkl", "rb") as f:
            self.captions = pickle.load(f)
        with open(ce_meta_dir / txt_file, "r") as t:
            self.video_ids = [
                l.strip() for l in t.read().split("\n") if l.strip()
            ]

        self.video_files = []
        nmissing = 0
        for v in self.video_ids:
            vfile = root / "videos" / (v + ".mp4")
            if vfile.exists():
                self.video_files.append(str(vfile))
            else:
                nmissing += 1
        print(len(self.video_files), "loaded files", nmissing, "missing files")

    def __len__(self):
        return len(self.video_files)

    def __getitem__(self, idx):
        video_path = self.video_files[idx]
        vid_id = video_path.split("/")[-1][:-4]
        vid = read_video_full(video_path)
        frames = vid  # raw; preprocessed post-stride by retrieval_eval
        captions = [" ".join(s) for s in self.captions[vid_id]]
        return frames, tokenize(captions, truncate=True), vid_id


class VideoDatasetK700Comments:
    """Kinetics-700 test videos with >=3 comments, excluding any id seen in
    k400/k700 training (``video_retrieval_videodatasets.py:478-554``)."""

    def __init__(
        self,
        root="/data",
        kinetics_csv="/data/oxford_project/kinetics700_havedescs.csv",
        train=False,
        split="test",
    ):
        assert train is False and split == "test"
        df = pd.read_csv(kinetics_csv)
        self.video_files = []
        self.titles = []
        self.comments = []
        self.descriptions = []

        k400train = glob.glob(
            os.path.join(root, "kinetics400", "train", "**", "*.mp4"),
            recursive=True,
        )
        k700train = glob.glob(
            os.path.join(root, "kinetics700", "train", "**", "*.mp4"),
            recursive=True,
        )
        train_ids = set(
            x.split("/")[-1].split(".")[0] for x in k700train
        ) | set(x.split("/")[-1].split(".")[0] for x in k400train)

        for _, row in df.iterrows():
            is_val = (
                "/test/" in row.video_path
                and row.kinetics_id not in train_ids
                and row.title_lang == "en"
                and not pd.isna(row.comments)
                and len(json.loads(row.comments)) >= 3
            )
            if is_val:
                self.video_files.append(os.path.join(root, row.video_path))
                self.titles.append(row.title)
                self.comments.append(json.loads(row.comments))
                self.descriptions.append(row.description)
        print(len(self.video_files), "kinetics comments val files")

    def __len__(self):
        return len(self.video_files)

    def __getitem__(self, index):
        vid = read_video_full(self.video_files[index])
        frames = vid  # raw; preprocessed post-stride by retrieval_eval
        vid_id = self.video_files[index].split("/")[-1].split(".")[0]
        title_tok = tokenize_max_len(self.titles[index])
        comments_tok = tokenize_max_len(self.comments[index])
        return frames, title_tok, comments_tok, vid_id
