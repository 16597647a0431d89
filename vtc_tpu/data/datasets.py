"""Training / eval datasets for the VTC (reddit video+title+comments) corpus.

Mirrors ``dataset_loaders/dataset_loaders.py``: the vision+title+comments
base (tokenization with RAKE fallback, CSV loaders, segment reader), the
training datasets (``VideoDatasetSegments`` ``:440-566``, ``ImTextDataset``
``:924-1046``, ``FeaturesDataset`` ``:821-921``, ``VideoDatasetFirst32``
``:569-680``, ``VideoDatasetFirst1800`` ``:683-775``) and the VTC test
loaders (``VideoDatasetReddit`` ``:1049-1113``, ``VideoDatasetLivebot``
``:1116-1174``).

All outputs are numpy (host side); the trainer shards them onto the mesh.
Randomness is an explicit ``np.random.Generator`` per dataset, reseeded per
epoch by the loader's shuffle seed — reproducible, unlike torch's implicit
global worker RNGs.
"""

from __future__ import annotations

import ast
import json
import logging
import os
from typing import List

import numpy as np
import pandas as pd

from .partition import (
    filter_by_k_comments,
    load_features,
    partition_dataframe,
    preprocess_comments,
    sample_if_list,
    should_add_comments,
)
from .preprocess import (
    augment_frames,
    augment_image,
    clip_preprocess,
    clip_resize_uint8,
)
from .rake import Rake
from .tokenizer import get_tokenizer, tokenize, tokenize_max_len
from .video import (
    FALLBACK_SHAPE,
    read_segment_with_fallbacks,
    read_video_full,
    read_video_segment,
)

_logger = logging.getLogger(__name__)


class VisionTitleCommentDatasetBase:
    """Base: CSV loading, splits, tokenization (``dataset_loaders.py:200-437``)."""

    def __len__(self):
        return len(self.filenames)

    def split_dataset(
        self, csv_file, df, train, test, test_on_over_k_comms=None,
        test_set_limit=None,
    ):
        if test:
            assert not train
            new_df = partition_dataframe(df, split="test")
        else:
            new_df = partition_dataframe(df, split="train" if train else "val")
        if test_on_over_k_comms is not None and not train:
            new_df = filter_by_k_comments(
                new_df, test_on_over_k_comms, limit=test_set_limit
            )
        return new_df

    should_add_comments = staticmethod(should_add_comments)

    def _tokenise(self, texts, max_len: int = 77) -> np.ndarray:
        """BPE with RAKE keyword-extraction fallback for >77-token texts
        (``dataset_loaders.py:224-248``)."""
        if isinstance(texts, str):
            texts = [texts]
        tok = get_tokenizer()
        sot, eot = tok.sot_token, tok.eot_token
        all_tokens = [[sot] + tok.encode(t) + [eot] for t in texts]
        result = np.zeros((len(all_tokens), max_len), dtype=np.int32)
        for i, tokens in enumerate(all_tokens):
            if len(tokens) >= max_len:
                self.rake.extract_keywords_from_text(texts[i])
                phrases = self.rake.get_ranked_phrases()
                tokens = [sot] + tok.encode(" ".join(phrases)) + [eot]
                if len(tokens) >= max_len:
                    result[i, :max_len] = np.asarray(
                        tokens[: max_len - 1] + [eot]
                    )
                else:
                    result[i, : len(tokens)] = np.asarray(tokens)
            else:
                result[i, : len(tokens)] = np.asarray(tokens)
        return result

    def preprocess_comments(self, comments, sampling=None, num_comms=2):
        return preprocess_comments(
            comments, sampling=sampling, num_comms=num_comms, rng=self.rng
        )

    def _load_reddit(self, df, file_extension: str = ".mp4"):
        """Append the reddit rows whose media exist under ``self.root``.

        The CSV's ``video_path`` column stores ``results/<id>.<orig-ext>``;
        the dataset's media carry ``file_extension`` instead (e.g. ``.jpg``
        thumbnails for the image datasets). Behavior of
        ``dataset_loaders.py:279-293``. Returns the filtered frame.
        """
        rel = df.video_path.str[len("results/"):-4] + file_extension
        paths = rel.map(lambda r: os.path.join(self.root, r))
        # dtype=bool matters: an empty split yields a float64 mask, which
        # pandas would treat as column selection instead of row filtering
        present = paths.map(os.path.exists).to_numpy(dtype=bool)
        if not present.all():
            _logger.warning(
                "reddit media: only %d of %d CSV rows found under %s",
                int(present.sum()), len(df), self.root,
            )
        df, paths = df[present], paths[present]
        self.filenames.extend(paths.tolist())
        self.ids.extend(df.reddit_id.tolist())
        self.titles.extend(df.title.tolist())
        self.video_lengths.extend(df.video_length.tolist())
        self.comments.extend(df.comments.map(ast.literal_eval).tolist())
        _logger.info("%d reddit videos", len(self.ids))
        return df

    def _append_mix_rows(self, df, root, title_col: str, desc_col: str) -> int:
        """Shared appender for the kinetics/howto100m training mixes: every
        on-disk row joins the corpus with id -1 (non-reddit marker), its JSON
        comments, and long description sentences as pseudo-comments
        (``dataset_loaders.py:294-351``)."""
        kept = 0
        for row in df.itertuples(index=False):
            path = os.path.join(root, row.video_path)
            if not os.path.exists(path):
                continue
            comms = [] if pd.isna(row.comments) else json.loads(row.comments)
            desc = getattr(row, desc_col)
            if not pd.isna(desc):
                comms += [s.strip() for s in desc.split(".") if len(s) > 60]
            self.filenames.append(path)
            self.ids.append(-1)
            self.titles.append(getattr(row, title_col))
            self.video_lengths.append(row.video_length)
            self.comments.append(comms)
            kept += 1
        return kept

    def _load_kinetics(self, df):
        # train rows only: k700-train, k400-train-or-unknown, /train/ path
        in_train = (
            (df.split_k700 == "train")
            & ((df.split_k400 == "train") | df.split_k400.isna())
            & df.video_path.str.contains("/train/", regex=False)
        )
        n = self._append_mix_rows(
            df[in_train], self.kinetics_root, "title_en", "description_en"
        )
        _logger.info("kinetics mix: %d videos", n)

    def _load_howto100m(self, df):
        n = self._append_mix_rows(
            df, self.howto100m_root, "title", "description"
        )
        _logger.info("howto100m mix: %d videos", n)

    def _read_video(self, idx) -> np.ndarray:
        vid = read_segment_with_fallbacks(
            self.filenames[idx],
            video_length=self.video_lengths[idx],
            nframes=self.nframes,
            frame_strides=self.frame_strides,
            reference_fps=self.reference_fps,
            is_reddit=self.ids[idx] != -1,
            train=self.train,
            resize_width=self.video_read_width,
            resize_height=self.video_read_height,
            rng=self.rng,
        )
        if self.train:
            vid = augment_frames(vid, self.rng)
        return vid


class VideoDatasetSegments(VisionTitleCommentDatasetBase):
    """Random augmented 8-frame segments + comments
    (``dataset_loaders.py:440-566``)."""

    def __init__(
        self,
        csv_file,
        root,
        train=True,
        test=False,
        add_comments="train_only",
        num_comms=2,
        comment_sampling="random",
        use_kinetics_train=None,
        kinetics_csv=None,
        kinetics_root=None,
        use_howto100m_train=None,
        howto100m_csv=None,
        howto100m_root=None,
        first_frame_only=False,
        test_on_over_k_comms=None,
        test_set_limit=None,
        seed=0,
    ):
        self.train = train
        self.root = root
        self.kinetics_root = kinetics_root
        self.howto100m_root = howto100m_root
        self.num_comms = num_comms
        self.comment_sampling = comment_sampling if train else None
        self.first_frame_only = first_frame_only
        self.rng = np.random.default_rng(seed)
        self.rake = Rake()

        self.add_comments = self.should_add_comments(add_comments, train)

        self.video_read_height = 300
        self.video_read_width = 0
        self.nframes = 8
        self.reference_fps = 30
        self.frame_strides = (4, 8, 16, 32) if train else (16,)

        self.ids: List = []
        self.filenames: List[str] = []
        self.titles: List[str] = []
        self.video_lengths: List[float] = []
        self.comments: List = []

        use_reddit = (not train) or (
            use_kinetics_train != "only" and use_howto100m_train != "only"
        )
        use_kinetics = train and use_kinetics_train in ("combine", "only")
        use_howto100m = train and use_howto100m_train in ("combine", "only")
        assert not (use_kinetics_train == "only" and use_howto100m_train == "only")

        if use_reddit:
            df = pd.read_csv(csv_file)
            df = self.split_dataset(
                csv_file, df, train, test,
                test_on_over_k_comms=test_on_over_k_comms,
                test_set_limit=test_set_limit,
            )
            self._load_reddit(df)
        if use_kinetics:
            self._load_kinetics(pd.read_csv(kinetics_csv))
        if use_howto100m:
            self._load_howto100m(pd.read_csv(howto100m_csv))

    def __getitem__(self, idx):
        title = self.titles[idx]
        comments = self.comments[idx]

        vid = self._read_video(idx)
        vid = clip_preprocess_batch(vid)
        if self.first_frame_only:
            vid = vid[0]

        title_tok = self._tokenise([title])[0]
        if self.add_comments:
            comments = self.preprocess_comments(
                comments, sampling=self.comment_sampling, num_comms=self.num_comms
            )
            comments_tok = self._tokenise(comments)
        else:
            comments_tok = self._tokenise([""])

        meta = {"id": self.ids[idx]}
        return vid, title_tok, comments_tok, meta


def clip_preprocess_pil(frame: np.ndarray) -> np.ndarray:
    from PIL import Image

    return clip_preprocess(Image.fromarray(frame))


def clip_preprocess_batch(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [t, h, w, 3] -> float32 [t, 3, size, size]: native threaded
    stage (PIL-bit-exact) with transparent PIL fallback."""
    from .native import clip_preprocess_frames_fast

    return clip_preprocess_frames_fast(frames, size)


class VideoDatasetFirst32:
    """First 32 frames at 128x172, ig65m normalization
    (``dataset_loaders.py:569-680``)."""

    def __init__(
        self,
        csv_file,
        root,
        text_features=None,
        train=True,
        should_partition_dataframe=True,
        clip_preprocess=False,
        seed=0,
    ):
        from .preprocess import IG65M_MEAN, IG65M_STD

        self.train = train
        self.height = 128
        self.width = 171
        self.nframes = 32
        self.clip_preprocess = clip_preprocess
        self.mean, self.std = IG65M_MEAN, IG65M_STD
        self.rng = np.random.default_rng(seed)

        df = pd.read_csv(csv_file)
        if should_partition_dataframe:
            df = partition_dataframe(
                df, root=root, split="train" if train else "val"
            )
        self.video_files = [
            os.path.join(root, df.video_path.iloc[i][len("results/"):])
            for i in range(len(df))
        ]
        self.ids = df.reddit_id.to_list()
        self.titles = df.title.to_list()
        self.text_feats = (
            load_features(df, text_features) if text_features is not None else None
        )
        if not clip_preprocess and self.text_feats is None:
            raise ValueError(
                "VideoDatasetFirst32 without clip_preprocess requires "
                "text_features (the ig65m path trains against cached text "
                "embeddings)"
            )

    def __len__(self):
        return len(self.video_files)

    def __getitem__(self, idx):
        vid = read_video_segment(
            self.video_files[idx], 0, 4,
            resize_width=self.width, resize_height=self.height,
            max_frames=self.nframes,
        )
        vid = vid[: self.nframes]
        if vid.shape[0] < self.nframes:
            out = np.zeros((self.nframes, self.height, self.width, 3), np.uint8)
            if vid.shape[0] == 0:
                print("Zero length video!", self.video_files[idx])
            else:
                out[: vid.shape[0]] = vid
            vid = out

        if self.clip_preprocess:
            vid = clip_preprocess_batch(vid)
            try:
                text = tokenize(self.titles[idx])
            except RuntimeError as e:
                print(f"Failed to tokenize {self.titles[idx]}", str(e))
                text = tokenize(self.titles[idx][:20])
        else:
            vid = vid.astype(np.float32) / 255.0
            vid = (vid - self.mean) / self.std
            vid = vid.transpose(3, 0, 1, 2)  # [c, t, h, w] (ig65m layout)
            text = self.text_feats[idx]
        return vid, text, {"id": self.ids[idx]}


class VideoDatasetFirst1800:
    """Collab-experts-style preprocessing (``dataset_loaders.py:683-775``)."""

    def __init__(self, csv_file, root, train=True, should_partition_dataframe=True):
        from .preprocess import IG65M_MEAN, IG65M_STD

        self.train = train
        self.video_read_height = 256
        self.height = 128
        self.crop_size = 112
        self.nframes = 1800
        self.min_nframes = 32
        self.mean, self.std = IG65M_MEAN, IG65M_STD

        df = pd.read_csv(csv_file)
        if should_partition_dataframe:
            df = partition_dataframe(
                df, root=root, split="train" if train else "val"
            )
        self.video_files = [
            os.path.join(root, df.video_path.iloc[i][len("results/"):])
            for i in range(len(df))
        ]

    def __len__(self):
        return len(self.video_files)

    def __getitem__(self, idx):
        import cv2

        vid = read_video_segment(
            self.video_files[idx], 0, self.nframes // 15,
            resize_width=0, resize_height=self.video_read_height,
            max_frames=self.nframes,
        )
        vid = vid[: self.nframes]
        length = vid.shape[0]
        if length > 0:
            # resize short side to 128, center crop 112
            frames = []
            for f in vid:
                h, w = f.shape[:2]
                # torchvision Resize TRUNCATES the long side (int(), not
                # round() — rounding shifts the resample grid by 1px on
                # ~half of aspect ratios; see preprocess._resize_short_side)
                if h <= w:
                    nh, nw = self.height, max(1, int(w * self.height / h))
                else:
                    nw, nh = self.height, max(1, int(h * self.height / w))
                f = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
                top = (nh - self.crop_size) // 2
                left = (nw - self.crop_size) // 2
                frames.append(
                    f[top : top + self.crop_size, left : left + self.crop_size]
                )
            vid = np.stack(frames).astype(np.float32) / 255.0
            vid = (vid - self.mean) / self.std
            vid = vid.transpose(0, 3, 1, 2)
        else:
            vid = np.zeros((0, 3, self.crop_size, self.crop_size), np.float32)

        if length < self.min_nframes:
            out = np.zeros(
                (self.min_nframes, 3, self.crop_size, self.crop_size), np.float32
            )
            if length == 0:
                print("Zero length video!", self.video_files[idx])
            else:
                out[:length] = vid
            vid = out
        return vid.transpose(1, 0, 2, 3), {}


class FeaturesDataset:
    """Precomputed-feature training (``dataset_loaders.py:821-921``):
    HBM-resident cached CLIP/audio embedding tables keyed by reddit id, with
    optional nested concatenation and per-item comment sampling."""

    def __init__(
        self,
        csv_file,
        input_features=None,
        target_features=None,
        train=True,
        train_comment_sampling=None,
        test_comment_sampling=None,
        seed=0,
    ):
        self.train = train
        self.feature_sampling = (
            train_comment_sampling if train else test_comment_sampling
        )
        self.rng = np.random.default_rng(seed)

        df = pd.read_csv(csv_file)
        df = partition_dataframe(df, split="train" if train else "val")

        if isinstance(input_features, str):
            input_features = [input_features]
        # NB: nesting is decided by the *spec* shape, not the loaded type —
        # the reference branches on ``isinstance(feat, list)`` at access time
        # (dataset_loaders.py:909-916), which confuses ragged comment-format
        # features (loaded as a list of per-row lists) with nested specs.
        self._nested = [isinstance(f, (list, tuple)) for f in input_features]
        self.feats = [
            (
                [load_features(df, f) for f in feats]
                if isinstance(feats, (list, tuple))
                else load_features(df, feats)
            )
            for feats in input_features
        ]
        self.targets = (
            load_features(df, target_features) if target_features else None
        )

    def __len__(self):
        return len(self.feats[0])

    def __getitem__(self, idx):
        inputs = []
        for nested, feat in zip(self._nested, self.feats):
            if nested:
                inputs.append(
                    np.concatenate(
                        [
                            sample_if_list(f[idx], self.feature_sampling, self.rng)
                            for f in feat
                        ]
                    )
                )
            else:
                inputs.append(
                    sample_if_list(feat[idx], self.feature_sampling, self.rng)
                )
        meta = {}
        if self.targets is not None:
            meta["target"] = self.targets[idx]
        return (*inputs, meta)


class ImTextDataset(VisionTitleCommentDatasetBase):
    """Thumbnails + titles + comments (``dataset_loaders.py:924-1046``)."""

    def __init__(
        self,
        csv_file,
        root,
        train=True,
        test=False,
        add_comments="train_only",
        num_comms=0,
        comment_sampling="random",
        cached_vision_features=None,
        test_on_over_k_comms=None,
        test_set_limit=None,
        use_augmentation=False,
        cached_audio_features=None,
        audio_with_comms=None,
        audio_instead_of_title=False,
        image_size=224,
        uint8_images=False,
        patch_images=False,
        seed=0,
    ):
        self.train = train
        self.root = root
        self.image_size = int(image_size)
        # ship resized uint8 HWC and normalize on device (4x fewer
        # host->device bytes); the jitted step applies the exact transform
        self.uint8_images = bool(uint8_images)
        # patch_images: additionally extract the ViT patches on host
        # ([N, p*p*3] uint8) so the device receives the patch-embed matmul
        # operand directly — zero device-side layout work (the eval fast
        # path; see models/clip_model.py and PERFORMANCE.md round 3).
        # True -> patch 32 (ViT-B/32); an int selects the patch size.
        self.patch_images = int(patch_images) if patch_images else 0
        if self.patch_images == 1:
            self.patch_images = 32
        self.num_comms = int(num_comms)
        self.comment_sampling = comment_sampling if train else None
        self.cached_vision_features = cached_vision_features
        self.use_augmentation = use_augmentation
        self.cached_audio_features = cached_audio_features
        self.audio_with_comms = audio_with_comms
        self.audio_instead_of_title = audio_instead_of_title
        self.rng = np.random.default_rng(seed)
        self.rake = Rake()

        self.add_comments = self.should_add_comments(add_comments, train)

        self.ids: List = []
        self.filenames: List[str] = []
        self.titles: List[str] = []
        self.video_lengths: List = []
        self.comments: List = []

        df = pd.read_csv(csv_file)
        df = self.split_dataset(
            csv_file, df, train, test,
            test_on_over_k_comms=test_on_over_k_comms,
            test_set_limit=test_set_limit,
        )
        df = self._load_reddit(df, file_extension=".jpg")

        if cached_vision_features is not None:
            self.vision_feats = load_features(df, cached_vision_features)
        if cached_audio_features is not None:
            self.audio_feats = load_features(df, cached_audio_features)

    def __getitem__(self, idx):
        from PIL import Image

        title = self.titles[idx]
        comments = self.comments[idx]

        if self.cached_vision_features is not None:
            im = np.asarray(self.vision_feats[idx], dtype=np.float32)
        else:
            im = Image.open(self.filenames[idx]).convert("RGB")
            if self.use_augmentation and self.train:
                im = augment_image(im, self.rng)
            if self.patch_images:
                from .preprocess import extract_patches

                im = extract_patches(
                    clip_resize_uint8(im, self.image_size), self.patch_images
                )
            elif self.uint8_images:
                im = clip_resize_uint8(im, self.image_size)
            else:
                im = clip_preprocess(im, self.image_size)

        title_tok = self._tokenise([title])[0]
        if self.add_comments:
            comments = self.preprocess_comments(
                comments, sampling=self.comment_sampling, num_comms=self.num_comms
            )
            comments_tok = self._tokenise(comments)
        else:
            comments_tok = self._tokenise([""])

        if self.cached_audio_features:
            audio_clips = np.asarray(self.audio_feats[idx], dtype=np.float32)
            if self.audio_instead_of_title:
                inputs = (im, audio_clips)
            elif self.audio_with_comms:
                inputs = (im, title_tok, (comments_tok, audio_clips))
            else:
                inputs = (im, title_tok, audio_clips)
        else:
            inputs = (im, title_tok, comments_tok)
        return (*inputs, {"id": self.ids[idx]})


class VideoDatasetReddit(VideoDatasetSegments):
    """VTC test split, >=3 comments, 5000-item cap
    (``dataset_loaders.py:1049-1113``)."""

    def __init__(
        self,
        root,
        reddit_csv,
        train=False,
        split="test",
        num_comms=5,
        test_on_over_k_comms=3,
        test_set_limit=5000,
        comment_sampling=None,
        first_frame_only=False,
        seed=0,
    ):
        assert train is False and split == "test"
        super().__init__(
            csv_file=reddit_csv,
            root=root,
            train=train,
            test=True,
            add_comments="always" if num_comms != 0 else "train_only",
            num_comms=num_comms,
            comment_sampling=comment_sampling,
            first_frame_only=first_frame_only,
            test_on_over_k_comms=test_on_over_k_comms,
            test_set_limit=test_set_limit,
            seed=seed,
        )

    def __getitem__(self, index):
        vid = read_video_full(self.filenames[index])
        if vid.shape[0] == 0:
            print(f"Failed reading: {self.filenames[index]}")
            vid = np.zeros(FALLBACK_SHAPE, np.uint8)

        frames = clip_preprocess_batch(vid[:8])
        if frames.shape[0] != 8:
            pad = np.zeros((8 - frames.shape[0],) + frames.shape[1:], np.float32)
            frames = np.concatenate([frames, pad], axis=0)

        title_tok = self._tokenise(self.titles[index])
        pp_comments = self.preprocess_comments(
            self.comments[index], sampling=self.comment_sampling,
            num_comms=self.num_comms,
        )
        comments_tok = self._tokenise(pp_comments)
        return frames, title_tok, comments_tok, self.ids[index]


class VideoDatasetLivebot:
    """Translated Bilibili danmaku test set (``dataset_loaders.py:1116-1174``)."""

    def __init__(self, root, cvs_file, train=False, split="test", add_comments=True):
        assert train is False and split == "test"
        df = pd.read_csv(cvs_file)
        self.video_files = [
            os.path.join(root, row.video_path) for _, row in df.iterrows()
        ]
        self.titles = [row.title for _, row in df.iterrows()]
        self.comments = [ast.literal_eval(row.comments) for _, row in df.iterrows()]
        self.add_comments = add_comments
        print(len(self.video_files), "comments test files")

    def __len__(self):
        return len(self.video_files)

    def __getitem__(self, index):
        vid = read_video_full(self.video_files[index])
        if vid.shape[0] == 0:
            print("failed video: ", self.video_files[index])
            frames = None
        else:
            frames = vid  # raw; preprocessed post-stride by retrieval_eval

        vid_id = self.video_files[index].split("/")[-1].split(".")[0]
        title_tok = tokenize_max_len(self.titles[index])
        if self.add_comments:
            comments_tok = tokenize_max_len(self.comments[index])
        else:
            comments_tok = tokenize_max_len([""])
        return frames, title_tok, comments_tok, vid_id
