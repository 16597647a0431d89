"""Data layer. Public dataset registry mirrors the reference's
``dataset_loaders/dataset_loaders.py:27-38`` exports (instantiated by name
via ``config.init_obj('dataset', data)``)."""

from .datasets import (  # noqa: F401
    FeaturesDataset,
    ImTextDataset,
    VideoDatasetFirst1800,
    VideoDatasetFirst32,
    VideoDatasetLivebot,
    VideoDatasetReddit,
    VideoDatasetSegments,
)
from .loader import DataLoader, default_collate, prefetch_to_device  # noqa: F401
from .partition import (  # noqa: F401
    BOT_TEXT_TO_AVOID,
    filter_by_k_comments,
    load_features,
    partition_dataframe,
    preprocess_comments,
)
from .tokenizer import get_tokenizer, tokenize, tokenize_max_len  # noqa: F401
from .video_retrieval import (  # noqa: F401
    VideoDatasetActivityNet,
    VideoDatasetK700Comments,
    VideoDatasetMSRVTT,
    VideoDatasetMSVD,
)

__all__ = [
    "FeaturesDataset",
    "ImTextDataset",
    "VideoDatasetFirst1800",
    "VideoDatasetFirst32",
    "VideoDatasetK700Comments",
    "VideoDatasetLivebot",
    "VideoDatasetMSRVTT",
    "VideoDatasetMSVD",
    "VideoDatasetActivityNet",
    "VideoDatasetReddit",
    "VideoDatasetSegments",
    "DataLoader",
]
