"""Dataset-generic retrieval evaluation (MSRVTT / MSVD / K700 / Reddit /
livebot) — the reference's ``evaluation/retrieval_evaluation.py:23-268``, also
used as the trainer's per-epoch probe.

Per video: subsample frames at ``frame_stride``, split into 8-frame chunks
(linspace-padding the tail, ``:174-199``), synthesize per-caption dummy or
real comment tensors (``:203-229``), forward, mean-pool chunk embeddings per
video (``:254-259``), pad ragged caption sets with -inf (``:239-252``), and
compute bidirectional R@1/5/10.

TPU discipline for the ragged shapes: chunk and caption counts are padded to
power-of-two buckets with masks, so jit compiles a handful of shapes instead
of one per video.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data import tokenizer as tk
from ..ops.retrieval import recall_at_k

logger = logging.getLogger(__name__)

N_COMMENTS = 5
NFRAMES = 8


RECALL_RANGE = (1, 5, 10)


def _recall_df(vt_fracs, tv_fracs, dataset_name, split):
    """Percent-scaled bidirectional recall table (one assembly for the
    1-caption and ragged paths, so column naming/scaling cannot drift)."""
    df = pd.DataFrame(
        {
            f"{dataset_name} {split} split Video to Text":
                np.asarray(vt_fracs) * 100.0,
            f"{dataset_name} {split} split Text to Video":
                np.asarray(tv_fracs) * 100.0,
        },
        index=[f"R@{k}" for k in RECALL_RANGE],
    )
    logger.info("%s", df)
    return df


def compute_recall(tensor_v, tensor_t, split="full-test", dataset_name="MSRVTT"):
    """Bidirectional R@1/5/10 DataFrame (``retrieval_evaluation.py:23-47``)."""
    vtr = [r for _, r in recall_at_k(tensor_v, tensor_t, RECALL_RANGE)]
    tvr = [r for _, r in recall_at_k(tensor_t, tensor_v, RECALL_RANGE)]
    return _recall_df(tvr, vtr, dataset_name, split)


def _bucket(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _ensure_preprocessed(chunks: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Raw uint8 [..., h, w, 3] frames (the eval datasets are decode-only
    since round 2) get the CLIP transform here, AFTER stride/chunk selection
    — preprocessing everything before striding cost ~16x the host work.
    Float CHW inputs (precomputed or synthetic) pass through unchanged."""
    arr = np.asarray(chunks)
    if arr.dtype != np.uint8 or arr.shape[-1] != 3:
        return arr
    from ..data.datasets import clip_preprocess_batch

    lead = arr.shape[:-3]
    flat = clip_preprocess_batch(arr.reshape((-1,) + arr.shape[-3:]), image_size)
    return flat.reshape(lead + flat.shape[1:])


def chunk_frames(frames: np.ndarray, frame_stride: int, nframes: int = NFRAMES):
    """[t, c, h, w] -> [nchunks, nframes, c, h, w] with linspace-padded tail
    (``retrieval_evaluation.py:174-198``)."""
    frames = frames[::frame_stride]
    t = frames.shape[0]
    chunks = []
    for s in range(0, t, nframes):
        x = frames[s : s + nframes]
        if x.shape[0] != nframes:
            idx = np.floor(np.linspace(0, x.shape[0] - 1, nframes)).astype(np.int64)
            x = x[idx]
        chunks.append(x)
    return np.stack(chunks)


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("branch_override", "needs_comments"),
)
def _eval_forward(
    module, variables, frames, captions, comments, branch_override, needs_comments
):
    if needs_comments:
        out = module.apply(
            variables, frames, captions, comments,
            branch_override=branch_override,
        )
    else:
        out = module.apply(variables, frames, captions)
    return out[0], out[1]


def make_eval_forward(module, variables, branch_override: Optional[str]):
    """Bucketed, jit-compiled forward: (frames[nchunk_b, 8, ...],
    captions[ncap_b, 77], comments[nc, 5, 77]) -> (feats_vis, feats_text).

    Params are jit arguments (closures would bake them into the HLO). The
    module itself is a STATIC jit argument: linen modules hash by config
    value and ``apply`` is pure in (config, variables), so jit's own cache
    keys compilations correctly per model — unlike round-1's id()-keyed
    side cache, where a GC'd id could alias a different model."""
    return partial(
        _eval_forward, module, variables, branch_override=branch_override
    )


def retrieval_evaluation(
    module,
    variables,
    datasetname: str,
    split: str,
    out_csv: Optional[str] = None,
    frame_stride: int = 16,
    first_frame_only: bool = False,
    first_chunk_only: bool = False,
    branch_override: Optional[str] = None,
    needs_comments: Optional[bool] = None,
    dataset=None,
    data_roots: Optional[dict] = None,
    image_size: int = 224,
    nframes: int = NFRAMES,
):
    """Evaluate a model on a transfer dataset; returns the recall DataFrame."""
    from .. import data as module_data

    data_roots = data_roots or {}
    if dataset is None:
        if datasetname == "MSRVTT_videos":
            dataset = module_data.VideoDatasetMSRVTT(
                train=False, split=split, **data_roots.get("MSRVTT", {})
            )
        elif datasetname == "MSVD_videos":
            dataset = module_data.VideoDatasetMSVD(
                train=False, split=split, **data_roots.get("MSVD", {})
            )
        elif datasetname == "K700_videos":
            dataset = module_data.VideoDatasetK700Comments(
                train=False, split=split, **data_roots.get("K700", {})
            )
        elif datasetname == "Reddit_videos":
            dataset = module_data.VideoDatasetReddit(
                train=False, split=split, **data_roots.get("Reddit", {})
            )
        elif datasetname == "livebot":
            dataset = module_data.VideoDatasetLivebot(
                train=False, split=split, **data_roots.get("livebot", {})
            )
        else:
            raise ValueError("Unknown dataset")

    if needs_comments is None:
        needs_comments = hasattr(module, "branch_to_adapt_val")

    fwd = make_eval_forward(module, variables, branch_override)

    video_embs = []
    caption_embs = []
    logger.info("Computing joint embeddings")

    empty_comment = tk.tokenize([""] * N_COMMENTS)

    for idx in range(len(dataset)):
        item = dataset[idx]
        if len(item) == 3:
            frames, captions, _ = item
            comments = None
        else:
            frames, captions, comments, _ = item
        if frames is None:
            continue
        captions = np.asarray(captions)
        assert captions.ndim == 2

        if first_frame_only:
            # single frame as a 1-image batch (4-D image path,
            # retrieval_evaluation.py:165-172)
            chunks = _ensure_preprocessed(np.asarray(frames)[0:1], image_size)
            assert not first_chunk_only
        else:  # every exported retrieval model accepts chunked video
            chunks = chunk_frames(np.asarray(frames), frame_stride, nframes)
            if first_chunk_only:
                chunks = chunks[0:1]
            chunks = _ensure_preprocessed(chunks, image_size)
        ncap = captions.shape[0]
        nchunk = chunks.shape[0]

        if needs_comments:
            # one shared comment row [1, n<=5, 77]: the model encodes the
            # unique comments ONCE and broadcasts the features across
            # captions/chunks (previously tiled to every row — up to
            # dozens of duplicate text-tower encodes per video). One jit
            # variant per distinct comment COUNT remains (reference feeds
            # unpadded real[:5] comments; padding with empties would add
            # mask-embedding rows to the CAM stack and change the math)
            if comments is None:
                comm = empty_comment[None]
            else:
                comm = np.asarray(comments)[:N_COMMENTS][None]
        else:
            comm = None

        # bucket + mask for stable jit shapes
        cb = _bucket(nchunk)
        kb = _bucket(ncap)
        chunks_p = np.concatenate(
            [chunks, np.repeat(chunks[-1:], cb - nchunk, axis=0)]
        ) if cb > nchunk else chunks
        captions_p = np.concatenate(
            [captions, np.repeat(captions[-1:], kb - ncap, axis=0)]
        ) if kb > ncap else captions

        fv, ft = fwd(
            jnp.asarray(chunks_p), jnp.asarray(captions_p),
            jnp.asarray(comm) if comm is not None else jnp.zeros(
                (1, N_COMMENTS, 77), jnp.int32
            ),
            needs_comments=needs_comments,
        )
        video_embs.append(np.asarray(fv)[:nchunk])
        caption_embs.append(np.asarray(ft)[:ncap])

    if not video_embs:
        # Every item was skipped (frames is None on decode failure) or the
        # split is empty — fail with the real condition instead of an
        # opaque max()/np.stack error below.
        raise RuntimeError(
            f"retrieval evaluation produced no embeddings: all "
            f"{len(dataset)} items of {datasetname}/{split} failed to "
            f"decode or the split is empty (check the data root paths)"
        )

    # mean over chunk embeddings per video
    max_len = max(c.shape[0] for c in caption_embs)
    video_tensor = np.stack([v.mean(axis=0) for v in video_embs])

    # for recall, use the first (real) caption per video when ragged; the
    # reference feeds the full padded tensor to FAISS which only works for
    # 1-caption splits (documented defect) — here every real caption counts:
    # query = each caption, target = its video
    flat_caps = []
    flat_targets = []
    for vi, c in enumerate(caption_embs):
        flat_caps.append(c)
        flat_targets.extend([vi] * c.shape[0])
    flat_caps = np.concatenate(flat_caps)
    flat_targets = np.asarray(flat_targets)

    if max_len == 1:
        outdf = compute_recall(
            video_tensor, flat_caps, split=split,
            dataset_name=datasetname,
        )
    else:
        tvr = [
            r for _, r in recall_at_k(
                video_tensor, flat_caps, RECALL_RANGE, targets=flat_targets
            )
        ]
        # video->text: rank captions, a video hits if any of its captions is
        # retrieved in top-k
        vt_hits = _vt_recall(
            video_tensor, flat_caps, flat_targets, RECALL_RANGE
        )
        outdf = _recall_df(vt_hits, tvr, datasetname, split)

    if out_csv is not None:
        outdf.to_csv(out_csv)
    return outdf


def _vt_recall(videos, captions, cap_video_idx, k_vals):
    """Video->text recall over a flattened caption gallery: a video scores a
    hit at k if any of its own captions appears in its top-k."""
    v = jnp.asarray(videos, jnp.float32)
    c = jnp.asarray(captions, jnp.float32)
    scores = jnp.matmul(v, c.T, preferred_element_type=jnp.float32)
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    max_k = int(max(k_vals))
    _, idx = jax.lax.top_k(scores, min(max_k, c.shape[0]))
    idx = np.asarray(idx)
    owner = np.asarray(cap_video_idx)[idx]  # [nvid, max_k]
    hits = owner == np.arange(videos.shape[0])[:, None]
    cum = np.cumsum(hits, axis=-1) > 0
    return np.array([cum[:, min(k, cum.shape[1]) - 1].mean() for k in k_vals])
