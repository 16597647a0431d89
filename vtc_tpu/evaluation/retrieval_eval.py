"""Dataset-generic retrieval evaluation (MSRVTT / MSVD / K700 / Reddit /
livebot) — the reference's ``evaluation/retrieval_evaluation.py:23-268``, also
used as the trainer's per-epoch probe (``trainer/trainer.py:152-182``).

Per video: subsample frames at ``frame_stride``, split into 8-frame chunks
(linspace-padding the tail, ``:174-199``), synthesize per-caption dummy or
real comment tensors (``:203-229``), forward, mean-pool chunk embeddings per
video (``:254-259``), pad ragged caption sets with -inf (``:239-252``), and
compute bidirectional R@1/5/10.

TPU discipline for the ragged shapes: chunk and caption counts are padded to
power-of-two buckets with masks, so jit compiles a handful of shapes instead
of one per video.

Scale-out (beyond the reference, which is strictly single-device here):

* ``mesh=...`` shards each video's chunk/caption batches over the mesh's
  batch axes (the repeat-pad-then-slice idiom of ``evaluation/eval.py``) and
  ranks with the query-sharded top-k kernel — the trained mesh does the
  probe instead of idling while one device grinds.
* Under multihost (``jax.process_count() > 1``) each process decodes and
  encodes a DISJOINT strided slice of the video list and the embeddings are
  allgathered once at the end — instead of every host redundantly evaluating
  the full set (the round-4 behavior this replaces).
"""

from __future__ import annotations

import contextlib
import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data import tokenizer as tk
from ..ops.retrieval import recall_at_k, recall_at_k_sharded

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


def compute_recall(tensor_v, tensor_t, split="full-test", dataset_name="MSRVTT",
                   mesh=None):
    """Bidirectional R@1/5/10 DataFrame (``retrieval_evaluation.py:23-47``).
    With ``mesh``, both directions rank via the query-sharded kernel."""
    if mesh is not None:
        vtr = [r for _, r in recall_at_k_sharded(tensor_v, tensor_t,
                                                 RECALL_RANGE, mesh)]
        tvr = [r for _, r in recall_at_k_sharded(tensor_t, tensor_v,
                                                 RECALL_RANGE, mesh)]
    else:
        vtr = [r for _, r in recall_at_k(tensor_v, tensor_t, RECALL_RANGE)]
        tvr = [r for _, r in recall_at_k(tensor_t, tensor_v, RECALL_RANGE)]
    return _recall_df(tvr, vtr, dataset_name, split)


def _bucket(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _n_batch_shards(mesh) -> int:
    """Number of ways the leading batch axis splits on this mesh (the
    ``data`` axis, times ``replica`` on a multi-slice mesh)."""
    from ..parallel.mesh import batch_pspec

    axes = batch_pspec(mesh)[0]
    axes = axes if isinstance(axes, tuple) else (axes,)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def _place_variables(variables, mesh):
    """Lay caller-provided host variables out on the mesh (tp rules, like
    ``evaluation/eval.py``). Variables already committed to devices — the
    trainer's live (possibly fsdp-sharded) state — pass through untouched."""
    leaves = jax.tree_util.tree_leaves(variables)
    if leaves and isinstance(leaves[0], jax.Array) and getattr(
        leaves[0], "committed", False
    ):
        return variables
    from ..parallel.mesh import tree_shardings

    return jax.device_put(variables, tree_shardings(variables, mesh))


def _locally_materializable(leaf) -> bool:
    """Whether this process can reconstruct the full value without a
    collective: host arrays, addressable device arrays, and global arrays
    that are fully replicated (every device holds the whole value — one
    ``addressable_data(0)`` read is the full copy). fsdp- or cross-host
    tp-sharded params are NOT (their shards live on other hosts)."""
    if not isinstance(leaf, jax.Array):
        return True
    return leaf.is_fully_addressable or leaf.is_fully_replicated


def _local_full(leaf):
    """Full local copy of a fully-replicated global array (no transfer for
    already-addressable leaves)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        return leaf.addressable_data(0)
    return leaf


def _local_mesh():
    """A data-only mesh over THIS process's devices — the per-host encode
    mesh for the multihost disjoint-split path."""
    from jax.sharding import Mesh

    from ..parallel.mesh import DATA_AXIS

    return Mesh(np.asarray(jax.local_devices()), (DATA_AXIS,))


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


def _encode_local(
    module,
    variables,
    dataset,
    indices,
    *,
    frame_stride,
    first_frame_only,
    first_chunk_only,
    branch_override,
    needs_comments,
    image_size,
    nframes,
    mesh=None,
):
    """Encode the videos at ``indices``: returns (ids, video_means [nv, D],
    caption_embs list of [ncap_i, D]) — the per-process contribution under
    multihost, the whole set otherwise."""
    from ..ops.retrieval import _fetch, _mesh_spans_processes, _put_on_mesh

    fwd = make_eval_forward(module, variables, branch_override)
    empty_comment = tk.tokenize([""] * N_COMMENTS)

    n_shard = 1
    bshard = rep = None
    spans = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_pspec

        n_shard = _n_batch_shards(mesh)
        bshard = NamedSharding(mesh, batch_pspec(mesh))
        rep = NamedSharding(mesh, P())
        # pod mesh (collective multihost path): every process calls with
        # identical host arrays; inputs enter via make_array_from_callback
        spans = _mesh_spans_processes(mesh)

    def put_batch(x):
        return jnp.asarray(x) if mesh is None else _put_on_mesh(x, bshard, spans)

    def put_rep(x):
        return jnp.asarray(x) if mesh is None else _put_on_mesh(x, rep, spans)

    ids = []
    video_means = []
    caption_embs = []
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    for idx in indices:
        item = dataset[idx]
        if len(item) == 3:
            frames, captions, _ = item
            comments = None
        else:
            frames, captions, comments, _ = item
        ok = frames is not None
        if spans:
            # collective schedule (pod mesh): every host must issue the SAME
            # per-video collective sequence, so a host-LOCAL decode failure
            # (transient IO) cannot silently `continue` — the desynchronized
            # collectives would hang the pod or mismatch silently. Agree
            # first with one tiny allgather: the video is skipped on ALL
            # hosts unless every host decoded it.
            from jax.experimental import multihost_utils as mhu

            ok = bool(np.min(mhu.process_allgather(np.asarray(ok, np.int32))))
            if ok != (frames is not None):
                logger.warning(
                    "skipping video %s: decode failed on another host "
                    "(collective schedule requires all hosts)", idx
                )
        if not ok:
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

        # bucket + mask for stable jit shapes; on a mesh the bucket floor is
        # the batch-shard count, so padded batches always divide evenly
        cb = _bucket(nchunk, minimum=n_shard)
        kb = _bucket(ncap, minimum=n_shard)
        chunks_p = np.concatenate(
            [chunks, np.repeat(chunks[-1:], cb - nchunk, axis=0)]
        ) if cb > nchunk else chunks
        captions_p = np.concatenate(
            [captions, np.repeat(captions[-1:], kb - ncap, axis=0)]
        ) if kb > ncap else captions

        with mesh_ctx:
            fv, ft = fwd(
                put_batch(np.asarray(chunks_p)),
                put_batch(np.asarray(captions_p)),
                put_rep(np.asarray(comm)) if comm is not None else put_rep(
                    np.zeros((1, N_COMMENTS, 77), np.int32)
                ),
                needs_comments=needs_comments,
            )
        ids.append(int(idx))
        video_means.append(_fetch(fv)[:nchunk].mean(axis=0))
        caption_embs.append(_fetch(ft)[:ncap])
    return ids, video_means, caption_embs


def _flatten_caps(ids, caption_embs):
    """Concatenate per-video caption embeddings; tag each row with its
    video's dataset index."""
    flat_caps = np.concatenate(caption_embs)
    cap_vid = np.concatenate(
        [
            np.full(c.shape[0], vid, np.int64)
            for vid, c in zip(ids, caption_embs)
        ]
    )
    return flat_caps, cap_vid


# module-level alias (not a bare from-import) so tests can monkeypatch the
# gather at this module's seam; the implementation is the shared public
# helper (also used by evaluation/eval.py's multihost merge)
from ..utils.util import allgather_varlen as _allgather_varlen  # noqa: E402


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
    mesh=None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
):
    """Evaluate a model on a transfer dataset; returns the recall DataFrame.

    ``mesh`` shards per-video batches and the final ranking over the mesh's
    batch axes. Under multihost each process evaluates the strided video
    subset ``process_index::process_count`` and embeddings are allgathered
    (``process_index``/``process_count`` default from the JAX runtime; the
    explicit arguments exist for tests)."""
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

    pidx = jax.process_index() if process_index is None else int(process_index)
    pcount = jax.process_count() if process_count is None else int(process_count)

    # multihost: by default each process encodes the strided DISJOINT video
    # subset pidx::pcount on its own local devices and the embeddings are
    # allgathered once — the params must be reconstructable per host
    # (replicated / addressable). fsdp- or cross-host-tp-sharded params
    # can't be materialized locally, so that case falls back to the
    # COLLECTIVE schedule: every process walks the full list in lockstep
    # feeding identical batches into the global mesh (redundant decode, but
    # the compute is sharded pod-wide and the sharded state is used as-is).
    multihost = pcount > 1
    collective = multihost and mesh is not None and not all(
        _locally_materializable(l) for l in jax.tree_util.tree_leaves(variables)
    )
    enc_mesh = mesh
    if collective:
        indices = range(len(dataset))
        logger.info(
            "multihost transfer eval: sharded state not host-materializable;"
            " using the collective schedule (all hosts, full video list)"
        )
    else:
        indices = range(pidx, len(dataset), pcount)
        if multihost and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            enc_mesh = _local_mesh()
            variables = jax.device_put(
                jax.tree_util.tree_map(_local_full, variables),
                NamedSharding(enc_mesh, P()),
            )

    if enc_mesh is not None:
        variables = _place_variables(variables, enc_mesh)

    logger.info("Computing joint embeddings")
    ids, video_means, caption_embs = _encode_local(
        module, variables, dataset, indices,
        frame_stride=frame_stride,
        first_frame_only=first_frame_only,
        first_chunk_only=first_chunk_only,
        branch_override=branch_override,
        needs_comments=needs_comments,
        image_size=image_size,
        nframes=nframes,
        mesh=enc_mesh,
    )

    disjoint = multihost and not collective
    if not ids and not disjoint:
        # Every item was skipped (frames is None on decode failure) or the
        # split is empty — fail with the real condition instead of an opaque
        # np.stack error below. Single-host, or the collective schedule
        # (identical indices everywhere): every process raises together.
        raise RuntimeError(
            f"retrieval evaluation produced no embeddings on process "
            f"{pidx}/{pcount}: all {len(list(indices))} local items of "
            f"{datasetname}/{split} failed to decode or the split is empty "
            f"(check the data root paths)"
        )

    if ids:
        ids = np.asarray(ids, np.int64)
        video_tensor = np.stack(video_means)
        flat_caps, cap_vid = _flatten_caps(ids, caption_embs)
    else:
        # disjoint multihost with ZERO local survivors: this host must still
        # join every allgather below (raising here while the others proceed
        # would deadlock the pod on the counts collective) — contribute
        # empty blocks instead, with the embedding width agreed collectively.
        logger.warning(
            "process %d/%d produced no embeddings (all %d local items "
            "failed to decode); contributing empty blocks to the allgather",
            pidx, pcount, len(list(indices)),
        )
        ids = np.zeros((0,), np.int64)
        video_tensor = flat_caps = None
        cap_vid = np.zeros((0,), np.int64)

    if disjoint:
        from jax.experimental import multihost_utils as mhu

        dim = 0 if video_tensor is None else int(video_tensor.shape[1])
        dim = int(np.max(mhu.process_allgather(np.asarray(dim, np.int64))))
        if dim == 0:
            # every process came up empty — now the loud failure is
            # collective-safe (all raise together, after the same gathers)
            raise RuntimeError(
                f"retrieval evaluation produced no embeddings on ANY of "
                f"{pcount} processes: {datasetname}/{split} failed to "
                f"decode everywhere or the split is empty (check the data "
                f"root paths)"
            )
        if video_tensor is None:
            video_tensor = np.zeros((0, dim), np.float32)
            flat_caps = np.zeros((0, dim), np.float32)
        else:
            # the allgather needs one dtype on every host (incl. empty-block
            # hosts); ranking is f32 math downstream anyway
            video_tensor = np.asarray(video_tensor, np.float32)
            flat_caps = np.asarray(flat_caps, np.float32)
        ids = _allgather_varlen(ids)
        video_tensor = _allgather_varlen(video_tensor)
        flat_caps = _allgather_varlen(flat_caps)
        cap_vid = _allgather_varlen(cap_vid)

    # canonical global order: videos by dataset index, captions following
    # their video — host-count-invariant, and in the 1-caption case caption
    # row i is exactly video row i (what compute_recall assumes)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    video_tensor = video_tensor[order]
    cap_order = np.argsort(cap_vid, kind="stable")
    flat_caps = flat_caps[cap_order]
    cap_vid = cap_vid[cap_order]
    row_of = {int(v): i for i, v in enumerate(ids)}
    flat_targets = np.asarray([row_of[int(v)] for v in cap_vid], np.int64)

    max_len = int(np.bincount(flat_targets, minlength=len(ids)).max())

    if max_len == 1:
        outdf = compute_recall(
            video_tensor, flat_caps, split=split,
            dataset_name=datasetname, mesh=enc_mesh,
        )
    else:
        # text->video: every real caption is a query, target = its video
        if enc_mesh is not None:
            tvr = [
                r for _, r in recall_at_k_sharded(
                    video_tensor, flat_caps, RECALL_RANGE, enc_mesh,
                    targets=flat_targets,
                )
            ]
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

    if out_csv is not None and pidx == 0:
        # every process computes identical metrics; one writer (concurrent
        # same-file writes on a shared filesystem can interleave/truncate)
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
