"""On-device retrieval evaluation — the FAISS replacement.

The reference computes R@K with a FAISS ``GpuIndexFlatL2`` over CPU-gathered
embeddings (``model/metric.py:103-187``). Eval sets are <=10k items, so an
index structure buys nothing: on TPU the exact ranking is one dense matmul on
the MXU plus ``lax.top_k``, entirely on device. Flat L2 over (normalized or
not) vectors is reproduced exactly via the expansion
``argmin ||a_j - q||^2 == argmax (q·a_j - ||a_j||^2 / 2)``.

Multi-device: :func:`recall_at_k_sharded` shards the *query* axis over the
mesh; each device scores its query shard against the replicated gallery and
``psum``s the hit counts over ICI — replacing both the reference's CPU
accumulation (``evaluation/eval.py:114-116``) and FAISS.

Non-finite embeddings (the reference pads ragged caption sets with -inf rows,
``evaluation/retrieval_evaluation.py:239-252``) rank last, matching FAISS's
inf-distance behavior.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _l2_scores(gallery: jax.Array, queries: jax.Array) -> jax.Array:
    """score[i, j] = -0.5 * ||gallery_j - queries_i||^2 (up to a per-query
    constant): higher is closer. [nq, ng], fp32, MXU matmul."""
    g = gallery.astype(jnp.float32)
    q = queries.astype(jnp.float32)
    dots = jnp.matmul(q, g.T, preferred_element_type=jnp.float32)
    g_sq = 0.5 * jnp.sum(g * g, axis=-1)
    scores = dots - g_sq[None, :]
    return jnp.where(jnp.isfinite(scores), scores, -jnp.inf)


@partial(jax.jit, static_argnames=("max_k",))
def _topk_hits(gallery, queries, targets, max_k: int):
    """For each query, ranks of the true gallery item within top ``max_k``.

    Returns hits [nq, max_k] bool: hits[i, r] == True iff target_i is among
    the r+1 closest gallery items.
    """
    scores = _l2_scores(gallery, queries)
    k_eff = min(max_k, gallery.shape[0])
    _, idx = jax.lax.top_k(scores, k_eff)  # [nq, k_eff]
    match = idx == targets[:, None]
    hits = jnp.cumsum(match, axis=-1) > 0
    if k_eff < max_k:  # gallery smaller than k: everything is within top-k
        hits = jnp.concatenate(
            [hits, jnp.broadcast_to(hits[:, -1:], (hits.shape[0], max_k - k_eff))],
            axis=-1,
        )
    return hits


def recall_at_k(
    features_a,
    features_b,
    k_vals: Sequence[int] = (1, 5, 10),
    targets=None,
):
    """R@K of retrieving ``features_a`` items from ``features_b`` queries.

    Matches ``RecallAtK.compute`` (``model/metric.py:137-161``): gallery =
    features_a, queries = features_b, target for query i defaults to i.
    Returns ``[(k, recall), ...]``.
    """
    gallery = jnp.asarray(features_a)
    queries = jnp.asarray(features_b)
    nq = queries.shape[0]
    if targets is None:
        targets = jnp.arange(nq)
    else:
        targets = jnp.asarray(targets)
    max_k = int(max(k_vals))
    hits = _topk_hits(gallery, queries, targets, max_k)
    hits = np.asarray(hits)
    return [(int(k), float(hits[:, int(k) - 1].mean())) for k in k_vals]


def ranks_of_targets(features_a, features_b, targets=None):
    """Full rank (1-based) of each query's target — powers median/mean rank.
    One dense [nq, ng] score matrix; rank = #items scoring strictly higher
    than the target + 1."""
    gallery = jnp.asarray(features_a)
    queries = jnp.asarray(features_b)
    nq = queries.shape[0]
    targets = jnp.arange(nq) if targets is None else jnp.asarray(targets)

    @jax.jit
    def _ranks(g, q, t):
        scores = _l2_scores(g, q)
        target_scores = jnp.take_along_axis(scores, t[:, None], axis=-1)
        return 1 + jnp.sum(scores > target_scores, axis=-1)

    return np.asarray(_ranks(gallery, queries, targets))


def retrieval_metrics(features_a, features_b, k_vals=(1, 5, 10), targets=None):
    """Full metric suite: R@K + median/mean rank."""
    ranks = ranks_of_targets(features_a, features_b, targets)
    out = {f"R@{k}": float((ranks <= k).mean()) for k in k_vals}
    out["median_rank"] = float(np.median(ranks))
    out["mean_rank"] = float(ranks.mean())
    return out


# --------------------------------------------------------------------------
# Sharded multi-device path
# --------------------------------------------------------------------------


def _mesh_spans_processes(mesh) -> bool:
    """True when the mesh includes devices of other processes (a pod mesh):
    host arrays then enter via ``make_array_from_callback`` (each process
    supplies its addressable shards from an identical host copy) and global
    outputs leave via ``process_allgather``."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _put_on_mesh(x, sharding, spans: bool):
    x = np.asarray(x)
    if spans:
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )
    return jax.device_put(x, sharding)


def _fetch(x) -> np.ndarray:
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def recall_hits_sharded(gallery, queries, targets, max_k: int, mesh, axis: str = "data"):
    """Top-k hit matrix with the query axis sharded over ``axis`` of ``mesh``.

    Each device holds a query shard and the full gallery (replicated over
    ICI); per-shard top-k runs locally and results concatenate along the
    query axis. This is the eval path that replaces FAISS at scale: the
    gallery matmul rides each chip's MXU, queries never leave their host
    shard. On a multi-process (pod) mesh every host must call with the SAME
    arrays; the hit matrix comes back allgathered to every host.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = queries.shape[0]
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    queries = np.asarray(queries)
    targets = np.asarray(targets)
    if pad:
        queries = np.concatenate([queries, np.full((pad,) + queries.shape[1:], -np.inf, queries.dtype)])
        targets = np.concatenate([targets, -np.ones((pad,), targets.dtype)])

    spans = _mesh_spans_processes(mesh)
    qsharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    queries = _put_on_mesh(queries, qsharding, spans)
    gallery = _put_on_mesh(gallery, rep, spans)
    targets = _put_on_mesh(targets, qsharding, spans)

    hits = jax.jit(
        _topk_hits,
        static_argnames=("max_k",),
        out_shardings=qsharding,
    )(gallery, queries, targets, max_k)
    return _fetch(hits)[:n]


def recall_at_k_sharded(features_a, features_b, k_vals, mesh, axis="data", targets=None):
    # keep inputs on host: recall_hits_sharded re-lays everything out on the
    # mesh anyway, so a jnp.asarray here would only add a host->device and a
    # device->host round-trip per call (~0.6 s each through the dev tunnel)
    queries = np.asarray(features_b)
    nq = queries.shape[0]
    targets = np.arange(nq) if targets is None else np.asarray(targets)
    hits = recall_hits_sharded(
        np.asarray(features_a), queries, targets, int(max(k_vals)), mesh, axis
    )
    return [(int(k), float(hits[:, int(k) - 1].mean())) for k in k_vals]


# --------------------------------------------------------------------------
# Chunked / streaming top-k for large galleries
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_k", "chunk"))
def _topk_hits_chunked(gallery, queries, targets, max_k: int, chunk: int):
    """Running top-k merged over gallery tiles via lax.scan: the full
    [nq, ng] score matrix never materializes in HBM (only [nq, chunk] tiles),
    so eval galleries can grow far past the dense-matrix budget."""
    nq = queries.shape[0]
    ng = gallery.shape[0]
    n_chunks = (ng + chunk - 1) // chunk
    pad = n_chunks * chunk - ng
    gallery = jnp.pad(gallery, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    g_tiles = gallery.reshape(n_chunks, chunk, gallery.shape[-1])

    q = queries.astype(jnp.float32)

    def scan_body(carry, tile_idx_and_g):
        best_scores, best_idx = carry
        tile_i, g = tile_idx_and_g
        # one scoring definition for the dense and streamed paths — a
        # change to the L2/non-finite semantics must apply to both
        scores = _l2_scores(g, q)
        idx = tile_i * chunk + jnp.arange(chunk)[None, :]
        merged_scores = jnp.concatenate([best_scores, scores], axis=-1)
        merged_idx = jnp.concatenate(
            [best_idx, jnp.broadcast_to(idx, scores.shape)], axis=-1
        )
        top_scores, top_pos = jax.lax.top_k(merged_scores, max_k)
        top_idx = jnp.take_along_axis(merged_idx, top_pos, axis=-1)
        return (top_scores, top_idx), None

    init = (
        jnp.full((nq, max_k), -jnp.inf, jnp.float32),
        jnp.full((nq, max_k), -1, jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(
        scan_body, init, (jnp.arange(n_chunks), g_tiles)
    )
    match = idx == targets[:, None]
    return jnp.cumsum(match, axis=-1) > 0


def recall_at_k_chunked(
    features_a, features_b, k_vals=(1, 5, 10), targets=None, chunk: int = 2048
):
    """R@K over a streamed gallery (same contract as :func:`recall_at_k`)."""
    gallery = jnp.asarray(features_a)
    queries = jnp.asarray(features_b)
    nq = queries.shape[0]
    targets = jnp.arange(nq) if targets is None else jnp.asarray(targets)
    max_k = int(max(k_vals))
    hits = np.asarray(
        _topk_hits_chunked(gallery, queries, targets, max_k, int(chunk))
    )
    return [(int(k), float(hits[:, int(k) - 1].mean())) for k in k_vals]
