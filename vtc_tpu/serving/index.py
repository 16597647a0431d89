"""Retrieval serving: an HBM-resident embedding index with jitted
encode->rank paths.

The reference stops at offline evaluation (FAISS over CPU-gathered
embeddings); this component packages the same exact-L2 ranking as a serving
primitive: the gallery lives on device (optionally sharded over the mesh's
data axis), queries are encoded by the model towers and ranked in one
compiled program — text->visual and visual->text retrieval at thousands of
queries/sec/chip (see PERFORMANCE.md for the encoder throughput that
dominates).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import l2_normalize


@partial(jax.jit, static_argnames=("k",))
def _rank(gallery, queries, k: int):
    g = gallery.astype(jnp.float32)
    q = l2_normalize(queries.astype(jnp.float32))
    scores = jnp.matmul(q, g.T, preferred_element_type=jnp.float32)
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, min(k, g.shape[0]))
    return top_scores, top_idx


class RetrievalIndex:
    """Exact dense retrieval over L2-normalized embeddings.

    ``ids`` are arbitrary integer identifiers aligned with the gallery rows
    (reddit ids in the VTC corpus). The gallery is normalized on add, so
    ranking by dot product == cosine == flat L2.
    """

    def __init__(self, embed_dim: int, mesh=None):
        self.embed_dim = embed_dim
        self.mesh = mesh
        self._chunks = []
        self._ids = []
        self._gallery = None
        self._gallery_ids = None
        self._n_real = 0  # gallery rows before mesh-divisibility padding

    def __len__(self):
        # length never forces a device materialization
        if self._gallery is not None:
            return self._n_real
        return int(sum(c.shape[0] for c in self._chunks))

    def add(self, embeddings, ids) -> None:
        if self._gallery is not None:
            # re-open a materialized index: fold the device gallery back
            # into the staging chunks (the host copies were released;
            # padding rows are sliced off)
            self._chunks = [np.asarray(self._gallery, np.float32)[: self._n_real]]
            self._ids = [np.asarray(self._gallery_ids)]
            self._gallery = None
            self._gallery_ids = None
        embeddings = np.asarray(embeddings, np.float32)
        assert embeddings.shape[-1] == self.embed_dim
        norms = np.linalg.norm(embeddings, axis=-1, keepdims=True)
        self._chunks.append(embeddings / np.maximum(norms, 1e-12))
        self._ids.append(np.asarray(ids, np.int64))

    def _materialize(self):
        if self._gallery is not None or not self._chunks:
            return
        gallery = np.concatenate(self._chunks)
        self._gallery_ids = np.concatenate(self._ids)
        self._n_real = gallery.shape[0]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            # device_put needs dim 0 divisible by the data-axis size; real
            # corpora almost never are, so pad with -inf rows — they score
            # -inf in _rank (the isfinite mask) and rank after every real
            # row, and search() maps any surfaced pad index to id -1
            nshard = int(self.mesh.shape[DATA_AXIS])
            pad = (-gallery.shape[0]) % nshard
            if pad:
                gallery = np.concatenate(
                    [gallery,
                     np.full((pad, gallery.shape[1]), -np.inf, np.float32)]
                )
            # gallery rows sharded over the data axis (per-chip HBM holds
            # 1/n of the index; top-k over the sharded axis via GSPMD)
            self._gallery = jax.device_put(
                gallery, NamedSharding(self.mesh, P(DATA_AXIS, None))
            )
        else:
            self._gallery = jnp.asarray(gallery)
        # release the host-side staging copies (was a 2x footprint)
        self._chunks = []
        self._ids = []

    def search(self, query_embeddings, k: int = 10):
        """-> (ids [nq, k], scores [nq, k])."""
        self._materialize()
        if self._gallery is None:
            raise ValueError("index is empty")
        scores, idx = _rank(self._gallery, jnp.asarray(query_embeddings), k)
        idx = np.asarray(idx)
        # pad rows (k > real gallery size on a mesh) surface as id -1
        safe = np.minimum(idx, self._n_real - 1)
        ids = np.where(idx < self._n_real, self._gallery_ids[safe], -1)
        return ids, np.asarray(scores)

    # ------------------------------------------------------------------ #

    def save(self, path) -> None:
        self._materialize()
        if self._gallery is None:
            raise ValueError("cannot save an empty RetrievalIndex")
        np.savez(
            path,
            embeddings=np.asarray(self._gallery)[: self._n_real],
            reddit_ids=self._gallery_ids,
        )

    @classmethod
    def load(cls, path, mesh=None) -> "RetrievalIndex":
        with np.load(path) as z:
            emb = z["embeddings"]
            ids = z["reddit_ids"]
        index = cls(embed_dim=emb.shape[-1], mesh=mesh)
        index.add(emb, ids)
        return index


class ClipRetrievalService:
    """Model + index: tokenized-text or image queries against an embedding
    gallery, all on device.

    Queries are padded to power-of-two batch buckets before encoding
    (``bucket_queries``): XLA compiles one executable per bucket instead of
    one per ragged request size — the standard TPU serving discipline
    (static shapes; a live service otherwise recompiles on every new batch
    size). Padding rows are sliced off before ranking, so results are
    byte-identical to the unbucketed path."""

    def __init__(self, module, variables, index: RetrievalIndex,
                 bucket_queries: bool = True):
        self.module = module
        self.variables = variables
        self.index = index
        self.bucket_queries = bucket_queries

        @jax.jit
        def _encode_text(variables, tokens):
            feats = module.apply(variables, tokens, method="encode_text")
            return l2_normalize(feats.astype(jnp.float32))

        @jax.jit
        def _encode_image(variables, images):
            feats = module.apply(variables, images, method="encode_image")
            return l2_normalize(feats.astype(jnp.float32))

        self._encode_text = _encode_text
        self._encode_image = _encode_image

    def _bucketed(self, encode, queries):
        queries = jnp.asarray(queries)
        n = queries.shape[0]
        if not self.bucket_queries or n == 0:
            # n == 0: nothing to pad with — fall through to the raw encode
            # (same behavior as the unbucketed service)
            return encode(self.variables, queries)
        bucket = 1 << (n - 1).bit_length() if n > 1 else 1
        if bucket != n:
            # repeat-pad with row 0 (valid content keeps every tower's
            # batch-independent math identical; padded rows are dropped)
            pad = jnp.broadcast_to(
                queries[:1], (bucket - n,) + queries.shape[1:]
            )
            queries = jnp.concatenate([queries, pad])
        return encode(self.variables, queries)[:n]

    def search_text(self, tokens, k: int = 10):
        return self.index.search(self._bucketed(self._encode_text, tokens), k)

    def search_image(self, images, k: int = 10):
        return self.index.search(self._bucketed(self._encode_image, images), k)
