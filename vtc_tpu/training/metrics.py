"""Metric aggregation.

The *result-key scheme* is the parity contract with the reference
(``"{b}_from_{a}-recall_at_{k}"``, ``model/metric.py:176-179``) and
``RecallAtK`` keeps its accumulate-then-compute contract — but the
aggregation machinery here is this repo's own shape: metrics are plain
objects satisfying a small duck-typed protocol (``reset`` / ``update`` /
``result`` plus ``is_train``/``is_val`` routing flags), and the tracker owns
all TensorBoard emission centrally instead of threading a writer into every
metric. R@K itself computes on device (``vtc_tpu.ops.retrieval``) — the
reference's FAISS GPU index has no role on TPU.
"""

from __future__ import annotations

import logging
from typing import Iterable

import numpy as np

from ..ops.retrieval import recall_at_k

logger = logging.getLogger(__name__)


def _to_host(x) -> np.ndarray:
    """``np.asarray`` that is safe for multi-host global jax.Arrays: when
    the array is not fully addressable (each controller holds only its
    process's slice of a batch sharded over a pod), all-gather it to every
    host first — plain ``np.asarray`` raises on such arrays, and using only
    the local shard would compute recall against a fraction of the gallery."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


class MetricTracker:
    """Composes metrics by name and routes writer emission.

    ``update`` feeds every metric one batch; metrics that return a per-batch
    scalar get it written to TensorBoard immediately (the reference's
    per-batch scalar stream), while dict-valued epoch results are written at
    ``result()`` time for metrics that opt in via ``emit_result_scalars``.
    """

    def __init__(self, *metrics):
        self.metrics = {}
        self._writer = None
        for m in metrics:
            self.add_metric(m)
        self.reset()

    def add_metric(self, metric):
        self.metrics[metric.name] = metric

    def set_writer(self, writer):
        self._writer = writer

    def reset(self):
        for m in self.metrics.values():
            m.reset()

    def update(self, loss, output, meta):
        for m in self.metrics.values():
            per_batch = m.update(loss, output, meta)
            if per_batch is not None and self._writer is not None:
                self._writer.add_scalar(m.name, per_batch)

    def avg(self):
        return {
            name: m.avg() for name, m in self.metrics.items()
            if hasattr(m, "avg")
        }

    def result(self):
        res = {}
        for m in self.metrics.values():
            part = m.result()
            res.update(part)
            if getattr(m, "emit_result_scalars", False) and self._writer:
                for key, value in part.items():
                    self._writer.add_scalar(key, value)
        return res


class ScalarPerBatchMetric:
    """Running mean of a per-batch scalar ``fn(loss, output, meta)``."""

    is_train = True
    is_val = True
    emit_result_scalars = False

    def __init__(self, name, metric_fun):
        self.name = name
        self.fun = metric_fun
        self.reset()

    def reset(self):
        self._total = 0.0
        self._count = 0

    def update(self, loss, output, meta, n: int = 1):
        value = float(self.fun(loss, output, meta))
        self._total += value * n
        self._count += n
        return value  # per-batch stream for the tracker's writer

    def avg(self):
        return self._total / max(self._count, 1)

    def result(self):
        return {self.name: self.avg()}


def LossMetric() -> ScalarPerBatchMetric:
    """The per-batch loss stream (reference ``LossMetric``)."""
    return ScalarPerBatchMetric("loss", lambda loss, output, meta: loss)


class RecallAtK:
    """Accumulates (feats_a, feats_b) per batch; at epoch end computes
    bidirectional R@K on device. Gallery/query contract and result keys
    match ``model/metric.py:137-179``."""

    is_train = False
    is_val = True
    emit_result_scalars = True
    name = "recall@k"

    def __init__(self, name_a, name_b, k_vals=5):
        if not isinstance(k_vals, Iterable):
            k_vals = [k_vals]
        self.k_vals = list(k_vals)
        self.name_a = name_a
        self.name_b = name_b
        self.reset()

    def reset(self):
        self._feats_a = []
        self._feats_b = []

    def update(self, loss, output, meta):
        self._feats_a.append(_to_host(output[0]))
        self._feats_b.append(_to_host(output[1]))
        return None  # no per-batch scalar

    def compute(self, features_a, features_b):
        """Gallery ``features_a``, queries ``features_b`` -> [(k, recall)]."""
        return recall_at_k(features_a, features_b, self.k_vals)

    def result(self):
        if not self._feats_a:
            logger.warning(
                "RecallAtK: no batches accumulated (validation set smaller "
                "than the batch size with drop_last?); skipping"
            )
            return {}
        feats_a = np.concatenate(self._feats_a)
        feats_b = np.concatenate(self._feats_b)
        res = {}
        for gallery, query, ga, qb in (
            (feats_a, feats_b, self.name_a, self.name_b),
            (feats_b, feats_a, self.name_b, self.name_a),
        ):
            for k, recall in self.compute(gallery, query):
                res[f"{qb}_from_{ga}-recall_at_{k}"] = recall
        return res


METRICS = {
    "MetricTracker": MetricTracker,
    "ScalarPerBatchMetric": ScalarPerBatchMetric,
    "LossMetric": LossMetric,
    "RecallAtK": RecallAtK,
}
