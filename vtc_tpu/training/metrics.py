"""Metric aggregation mirroring the reference's ``model/metric.py``.

``MetricTracker`` / ``ScalarPerBatchMetric`` / ``LossMetric`` keep the same
interfaces (``model/metric.py:10-100``). ``RecallAtK`` keeps the reference's
accumulate-then-compute contract and result keys
(``"{b}_from_{a}-recall_at_{k}"``, ``model/metric.py:176-179``) but computes
on device via ``vtc_tpu.ops.retrieval`` instead of FAISS.
"""

from __future__ import annotations

import time
from typing import Iterable

import numpy as np

from ..ops.retrieval import recall_at_k


class MetricTracker:
    def __init__(self, *metrics):
        self.metrics = {}
        for m in metrics:
            self.add_metric(m)
        self.reset()

    def add_metric(self, metric):
        self.metrics[metric.name] = metric

    def set_writer(self, writer):
        for m in self.metrics.values():
            m.set_writer(writer)

    def reset(self):
        for m in self.metrics.values():
            m.reset()

    def update(self, loss, output, meta):
        for m in self.metrics.values():
            m.update(loss, output, meta)

    def avg(self):
        return {name: m.avg() for name, m in self.metrics.items()}

    def result(self):
        res = {}
        for m in self.metrics.values():
            res.update(m.result())
        return res


class BaseMetric:
    def __init__(self, name):
        self.name = name
        self.writer = None
        self.is_train = True
        self.is_val = True

    def set_writer(self, writer):
        self.writer = writer

    def reset(self):
        raise NotImplementedError

    def update(self, loss, output, meta):
        raise NotImplementedError

    def avg(self):
        raise NotImplementedError

    def result(self):
        raise NotImplementedError


class ScalarPerBatchMetric(BaseMetric):
    def __init__(self, name, metric_fun):
        super().__init__(name)
        self.fun = metric_fun
        self.reset()

    def reset(self):
        self._total = 0.0
        self._count = 0

    def update(self, loss, output, meta, n=1):
        value = float(self.fun(loss, output, meta))
        if self.writer is not None:
            self.writer.add_scalar(self.name, value)
        self._total += value * n
        self._count += n

    def avg(self):
        return self._total / max(self._count, 1)

    def result(self):
        return {self.name: self.avg()}


class LossMetric(ScalarPerBatchMetric):
    def __init__(self):
        super().__init__("loss", lambda loss, o, m: loss)


class RecallAtK(BaseMetric):
    """Accumulates (feats_a, feats_b) per batch; at epoch end computes
    bidirectional R@K on device."""

    def __init__(self, name_a, name_b, k_vals=5):
        super().__init__("recall@k")
        if not isinstance(k_vals, Iterable):
            k_vals = [k_vals]
        self.k_vals = list(k_vals)
        self.name_a = name_a
        self.name_b = name_b
        self.is_train = False
        self.reset()

    def reset(self):
        self.features_a_list = []
        self.features_b_list = []

    def update(self, loss, output, meta):
        self.features_a_list.append(np.asarray(output[0]))
        self.features_b_list.append(np.asarray(output[1]))

    def compute(self, features_a, features_b):
        """Same contract as ``model/metric.py:137-161``: gallery features_a,
        queries features_b, returns [(k, recall)]."""
        return recall_at_k(features_a, features_b, self.k_vals)

    def avg(self):
        return None

    def result(self):
        tic = time.time()
        if not self.features_a_list:
            import logging

            logging.getLogger(__name__).warning(
                "RecallAtK: no batches accumulated (validation set smaller "
                "than the batch size with drop_last?); skipping"
            )
            return {}
        features_a = np.concatenate(self.features_a_list)
        features_b = np.concatenate(self.features_b_list)

        res = {}
        for k, recall in self.compute(features_a, features_b):
            res[f"{self.name_b}_from_{self.name_a}-recall_at_{k}"] = recall
        for k, recall in self.compute(features_b, features_a):
            res[f"{self.name_a}_from_{self.name_b}-recall_at_{k}"] = recall

        if self.writer:
            for name, recall in res.items():
                self.writer.add_scalar(name, recall)
        del tic
        return res


METRICS = {
    "MetricTracker": MetricTracker,
    "ScalarPerBatchMetric": ScalarPerBatchMetric,
    "LossMetric": LossMetric,
    "RecallAtK": RecallAtK,
}
