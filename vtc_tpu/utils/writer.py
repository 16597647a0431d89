"""Metric sinks: a TensorBoard writer wrapper with train/valid mode tagging.

Mirrors the behavior of the reference's ``logger/visualization.py:5-87``:
lazily binds a SummaryWriter implementation, tags every scalar with the
current mode (train/valid) and global step, and emits a ``steps_per_sec``
scalar on every ``set_step`` call.
"""

from __future__ import annotations

import importlib
from datetime import datetime

_WRITER_FTNS = {
    "add_scalar",
    "add_scalars",
    "add_image",
    "add_images",
    "add_audio",
    "add_text",
    "add_histogram",
    "add_pr_curve",
    "add_embedding",
}
_TAG_MODE_EXCEPTIONS = {"add_histogram", "add_embedding"}


class TensorboardWriter:
    def __init__(self, log_dir, logger, enabled: bool):
        self.writer = None
        self.selected_module = ""

        if enabled:
            for module in ["tensorboardX", "torch.utils.tensorboard"]:
                try:
                    self.writer = importlib.import_module(module).SummaryWriter(
                        str(log_dir)
                    )
                    self.selected_module = module
                    break
                except ImportError:
                    continue
            if self.writer is None and logger is not None:
                logger.warning(
                    "Tensorboard logging requested but no SummaryWriter "
                    "implementation (tensorboardX) is available; disabling."
                )

        self.step = 0
        self.mode = ""
        self.timer = datetime.now()

    def set_step(self, step: int, mode: str = "train") -> None:
        self.mode = mode
        self.step = step
        if step == 0:
            self.timer = datetime.now()
        else:
            duration = datetime.now() - self.timer
            secs = duration.total_seconds()
            if secs > 0:
                self.add_scalar("steps_per_sec", 1 / secs)
            self.timer = datetime.now()

    def __getattr__(self, name):
        if name in _WRITER_FTNS:
            add_data = getattr(self.writer, name, None)

            def wrapper(tag, data, *args, **kwargs):
                if add_data is not None:
                    if name not in _TAG_MODE_EXCEPTIONS:
                        tag = f"{tag}/{self.mode}"
                    add_data(tag, data, self.step, *args, **kwargs)

            return wrapper
        raise AttributeError(
            f"type object '{self.selected_module}' has no attribute '{name}'"
        )
