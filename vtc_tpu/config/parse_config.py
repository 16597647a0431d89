"""Config / flag system.

Behavior-compatible with the reference's ``utils/parse_config.py:13-187``
(the config surface is part of the experiment contract):

* JSONC config files with sections name/batch_size/arch/dataset/optimizer/
  loss/metrics/lr_scheduler/trainer.
* CLI overrides declared as ``CustomArgs(flags, type, target)`` tuples where
  ``target`` is a ``;``-separated path into the config tree
  (``utils/parse_config.py:162-187``).
* Run directories ``save_dir/models/<name>/<NNN_MonDD_HH:MM>/`` carrying a
  monotonically increasing sequence number plus a timestamp
  (``utils/parse_config.py:33-50``), with the merged config re-serialized
  into the run dir as ``config.json``.
* ``-r/--resume`` re-reads the run's saved ``config.json``; passing ``-c``
  alongside ``-r`` overlays the new file for fine-tuning
  (``utils/parse_config.py:77-89``).
* Reflective construction ``init_obj``/``init_ftn``
  (``utils/parse_config.py:97-129``).

The device flag differs from the reference: instead of CUDA_VISIBLE_DEVICES it
selects the number of mesh devices (TPU chips are addressed via the JAX mesh,
not an env var).
"""

from __future__ import annotations

import functools
import logging
import re
from pathlib import Path
from typing import NamedTuple, Optional

from ..utils import read_json, setup_logging, write_json


class CustomArgs(NamedTuple):
    """One CLI override: argparse flags, value type, ``;``-path into the config."""

    flags: list
    type: type
    target: str


_RUN_DIR_RE = re.compile(r"(\d+)_[A-Za-z]{3}\d{2}_\d{2}:\d{2}\Z")
_LOG_LEVELS = (logging.WARNING, logging.INFO, logging.DEBUG)


def _next_run_id(exp_dir: Path) -> str:
    """``NNN_MonDD_HH:MM`` — sequence number continues from existing runs."""
    from datetime import datetime

    last = 0
    if exp_dir.is_dir():
        for child in exp_dir.iterdir():
            m = _RUN_DIR_RE.match(child.name)
            if m:
                last = max(last, int(m.group(1)))
    return f"{last + 1:03d}_{datetime.now():%b%d_%H:%M}"


def _override(cfg: dict, path: str, value) -> None:
    """Assign ``value`` at the ``;``-separated ``path`` inside ``cfg``."""
    node = cfg
    *parents, leaf = path.split(";")
    for key in parents:
        node = node[key]
    node[leaf] = value


def _broadcast_str(s: Optional[str], length: int = 64) -> str:
    """Broadcast a short string from process 0 to every process (fixed-size
    uint8 buffer through ``multihost_utils.broadcast_one_to_all``; non-zero
    ranks pass ``None``). Single-process: returns ``s`` unchanged."""
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(length, np.uint8)
    if s is not None:
        raw = s.encode()
        assert len(raw) <= length, (s, length)
        buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()


class ConfigParser:
    """Parsed experiment config + run directory + reflective construction."""

    def __init__(self, config, resume=None, modification=None, run_id=None):
        if modification:
            for path, value in modification.items():
                if value is not None:
                    _override(config, path, value)
        self._config = config
        self.resume = resume
        self.log_levels = dict(enumerate(_LOG_LEVELS))

        if bool(config.get("multihost")) and run_id is None:
            # multi-controller run: every process independently picking a
            # wall-clock run id races the mkdir (same minute) or — worse —
            # resolves DIFFERENT save_dirs (minute boundary), deadlocking
            # orbax's collective save across directories. Defer: train.py
            # calls finalize_run_dir() after jax.distributed.initialize(),
            # where rank 0 picks the id and broadcasts it.
            self._run_dir = None
            return

        exp_dir = Path(config["trainer"]["save_dir"]) / "models" / config["name"]
        if run_id is None:
            run_id = _next_run_id(exp_dir)
        run_dir = exp_dir / run_id
        # an explicit empty run_id reuses exp_dir itself (no fresh-dir guard)
        run_dir.mkdir(parents=True, exist_ok=(run_id == ""))
        self._run_dir = run_dir

        write_json(config, run_dir / "config.json")
        setup_logging(run_dir)

    def finalize_run_dir(self) -> Path:
        """Rank-coordinated run-dir creation for ``--multihost`` (call after
        ``jax.distributed.initialize()``): rank 0 computes the next run id on
        the shared filesystem and broadcasts it; ONLY rank 0 creates the
        directory and writes ``config.json``/log files (the fsdp checkpoint
        contract already requires ``save_dir`` to be host-shared,
        ``trainer.py:382-392``). A device barrier afterwards guarantees every
        rank sees the directory before the trainer touches it. No-op when the
        run dir already exists (single-host path or repeated call)."""
        if self._run_dir is not None:
            return self._run_dir
        import jax
        from jax.experimental import multihost_utils

        exp_dir = Path(
            self._config["trainer"]["save_dir"]
        ) / "models" / self._config["name"]
        rank0 = jax.process_index() == 0
        run_id = _broadcast_str(_next_run_id(exp_dir) if rank0 else None)
        run_dir = exp_dir / run_id
        if rank0:
            run_dir.mkdir(parents=True, exist_ok=False)
            write_json(self._config, run_dir / "config.json")
            setup_logging(run_dir)
        else:
            # non-zero ranks get a console-only WARNING setup with a rank
            # prefix (no shared log files — N ranks writing the same
            # rotating file would interleave/rotate each other): rank-local
            # operator warnings (e.g. the trainer's zero-val-batches root
            # cause) must not vanish just because they fired off rank 0.
            logging.basicConfig(
                level=logging.WARNING,
                format=(
                    f"[rank {jax.process_index()}] "
                    "%(levelname)s %(name)s: %(message)s"
                ),
            )
        multihost_utils.sync_global_devices("vtc_tpu:run_dir")
        self._run_dir = run_dir
        return run_dir

    @classmethod
    def from_args(cls, args, options=()):
        """Build from an argparse parser (train.py / eval.py entry points)."""
        for opt in options:
            args.add_argument(*opt.flags, default=None, type=opt.type)
        parsed = args if isinstance(args, tuple) else args.parse_args()

        resume = getattr(parsed, "resume", None)
        explicit_cfg = getattr(parsed, "config", None)
        if resume is not None:
            resume = Path(resume)
            config = read_json(resume.parent / "config.json")
            # multihost is a property of THIS launch's topology, not of the
            # experiment: a run dir written by a pod training run persists
            # "multihost": 1, and inheriting it would make a later
            # single-host eval/resume call jax.distributed.initialize() off
            # a pod and crash. Drop it; the CLI flag re-enables per launch.
            config.pop("multihost", None)
            if explicit_cfg:  # fine-tuning: overlay the new config file
                config.update(read_json(explicit_cfg))
        else:
            if explicit_cfg is None:
                raise AssertionError(
                    "Configuration file needs to be specified. "
                    "Add '-c config.jsonc', for example."
                )
            config = read_json(explicit_cfg)

        parsed_vars = vars(parsed)
        modification = {}
        for opt in options:
            long_flags = [f for f in opt.flags if f.startswith("--")]
            dest = (long_flags[0] if long_flags else opt.flags[0]).lstrip("-").replace("-", "_")
            modification[opt.target] = parsed_vars[dest]
        # -d/--device selects the number of mesh (data-axis) devices — the
        # TPU analogue of the reference's CUDA_VISIBLE_DEVICES flag (see
        # module docstring). An explicit --n_devices override wins.
        device = parsed_vars.get("device")
        if device is not None and modification.get("n_devices") is None:
            # accept both a count ("-d 4") and the reference's id-list
            # form ("-d 0,1" meant two GPUs -> two mesh devices)
            n = len(device.split(",")) if "," in str(device) else int(device)
            modification["n_devices"] = n
        return cls(config, resume, modification)

    # -- reflective construction ------------------------------------------

    def _resolve(self, name: str, kwargs: dict):
        section = self[name]
        call_args = dict(section["args"])
        clashes = set(kwargs) & set(call_args)
        assert not clashes, (
            f"Overwriting kwargs given in config file is not allowed: {clashes}"
        )
        call_args.update(kwargs)
        return section["type"], call_args

    def init_obj(self, name, module, *args, **kwargs):
        """``config.init_obj('arch', models)`` == ``models.<type>(**args)``."""
        type_name, call_args = self._resolve(name, kwargs)
        return getattr(module, type_name)(*args, **call_args)

    def init_ftn(self, name, module, *args, **kwargs):
        """Like ``init_obj`` but returns a partial instead of calling."""
        type_name, call_args = self._resolve(name, kwargs)
        return functools.partial(getattr(module, type_name), *args, **call_args)

    # -- dict-like access ---------------------------------------------------

    def __getitem__(self, name):
        return self._config[name]

    def get(self, name, default=None):
        return self._config.get(name, default)

    def get_logger(self, name, verbosity=2):
        assert verbosity in self.log_levels, (
            f"verbosity option {verbosity} is invalid. "
            f"Valid options are {list(self.log_levels)}."
        )
        logger = logging.getLogger(name)
        logger.setLevel(self.log_levels[verbosity])
        return logger

    @property
    def config(self):
        return self._config

    @property
    def save_dir(self) -> Path:
        if self._run_dir is None:
            raise RuntimeError(
                "run dir not finalized: a --multihost config defers run-dir "
                "creation until after jax.distributed.initialize(); call "
                "config.finalize_run_dir() first (train.py does)"
            )
        return self._run_dir

    @property
    def log_dir(self) -> Path:
        return self.save_dir
