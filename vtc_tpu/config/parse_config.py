"""Config / flag system.

Mirrors the public surface of the reference's ``utils/parse_config.py:13-187``:

* JSONC config files with sections name/batch_size/arch/dataset/optimizer/
  loss/metrics/lr_scheduler/trainer.
* CLI overrides declared as ``CustomArgs(flags, type, target)`` tuples where
  ``target`` is a ``;``-separated path into the config tree
  (``utils/parse_config.py:162-187``).
* Run directories ``save_dir/models/<name>/<NNN_MonDD_HH:MM>/`` with both a
  sequence number and timestamp (``utils/parse_config.py:33-50``), the merged
  config re-serialized into the run dir as ``config.json``.
* ``-r/--resume`` re-reads the run's saved ``config.json``
  (``utils/parse_config.py:77-89``).
* Reflective construction ``init_obj``/``init_ftn``
  (``utils/parse_config.py:97-129``).

The device flag differs from the reference: instead of CUDA_VISIBLE_DEVICES it
selects the number of mesh devices (TPU chips are addressed via the JAX mesh,
not an env var).
"""

from __future__ import annotations

import collections
import logging
import os
import re
from datetime import datetime
from functools import partial, reduce
from operator import getitem
from pathlib import Path

from ..utils import read_json, setup_logging, write_json

CustomArgs = collections.namedtuple("CustomArgs", "flags type target")


class ConfigParser:
    def __init__(self, config, resume=None, modification=None, run_id=None):
        self._config = _update_config(config, modification)
        self.resume = resume

        save_dir = Path(self.config["trainer"]["save_dir"])
        exper_name = self.config["name"]
        exp_dir = save_dir / "models" / exper_name

        if run_id is None:
            # Human-friendly run id with both sequence and timestamp,
            # e.g. 001_Jan05_16:55 (same scheme as the reference).
            ts = datetime.now().strftime("%b%d_%H:%M")
            pattern = r"^\d+_\w\w\w\d\d_\d\d:\d\d$"
            num = 1
            if exp_dir.exists():
                folders = [x for x in os.listdir(exp_dir) if re.match(pattern, x)]
                ints = [int(x.split("_")[0]) for x in folders]
                if ints:
                    num = max(ints) + 1
            run_id = "%03d_%s" % (num, ts)

        self._save_dir = exp_dir / run_id
        self._log_dir = exp_dir / run_id

        exist_ok = run_id == ""
        self.save_dir.mkdir(parents=True, exist_ok=exist_ok)
        self.log_dir.mkdir(parents=True, exist_ok=True)

        write_json(self.config, self.save_dir / "config.json")

        setup_logging(self.log_dir)
        self.log_levels = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}

    @classmethod
    def from_args(cls, args, options=()):
        """Initialize from CLI arguments (used by train.py / eval.py)."""
        for opt in options:
            args.add_argument(*opt.flags, default=None, type=opt.type)
        if not isinstance(args, tuple):
            args = args.parse_args()

        if getattr(args, "resume", None) is not None:
            resume = Path(args.resume)
            cfg_fname = resume.parent / "config.json"
        else:
            msg_no_cfg = (
                "Configuration file needs to be specified. "
                "Add '-c config.jsonc', for example."
            )
            assert args.config is not None, msg_no_cfg
            resume = None
            cfg_fname = Path(args.config)

        config = read_json(cfg_fname)
        if getattr(args, "config", None) and resume:
            # update new config for fine-tuning
            config.update(read_json(args.config))

        modification = {
            opt.target: getattr(args, _get_opt_name(opt.flags)) for opt in options
        }
        return cls(config, resume, modification)

    def init_obj(self, name, module, *args, **kwargs):
        """``config.init_obj('arch', models)`` == ``models.<type>(**args)``."""
        module_name = self[name]["type"]
        module_args = dict(self[name]["args"])
        assert all(
            k not in module_args for k in kwargs
        ), "Overwriting kwargs given in config file is not allowed"
        module_args.update(kwargs)
        return getattr(module, module_name)(*args, **module_args)

    def init_ftn(self, name, module, *args, **kwargs):
        module_name = self[name]["type"]
        module_args = dict(self[name]["args"])
        assert all(
            k not in module_args for k in kwargs
        ), "Overwriting kwargs given in config file is not allowed"
        module_args.update(kwargs)
        return partial(getattr(module, module_name), *args, **module_args)

    def __getitem__(self, name):
        return self.config[name]

    def get(self, name, default=None):
        return self.config.get(name, default)

    def get_logger(self, name, verbosity=2):
        msg = (
            f"verbosity option {verbosity} is invalid. "
            f"Valid options are {self.log_levels.keys()}."
        )
        assert verbosity in self.log_levels, msg
        logger = logging.getLogger(name)
        logger.setLevel(self.log_levels[verbosity])
        return logger

    @property
    def config(self):
        return self._config

    @property
    def save_dir(self):
        return self._save_dir

    @property
    def log_dir(self):
        return self._log_dir


def _update_config(config, modification):
    if modification is None:
        return config
    for k, v in modification.items():
        if v is not None:
            _set_by_path(config, k, v)
    return config


def _get_opt_name(flags):
    for flg in flags:
        if flg.startswith("--"):
            return flg.replace("--", "")
    return flags[0].replace("--", "")


def _set_by_path(tree, keys, value):
    keys = keys.split(";")
    _get_by_path(tree, keys[:-1])[keys[-1]] = value


def _get_by_path(tree, keys):
    return reduce(getitem, keys, tree)
