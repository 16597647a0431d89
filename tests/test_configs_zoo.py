"""Every shipped config must stay loadable and internally consistent.

BASELINE.json requires the same `configs/*.jsonc` surface as the reference;
these are the files users actually launch. For each one: parse the JSONC,
check the declared arch/loss/metrics/scheduler resolve against the real
registries, and construct the arch (downsized to the test-tiny variant) so
arg names can't rot.
"""

import pathlib

import jax.numpy as jnp
import pytest

from vtc_tpu.config.parse_config import ConfigParser
from vtc_tpu.models import create_model
from vtc_tpu.models.factory import ARCHS
from vtc_tpu.ops import losses
from vtc_tpu.training import metrics as metrics_mod
from vtc_tpu.utils.jsonc import read_json

CONFIG_DIR = pathlib.Path(__file__).parent.parent / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*.jsonc"))


def test_config_zoo_is_nonempty():
    # the reference's 7 configs + the frozen-CAM MoE-adapter variant
    assert len(CONFIGS) == 8, [c.name for c in CONFIGS]


def test_moe_config_surfaces_aux_loss_weight(tmp_path):
    """The router's load-balance weight is a config knob (consumed by
    Trainer -> make_step_fns), not a hardcoded constant."""
    cfg = read_json(CONFIG_DIR / "pretrained_clip_comments_attn_moe.jsonc")
    assert cfg["moe_aux_loss_weight"] == 0.01  # Switch-Transformer default

    import inspect

    from vtc_tpu.training.trainer import Trainer, make_step_fns

    assert "aux_loss_weight" in inspect.signature(make_step_fns).parameters
    src = inspect.getsource(Trainer.__init__)
    assert "moe_aux_loss_weight" in src


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_config_loads_and_constructs(path, tmp_path):
    cfg = read_json(path)

    # required reference sections (utils/parse_config.py contract)
    for section in ("name", "arch", "dataset", "optimizer", "loss",
                    "metrics", "lr_scheduler", "trainer"):
        assert section in cfg, (path.name, section)

    # arch resolves and constructs with its declared args (tiny variant)
    arch = cfg["arch"]
    assert arch["type"] in ARCHS, arch["type"]
    args = dict(arch["args"])
    args["model_type"] = "test-tiny"
    # audio configs point at real checkpoint paths; construction must not
    # require them (factory accepts-and-defers like the reference)
    module, variables = create_model(arch["type"], seed=0, **args)
    assert variables["params"]

    # loss + metrics resolve against the registries
    assert hasattr(losses, cfg["loss"]), cfg["loss"]
    for m in cfg["metrics"]:
        assert hasattr(metrics_mod, m["type"]), m["type"]

    # scheduler type is one the optimizer builder understands
    assert cfg["lr_scheduler"]["type"] in ("StepLR",), cfg["lr_scheduler"]

    # monitor string follows "min|max <metric>"
    mode, _, key = cfg["trainer"]["monitor"].partition(" ")
    assert mode in ("min", "max") and key

    # the ConfigParser end-to-end path (run-dir creation, write-back)
    cfg2 = dict(cfg)
    cfg2["trainer"] = dict(cfg["trainer"], save_dir=str(tmp_path))
    parser = ConfigParser(cfg2, run_id="t")
    assert parser["arch"]["type"] == arch["type"]
    assert (parser.save_dir / "config.json").exists()
