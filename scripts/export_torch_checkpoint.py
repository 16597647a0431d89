#!/usr/bin/env python
"""Export a vtc_tpu checkpoint as a reference-format torch ``.pth``.

Usage::

    python scripts/export_torch_checkpoint.py saved/models/run/0_.../checkpoint-epoch3 out.pth

The output loads in the reference codebase exactly like its own trainer
saves (``trainer/base_trainer.py:123-140``): ``--resume out.pth`` /
``evaluation/eval.py -r out.pth``. Inverse direction of the ``.pth`` import
``vtc_tpu.training.checkpoints.load_checkpoint`` already supports — together
they make migration bidirectional (docs/MIGRATION.md).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="vtc_tpu (orbax) checkpoint directory")
    ap.add_argument("out", help="output .pth path")
    args = ap.parse_args(argv)

    from vtc_tpu.models.torch_export import save_torch_checkpoint
    from vtc_tpu.training.checkpoints import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    save_torch_checkpoint(
        args.out,
        ckpt["params"],
        ckpt.get("batch_stats"),
        arch=ckpt.get("arch") or "",
        epoch=int(ckpt.get("epoch", 0)),
        monitor_best=float(ckpt.get("monitor_best", 0.0)),
        config=ckpt.get("config"),
    )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
