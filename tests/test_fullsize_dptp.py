"""One dp4×tp2 train step at real ViT-B/32 dimensions (VERDICT r2 #7).

Slow (~5 min single-core: XLA CPU compile of the full 151M-param train
step dominates) — gated behind ``VTC_SLOW=1``; CI and the default suite
skip it. Run directly via ``python scripts/dryrun_fullsize.py``.
"""

import os

import pytest


@pytest.mark.skipif(
    os.environ.get("VTC_SLOW") != "1",
    reason="full-size dp×tp step is slow; set VTC_SLOW=1 (or run "
    "scripts/dryrun_fullsize.py)",
)
def test_fullsize_dp4tp2_step():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import dryrun_fullsize

    loss = dryrun_fullsize.run(tp=2)
    assert loss > 0
