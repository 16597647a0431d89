"""End-to-end test of the feature-caching script (sharded batch inference ->
{"reddit_ids", "embeddings"} table consumable by load_features)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def test_get_clip_vit_embeddings_script(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    root = tmp_path / "media"
    (root / "v").mkdir(parents=True)
    rows = []
    for i in range(10):
        rid = 1000 + i
        rows.append({"reddit_id": rid, "video_path": f"results/v/x{i}.mp4"})
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(root / "v" / f"x{i}.jpg")
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    out = tmp_path / "feats.npz"
    monkeypatch.setattr(
        sys, "argv",
        ["get_clip_vit_embeddings.py", "--csv", str(csv), "--root", str(root),
         "--out", str(out), "--batch_size", "4", "--num_workers", "0",
         "--model_type", "test-tiny", "--image_size", "32"],
    )
    sys.path.insert(0, str(REPO / "scripts"))
    import importlib

    script = importlib.import_module("get_clip_vit_embeddings")
    script.main()

    with np.load(out) as z:
        ids = z["reddit_ids"]
        emb = z["embeddings"]
    assert list(ids) == [1000 + i for i in range(10)]
    assert emb.shape == (10, 32)
    assert np.isfinite(emb).all()

    # table round-trips through load_features
    from vtc_tpu.data import load_features

    feats = load_features(pd.read_csv(csv), str(out))
    np.testing.assert_allclose(feats, emb)
