"""Plumbing tests for scripts/verify_real_weights.py: every stage runs
end-to-end against the assets available in this environment (HF-random twin,
fallback vocab, synthetic corpus) so the harness cannot rot while the real
CLIP weights / merges file are absent."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import verify_real_weights as vrw  # noqa: E402

BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def test_stage_tokenizer_fallback_structural():
    res = vrw.stage_tokenizer(None)
    assert res["ok"] and not res["is_exact"]
    assert res["goldens"] == []  # goldens wait for the real merges file
    # the golden fixtures themselves are well-formed
    for text, ids in vrw.TOKENIZER_GOLDENS:
        assert ids[0] == 49406 and ids[-1] == 49407 and len(ids) <= 77


def test_stage_clip_parity_hf_dir(tmp_path):
    """The HF-directory branch (layerwise harness + end-to-end diff) on a
    random twin saved to disk — must report fp32-level agreement."""
    pytest.importorskip("transformers")
    import torch
    from transformers import CLIPConfig, CLIPModel

    config = CLIPConfig(
        projection_dim=32,
        text_config=dict(
            vocab_size=49408, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=49407, bos_token_id=49406,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    CLIPModel(config).eval().save_pretrained(tmp_path / "hf_clip")

    res = vrw.stage_clip_parity(str(tmp_path / "hf_clip"), model_type="test-tiny")
    assert res["ok"], res
    assert res["img_max_abs"] < 1e-4 and res["txt_max_abs"] < 1e-4
    assert res["layer_report"] is not None
    assert ("visual", 0) in res["layer_report"]


def test_stage_zero_shot_runs_end_to_end(tmp_path):
    """The zero-shot eval stage on a synthetic corpus (limit mode: plumbing
    only, no README comparison)."""
    rng = np.random.default_rng(0)
    root = tmp_path / "media"
    (root / "vids").mkdir(parents=True)
    rows = []
    for i in range(40):
        rid_str = "ab" + BASE36[(i * 7) % 36] + BASE36[i % 36]
        rid = int(rid_str, 36)
        if any(r["reddit_id"] == rid for r in rows):
            continue
        rows.append({
            "reddit_id": rid,
            "video_path": f"results/vids/{rid_str}.mp4",
            "title": f"topic {i}",
            "video_length": 5.0,
            "comments": str([f"c{i} one", f"c{i} two", f"c{i} three"]),
        })
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(root / "vids" / f"{rid_str}.jpg")
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    import vtc_tpu.models.factory as factory

    orig = factory.create_model

    def tiny_create(arch, **kw):
        kw["model_type"] = "test-tiny"
        return orig(arch, **kw)

    vrw_create = vrw.stage_zero_shot.__globals__  # module-level import site
    try:
        factory.create_model = tiny_create
        import vtc_tpu.models as models_pkg

        models_pkg.create_model = tiny_create
        res = vrw.stage_zero_shot(
            str(csv), str(root), limit=8, batch_size=4, image_size=32
        )
    finally:
        factory.create_model = orig
        import vtc_tpu.models as models_pkg

        models_pkg.create_model = orig
    assert res["ok"] and res["n"] > 0
    for k in ("tvr_r1", "tvr_r10", "vtr_r1", "vtr_r10"):
        assert 0.0 <= res[k] <= 100.0
    del vrw_create


def test_factory_warns_on_real_weights_with_fallback_vocab(tmp_path, caplog):
    """create_model must warn loudly when importing real weights while the
    tokenizer is the fallback vocabulary (VERDICT r1 weak #4)."""
    import logging

    import torch

    from vtc_tpu.data.tokenizer import get_tokenizer
    from vtc_tpu.models import create_model
    from vtc_tpu.models.clip_model import CLIP_VARIANTS

    assert not get_tokenizer().is_exact  # environment has no merges file

    # minimal openai-format state dict for the tiny variant
    v = CLIP_VARIANTS["test-tiny"]
    module, variables = create_model("PretrainedCLIP", model_type="test-tiny")
    from vtc_tpu.models.torch_import import import_openai_clip  # noqa: F401

    # build an openai-style checkpoint by exporting our random params
    sd = {}
    grid = v.input_resolution // v.patch_size

    p = variables["params"]["clip"]

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    # our conv1 operand is the OIHW kernel flattened to (O, I*H*W)
    sd["visual.conv1.weight"] = t(p["visual"]["conv1"]).reshape(
        v.vision_width, 3, v.patch_size, v.patch_size
    )
    sd["visual.class_embedding"] = t(p["visual"]["class_embedding"])
    sd["visual.positional_embedding"] = t(p["visual"]["positional_embedding"])
    sd["visual.ln_pre.weight"] = t(p["visual"]["ln_pre"]["scale"])
    sd["visual.ln_pre.bias"] = t(p["visual"]["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = t(p["visual"]["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = t(p["visual"]["ln_post"]["bias"])
    sd["visual.proj"] = t(p["visual"]["proj"])
    for i in range(v.vision_layers):
        b = p["visual"]["transformer"][f"resblocks_{i}"]
        pre = f"visual.transformer.resblocks.{i}"
        _export_block(sd, pre, b, t)
    sd["text_projection"] = t(p["text"]["text_projection"])
    sd["token_embedding.weight"] = t(p["text"]["token_embedding"])
    sd["positional_embedding"] = t(p["text"]["positional_embedding"])
    sd["ln_final.weight"] = t(p["text"]["ln_final"]["scale"])
    sd["ln_final.bias"] = t(p["text"]["ln_final"]["bias"])
    sd["logit_scale"] = t(p["logit_scale"]).reshape(())
    for i in range(v.text_layers):
        b = p["text"]["transformer"][f"resblocks_{i}"]
        _export_block(sd, f"transformer.resblocks.{i}", b, t)
    del grid

    ckpt = tmp_path / "tiny_clip.pth"
    torch.save(sd, ckpt)

    with caplog.at_level(logging.WARNING, logger="vtc_tpu.models.factory"):
        create_model(
            "PretrainedCLIP", model_type="test-tiny", clip_weights=str(ckpt)
        )
    assert any("FALLBACK" in rec.message for rec in caplog.records)


def _export_block(sd, pre, b, t):
    from vtc_tpu.models.torch_import import qkv_to_torch

    sd[f"{pre}.attn.in_proj_weight"] = t(qkv_to_torch(b["attn"]["in_proj_weight"]))
    sd[f"{pre}.attn.in_proj_bias"] = t(qkv_to_torch(b["attn"]["in_proj_bias"]))
    sd[f"{pre}.attn.out_proj.weight"] = t(b["attn"]["out_proj"]["kernel"]).T
    sd[f"{pre}.attn.out_proj.bias"] = t(b["attn"]["out_proj"]["bias"])
    sd[f"{pre}.ln_1.weight"] = t(b["ln_1"]["scale"])
    sd[f"{pre}.ln_1.bias"] = t(b["ln_1"]["bias"])
    sd[f"{pre}.ln_2.weight"] = t(b["ln_2"]["scale"])
    sd[f"{pre}.ln_2.bias"] = t(b["ln_2"]["bias"])
    sd[f"{pre}.mlp.c_fc.weight"] = t(b["mlp"]["c_fc"]["kernel"]).T
    sd[f"{pre}.mlp.c_fc.bias"] = t(b["mlp"]["c_fc"]["bias"])
    sd[f"{pre}.mlp.c_proj.weight"] = t(b["mlp"]["c_proj"]["kernel"]).T
    sd[f"{pre}.mlp.c_proj.bias"] = t(b["mlp"]["c_proj"]["bias"])


@pytest.mark.slow
def test_stage_table6a_runs_end_to_end(tmp_path):
    """The trained-checkpoint Table-6a stage on a synthetic corpus + tiny
    Orbax checkpoint (limit mode: plumbing only, no README comparison)."""
    rng = np.random.default_rng(1)
    root = tmp_path / "media"
    (root / "vids").mkdir(parents=True)
    rows = []
    for i in range(40):
        rid_str = "cd" + BASE36[(i * 11) % 36] + BASE36[i % 36]
        rid = int(rid_str, 36)
        if any(r["reddit_id"] == rid for r in rows):
            continue
        rows.append({
            "reddit_id": rid,
            "video_path": f"results/vids/{rid_str}.mp4",
            "title": f"topic {i}",
            "video_length": 5.0,
            "comments": str([f"c{i} one", f"c{i} two", f"c{i} three"]),
        })
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(root / "vids" / f"{rid_str}.jpg")
    csv = tmp_path / "posts.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    from vtc_tpu.models import create_model
    from vtc_tpu.training.checkpoints import save_checkpoint

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", seed=3
    )
    save_checkpoint(
        tmp_path, "model_best", arch="PretrainedCLIP_finaltf", epoch=1,
        params=variables["params"], opt_state=None,
        config={"arch": {"type": "PretrainedCLIP_finaltf"}},
    )

    res = vrw.stage_table6a(
        str(csv), str(root), str(tmp_path / "model_best"),
        model_type="test-tiny", limit=8, batch_size=4, image_size=32,
    )
    assert res["ok"] and res["n"] >= 4
    for key in ("tvr_r1", "tvr_r5", "tvr_r10", "vtr_r1", "vtr_r5", "vtr_r10"):
        assert 0.0 <= res[key] <= 100.0


class _TinyVideoDataset:
    """Items in VideoDatasetReddit's format — (frames[8,3,r,r] float,
    captions[1,77], comments[k,77], id) — at the test-tiny resolution (the
    real dataset preprocesses at 224, which only fits the full variants)."""

    def __init__(self, n=12, res=32, seed=0):
        self.rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            frames = self.rng.normal(size=(8, 3, res, res)).astype(np.float32)
            caps = np.zeros((1, 77), np.int32)
            caps[0, 0], caps[0, 1 + i % 5] = 49406, 49407
            caps[0, 1:1 + i % 5] = self.rng.integers(1, 49000, i % 5)
            comms = np.zeros((3, 77), np.int32)
            comms[:, 0], comms[:, 2] = 49406, 49407
            comms[:, 1] = self.rng.integers(1, 49000, 3)
            self.items.append((frames, caps, comms, i))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.mark.slow
def test_stage_table6b_runs_end_to_end(tmp_path):
    """Image-CAM checkpoint -> ViT→TimeSformer surgery -> warm-start key
    contract -> chunked video eval, as ONE flow (VERDICT r3 item 3). Also
    the mean-pooling row (direct graft, 5-D averaging dispatch)."""
    from vtc_tpu.models import create_model
    from vtc_tpu.training.checkpoints import save_checkpoint

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", seed=5
    )
    save_checkpoint(
        tmp_path, "img_cam", arch="PretrainedCLIP_finaltf", epoch=1,
        params=variables["params"], opt_state=None,
        config={"arch": {"type": "PretrainedCLIP_finaltf"}},
    )
    ckpt = str(tmp_path / "img_cam")
    ds = _TinyVideoDataset()

    res = vrw.stage_table6b(
        None, None, ckpt, model_type="test-tiny", limit=8,
        table_row="video+comments-8", dataset=ds,
    )
    assert res["ok"] and res["warm_start"] == "surgery"
    assert 0.0 <= res["vtr_r10"] <= 100.0 and 0.0 <= res["tvr_r10"] <= 100.0

    # comments-skipped row: same surgery path, branch_override="skip"
    res = vrw.stage_table6b(
        None, None, ckpt, model_type="test-tiny", limit=8,
        table_row="video-8", dataset=ds,
    )
    assert res["ok"] and res["warm_start"] == "surgery"

    # mean-pooling baseline: image arch, NO surgery, frames mean-pooled by
    # the 5-D dispatch
    res = vrw.stage_table6b(
        None, None, ckpt, model_type="test-tiny", limit=8,
        table_row="mean-pooling-8", dataset=ds,
    )
    assert res["ok"] and res["warm_start"] == "direct"


def test_stage_table6b_validates_row_before_eval(tmp_path):
    with pytest.raises(ValueError, match="VTC_TABLE6B_ROW"):
        vrw.stage_table6b(
            tmp_path / "missing.csv", tmp_path, tmp_path / "missing.ckpt",
            table_row="video+cmts-8",
        )


def test_stage_table6a_validates_row_before_eval(tmp_path):
    """A VTC_TABLE6A_ROW typo must fail before the multi-minute eval (and
    name the valid rows), not at the final lookup."""
    with pytest.raises(ValueError, match="VTC_TABLE6A_ROW"):
        vrw.stage_table6a(
            tmp_path / "missing.csv", tmp_path, tmp_path / "missing.ckpt",
            table_row="img+title+cmts-2stage ",
        )


def test_factory_loads_hf_clip_directory(tmp_path):
    """create_model(clip_weights=<HF dir>) — and therefore the
    VTC_CLIP_WEIGHTS env var pointing at an HF snapshot — routes through
    import_hf_clip instead of crashing in torch.load(directory)."""
    pytest.importorskip("transformers")
    import torch
    from transformers import CLIPConfig, CLIPModel

    config = CLIPConfig(
        projection_dim=32,
        text_config=dict(
            vocab_size=49408, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=49407, bos_token_id=49406,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    hf = CLIPModel(config).eval()
    hf.save_pretrained(tmp_path / "hf_clip")

    from vtc_tpu.models import create_model
    from vtc_tpu.models.torch_import import import_hf_clip

    _, variables = create_model(
        "PretrainedCLIP", model_type="test-tiny",
        clip_weights=str(tmp_path / "hf_clip"),
    )
    want = import_hf_clip(hf.state_dict())
    got = variables["params"]["clip"]
    np.testing.assert_allclose(
        np.asarray(got["visual"]["proj"]), np.asarray(want["visual"]["proj"]),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(got["text"]["text_projection"]),
        np.asarray(want["text"]["text_projection"]), atol=0,
    )


def test_clip_audio_ckpt_ignored_without_init_audio_model(tmp_path):
    """The reference loads CLIP from clip_audio_ckpt only inside
    'if self.init_audio_model:' (model/model.py:409-435); with
    init_audio_model=False the (possibly invalid) ckpt must not be touched."""
    bad = tmp_path / "retrieval_ckpt.pth"
    bad.write_bytes(b"not a torch file at all")

    from vtc_tpu.models import create_model

    # init_audio_model defaults to False on the CAM models: must not load
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny",
        clip_audio_ckpt=str(bad),
    )
    assert variables["params"]["clip"] is not None

    # with init_audio_model=True the path IS consulted and the garbage file
    # fails loudly
    with pytest.raises(Exception):
        create_model(
            "PretrainedCLIP_finaltf", model_type="test-tiny",
            clip_audio_ckpt=str(bad), init_audio_model=True,
        )
