"""One-command real-weights readiness harness.

The environment this framework was built in has no network egress, so all
parity testing runs against randomly-initialized torch twins. The day real
assets are provisioned, this script validates the full chain in one command:

    VTC_BPE_VOCAB=.../bpe_simple_vocab_16e6.txt.gz \
    VTC_CLIP_WEIGHTS=.../ViT-B-32.pt \
    VTC_DATA_CSV=.../posts.csv VTC_DATA_ROOT=.../media \
        python scripts/verify_real_weights.py

Stages (each runs iff its asset is present, and fails loudly otherwise):

1. **Tokenizer goldens** — canonical openai-CLIP token ids for known strings
   (oracle: ``clip.tokenize`` with the real merges file; the reference's
   tests tokenize with it via ``clip`` at ``tests/test_pretrained_clip.py:20``).
2. **CLIP weight parity** — imports the checkpoint into the flax towers and
   diffs embeddings against the torch model run from the same file
   (TorchScript archive → end-to-end; HF directory → layer-wise via
   ``vtc_tpu.models.parity_harness``). Oracle:
   ``/root/reference/tests/test_pretrained_clip.py:7-42``.
3. **Zero-shot VTC eval** — img+title R@1/5/10 both directions on the VTC
   test split; the four README-published numbers (Table 6a row 1,
   ``README.md:112``) are gated within 0.3 pts.
4. **Table-6a row for a trained checkpoint** (``VTC_CKPT=model_best.pth``,
   optional ``VTC_TABLE6A_ROW=img+title+cmts-2stage``) — the full
   TVR+VTR R@1/5/10 row with comments through the CAM eval forward,
   gated against the named README row when given.
5. **Table-6b video row** (``VTC_VIDEO_CKPT=...``, optional
   ``VTC_TABLE6B_ROW=video+comments-8``) — image-CAM checkpoint
   warm-started into the TimeSformer CAM model (ViT→TimeSformer weight
   surgery + the warm-start key contract) → chunked video eval on the VTC
   test split → the two published VTC R@10 numbers. This is the one
   real-weights flow where layout migration, weight surgery and chunked
   eval compose (``README.md:126-132``).

Each stage function is importable; ``tests/test_real_weights_harness.py``
runs them against the HF-random twin + fallback vocab so the plumbing
cannot rot while the real assets are absent.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Oracle: openai-CLIP `tokenize` with the real bpe_simple_vocab_16e6 merges.
# Structural ids (sot/eot) hold for the fallback vocabulary too.
TOKENIZER_GOLDENS = [
    ("a photo of a cat", [49406, 320, 1125, 539, 320, 2368, 49407]),
    ("a photo of a dog", [49406, 320, 1125, 539, 320, 1929, 49407]),
    ("hello world", [49406, 3306, 1002, 49407]),
]

# Table 6a row 1 (README.md:112): CLIP zero-shot, img+title inference —
# both retrieval directions.
ZERO_SHOT_TARGET = {
    "tvr_r1": 11.1, "tvr_r10": 26.0, "vtr_r1": 11.1, "vtr_r10": 25.3,
}
ZERO_SHOT_TOLERANCE = 0.3

# Table 6a trained rows (README.md:113-120) keyed by the experiment combo a
# provided checkpoint claims to be; used by stage_table6a when
# VTC_TABLE6A_ROW names one. Values: TVR R@1/R@10, VTR R@1/R@10.
TABLE6A_ROWS = {
    "img+title": (15.5, 34.9, 14.4, 33.4),
    "img+title+cmts": (18.0, 43.2, 18.7, 43.9),
    "img+title+cmts-2stage": (28.2, 51.2, 25.1, 49.9),
    "img+title+cmts+audio": (19.6, 45.6, 20.6, 47.2),
}

# Table 6b VTC video rows (README.md:126-132) — only R@10 is published.
# Keyed "{inference}-{nframes}"; values: (VTC VTR R@10, VTC TVR R@10).
TABLE6B_ROWS = {
    "video-1": (28.9, 28.3),
    "video+comments-1": (40.8, 41.0),
    "mean-pooling-8": (19.3, 24.2),
    "video-8": (28.9, 27.6),
    "video+comments-8": (41.5, 41.9),
}


def stage_tokenizer(bpe_path=None) -> dict:
    """Structural checks always; golden-vector checks iff the real merges
    file is loaded (``tokenizer.is_exact``)."""
    from vtc_tpu.data.tokenizer import ClipTokenizer

    tok = ClipTokenizer(bpe_path)
    result = {"is_exact": tok.is_exact, "structural_ok": True, "goldens": []}

    # invariants of both vocabularies
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    arr = np.zeros((2, 77), np.int32)
    for i, text in enumerate(["some text", ""]):
        ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        arr[i, : len(ids)] = ids
    assert arr[0, 0] == 49406 and arr[1, 1] == 49407  # empty -> [sot, eot]

    if tok.is_exact:
        for text, want in TOKENIZER_GOLDENS:
            got = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
            result["goldens"].append(
                {"text": text, "ok": got == want, "got": got, "want": want}
            )
    result["ok"] = result["structural_ok"] and all(
        g["ok"] for g in result["goldens"]
    )
    return result


def _torch_reference_embeds(weights_path, images, tokens):
    """Run the torch model stored at ``weights_path`` (TorchScript archive or
    HF directory) on the same inputs. Returns (img_embeds, txt_embeds,
    torch_model_or_None_for_jit)."""
    import torch

    if os.path.isdir(weights_path):  # HF CLIPModel directory
        from transformers import CLIPModel

        model = CLIPModel.from_pretrained(weights_path).eval()
        with torch.no_grad():
            img = model.get_image_features(
                pixel_values=torch.from_numpy(images)
            )
            txt = model.get_text_features(
                input_ids=torch.from_numpy(tokens).long()
            )
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        return img.numpy(), txt.numpy(), model

    model = torch.jit.load(weights_path, map_location="cpu").float().eval()
    with torch.no_grad():
        img = model.encode_image(torch.from_numpy(images))
        txt = model.encode_text(torch.from_numpy(tokens).long())
    img = img / img.norm(dim=-1, keepdim=True)
    txt = txt / txt.norm(dim=-1, keepdim=True)
    return img.float().numpy(), txt.float().numpy(), None


def stage_clip_parity(
    weights_path, model_type: str = "ViT-B/32", atol: float = 1e-4
) -> dict:
    """Import ``weights_path`` into the flax towers and diff embeddings
    against the torch run of the same file."""
    import jax

    from vtc_tpu.models import CLIP_VARIANTS, ClipModel, create_model
    from vtc_tpu.models.parity_harness import (
        compare_clip_activations,
        format_report,
    )

    module, variables = create_model(
        "PretrainedCLIP", model_type=model_type, clip_weights=(
            weights_path if not os.path.isdir(weights_path) else None
        ),
    )
    v = CLIP_VARIANTS[model_type]
    rng = np.random.default_rng(0)
    images = rng.normal(
        size=(2, 3, v.input_resolution, v.input_resolution)
    ).astype(np.float32)
    tokens = np.zeros((2, v.context_length), np.int32)
    tokens[:, 0] = 49406
    tokens[0, 1:9] = rng.integers(1, 49000, 8)
    tokens[0, 9] = 49407
    tokens[1, 1] = 49407

    if os.path.isdir(weights_path):  # HF: layerwise harness available
        from vtc_tpu.models.torch_import import import_hf_clip

        t_img, t_txt, torch_model = _torch_reference_embeds(
            weights_path, images, tokens
        )
        variables = dict(variables)
        params = dict(variables["params"])
        params["clip"] = import_hf_clip(torch_model.state_dict())
        variables["params"] = params
        layer_report = compare_clip_activations(
            torch_model, ClipModel(variant=v), {"params": params["clip"]},
            images, tokens,
        )
        print(format_report(layer_report))
    else:
        t_img, t_txt, _ = _torch_reference_embeds(weights_path, images, tokens)
        layer_report = None

    j_img, j_txt, _ = jax.jit(module.apply)(variables, images, tokens)
    img_diff = float(np.abs(np.asarray(j_img) - t_img).max())
    txt_diff = float(np.abs(np.asarray(j_txt) - t_txt).max())
    return {
        "img_max_abs": img_diff,
        "txt_max_abs": txt_diff,
        "ok": img_diff < atol and txt_diff < atol,
        "layer_report": layer_report,
    }


def stage_zero_shot(
    csv_file, data_root, weights_path=None, batch_size: int = 64,
    limit=None, image_size: int = 224,
) -> dict:
    """CLIP zero-shot img+title retrieval on the VTC test split vs Table 6a
    row 1. ``limit`` (for plumbing tests) skips the README comparison."""
    import jax
    import jax.numpy as jnp

    from vtc_tpu.data import ImTextDataset
    from vtc_tpu.data.loader import DataLoader
    from vtc_tpu.models import create_model

    # the factory handles both openai .pt archives and HuggingFace CLIPModel
    # directories (models/factory.py routes directories to import_hf_clip)
    module, variables = create_model(
        "PretrainedCLIP", model_type="ViT-B/32", clip_weights=weights_path
    )
    dataset = ImTextDataset(
        csv_file, data_root, train=False, test=True, add_comments="never",
        test_on_over_k_comms=3, test_set_limit=limit or 5000,
        image_size=image_size,
    )
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=False,
        num_workers=2,
    )
    fwd = jax.jit(lambda v, vis, title: module.apply(v, vis, title)[:2])
    vis_all, txt_all = [], []
    for batch in loader:
        vis, title = batch[0], batch[1]
        fv, ft = fwd(variables, jnp.asarray(vis), jnp.asarray(title))
        vis_all.append(np.asarray(fv))
        txt_all.append(np.asarray(ft))
    vis_all = np.concatenate(vis_all)
    txt_all = np.concatenate(txt_all)

    result = {"n": len(vis_all)}
    result.update(_bidirectional_recalls(vis_all, txt_all))
    if limit is None:
        result["ok"] = all(
            abs(result[key] - want) <= ZERO_SHOT_TOLERANCE
            for key, want in ZERO_SHOT_TARGET.items()
        )
    else:
        result["ok"] = True  # plumbing mode: ran end-to-end
    return result


def _bidirectional_recalls(vis_all, txt_all) -> dict:
    """Full R@1/5/10 row, both directions.

    recall_at_k(gallery, queries): text->video ranks the VIDEO gallery for
    each text query (see ops/retrieval.py docstring; the earlier argument
    order silently reported V2T as TVR — a 0.7-pt mislabel vs a 0.3-pt
    tolerance at the Table-6a targets)."""
    from vtc_tpu.ops.retrieval import recall_at_k

    tvr = dict(recall_at_k(vis_all, txt_all, [1, 5, 10]))  # text -> video
    vtr = dict(recall_at_k(txt_all, vis_all, [1, 5, 10]))  # video -> text
    return {
        "tvr_r1": tvr[1] * 100, "tvr_r5": tvr[5] * 100, "tvr_r10": tvr[10] * 100,
        "vtr_r1": vtr[1] * 100, "vtr_r5": vtr[5] * 100, "vtr_r10": vtr[10] * 100,
    }


def stage_table6a(
    csv_file,
    data_root,
    ckpt_path,
    arch: str = "PretrainedCLIP_finaltf",
    model_type: str = "ViT-B/32",
    num_comms: int = 5,
    batch_size: int = 64,
    limit=None,
    image_size: int = 224,
    table_row: str = None,
    branch_override=None,
) -> dict:
    """Full Table-6a row (TVR+VTR R@1/5/10) for a trained checkpoint on the
    real VTC test split — the quality-parity gate for trained models
    (``/root/reference/README.md:110-120``; eval path oracle:
    ``evaluation/eval.py:101-141``).

    ``ckpt_path`` may be a reference ``.pth`` (imported transparently) or a
    vtc_tpu Orbax checkpoint. ``table_row`` names a TABLE6A_ROWS entry to
    gate against (±ZERO_SHOT_TOLERANCE); without it the row is reported
    ungated (the README rows assume specific training recipes the caller
    must know their checkpoint matches)."""
    import jax
    import jax.numpy as jnp

    from vtc_tpu.data import ImTextDataset
    from vtc_tpu.data.loader import DataLoader
    from vtc_tpu.models import create_model
    from vtc_tpu.training.checkpoints import graft_params, load_checkpoint

    if table_row is not None and table_row not in TABLE6A_ROWS:
        # validate BEFORE the multi-minute eval, not at the final lookup
        raise ValueError(
            f"unknown VTC_TABLE6A_ROW {table_row!r}; valid rows: "
            f"{sorted(TABLE6A_ROWS)}"
        )

    module, variables = create_model(arch, model_type=model_type)
    restored = load_checkpoint(ckpt_path)
    params, missing, unexpected = graft_params(
        variables["params"], restored["params"]
    )
    if missing or unexpected:
        raise ValueError(
            f"checkpoint/arch mismatch: missing={missing[:4]} "
            f"unexpected={unexpected[:4]}"
        )
    variables = dict(variables)
    variables["params"] = params
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]

    dataset = ImTextDataset(
        csv_file, data_root, train=False, test=True, add_comments="always",
        num_comms=num_comms, test_on_over_k_comms=3,
        test_set_limit=limit or 5000, image_size=image_size,
    )
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=False,
        num_workers=2,
    )
    fwd = jax.jit(
        lambda v, vis, title, comments: module.apply(
            v, vis, title, comments, branch_override=branch_override
        )[:2],
        static_argnames=(),
    )
    vis_all, txt_all = [], []
    for batch in loader:
        vis, title, comments = batch[0], batch[1], batch[2]
        fv, ft = fwd(
            variables, jnp.asarray(vis), jnp.asarray(title),
            jnp.asarray(comments),
        )
        vis_all.append(np.asarray(fv))
        txt_all.append(np.asarray(ft))
    vis_all = np.concatenate(vis_all)
    txt_all = np.concatenate(txt_all)

    result = {"n": len(vis_all), "ckpt": str(ckpt_path)}
    result.update(_bidirectional_recalls(vis_all, txt_all))
    if table_row and limit is None:
        want = TABLE6A_ROWS[table_row]
        got = (
            result["tvr_r1"], result["tvr_r10"],
            result["vtr_r1"], result["vtr_r10"],
        )
        result["target_row"] = table_row
        result["ok"] = all(
            abs(g - w) <= ZERO_SHOT_TOLERANCE for g, w in zip(got, want)
        )
    else:
        result["ok"] = True
    return result


def stage_table6b(
    csv_file,
    data_root,
    ckpt_path,
    model_type: str = "ViT-B/32",
    num_comms: int = 5,
    limit=None,
    table_row: str = None,
    branch_to_adapt: str = "text",
    dataset=None,
) -> dict:
    """Table-6b VTC video row (``/root/reference/README.md:126-132``): an
    image-CAM checkpoint warm-started into the video model, then chunked
    video eval on the VTC test split — the one real-weights flow where the
    ViT→TimeSformer weight surgery, the warm-start key contract
    (``base_trainer.py:165-176``) and chunked eval
    (``evaluation/retrieval_evaluation.py:174-259``) compose.

    ``ckpt_path``: an image-CAM (``PretrainedCLIP_finaltf``) checkpoint —
    its ViT visual tower goes through
    :func:`timesformer_params_from_clip_visual`; a checkpoint whose visual
    tower is already TimeSformer-shaped grafts directly. ``table_row`` names
    a TABLE6B_ROWS entry; its suffix picks nframes (1 or 8) and its
    inference combo picks the arch and comment branch:

    - ``video-N``: TimeSformer tower, comments skipped at inference
    - ``video+comments-N``: TimeSformer tower + CAM over real comments
    - ``mean-pooling-8``: the frame-averaging baseline — the image model's
      5-D dispatch (mean over frame embeddings), no surgery, no comments

    Only the two VTC columns (VTR/TVR R@10) are published, so only those are
    gated (±ZERO_SHOT_TOLERANCE). ``dataset`` overrides the VTC test-split
    dataset (plumbing tests); ``limit`` skips the README comparison."""
    from vtc_tpu.data.datasets import VideoDatasetReddit
    from vtc_tpu.evaluation import retrieval_evaluation
    from vtc_tpu.models import create_model
    from vtc_tpu.models.clip_model import CLIP_VARIANTS
    from vtc_tpu.models.timesformer import timesformer_params_from_clip_visual
    from vtc_tpu.training.checkpoints import (
        assert_warm_start_keys,
        graft_params,
        load_checkpoint,
    )

    table_row = table_row or "video+comments-8"
    if table_row not in TABLE6B_ROWS:
        # validate BEFORE the multi-minute eval, not at the final lookup
        raise ValueError(
            f"unknown VTC_TABLE6B_ROW {table_row!r}; valid rows: "
            f"{sorted(TABLE6B_ROWS)}"
        )
    combo, nframes = table_row.rsplit("-", 1)
    nframes = int(nframes)
    mean_pooling = combo == "mean-pooling"
    branch_override = None if "+comments" in combo else "skip"

    if mean_pooling:
        module, variables = create_model(
            "PretrainedCLIP_finaltf", model_type=model_type,
            branch_to_adapt_val=branch_to_adapt,
        )
    else:
        module, variables = create_model(
            "PretrainedCLIP_TimeSformer_finaltf", model_type=model_type,
            nframes=nframes, branch_to_adapt_val=branch_to_adapt,
        )

    restored = load_checkpoint(ckpt_path)
    loaded = dict(restored["params"])
    visual = dict(loaded.get("clip", {})).get("visual", {})
    # ViT layout keeps the block stack under visual/transformer/resblocks_i;
    # the TimeSformer layout hoists it to visual/transformer_resblocks_i
    is_image_ckpt = "transformer" in visual
    if is_image_ckpt and not mean_pooling:
        clip = dict(loaded["clip"])
        clip["visual"] = timesformer_params_from_clip_visual(
            visual, CLIP_VARIANTS[model_type], nframes=nframes
        )
        loaded["clip"] = clip
    params, missing, unexpected = graft_params(variables["params"], loaded)
    assert_warm_start_keys(missing, unexpected)
    variables = dict(variables)
    variables["params"] = params
    if restored.get("batch_stats"):
        variables["batch_stats"], _, _ = graft_params(
            variables.get("batch_stats", {}), restored["batch_stats"]
        )

    if dataset is None:
        dataset = VideoDatasetReddit(
            root=data_root, reddit_csv=csv_file, num_comms=num_comms,
            test_set_limit=limit or 5000,
        )

    # the VTC video dataset delivers its (preprocessed) frame set directly,
    # so stride 1; nframes-1 rows take only the first single-frame chunk
    df = retrieval_evaluation(
        module, variables, "Reddit_videos", "test",
        frame_stride=1, nframes=nframes,
        first_chunk_only=(nframes == 1),
        branch_override=branch_override,
        dataset=dataset,
    )
    vtr_col = [c for c in df.columns if "Video to Text" in c][0]
    tvr_col = [c for c in df.columns if "Text to Video" in c][0]
    result = {
        "n": len(dataset), "ckpt": str(ckpt_path), "row": table_row,
        "warm_start": "surgery" if (is_image_ckpt and not mean_pooling)
        else "direct",
        "vtr_r10": float(df.loc["R@10", vtr_col]),
        "tvr_r10": float(df.loc["R@10", tvr_col]),
    }
    if limit is None:
        want_vtr, want_tvr = TABLE6B_ROWS[table_row]
        result["ok"] = (
            abs(result["vtr_r10"] - want_vtr) <= ZERO_SHOT_TOLERANCE
            and abs(result["tvr_r10"] - want_tvr) <= ZERO_SHOT_TOLERANCE
        )
    else:
        result["ok"] = True  # plumbing mode: ran end-to-end
    return result


def main() -> int:
    from vtc_tpu.data.tokenizer import _find_vocab_file

    failures, ran = [], []

    bpe = os.environ.get("VTC_BPE_VOCAB") or _find_vocab_file()
    res = stage_tokenizer(bpe)
    if res["is_exact"]:
        ran.append("tokenizer")
        print(f"[tokenizer] exact vocab, goldens: "
              f"{[(g['text'], g['ok']) for g in res['goldens']]}")
        if not res["ok"]:
            failures.append(("tokenizer", res))
    else:
        print("[tokenizer] SKIPPED goldens — no merges file "
              "(set VTC_BPE_VOCAB); structural checks passed")

    weights = os.environ.get("VTC_CLIP_WEIGHTS")
    if weights and os.path.exists(weights):
        ran.append("clip_parity")
        res = stage_clip_parity(weights)
        print(f"[clip_parity] img max|Δ|={res['img_max_abs']:.2e} "
              f"txt max|Δ|={res['txt_max_abs']:.2e} ok={res['ok']}")
        if not res["ok"]:
            failures.append(("clip_parity", res))
    else:
        print("[clip_parity] SKIPPED — set VTC_CLIP_WEIGHTS")

    csv_file = os.environ.get("VTC_DATA_CSV")
    root = os.environ.get("VTC_DATA_ROOT")
    if csv_file and root and os.path.exists(csv_file) and not (
        weights and os.path.exists(weights)
    ):
        print("[zero_shot] SKIPPED — data present but VTC_CLIP_WEIGHTS "
              "missing (a random-weight run would report a misleading "
              "failure)")
    elif csv_file and root and os.path.exists(csv_file):
        ran.append("zero_shot")
        res = stage_zero_shot(csv_file, root, weights_path=weights)
        print(f"[zero_shot] n={res['n']} TVR R@1={res['tvr_r1']:.1f} "
              f"R@10={res['tvr_r10']:.1f} "
              f"(target {ZERO_SHOT_TARGET['tvr_r1']}/{ZERO_SHOT_TARGET['tvr_r10']}"
              f" ±{ZERO_SHOT_TOLERANCE}) ok={res['ok']}")
        if not res["ok"]:
            failures.append(("zero_shot", res))
    else:
        print("[zero_shot] SKIPPED — set VTC_DATA_CSV + VTC_DATA_ROOT")

    ckpt = os.environ.get("VTC_CKPT")
    if ckpt and os.path.exists(ckpt) and csv_file and root and os.path.exists(csv_file):
        ran.append("table6a")
        res = stage_table6a(
            csv_file, root, ckpt,
            arch=os.environ.get("VTC_CKPT_ARCH", "PretrainedCLIP_finaltf"),
            table_row=os.environ.get("VTC_TABLE6A_ROW"),
        )
        print(
            f"[table6a] n={res['n']} "
            f"TVR R@1/5/10={res['tvr_r1']:.1f}/{res['tvr_r5']:.1f}/{res['tvr_r10']:.1f} "
            f"VTR R@1/5/10={res['vtr_r1']:.1f}/{res['vtr_r5']:.1f}/{res['vtr_r10']:.1f} "
            f"target_row={res.get('target_row')} ok={res['ok']}"
        )
        if not res["ok"]:
            failures.append(("table6a", res))
    else:
        print("[table6a] SKIPPED — set VTC_CKPT (+ VTC_DATA_CSV/VTC_DATA_ROOT; "
              "optional VTC_TABLE6A_ROW to gate against a README row)")

    vckpt = os.environ.get("VTC_VIDEO_CKPT")
    if vckpt and os.path.exists(vckpt) and csv_file and root and os.path.exists(csv_file):
        ran.append("table6b")
        res = stage_table6b(
            csv_file, root, vckpt,
            table_row=os.environ.get("VTC_TABLE6B_ROW"),
        )
        print(
            f"[table6b] n={res['n']} row={res['row']} "
            f"warm_start={res['warm_start']} "
            f"VTR R@10={res['vtr_r10']:.1f} TVR R@10={res['tvr_r10']:.1f} "
            f"(target {TABLE6B_ROWS[res['row']]} ±{ZERO_SHOT_TOLERANCE}) "
            f"ok={res['ok']}"
        )
        if not res["ok"]:
            failures.append(("table6b", res))
    else:
        print("[table6b] SKIPPED — set VTC_VIDEO_CKPT to an image-CAM or "
              "video checkpoint (+ VTC_DATA_CSV/VTC_DATA_ROOT; optional "
              "VTC_TABLE6B_ROW, default video+comments-8)")

    if not ran:
        print("\nNo real assets found; nothing verified. "
              "Provision VTC_BPE_VOCAB / VTC_CLIP_WEIGHTS / VTC_DATA_*.")
        return 2
    if failures:
        print(f"\nFAILED stages: {[f[0] for f in failures]}")
        return 1
    print(f"\nAll executed stages passed: {ran}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
