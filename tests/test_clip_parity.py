"""Numerical parity of the JAX CLIP towers against HuggingFace's torch
CLIPModel (quick_gelu config, random weights).

This is the TPU-build analogue of the reference's
``tests/test_pretrained_clip.py:7-42`` equivalence test: instead of comparing
against downloaded openai weights (no network egress here), both
implementations are driven with the same randomly-initialized weights and
must agree to fp32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.models.clip_model import ClipModel, ClipVariant
from vtc_tpu.models.torch_import import (
    import_hf_clip,
    import_openai_clip,
    qkv_to_torch,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


VOCAB = 512
EOT = VOCAB - 1
SOT = VOCAB - 2


def _small_hf_clip():
    from transformers import CLIPConfig, CLIPModel

    config = CLIPConfig(
        projection_dim=32,
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
            hidden_act="quick_gelu",
            eos_token_id=EOT,
            bos_token_id=SOT,
        ),
        vision_config=dict(
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    return CLIPModel(config).eval()


def _small_variant():
    return ClipVariant(
        input_resolution=32,
        patch_size=8,
        vision_width=64,
        vision_layers=2,
        vision_heads=4,
        embed_dim=32,
        text_width=64,
        text_layers=2,
        text_heads=4,
        context_length=77,
        vocab_size=VOCAB,
    )


def _random_tokens(rng, batch=3, seq=77, n_real=9):
    toks = np.zeros((batch, seq), dtype=np.int32)
    for b in range(batch):
        toks[b, 0] = SOT
        toks[b, 1 : 1 + n_real] = rng.integers(1, VOCAB - 2, n_real)
        toks[b, 1 + n_real] = EOT
    return toks


@pytest.fixture(scope="module")
def models():
    hf = _small_hf_clip()
    params = import_hf_clip(hf.state_dict())
    model = ClipModel(variant=_small_variant())
    return hf, model, {"params": params}


def test_image_tower_parity(models):
    hf, model, variables = models
    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(images)).numpy()

    ours = model.apply(variables, jnp.asarray(images), method=ClipModel.encode_image)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_text_tower_parity(models):
    hf, model, variables = models
    rng = np.random.default_rng(1)
    toks = _random_tokens(rng)

    with torch.no_grad():
        ref = hf.get_text_features(
            input_ids=torch.from_numpy(toks).long()
        ).numpy()

    ours = model.apply(variables, jnp.asarray(toks), method=ClipModel.encode_text)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_openai_format_roundtrip(models):
    """Export HF weights to openai naming, re-import through the openai
    importer, and verify the text tower still matches (exercises the
    openai-format mapping without needing openai weights)."""
    hf, model, variables = models
    p = variables["params"]

    sd = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr)
        sd[key] = torch.from_numpy(a.T.copy() if transpose else a.copy())

    # visual
    v = p["visual"]
    w = np.asarray(v["conv1"])  # (width, 3*p*p)
    sd["visual.conv1.weight"] = torch.from_numpy(w.reshape(w.shape[0], 3, 8, 8).copy())
    put("visual.class_embedding", v["class_embedding"])
    put("visual.positional_embedding", v["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        put(f"visual.{ln}.weight", v[ln]["scale"])
        put(f"visual.{ln}.bias", v[ln]["bias"])
    put("visual.proj", v["proj"])
    for i, blk in enumerate([v["transformer"][f"resblocks_{j}"] for j in range(2)]):
        pre = f"visual.transformer.resblocks.{i}"
        put(f"{pre}.attn.in_proj_weight",
            qkv_to_torch(blk["attn"]["in_proj_weight"]))
        put(f"{pre}.attn.in_proj_bias",
            qkv_to_torch(blk["attn"]["in_proj_bias"]))
        put(f"{pre}.attn.out_proj.weight", blk["attn"]["out_proj"]["kernel"], transpose=True)
        put(f"{pre}.attn.out_proj.bias", blk["attn"]["out_proj"]["bias"])
        for ln in ("ln_1", "ln_2"):
            put(f"{pre}.{ln}.weight", blk[ln]["scale"])
            put(f"{pre}.{ln}.bias", blk[ln]["bias"])
        for fc in ("c_fc", "c_proj"):
            put(f"{pre}.mlp.{fc}.weight", blk["mlp"][fc]["kernel"], transpose=True)
            put(f"{pre}.mlp.{fc}.bias", blk["mlp"][fc]["bias"])
    # text
    t = p["text"]
    put("token_embedding.weight", t["token_embedding"])
    put("positional_embedding", t["positional_embedding"])
    put("ln_final.weight", t["ln_final"]["scale"])
    put("ln_final.bias", t["ln_final"]["bias"])
    put("text_projection", t["text_projection"])
    for i, blk in enumerate([t["transformer"][f"resblocks_{j}"] for j in range(2)]):
        pre = f"transformer.resblocks.{i}"
        put(f"{pre}.attn.in_proj_weight",
            qkv_to_torch(blk["attn"]["in_proj_weight"]))
        put(f"{pre}.attn.in_proj_bias",
            qkv_to_torch(blk["attn"]["in_proj_bias"]))
        put(f"{pre}.attn.out_proj.weight", blk["attn"]["out_proj"]["kernel"], transpose=True)
        put(f"{pre}.attn.out_proj.bias", blk["attn"]["out_proj"]["bias"])
        for ln in ("ln_1", "ln_2"):
            put(f"{pre}.{ln}.weight", blk[ln]["scale"])
            put(f"{pre}.{ln}.bias", blk[ln]["bias"])
        for fc in ("c_fc", "c_proj"):
            put(f"{pre}.mlp.{fc}.weight", blk["mlp"][fc]["kernel"], transpose=True)
            put(f"{pre}.mlp.{fc}.bias", blk["mlp"][fc]["bias"])
    put("logit_scale", p["logit_scale"])

    p2 = import_openai_clip(sd)

    import jax

    flat1 = jax.tree_util.tree_leaves_with_path(p)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert len(flat1) == len(flat2)
    for (k1, a1), (k2, a2) in zip(sorted(flat1, key=str), sorted(flat2, key=str)):
        assert str(k1) == str(k2)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_param_shapes_match_init(models):
    """Imported tree is structurally identical to a fresh init (guards against
    silent key drift that flax would mask)."""
    import jax

    hf, model, variables = models
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, 32, 32), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    assert ref_shapes == got_shapes


@pytest.mark.slow
def test_bf16_close_to_fp32():
    """The bf16 deployment config must track the fp32 model closely on
    normalized embeddings (cosine > 0.995)."""
    import jax

    from vtc_tpu.models import create_model

    m32, v32 = create_model("PretrainedCLIP", model_type="test-tiny", seed=0)
    mbf, vbf = create_model(
        "PretrainedCLIP", model_type="test-tiny", seed=0, dtype="bf16"
    )
    # same init seed -> identical fp32 params
    for a, b in zip(
        jax.tree_util.tree_leaves(v32["params"]),
        jax.tree_util.tree_leaves(vbf["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(4, 3, 32, 32)).astype(np.float32))
    title = jnp.asarray(
        rng.integers(1, 49405, size=(4, 77)).astype(np.int32)
    )
    f32 = m32.apply(v32, vis, title)
    fbf = mbf.apply(vbf, vis, title)
    for a, b in zip(f32[:2], fbf[:2]):  # normalized embeddings
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1)
        assert (cos > 0.995).all(), cos


def test_activation_diff_harness(models):
    """The layerwise parity harness aligns every block and reports fp32-level
    diffs on the HF twin."""
    from vtc_tpu.models.parity_harness import (
        compare_clip_activations,
        format_report,
    )

    hf, model, variables = models
    rng = np.random.default_rng(2)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    toks = _random_tokens(rng, batch=2)

    report = compare_clip_activations(hf, model, variables, images, toks)
    # every vision/text block + final embeddings aligned
    keys = set(report)
    assert ("visual", 0) in keys and ("visual", 1) in keys
    assert ("text", 0) in keys and ("text", 1) in keys
    assert ("visual", "embed") in keys and ("text", "embed") in keys
    for key, stats in report.items():
        assert "max_abs" in stats, (key, stats)
        assert stats["max_abs"] < 1e-4, (key, stats)
    text = format_report(report)
    assert "visual.embed" in text
