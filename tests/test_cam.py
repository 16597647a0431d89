"""CAM semantics tests — TPU-build ports of the reference's
``tests/test_pretrained_clip.py`` plus the zero-init and residual-activation
invariants it leaves implicit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.data import tokenizer as tk
from vtc_tpu.models import create_model
from vtc_tpu.models.cam import ContextAdapter, squash, zero_init_cam_params
from vtc_tpu.models.layers import l2_normalize

TINY = "test-tiny"
RES = 32
DIM = 32


def _rngs(seed=0):
    return {
        "adapter_skip": jax.random.PRNGKey(seed + 10),
        "comment_mask": jax.random.PRNGKey(seed + 20),
        "dropout": jax.random.PRNGKey(seed + 30),
    }


def _inputs(batch=4, ncomms=3, seed=0):
    rng = np.random.default_rng(seed)
    vis = rng.normal(size=(batch, 3, RES, RES)).astype(np.float32)
    title = tk.tokenize(["a cat video"] * batch)
    comments = np.stack(
        [tk.tokenize(["nice", "wow great", ""][:ncomms]) for _ in range(batch)]
    )
    return jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments)


@pytest.fixture(scope="module")
def finaltf():
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=TINY, seed=0
    )
    return module, variables


@pytest.fixture(scope="module")
def plain_clip():
    module, variables = create_model("PretrainedCLIP", model_type=TINY, seed=0)
    return module, variables


def test_skip_branch_is_plain_clip(finaltf, plain_clip):
    """Port of test_pretrained_clip.py:22-42: with branch 'skip' the CAM
    model is exactly the plain CLIP wrapper (shared tower weights)."""
    module, variables = finaltf
    plain_module, plain_vars = plain_clip

    # graft identical clip weights
    pv = jax.tree_util.tree_map(np.asarray, plain_vars)
    pv["params"]["clip"] = variables["params"]["clip"]

    vis, title, comments = _inputs()
    fv1, ft1, sim1 = module.apply(
        variables, vis, title, comments, branch_override="skip"
    )
    fv2, ft2, sim2 = plain_module.apply(pv, vis, title)

    np.testing.assert_allclose(np.asarray(fv1), np.asarray(fv2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ft1), np.asarray(ft2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sim1), np.asarray(sim2), atol=1e-4)


def test_branch_to_adapt(finaltf):
    """Port of test_pretrained_clip.py:45-85: only the adapted branch
    changes; the image branch is invariant to the title when adapting
    image."""
    module, variables = finaltf
    vis, title, comments = _inputs()
    fv_skip, ft_skip, _ = module.apply(
        variables, vis, title, comments, branch_override="skip"
    )

    fv_t, ft_t, _ = module.apply(
        variables, vis, title, comments, branch_override="text"
    )
    np.testing.assert_allclose(np.asarray(fv_t), np.asarray(fv_skip), atol=1e-6)
    assert not np.allclose(np.asarray(ft_t), np.asarray(ft_skip), atol=1e-4)

    fv_i, ft_i, _ = module.apply(
        variables, vis, title, comments, branch_override="image"
    )
    np.testing.assert_allclose(np.asarray(ft_i), np.asarray(ft_skip), atol=1e-6)
    assert not np.allclose(np.asarray(fv_i), np.asarray(fv_skip), atol=1e-4)

    # image features invariant to a different title when adapting image
    title2 = jnp.asarray(tk.tokenize(["completely different words"] * 4))
    fv_i2, _, _ = module.apply(
        variables, vis, title2, comments, branch_override="image"
    )
    np.testing.assert_allclose(np.asarray(fv_i), np.asarray(fv_i2), atol=1e-6)


def test_zero_init_cam_is_average():
    """With init_from_avg zero-init the adapter transformer is the identity,
    so the residual is exactly normalize(mean(normalize(stack)))
    (model/model.py:150-159,440-452)."""
    cam = ContextAdapter(feature_dim=DIM, n_layers=2, n_heads=4)
    rng = np.random.default_rng(0)
    main = rng.normal(size=(4, DIM)).astype(np.float32)
    aux = rng.normal(size=(3, 4, DIM)).astype(np.float32)

    params = cam.init(
        {"params": jax.random.PRNGKey(0), **_rngs()}, jnp.asarray(main),
        jnp.asarray(aux),
    )["params"]
    params = zero_init_cam_params(dict(params), 2, True)

    out = cam.apply({"params": params}, jnp.asarray(main), jnp.asarray(aux))

    stack = np.concatenate([main[None], aux], axis=0)
    stack = stack / np.linalg.norm(stack, axis=-1, keepdims=True)
    res = np.mean(stack, axis=0)
    res = res / np.linalg.norm(res, axis=-1, keepdims=True)
    mainn = main / np.linalg.norm(main, axis=-1, keepdims=True)
    expected = mainn + res
    expected = expected / np.linalg.norm(expected, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_empty_comment_uses_mask_embedding(finaltf):
    """Two different empty comments must contribute identically (both map to
    the learned mask embedding, model/model.py:207-214)."""
    module, variables = finaltf
    vis, title, _ = _inputs(batch=2)
    empty2 = jnp.asarray(np.stack([tk.tokenize(["", ""]) for _ in range(2)]))
    empty3 = jnp.asarray(np.stack([tk.tokenize(["", "", ""]) for _ in range(2)]))
    # adapting with 2 vs 3 empty comments: stack mean changes, so just check
    # determinism and that two all-empty sets of the same size agree
    _, ft_a, _ = module.apply(variables, vis, title, empty2)
    _, ft_b, _ = module.apply(variables, vis, title, empty2)
    np.testing.assert_allclose(np.asarray(ft_a), np.asarray(ft_b), atol=1e-7)
    _, ft_c, _ = module.apply(variables, vis, title, empty3)
    assert np.asarray(ft_c).shape == np.asarray(ft_a).shape


def test_random_skip_adapter_train_mode(finaltf):
    """In train mode with random_skip_adapter, ~half the rows keep the
    unadapted (but normalized) embedding (model/model.py:199-203)."""
    module, variables = finaltf
    vis, title, comments = _inputs(batch=16)
    _, ft_skip, _ = module.apply(
        variables, vis, title, comments, branch_override="skip"
    )
    _, ft_train, _ = module.apply(
        variables, vis, title, comments, train=True, rngs=_rngs(3)
    )
    # rows where the residual was zeroed equal normalize(normalize(title)):
    skipn = np.asarray(l2_normalize(l2_normalize(ft_skip)))
    train_out = np.asarray(ft_train)
    matches = np.isclose(train_out, skipn, atol=1e-5).all(axis=-1).sum()
    assert 1 <= matches <= 15  # p=0.5 per row over 16 rows


def test_squash_bounds():
    x = np.random.default_rng(0).normal(size=(8, DIM)).astype(np.float32) * 10
    out = np.asarray(squash(jnp.asarray(x)))
    norms = np.linalg.norm(out, axis=-1)
    assert (norms < 1.0).all()


@pytest.mark.parametrize("act", ["sub_mean", "bn"])
def test_stateful_residual_activations(act):
    cam = ContextAdapter(
        feature_dim=DIM, n_layers=1, n_heads=4, residual_activation=act,
        random_skip_adapter=False,
    )
    rng = np.random.default_rng(1)
    main = jnp.asarray(rng.normal(size=(8, DIM)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(2, 8, DIM)).astype(np.float32))
    variables = cam.init({"params": jax.random.PRNGKey(0), **_rngs()}, main, aux)
    assert "batch_stats" in variables

    out, updates = cam.apply(
        variables, main, aux, True, False, mutable=["batch_stats"],
        rngs=_rngs(1),
    )
    # running stats moved away from init
    assert not np.allclose(
        np.asarray(updates["batch_stats"]["cam"]["mean"])
        if "cam" in updates["batch_stats"]
        else np.asarray(updates["batch_stats"]["mean"]),
        0.0,
    )
    # eval mode uses running stats, is deterministic
    out_eval = cam.apply(variables, main, aux, False, False)
    out_eval2 = cam.apply(variables, main, aux, False, False)
    np.testing.assert_allclose(
        np.asarray(out_eval), np.asarray(out_eval2), atol=1e-7
    )


def test_comment_fusion_averaging(plain_clip):
    """PretrainedCLIP 'averaging' fusion (model/model.py:349-364)."""
    module, variables = create_model(
        "PretrainedCLIP", model_type=TINY, comment_fusion="averaging"
    )
    vis, title, comments = _inputs()
    fv, ft, sim = module.apply(variables, vis, title, comments)
    fv2, ft2, _ = module.apply(variables, vis, title)  # no comments
    np.testing.assert_allclose(np.asarray(fv), np.asarray(fv2), atol=1e-6)
    assert not np.allclose(np.asarray(ft), np.asarray(ft2), atol=1e-4)
    # normalized outputs
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ft), axis=-1), 1.0, atol=1e-5
    )


def test_precomputed_feature_passthrough(finaltf):
    """2-D visual input is treated as a precomputed feature
    (model/model.py:459-461)."""
    module, variables = finaltf
    _, title, comments = _inputs()
    feats = np.random.default_rng(0).normal(size=(4, DIM)).astype(np.float32)
    fv, _, _ = module.apply(
        variables, jnp.asarray(feats), title, comments, branch_override="skip"
    )
    expected = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(fv), expected, atol=1e-6)


def test_video_frame_mean(plain_clip):
    """5-D visual input takes the frame mean (model/model.py:334-338)."""
    module, variables = plain_clip
    rng = np.random.default_rng(0)
    frame = rng.normal(size=(2, 1, 3, RES, RES)).astype(np.float32)
    vid = np.tile(frame, (1, 4, 1, 1, 1))
    title = jnp.asarray(tk.tokenize(["a", "b"]))
    fv_vid, _, _ = module.apply(variables, jnp.asarray(vid), title)
    fv_img, _, _ = module.apply(variables, jnp.asarray(frame[:, 0]), title)
    np.testing.assert_allclose(
        np.asarray(fv_vid), np.asarray(fv_img), atol=1e-5
    )


def test_shared_comments_broadcast_matches_tiled(finaltf):
    """A size-1 comment batch must produce EXACTLY the embeddings of the
    same comments tiled per row (the transfer-eval dedup path: one encode
    of the 5 shared comments, features broadcast across captions)."""
    module, variables = finaltf
    vis, title, comments = _inputs()
    shared = comments[:1]  # [1, nc, ntoks]
    tiled = jnp.broadcast_to(shared, comments.shape)

    fv_t, ft_t, _ = module.apply(variables, vis, title, tiled)
    fv_s, ft_s, _ = module.apply(variables, vis, title, shared)
    np.testing.assert_allclose(
        np.asarray(ft_s), np.asarray(ft_t), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fv_s), np.asarray(fv_t), atol=1e-6
    )


def test_bn_activation_rejects_singleton_train_batch():
    """torch BatchNorm1d raises on batch 1 ('Expected more than 1 value per
    channel'); silently accepting it decays the running var toward 0 and
    blows up eval residuals."""
    cam = ContextAdapter(feature_dim=DIM, residual_activation="bn")
    rng = np.random.default_rng(0)
    variables = cam.init(
        {"params": jax.random.PRNGKey(0), "adapter_skip": jax.random.PRNGKey(1)},
        jnp.asarray(rng.normal(size=(2, DIM)), jnp.float32),
        jnp.asarray(rng.normal(size=(3, 2, DIM)), jnp.float32),
        True, False,
    )
    with pytest.raises(ValueError, match="batch >= 2"):
        cam.apply(
            variables,
            jnp.asarray(rng.normal(size=(1, DIM)), jnp.float32),
            jnp.asarray(rng.normal(size=(3, 1, DIM)), jnp.float32),
            True, False,
            mutable=["batch_stats"],
            rngs={"adapter_skip": jax.random.PRNGKey(2)},
        )


def test_shared_comment_broadcast_is_eval_only(finaltf):
    """A size-1 comment batch against a larger feature batch must error in
    TRAINING (the reference's torch.stack would) — the broadcast is the
    transfer-eval dedup optimization only."""
    module, variables = finaltf
    vis, title, comments = _inputs()
    one_comment = comments[:1]  # [1, nc, ntoks]
    # eval: broadcast works
    fv, ft, _ = module.apply(
        variables, vis, title, one_comment, branch_override="text"
    )
    assert ft.shape[0] == title.shape[0]
    # train: loud error
    with pytest.raises(ValueError, match="eval-only"):
        module.apply(
            variables, vis, title, one_comment, train=True,
            mutable=["batch_stats"],
            rngs={
                "adapter_skip": jax.random.PRNGKey(0),
                "comment_mask": jax.random.PRNGKey(1),
            },
        )


def test_joint_embedding_zero_feature_row_stays_finite():
    """F.normalize's eps clamp (model/model.py:117-118): an all-zero feature
    row normalizes to zeros, not NaN."""
    from vtc_tpu.models.retrieval import JointEmbedding

    m = JointEmbedding(input_dims_a=8, input_dims_b=8, embedding_dims=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)), jnp.zeros((2, 8)))
    # zero inputs through zero-bias dense + BN(eval) + relu stay zero rows
    fa, fb = m.apply(v, jnp.zeros((2, 8)), jnp.zeros((2, 8)))
    assert np.isfinite(np.asarray(fa)).all()
    assert np.isfinite(np.asarray(fb)).all()
