"""TimeSformer tests, incl. the init-equals-frame-mean-ViT invariant the
reference only checks in an inline __main__ smoke test
(``timesformer_clip_alt.py:333-360``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtc_tpu.models.clip_model import CLIP_VARIANTS, VisionTransformer
from vtc_tpu.models.timesformer import (
    TimeSformer,
    timesformer_params_from_clip_visual,
)

TINY = CLIP_VARIANTS["test-tiny"]
RES = TINY.input_resolution
NFRAMES = 4


@pytest.fixture(scope="module")
def towers():
    vit = VisionTransformer(variant=TINY)
    vit_params = vit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES))
    )["params"]
    tsf = TimeSformer(variant=TINY, nframes=NFRAMES)
    tsf_params = timesformer_params_from_clip_visual(
        vit_params, TINY, nframes=NFRAMES
    )
    return vit, vit_params, tsf, tsf_params


def test_surgery_tree_matches_init(towers):
    """Surgery output must be structurally identical to a fresh TimeSformer
    init (the JAX analogue of the strict=False missing-keys assertion)."""
    vit, vit_params, tsf, tsf_params = towers
    fresh = tsf.init(
        jax.random.PRNGKey(1), jnp.zeros((1, NFRAMES, 3, RES, RES))
    )["params"]
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, fresh)
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, tsf_params)
    assert ref_shapes == got_shapes


def test_init_equals_frame_mean_vit(towers):
    """At init (zero temporal_fc / temporal_embed), a repeated-frame video
    must produce the single-frame ViT output exactly."""
    vit, vit_params, tsf, tsf_params = towers
    rng = np.random.default_rng(0)
    frame = rng.normal(size=(2, 3, RES, RES)).astype(np.float32)
    video = jnp.asarray(np.tile(frame[:, None], (1, NFRAMES, 1, 1, 1)))

    vit_out = vit.apply({"params": vit_params}, jnp.asarray(frame))
    tsf_out = tsf.apply({"params": tsf_params}, video)
    np.testing.assert_allclose(
        np.asarray(tsf_out), np.asarray(vit_out), atol=1e-4, rtol=1e-4
    )


def test_distinct_frames_differ_from_mean(towers):
    """With distinct frames the (spatial-attention) output differs from the
    naive per-frame mean — the tower actually mixes time."""
    vit, vit_params, tsf, tsf_params = towers
    rng = np.random.default_rng(1)
    video = rng.normal(size=(2, NFRAMES, 3, RES, RES)).astype(np.float32)

    tsf_out = np.asarray(tsf.apply({"params": tsf_params}, jnp.asarray(video)))
    per_frame = np.asarray(
        vit.apply({"params": vit_params}, jnp.asarray(video.reshape(-1, 3, RES, RES)))
    ).reshape(2, NFRAMES, -1)
    # at random init the shared-CLS coupling is weak, so the deviation from
    # the naive mean is small but must be clearly above fp noise
    assert np.abs(tsf_out - per_frame.mean(1)).max() > 5e-6
    assert np.isfinite(tsf_out).all()


def test_temporal_path_active_after_perturbation(towers):
    """Perturbing temporal_fc changes the output (the zero-init path is
    actually wired in)."""
    vit, vit_params, tsf, tsf_params = towers
    rng = np.random.default_rng(2)
    video = jnp.asarray(
        rng.normal(size=(1, NFRAMES, 3, RES, RES)).astype(np.float32)
    )
    out0 = np.asarray(tsf.apply({"params": tsf_params}, video))

    import copy

    p2 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, tsf_params))
    blk = p2["transformer_resblocks_0"]
    blk["temporal_fc"]["kernel"] = np.eye(TINY.vision_width, dtype=np.float32)
    blk["timeattn"]["out_proj"]["kernel"] = (
        blk["timeattn"]["out_proj"]["kernel"] * 100.0
    )
    out1 = np.asarray(tsf.apply({"params": p2}, video))
    assert not np.allclose(out0, out1, atol=1e-4)

    # the temporal embedding also feeds the tokens (zero at init)
    p3 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, tsf_params))
    # note: a constant shift would be erased by ln_pre; perturb per-dim
    p3["temporal_embed"] = p3["temporal_embed"] + np.asarray(
        np.random.default_rng(0).normal(size=p3["temporal_embed"].shape),
        dtype=np.float32,
    )
    out2 = np.asarray(tsf.apply({"params": p3}, video))
    assert not np.allclose(out0, out2, atol=1e-4)


def test_temporal_fc_zero_initialized_without_surgery():
    """The reference zeroes temporal_fc.weight/bias unconditionally in
    VisualTransformer.__init__ (timesformer_clip_alt.py:246-250) — a
    from-scratch TimeSformer (no CLIP weight surgery) must also start with
    the divided temporal residual as a no-op."""
    tsf = TimeSformer(variant=TINY, nframes=NFRAMES)
    params = tsf.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, NFRAMES, 3, RES, RES)),
    )["params"]
    blocks = [k for k in params if "resblock" in k]
    assert blocks
    for k in blocks:
        fc = params[k]["temporal_fc"]
        assert not np.asarray(fc["kernel"]).any(), k
        assert not np.asarray(fc["bias"]).any(), k


def test_trunc_normal_matches_torch_absolute_bounds():
    """torch.nn.init.trunc_normal_(std=.02) truncates at ABSOLUTE ±2 (±100σ,
    effectively untruncated); a ±2σ truncation clips 4.6% of draws."""
    from vtc_tpu.models.timesformer import _trunc_normal

    x = np.asarray(_trunc_normal(jax.random.PRNGKey(0), (20000,), std=0.02))
    # an effectively untruncated N(0, 0.02^2) exceeds 2σ=0.04 routinely
    assert (np.abs(x) > 0.04).mean() > 0.02
    assert np.abs(x).max() < 2.0  # the absolute bound
    assert abs(x.std() - 0.02) < 0.002
