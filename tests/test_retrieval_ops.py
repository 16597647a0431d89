"""Retrieval math tests: R@K on synthetic embeddings with known ranks, L2
equivalence with FAISS semantics, -inf padding behavior, sharded path on the
8-device CPU mesh, and losses."""

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops.losses import binary_cross_entropy, clip_loss, cross_entropy, mse_loss
from vtc_tpu.ops.retrieval import (
    ranks_of_targets,
    recall_at_k,
    recall_at_k_sharded,
    retrieval_metrics,
)
from vtc_tpu.training.metrics import LossMetric, MetricTracker, RecallAtK


def _synthetic(n=20, d=16, seed=0):
    """Gallery = random unit vectors; query i = slightly-perturbed gallery i
    so the true match is always rank 1."""
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    q = g + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return g, q


def test_perfect_recall():
    g, q = _synthetic()
    res = dict(recall_at_k(g, q, [1, 5, 10]))
    assert res[1] == 1.0 and res[5] == 1.0 and res[10] == 1.0


def test_known_ranks():
    # gallery of one-hot vectors; query i matches gallery (i+1)%n best
    n = 8
    g = np.eye(n, dtype=np.float32)
    q = np.roll(np.eye(n, dtype=np.float32), -1, axis=0)  # q_i == g_{(i+1)%n}
    targets = (np.arange(n) + 1) % n
    res = dict(recall_at_k(g, q, [1], targets=targets))
    assert res[1] == 1.0
    # with identity targets, the true item is never rank-1 ...
    res_wrong = dict(recall_at_k(g, q, [1]))
    assert res_wrong[1] == 0.0
    # ... but ties put it within top-8
    res_wrong8 = dict(recall_at_k(g, q, [8]))
    assert res_wrong8[8] == 1.0


def test_l2_vs_dot_on_unnormalized():
    """Ranking must be flat-L2 (FAISS GpuIndexFlatL2), not dot: a gallery
    vector with a huge norm must NOT win on L2."""
    g = np.array([[1.0, 0.0], [100.0, 0.0]], dtype=np.float32)
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    res = dict(recall_at_k(g, q, [1], targets=np.array([0])))
    assert res[1] == 1.0  # nearest by L2 is [1,0], not [100,0]


def test_inf_padding_ranks_last():
    g, q = _synthetic(10)
    g_pad = np.concatenate([g, np.full((3, g.shape[1]), -np.inf, np.float32)])
    ranks = ranks_of_targets(g_pad, q)
    assert (ranks == 1).all()


def test_retrieval_metrics_suite():
    g, q = _synthetic(30)
    m = retrieval_metrics(g, q)
    assert m["R@1"] == 1.0
    assert m["median_rank"] == 1.0
    assert m["mean_rank"] == 1.0


def test_sharded_matches_single_device():
    from jax.sharding import Mesh

    g, q = _synthetic(37)  # deliberately not divisible by 8
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    res_single = recall_at_k(g, q, [1, 5])
    res_sharded = recall_at_k_sharded(g, q, [1, 5], mesh)
    assert res_single == res_sharded


def test_recall_metric_tracker_keys():
    g, q = _synthetic(12)
    metric = RecallAtK("visual", "titles", [1, 5])
    tracker = MetricTracker(metric)
    tracker.add_metric(LossMetric())
    for i in range(0, 12, 4):
        tracker.update(0.5, (g[i : i + 4], q[i : i + 4], None), {})
    res = tracker.result()
    assert res["titles_from_visual-recall_at_1"] == 1.0
    assert res["visual_from_titles-recall_at_5"] == 1.0
    assert res["loss"] == 0.5


def test_clip_loss_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    sim = rng.normal(size=(6, 6)).astype(np.float32) * 3
    ours = float(clip_loss((None, None, jnp.asarray(sim))))
    t = torch.from_numpy(sim)
    labels = torch.arange(6)
    ref = 0.5 * (F.cross_entropy(t, labels) + F.cross_entropy(t.t(), labels))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_clip_loss_minimized_on_diagonal():
    good = jnp.eye(8) * 20.0
    bad = jnp.roll(jnp.eye(8) * 20.0, 1, axis=1)
    assert float(clip_loss((None, None, good))) < float(
        clip_loss((None, None, bad))
    )


def test_other_losses():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    target = jnp.asarray(np.array([0, 1, 2, 1]))
    assert np.isfinite(float(cross_entropy(logits, {"target": target})))

    pred = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    assert float(mse_loss(pred, {"target": pred})) == 0.0

    blogits = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    btarget = jnp.asarray((rng.random((4, 1)) > 0.5).astype(np.float32))
    import torch
    import torch.nn.functional as F

    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(blogits)), torch.from_numpy(np.asarray(btarget))
    )
    np.testing.assert_allclose(
        float(binary_cross_entropy(blogits, {"target": btarget})),
        float(ref),
        rtol=1e-5,
    )


def test_chunked_matches_dense():
    from vtc_tpu.ops.retrieval import recall_at_k_chunked

    rng = np.random.default_rng(3)
    g = rng.normal(size=(300, 32)).astype(np.float32)
    q = g[rng.permutation(300)] + 0.001 * rng.normal(size=(300, 32)).astype(
        np.float32
    )
    targets = None  # identity targets vs permuted gallery: nontrivial recall
    dense = recall_at_k(g, q, [1, 5, 10])
    chunked = recall_at_k_chunked(g, q, [1, 5, 10], chunk=64)
    assert dense == chunked

    # with -inf padding rows mixed in
    g_pad = np.concatenate([g, np.full((20, 32), -np.inf, np.float32)])
    dense2 = recall_at_k(g_pad, q, [1, 5])
    chunked2 = recall_at_k_chunked(g_pad, q, [1, 5], chunk=77)
    assert dense2 == chunked2
