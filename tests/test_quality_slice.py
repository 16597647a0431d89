"""Mechanical reproduction of the paper's core claim on a synthetic corpus:
training the CAM (frozen towers, adapter-only — the Table-2 setup) makes
comment-conditioned retrieval dramatically beat the no-comment baseline.

Construction: titles are AMBIGUOUS (shared between item pairs) while each
item's distinguishing comment defines its visual feature (the frozen text
embedding of that comment). Without comments, retrieval is at chance; the
CAM must learn to fold the comment embedding into the text embedding.

Measured on this setup: R@1 ~0.04 (skip branch, unchanged by training) vs
~0.85 after 80 adapter-only steps.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from vtc_tpu.data import tokenizer as tk
from vtc_tpu.models import create_model
from vtc_tpu.ops.losses import clip_loss
from vtc_tpu.ops.retrieval import recall_at_k
from vtc_tpu.training.optim import build_optimizer
from vtc_tpu.training.trainer import TrainState, make_step_fns

N = 48  # items; titles shared in pairs -> 24 unique titles


@pytest.mark.slow
def test_cam_learns_to_use_comments():
    rng = np.random.default_rng(0)
    letters = list("abcdefghijklmnopqrstuvwxyz")

    def rand_word(n=12):
        return "".join(rng.choice(letters, n))

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", freeze="all",
        random_skip_adapter=False, seed=0,
    )

    titles = [f"video {i // 2}" for i in range(N)]  # ambiguous
    comments = [[rand_word(), ""] for _ in range(N)]  # distinct + one empty
    title_tok = tk.tokenize(titles)
    comment_tok = np.stack([tk.tokenize(c) for c in comments])

    first_comments = tk.tokenize([c[0] for c in comments])
    vis = np.asarray(
        module.apply(
            variables,
            jnp.asarray(first_comments),
            method=lambda m, t: m.clip.encode_text(t),
        )
    )
    vis = (vis / np.linalg.norm(vis, axis=-1, keepdims=True)).astype(np.float32)

    data = (jnp.asarray(vis), jnp.asarray(title_tok), jnp.asarray(comment_tok))

    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 0.02}}, None, 1,
        branch_to_freeze="all",
    )
    train_step, eval_step = make_step_fns(module, clip_loss, tx, donate=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]), batch_stats={},
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for s in range(80):
        state, loss, _ = train_step(state, data, {}, jax.random.fold_in(key, s))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0  # the adapter actually trained

    _, out_cam = eval_step(state, data, {})
    _, out_skip = eval_step(state, data, {}, branch_override="skip")

    r1_cam = dict(
        recall_at_k(np.asarray(out_cam[0]), np.asarray(out_cam[1]), [1])
    )[1]
    r1_skip = dict(
        recall_at_k(np.asarray(out_skip[0]), np.asarray(out_skip[1]), [1])
    )[1]

    assert r1_skip <= 0.2, r1_skip  # titles alone are at chance
    assert r1_cam >= r1_skip + 0.4, (r1_cam, r1_skip)
