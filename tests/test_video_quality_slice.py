"""Video mechanism slice: the TimeSformer's divided temporal attention is
the component that makes *frame order* representable — the capability that
separates it from the frame-mean image baseline
(``model/timesformer_clip_alt.py:135-175``).

Three pinned properties on order-paired videos (same two frame patterns,
opposite order — any frame-permutation-invariant model embeds them
identically):

1. at init (zero temporal path) the model is exactly order-invariant —
   paired videos embed identically (the reference's frame-mean invariant);
2. the loss gradient at init is nonzero on `temporal_fc` — training can
   move the temporal path off zero (it is a live parameter, not dead);
3. with a nonzero temporal path the SAME architecture embeds the pair
   differently — order becomes representable, which no frame-mean model
   can do.

(Full training-dynamics runs escape the order-symmetric saddle only with
asymmetric batches — both orders of each pair in one batch make the
antisymmetric gradient components cancel exactly. That dynamics detail is
intentionally not pinned; the mechanism is.)
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from vtc_tpu.data import tokenizer as tk
from vtc_tpu.models import create_model
from vtc_tpu.ops.losses import clip_loss

N_PAIRS = 3
FRAMES = 4


def _paired_videos(rng):
    vids = []
    for _ in range(N_PAIRS):
        x = rng.normal(size=(3, 32, 32)).astype(np.float32)
        y = rng.normal(size=(3, 32, 32)).astype(np.float32)
        vids.append(np.stack([x, x, y, y]))
        vids.append(np.stack([y, y, x, x]))
    return jnp.asarray(np.stack(vids))


@pytest.mark.slow
def test_timesformer_order_sensitivity_mechanism():
    rng = np.random.default_rng(0)
    module, variables = create_model(
        "PretrainedCLIP_TimeSformer", model_type="test-tiny",
        nframes=FRAMES, seed=0,
    )
    vis = _paired_videos(rng)
    titles = jnp.asarray(
        tk.tokenize([f"clip number {i}" for i in range(2 * N_PAIRS)])
    )

    # 1. zero temporal path: order-mates embed identically
    fv0, _, _ = module.apply(variables, vis, titles)
    fv0 = np.asarray(fv0, np.float32)
    np.testing.assert_allclose(fv0[0::2], fv0[1::2], atol=1e-4)

    # 2. the temporal path receives gradient at init
    def loss_fn(params):
        out = module.apply({"params": params}, vis, titles)
        return clip_loss(out, {})

    grads = jax.grad(loss_fn)(variables["params"])
    visual = grads["clip"]["visual"]
    gnorm = max(
        float(jnp.linalg.norm(v["temporal_fc"]["kernel"]))
        for k, v in visual.items()
        if k.startswith("transformer_resblocks") and "temporal_fc" in v
    )
    assert gnorm > 1e-6, gnorm

    # 3. nonzero temporal path makes order representable
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    pv = params["clip"]["visual"]
    key = jax.random.PRNGKey(1)
    pv["temporal_embed"] = 0.5 * jax.random.normal(
        key, pv["temporal_embed"].shape, jnp.float32
    )
    for k in list(pv):
        if k.startswith("transformer_resblocks") and "temporal_fc" in pv[k]:
            key, sub = jax.random.split(key)
            pv[k]["temporal_fc"]["kernel"] = 0.5 * jax.random.normal(
                sub, pv[k]["temporal_fc"]["kernel"].shape, jnp.float32
            )
    fv1, _, _ = module.apply({"params": params}, vis, titles)
    fv1 = np.array(fv1, np.float32)
    assert np.all(np.isfinite(fv1))
    # order-mates now embed DIFFERENTLY: the pair gap must rise orders of
    # magnitude above the zero-path numerical floor (measured: ~1e-4 vs
    # ~6e-8 at these scales)
    gap0 = np.max(np.abs(fv0[0::2] - fv0[1::2]))
    gap1 = np.max(np.abs(fv1[0::2] - fv1[1::2]))
    assert gap1 > 100 * max(gap0, 1e-7), (gap0, gap1)
