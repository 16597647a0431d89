"""One-off: eval throughput with the pre-patchified uint8 input path vs the
fp32 NCHW path (same fori_loop harness as bench.py). Run on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.data.preprocess import extract_patches
from vtc_tpu.models import create_model
from vtc_tpu.models.factory import convert_weights


def run(batch, iters, warmup, mode):
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="ViT-B/32", seed=0,
        dtype=jnp.bfloat16,
    )
    variables = dict(variables)
    variables["params"] = convert_weights(variables["params"], jnp.bfloat16)

    @jax.jit
    def fwd_n(variables, vis, title, comments, n):
        def body(i, carry):
            eps = (carry * 1e-12).astype(vis.dtype)
            v = vis + eps
            tok_eps = (carry * 1e-12).astype(jnp.int32)
            t = title + tok_eps
            c = comments + tok_eps
            feats_vis, feats_text, sim = module.apply(variables, v, t, c)
            return jnp.sum(sim).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
    if mode == "patches":
        vis = jnp.asarray(extract_patches(u8, 32))  # [B, 49, 3072] uint8
    else:
        x = u8.astype(np.float32) / 255.0
        from vtc_tpu.data.preprocess import CLIP_MEAN, CLIP_STD

        x = (x - CLIP_MEAN) / CLIP_STD
        vis = jnp.asarray(np.moveaxis(x, -1, 1)).astype(jnp.bfloat16)

    ntoks = 16

    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    float(fwd_n(variables, vis, title, comments, jnp.int32(warmup)))
    vals = []
    for _ in range(3):
        tic = time.perf_counter()
        float(fwd_n(variables, vis, title, comments, jnp.int32(iters)))
        vals.append(batch * iters / (time.perf_counter() - tic))
    return vals


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "patches"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    vals = run(batch, iters=16, warmup=3, mode=mode)
    print(mode, batch, [round(v, 1) for v in vals], "median", round(sorted(vals)[1], 1))
