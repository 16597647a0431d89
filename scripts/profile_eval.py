"""Component-level profile of the flagship eval forward on the real chip.

Times (device-side fori_loop, same discipline as bench.py):
  * full forward (image + title + 5 comments + CAM + sim)
  * image tower alone
  * text tower alone (6 texts/pair: title + 5 comments)
  * CAM alone (on precomputed embeddings)

Run: python scripts/profile_eval.py [batch] [ntoks]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(batch=128, ntoks=16, iters=16, warmup=3):
    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="ViT-B/32", seed=0,
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.normal(size=(batch, 3, 224, 224)).astype(np.float32))

    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    def timed(name, body_fn, *args):
        @jax.jit
        def loop(variables, n, *args):
            def body(i, carry):
                return body_fn(variables, carry, *args)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        float(loop(variables, jnp.int32(warmup), *args))
        tic = time.perf_counter()
        float(loop(variables, jnp.int32(iters), *args))
        dt = (time.perf_counter() - tic) / iters
        print(f"{name:<28} {dt * 1e3:8.2f} ms/iter  "
              f"{batch / dt:10.0f} items/s")
        return dt

    def full(variables, carry, vis, title, comments):
        v = vis + carry * 1e-12
        eps = (carry * 1e-12).astype(jnp.int32)
        _, _, sim = module.apply(variables, v, title + eps, comments + eps)
        return jnp.sum(sim).astype(jnp.float32)

    def image_only(variables, carry, vis):
        v = vis + carry * 1e-12
        out = module.apply(
            variables, v, method=lambda mdl, x: mdl.clip.encode_image(x)
        )
        return jnp.sum(out).astype(jnp.float32)

    def text_only(variables, carry, title, comments):
        eps = (carry * 1e-12).astype(jnp.int32)
        flat = jnp.concatenate(
            [title[:, None], comments], axis=1
        ).reshape(-1, title.shape[-1])
        out = module.apply(
            variables, flat + eps,
            method=lambda mdl, x: mdl.clip.encode_text(x),
        )
        return jnp.sum(out).astype(jnp.float32)

    def title_only(variables, carry, title):
        eps = (carry * 1e-12).astype(jnp.int32)
        out = module.apply(
            variables, title + eps,
            method=lambda mdl, x: mdl.clip.encode_text(x),
        )
        return jnp.sum(out).astype(jnp.float32)

    t_full = timed("full forward", full, vis, title, comments)
    t_img = timed("image tower", image_only, vis)
    t_txt = timed("text tower x6", text_only, title, comments)
    timed("text tower x1 (title)", title_only, title)
    print(f"{'(img + 6x text) sum':<28} {(t_img + t_txt) * 1e3:8.2f} ms")
    print(f"{'CAM + sim (residual)':<28} "
          f"{(t_full - t_img - t_txt) * 1e3:8.2f} ms")

    # MFU: image fwd ≈ 8.7 GFLOP (12 blocks · 7.08M params · 2 · 50 tokens
    # + conv/proj); text fwd ≈ 2 · 37.8M · ntoks GFLOP per text, 6 texts/pair
    pair_gflop = 8.7 + 6 * 2 * 0.0378 * ntoks
    print(f"\npair ≈ {pair_gflop:.1f} GFLOP -> "
          f"{batch * pair_gflop / t_full / 1e3:.1f} TFLOP/s "
          f"({batch * pair_gflop / t_full / 1e3 / 197 * 100:.0f}% of v5e "
          f"bf16 peak)")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(b, n)
