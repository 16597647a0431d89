"""Device throughput of the video eval forward (TimeSformer 8f + CAM).

Same measurement discipline as bench.py (device-side fori_loop, data-
dependent inputs, host-transfer sync, median of three windows). The frames
ride the uint8 patch fast path by default (``VTC_BENCH_PATCHES=0`` for the
fp32 NCHW path).

Run: python scripts/bench_video_eval.py [batch] [frames] [ntoks]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(batch=32, frames=8, ntoks=16, iters=32, warmup=2, windows=3):
    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.models.factory import convert_weights

    module, variables = create_model(
        "PretrainedCLIP_TimeSformer_finaltf", model_type="ViT-B/32",
        nframes=frames, seed=0, dtype=jnp.bfloat16,
    )
    variables = dict(variables)
    variables["params"] = convert_weights(variables["params"], jnp.bfloat16)

    rng = np.random.default_rng(0)
    patches = os.environ.get("VTC_BENCH_PATCHES", "1") == "1"
    if patches:
        from vtc_tpu.data.preprocess import extract_patches

        u8 = rng.integers(
            0, 256, (batch, frames, 224, 224, 3), dtype=np.uint8
        )
        vis = jnp.asarray(extract_patches(u8, 32))  # [B, F, 49, 3072] uint8
    else:
        vis = jnp.asarray(
            rng.normal(size=(batch, frames, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    @jax.jit
    def fwd_n(variables, vis, title, comments, n):
        def body(i, carry):
            v = vis + (carry * 1e-12).astype(vis.dtype)  # uint8-safe zero
            eps = (carry * 1e-12).astype(jnp.int32)
            _, _, sim = module.apply(variables, v, title + eps, comments + eps)
            return jnp.sum(sim).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(fwd_n(variables, vis, title, comments, jnp.int32(warmup)))

    if os.environ.get("VTC_TRACE") == "1":
        # op-level receipts for one timed window (see profile_trace.py)
        import profile_trace

        logdir = "/tmp/vtc_video_trace"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            float(fwd_n(variables, vis, title, comments, jnp.int32(iters)))
        profile_trace.parse(logdir, iters)
        return

    vals = []
    for _ in range(windows):
        tic = time.perf_counter()
        float(fwd_n(variables, vis, title, comments, jnp.int32(iters)))
        vals.append(batch * iters / (time.perf_counter() - tic))
    med = sorted(vals)[len(vals) // 2]
    print(f"video eval: {med:.0f} clip-pairs/s median "
          f"(windows {[round(v) for v in vals]}, batch {batch}, "
          f"{frames} frames, {ntoks}-token texts, "
          f"{'patches' if patches else 'NCHW'})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
