"""Serving-path throughput: tokenized-text query -> encode -> rank against
an HBM-resident gallery (the ``vtc_tpu/serving`` hot path) on one chip.

Usage: python scripts/bench_serving.py [batch] [gallery_size] [k] [iters]

Measurement discipline (CLAUDE.md): the dev tunnel costs ~0.6 s per
dispatch, so per-request LATENCY is not measurable here — this reports
steady-state device THROUGHPUT with the iteration loop inside one jitted
program (`lax.fori_loop`, dynamic bound shared by warmup), median of 3
windows, sync by host transfer. The compute is the same math the service
executes per request: encode_text on the query batch + fp32 dot against
the [N, D] gallery + lax.top_k.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    gallery_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.models.factory import convert_weights
    from vtc_tpu.models.layers import l2_normalize

    module, variables = create_model(
        "PretrainedCLIP", model_type="ViT-B/32", seed=0, dtype=jnp.bfloat16
    )
    variables = dict(variables)
    variables["params"] = convert_weights(variables["params"], jnp.bfloat16)

    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(gallery_n, 512)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=-1, keepdims=True)
    gallery = jnp.asarray(gallery)

    from vtc_tpu.data.tokenizer import synthetic_tokens

    tokens = jnp.asarray(synthetic_tokens((batch,), 77, 14, rng))

    @jax.jit
    def serve_n(variables, gallery, tokens, n):
        def body(i, carry):
            toks = tokens + (carry * 0).astype(jnp.int32)
            q = module.apply(variables, toks, method="encode_text")
            q = l2_normalize(q.astype(jnp.float32))
            scores = jnp.matmul(
                q, gallery.T, preferred_element_type=jnp.float32
            )
            top_s, _ = jax.lax.top_k(scores, k)
            return jnp.sum(top_s)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(serve_n(variables, gallery, tokens, jnp.int32(3)))  # warmup
    vals = []
    for _ in range(3):
        tic = time.perf_counter()
        float(serve_n(variables, gallery, tokens, jnp.int32(iters)))
        vals.append(batch * iters / (time.perf_counter() - tic))
    qps = sorted(vals)[1]

    # host-side cost of the encoded-image path (/search/image images_b64):
    # base64 decode + JPEG decode + PIL-bit-exact CLIP preprocess per image
    # — pure host work (this container: ONE core), measured per image so
    # deployments can size the host pool
    import base64
    import io

    from PIL import Image

    from vtc_tpu.data.datasets import clip_preprocess_batch

    raw = rng.integers(0, 255, (360, 480, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    n_img = 32
    tic = time.perf_counter()
    for _ in range(n_img):
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        clip_preprocess_batch(np.asarray(img, np.uint8)[None], 224)
    decode_ms = (time.perf_counter() - tic) / n_img * 1e3

    print({
        "serving_queries_per_sec_per_chip": round(qps, 1),
        "batch": batch, "gallery": gallery_n, "k": k, "iters": iters,
        "b64_image_decode_preprocess_ms_per_image": round(decode_ms, 2),
    })


if __name__ == "__main__":
    main()
