"""Capture a jax.profiler device trace of the flagship eval forward and print
the top ops by self-time (parsed from the xplane.pb with tensorboard-plugin-
profile's raw-to-tool conversion; falls back to listing planes).

Run: python scripts/profile_trace.py [batch] [ntoks]
"""

import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(batch=160, ntoks=16, iters=8):
    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.models.factory import convert_weights

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="ViT-B/32", seed=0,
        dtype=jnp.bfloat16,
    )
    variables = dict(variables)
    variables["params"] = convert_weights(variables["params"], jnp.bfloat16)

    rng = np.random.default_rng(0)
    if os.environ.get("VTC_PROFILE_PATCHES") == "1":
        # the uint8 patch fast path (data/preprocess.py:extract_patches)
        from vtc_tpu.data.preprocess import extract_patches

        u8 = rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
        vis = jnp.asarray(extract_patches(u8, 32))
    else:
        vis = jnp.asarray(
            rng.normal(size=(batch, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    @jax.jit
    def fwd_n(variables, vis, title, comments, n):
        def body(i, carry):
            v = vis + (carry * 1e-12).astype(vis.dtype)  # uint8-safe
            eps = (carry * 1e-12).astype(jnp.int32)
            _, _, sim = module.apply(variables, v, title + eps, comments + eps)
            return jnp.sum(sim).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    # warm up / compile outside the trace
    float(fwd_n(variables, vis, title, comments, jnp.int32(2)))

    logdir = "/tmp/vtc_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(fwd_n(variables, vis, title, comments, jnp.int32(iters)))
    return logdir, iters


def parse(logdir, iters):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb captured; files:", glob.glob(f"{logdir}/**", recursive=True))
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    import re

    print("planes:", [p.name for p in xspace.planes])
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        print(f"\n==== plane {plane.name}: lines "
              f"{[(l.name, len(l.events)) for l in plane.lines]}")
        for line in plane.lines:
            totals = {}
            counts = {}
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id].name
                totals[md] = totals.get(md, 0) + ev.duration_ps
                counts[md] = counts.get(md, 0) + 1
            tot_all = sum(totals.values())
            print(f"\n== line '{line.name}' sum "
                  f"{tot_all / 1e12 / iters * 1e3:.2f} ms/iter")
            # aggregate by the HLO instruction's leading name ("%copy.5",
            # "%convert_reduce_fusion.12", ...) — strip the ordinal; fall
            # back to the post-'=' opcode for name formats without a '%'
            by_op = {}
            for name, ps in totals.items():
                m = re.match(r"%?([a-zA-Z][\w.-]*?)(?:[._-]?\d+)?(?:\s|=|$)", name)
                if not m:
                    m = re.search(r"= (?:\([^)]*\) )?\S*?([a-z][a-z0-9-]*)", name)
                op = m.group(1) if m else name[:40]
                t, c = by_op.get(op, (0, 0))
                by_op[op] = (t + ps, c + counts[name])
            for op, (ps, c) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:25]:
                print(f"{ps / 1e12 / iters * 1e6:10.1f} us/iter  x{c:<6} {op}")
            # VTC_TRACE_RAW=<prefix>: top individual (un-aggregated) ops
            # whose name starts with the prefix — for identifying what a
            # fat aggregate (e.g. `copy`) actually is
            raw = os.environ.get("VTC_TRACE_RAW")
            if raw:
                print(f"\n-- raw ops matching '{raw}':")
                sel = [
                    (ps, counts[name], name)
                    for name, ps in totals.items()
                    if name.lstrip("%").startswith(raw)
                ]
                for ps, c, name in sorted(sel, reverse=True)[:30]:
                    print(f"{ps / 1e12 / iters * 1e6:10.1f} us/iter  x{c:<6} "
                          f"{name[:140]}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    logdir, iters = capture(b, n)
    parse(logdir, iters)
