"""Device throughput of the full finetune train step (forward + backward +
4-group Adam/amsgrad update) on the flagship image model.

Same measurement discipline as bench.py. The compiled step is iterated with
lax.fori_loop carrying the TrainState, so optimizer updates chain exactly as
in training.

Run: python scripts/bench_train_step.py [batch] [ntoks] [arch]
  VTC_REMAT=1 for the memory-bound configs.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(batch=128, ntoks=16, arch="PretrainedCLIP_finaltf", frames=0,
         iters=8, warmup=2):
    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    kwargs = {"nframes": frames} if frames else {}
    module, variables = create_model(
        arch, model_type="ViT-B/32", seed=0, dtype=jnp.bfloat16, **kwargs
    )
    opt_args = {"lr": 1e-5, "amsgrad": True}
    if os.environ.get("VTC_MOMENTS_DTYPE"):  # A/B: bf16 moment storage
        opt_args["moments_dtype"] = os.environ["VTC_MOMENTS_DTYPE"]
    tx = build_optimizer(
        variables["params"],
        {"type": "Adam", "args": opt_args},
        {"type": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        steps_per_epoch=100,
        adapter_lr=1e-4,
        time_lr=1e-5,
    )
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    accum = int(os.environ.get("VTC_ACCUM", "1"))  # GradCache accumulation
    train_step, _ = make_step_fns(
        module, clip_loss, tx, donate=donate, accum_steps=accum
    )

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )

    rng = np.random.default_rng(0)
    if os.environ.get("VTC_BENCH_PATCHES", "0") == "1":
        from vtc_tpu.data.preprocess import extract_patches

        shape = ((batch, frames) if frames else (batch,)) + (224, 224, 3)
        vis = jnp.asarray(
            extract_patches(rng.integers(0, 256, shape, dtype=np.uint8), 32)
        )
    else:
        shape = (batch, frames, 3, 224, 224) if frames else (batch, 3, 224, 224)
        vis = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
            jnp.bfloat16
        )

    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    @jax.jit
    def run_n(state, vis, title, comments, n):
        def body(i, state):
            new_state, loss, _ = train_step(
                state, (vis, title, comments), {}, jax.random.PRNGKey(0)
            )
            return new_state

        return jax.lax.fori_loop(0, n, body, state)

    s = run_n(state, vis, title, comments, jnp.int32(warmup))
    float(jnp.sum(s.step).astype(jnp.float32))

    if os.environ.get("VTC_TRACE") == "1":
        # capture one timed window as a device trace and aggregate it with
        # profile_trace's xplane parser (op-level ms/step receipts)
        import profile_trace

        logdir = "/tmp/vtc_train_trace"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            s2 = run_n(s, vis, title, comments, jnp.int32(iters))
            float(jnp.sum(s2.step).astype(jnp.float32))
        profile_trace.parse(logdir, iters)
        return

    vals = []
    for _ in range(3):
        tic = time.perf_counter()
        s2 = run_n(s, vis, title, comments, jnp.int32(iters))
        float(jnp.sum(s2.step).astype(jnp.float32))
        vals.append(batch * iters / (time.perf_counter() - tic))
    med = sorted(vals)[len(vals) // 2]
    ms = batch / med * 1e3
    print(f"train step: {med:.0f} samples/s median ({ms:.1f} ms/step, "
          f"windows {[round(v) for v in vals]}, batch {batch}, "
          f"{ntoks}-token texts, arch {arch})")
    return med


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ntoks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    arch = sys.argv[3] if len(sys.argv) > 3 else "PretrainedCLIP_finaltf"
    frames = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    warmup = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    main(batch, ntoks, arch, frames, iters=iters, warmup=warmup)
