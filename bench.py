"""Benchmark: eval throughput (clip-pairs/sec/chip) of the flagship model.

Flagship = PretrainedCLIP_finaltf (CLIP ViT-B/32 image+text towers + Context
Adapter over 5 comments) running the retrieval-eval forward: encode image,
title, 5 comments, adapt, dense similarity. bf16 activations / fp32
accumulation (MXU-native). The image input rides the uint8 patch fast path
(host patch extraction, ``data/preprocess.py:extract_patches``; CLIP
normalization folded into the conv weights on device) — the same path the
eval CLI uses with ``uint8_images``.

Measurement discipline (PERFORMANCE.md): the whole iteration loop runs
inside ONE jitted program (``lax.fori_loop``, dynamic bound so warmup and
timed calls share the executable) because the dev tunnel costs ~0.6 s per
dispatch; synchronization is an explicit host transfer. The reported value
is the MEDIAN of three timed windows in a clean process (not best-of-N).
The worst-case full-77-token-context throughput is measured the same way in
its own subprocess and reported alongside.

Baseline = the same forward jitted on one host CPU (the reference ships no
hardware benchmarks — SURVEY.md §6 — so the CPU run is the comparison point;
the BASELINE.md target is >=10x CPU). The CPU number is measured once in a
subprocess and cached in ``.bench_cpu_baseline.json``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "full_context_pairs_per_sec": N}
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

CACHE = Path(__file__).parent / ".bench_cpu_baseline.json"

BENCH_CODE = r"""
import json, time
from functools import partial
import numpy as np

def run(batch, iters, warmup, dtype_name, ntoks=16, windows=3, model_type="ViT-B/32"):
    import jax
    import jax.numpy as jnp
    from vtc_tpu.models import create_model
    from vtc_tpu.models.clip_model import CLIP_VARIANTS
    from vtc_tpu.data.preprocess import extract_patches

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type=model_type, seed=0, dtype=dtype
    )
    variant = CLIP_VARIANTS[model_type]
    if dtype_name == "bf16":
        # matmul weights in bf16 (halved weight HBM traffic); LN/embeddings
        # stay fp32 — the same cast serving uses
        from vtc_tpu.models.factory import convert_weights

        variables = dict(variables)
        variables["params"] = convert_weights(variables["params"], dtype)

    # loop `iters` forwards inside ONE jitted program so host<->device
    # dispatch overhead (large on tunneled dev backends) doesn't pollute the
    # device-throughput measurement; a data dependency prevents DCE.
    # `variables` is a jit ARGUMENT — closing over the weights would embed
    # 151M parameters as HLO constants and blow up compilation.
    @jax.jit
    def fwd_n(variables, vis, title, comments, n):
        def body(i, carry):
            # EVERY input must depend on the carry, otherwise XLA hoists the
            # corresponding tower out of the loop and the bench overstates
            # throughput (caught: loop-invariant tokens let the whole text
            # tower run once instead of per iteration).
            v = vis + (carry * 1e-12).astype(vis.dtype)  # uint8-safe zero
            tok_eps = (carry * 1e-12).astype(jnp.int32)
            t = title + tok_eps
            c = comments + tok_eps
            feats_vis, feats_text, sim = module.apply(variables, v, t, c)
            return jnp.sum(sim).astype(jnp.float32)

        # dynamic loop bound: warmup and timed calls share one executable
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    # uint8 patch input: the flagship eval fast path (4x fewer transfer
    # bytes; zero device-side layout work — normalization rides the conv)
    rng = np.random.default_rng(0)
    res = variant.input_resolution
    u8 = rng.integers(0, 256, (batch, res, res, 3), dtype=np.uint8)
    vis = jnp.asarray(extract_patches(u8, variant.patch_size))

    # realistic text lengths: VTC titles/comments are short (~15 BPE tokens)
    # and the eval CLI truncates to the EOT bucket (exactness-preserving —
    # the causal tower never reads past EOT); ntoks=77 is the worst case.
    from vtc_tpu.data.tokenizer import synthetic_tokens

    def make_tokens(lead, n_real=14):
        return jnp.asarray(synthetic_tokens(lead, ntoks, n_real, rng))

    title = make_tokens((batch,))
    comments = make_tokens((batch, 5))

    # synchronize via an explicit host transfer: block_until_ready is not
    # reliable on all experimental PJRT backends
    float(fwd_n(variables, vis, title, comments, jnp.int32(warmup)))
    # median of `windows` timed windows of the same executable (the repo's
    # stated measurement discipline; best-of-N systematically reports the
    # fast tail)
    vals = []
    for _ in range(windows):
        tic = time.perf_counter()
        float(fwd_n(variables, vis, title, comments, jnp.int32(iters)))
        vals.append(batch * iters / (time.perf_counter() - tic))
    return float(sorted(vals)[len(vals) // 2])
"""


def _run_code_subprocess(code: str, extra_env=None, timeout=2400) -> float:
    env = dict(os.environ)
    # APPEND to PYTHONPATH: the axon sitecustomize lives on it — clobbering
    # would leave JAX_PLATFORMS=axon with no registered plugin
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).parent)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=timeout, cwd=str(Path(__file__).parent),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"bench subprocess failed: {out.stderr[-2000:]}")


def _subprocess_run(
    expr: str, extra_env=None, timeout=2400, force_cpu=False
) -> float:
    prelude = ""
    if force_cpu:
        # The sitecustomize registers the axon plugin and sets
        # jax_platforms="axon,cpu" at CONFIG level in every process, so the
        # JAX_PLATFORMS env var alone does NOT keep this subprocess off the
        # TPU (and with the tunnel down it would hang in axon client
        # creation). Re-update the config before first device use and
        # assert the backend actually is CPU — a baseline silently measured
        # through the tunnel would corrupt vs_baseline.
        prelude = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        )
    code = prelude + BENCH_CODE + f"\nprint('RESULT', {expr})\n"
    return _run_code_subprocess(code, extra_env, timeout)


def _measure_train() -> float:
    """Flagship finetune train-step throughput (forward + backward + 4-group
    Adam update) in its own clean subprocess — the exact
    ``scripts/bench_train_step.py 128 16 PretrainedCLIP_finaltf 0 24 6``
    recipe with the uint8 patch input (PERFORMANCE.md "Training throughput
    r3"); median of 3 fori_loop windows. Putting it in the driver artifact
    means a train-step regression fails loudly instead of hiding in
    PERFORMANCE.md history."""
    code = (
        "import os, sys\n"
        "sys.path.insert(0, 'scripts')\n"
        "os.environ.setdefault('VTC_BENCH_PATCHES', '1')\n"
        "import bench_train_step\n"
        "v = bench_train_step.main(128, 16, 'PretrainedCLIP_finaltf', 0,"
        " iters=24, warmup=6)\n"
        "print('RESULT', v)\n"
    )
    return _run_code_subprocess(code, timeout=2400)


def _probe_tpu(total_budget_s: float = 1800.0, attempt_timeout_s: float = 120.0):
    """Fail fast (and loudly) when the TPU tunnel is unreachable.

    The headline measurement runs in THIS process, and a hung axon client
    creation blocks in C (uninterruptible) — observed when the tunnel is
    down: ``jax.devices()`` never returns. Probe device init in a subprocess
    (killable) with a bounded per-attempt timeout, retrying for up to
    ``total_budget_s`` in case the outage is transient. Raises RuntimeError
    when the budget is exhausted so the caller exits nonzero instead of
    stalling the driver indefinitely.
    """
    if os.environ.get("BENCH_SKIP_TPU_PROBE") == "1":
        return
    code = "import jax; d = jax.devices(); print('PROBE_OK', len(d), d[0].platform)"
    deadline = time.monotonic() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=attempt_timeout_s,
            )
            if "PROBE_OK" in out.stdout:
                return
            err = out.stderr[-500:]
        except subprocess.TimeoutExpired:
            err = f"device init did not return within {attempt_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(
                f"TPU backend unreachable after {attempt} probe attempts "
                f"({total_budget_s:.0f}s budget); last error: {err}"
            )
        print(
            f"warning: TPU probe attempt {attempt} failed ({err}); "
            f"retrying ({remaining:.0f}s left)",
            file=sys.stderr,
        )
        time.sleep(min(60.0, max(0.0, remaining)))


def _measure_cpu() -> float:
    """CPU baseline in a clean subprocess (the TPU plugin owns this process).

    The cache is keyed on a hash of the bench workload so a stale baseline
    measured under an older harness (different input path / windowing) can
    never be compared against the current TPU number.
    """
    import hashlib

    key = hashlib.sha256(BENCH_CODE.encode()).hexdigest()[:16]
    if CACHE.exists():
        try:
            cached = json.loads(CACHE.read_text())
            if cached.get("workload") == key:
                return float(cached["pairs_per_sec"])
        except Exception:
            pass
    val = _subprocess_run(
        "run(8, 2, 1, 'fp32', windows=1)", {"JAX_PLATFORMS": "cpu"},
        timeout=1800, force_cpu=True,
    )
    CACHE.write_text(
        json.dumps({"pairs_per_sec": val, "ts": time.time(), "workload": key})
    )
    return val


def main():
    # fixed-harness batch sweep history in PERFORMANCE.md; 160 is the benched
    # optimum on v5e for ViT-B/32 + 5 comments
    # iters=96 amortizes the ~33 ms fixed window-sync overhead of the dev
    # tunnel (sweep: 16 -> 6309, 32 -> 6529, 48 -> 6686, 96 -> 6730 pairs/s
    # at identical device time; PERFORMANCE.md round 3)
    batch = int(os.environ.get("BENCH_BATCH", 160))
    iters = int(os.environ.get("BENCH_ITERS", 96))
    # BENCH_MODEL switches the CLIP variant (ViT-B/16, ViT-L/14 rows in
    # PERFORMANCE.md); the full-context and CPU-baseline companions only run
    # for the default flagship so vs_baseline always compares like with like
    model_type = os.environ.get("BENCH_MODEL", "ViT-B/32")

    _probe_tpu()

    # train probe FIRST (round-5 receipt: run last — after several
    # compile-heavy subprocesses in the same bench session — it reads ~5%
    # low vs an identical fresh run, the known late-subprocess degradation;
    # first, it matches the standalone number). The eval headline runs in
    # the main process either way.
    train_sps = None
    if model_type == "ViT-B/32" and os.environ.get("BENCH_SKIP_TRAIN") != "1":
        try:
            train_sps = _measure_train()
        except Exception as e:
            print(f"warning: train probe unavailable ({e})", file=sys.stderr)

    ns = {}
    exec(BENCH_CODE, ns)
    tpu_pps = ns["run"](
        batch, iters, warmup=3, dtype_name="bf16", model_type=model_type
    )

    if model_type != "ViT-B/32":
        print(json.dumps({
            "metric": "eval_clip_pairs_per_sec_per_chip",
            "value": round(tpu_pps, 2),
            "unit": "pairs/s",
            "model": model_type,
            "vs_baseline": None,
        }))
        return

    # worst case (full 77-token context) in its own clean subprocess
    full_ctx = None
    if os.environ.get("BENCH_SKIP_FULL_CONTEXT") != "1":
        try:
            full_ctx = _subprocess_run("run(96, 8, 2, 'bf16', ntoks=77)")
        except Exception as e:
            print(f"warning: full-context run unavailable ({e})", file=sys.stderr)

    try:
        cpu_pps = _measure_cpu()
    except Exception as e:
        print(f"warning: CPU baseline unavailable ({e})", file=sys.stderr)
        cpu_pps = None

    result = {
        "metric": "eval_clip_pairs_per_sec_per_chip",
        "value": round(tpu_pps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_pps / cpu_pps, 2) if cpu_pps else None,
    }
    if full_ctx is not None:
        result["full_context_pairs_per_sec"] = round(full_ctx, 2)
    # the north-star quality metric (BASELINE.md Table 6a/6b) needs real
    # CLIP weights + BPE merges, absent in this container; record WHY it is
    # missing in every round's artifact instead of silently omitting it
    if os.environ.get("VTC_CLIP_WEIGHTS"):
        result["quality_parity"] = "run scripts/verify_real_weights.py"
    else:
        result["quality_parity"] = (
            "asset-gated — set VTC_CLIP_WEIGHTS/VTC_BPE_VOCAB and run "
            "scripts/verify_real_weights.py"
        )
    # analytic MFU: 16.0 GFLOP/pair (ViT-B/32 visual tower + 6 text encodes
    # at 16-token EOT buckets + CAM; PERFORMANCE.md) over the v5e bf16 peak
    result["mfu"] = round(tpu_pps * 16.0e9 / 197e12, 3)

    # train probe (round-5 item 6, measured up top): the finetune step in the
    # same artifact so BOTH hot paths are regression-gated. Train MFU =
    # samples/s x 3 x 16.0 GFLOP (fwd + ~2x bwd) / 197 TFLOP/s.
    if train_sps is not None:
        result["train_samples_per_sec"] = round(train_sps, 2)
        result["train_mfu"] = round(train_sps * 3 * 16.0e9 / 197e12, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
