"""One dp×tp train step at REAL ViT-B/32 dimensions on the virtual CPU mesh.

The driver's multichip dryrun (``__graft_entry__.dryrun_multichip``) runs
tiny shapes — right for a fast correctness gate, but shape-dependent
sharding edges (12/8-head splits, the 49408-row vocab table, 3072-wide MLP)
only appear at the real dims. This script compiles and executes ONE
dp×tp training step of the flagship image model (PretrainedCLIP_finaltf,
CLIP ViT-B/32 + CAM) with full-size parameters on the 8-device CPU mesh.

Run (CI-optional; measured ~4-6 min on this container's single CPU core,
dominated by XLA CPU compile of the 151M-param train step):

    python scripts/dryrun_fullsize.py [tp]     # tp in {1, 2, 4}; default 2

Also exercised by ``tests/test_fullsize_dptp.py`` when ``VTC_SLOW=1``.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run(n_devices: int = 8, tp: int = 2, batch: int = 8, ntoks: int = 16,
        ncomms: int = 1) -> float:
    import __graft_entry__ as ge

    ge._ensure_devices(n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.parallel.mesh import DATA_AXIS, create_mesh, tree_shardings
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    mesh = create_mesh(n_devices // tp, tp, devices=jax.devices()[:n_devices])

    tic = time.time()
    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="ViT-B/32", seed=0
    )
    t_init = time.time() - tic

    tx = build_optimizer(
        variables["params"],
        {"type": "Adam", "args": {"lr": 1e-5, "amsgrad": True}},
        {"type": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        steps_per_epoch=10,
        adapter_lr=1e-4,
    )
    train_step, _ = make_step_fns(module, clip_loss, tx, donate=False)

    params = jax.device_put(
        variables["params"], tree_shardings(variables["params"], mesh)
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )

    rng = np.random.default_rng(0)
    ds = NamedSharding(mesh, P(DATA_AXIS))
    vis = jax.device_put(
        rng.normal(size=(batch, 3, 224, 224)).astype(np.float32), ds
    )

    def toks(lead):
        t = np.zeros(lead + (ntoks,), np.int32)
        t[..., 0] = 49406
        t[..., 1:4] = rng.integers(1, 49405, lead + (3,))
        t[..., 4] = 49407
        return jax.device_put(t, ds)

    tic = time.time()
    with mesh:
        new_state, loss, _ = train_step(
            state, (vis, toks((batch,)), toks((batch, ncomms))), {},
            jax.random.PRNGKey(0),
        )
        loss = float(loss)
    t_step = time.time() - tic

    assert np.isfinite(loss), loss
    # a sharded in_proj got a real update (head-aligned tp path)
    w_old = np.asarray(jax.device_get(
        state.params["clip"]["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj_weight"]
    ))
    w_new = np.asarray(jax.device_get(
        new_state.params["clip"]["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj_weight"]
    ))
    assert not np.allclose(w_old, w_new)
    assert np.isfinite(w_new).all()

    print(
        f"fullsize dp{n_devices // tp}xtp{tp} ok: loss={loss:.4f}, "
        f"init {t_init:.0f}s, compile+step {t_step:.0f}s"
    )
    return loss


if __name__ == "__main__":
    tp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(tp=tp)
