"""Trainer: epoch loop with the reference's monitor / early-stop / checkpoint
semantics (``trainer/base_trainer.py:9-219``) around a jit-compiled functional
train step (``trainer/trainer.py:56-123``'s hot loop, TPU-style).

Differences from the reference are all JAX-shaped, not behavioral:

* forward/backward/update is one compiled ``train_step`` (donated state) —
  the whole batch loop body runs on device; the host only feeds batches.
* DataParallel is replaced by batch sharding over the mesh's ``data`` axis;
  gradient psums ride ICI via the partitioner.
* stochastic switches (adapter skip, comment masking, dropout) consume a
  per-step PRNG folded from a base seed — bitwise reproducible.
* the per-epoch MSRVTT retrieval probe (``trainer/trainer.py:152-182``) runs
  when the MSRVTT data root exists, in both normal and adapter-skip modes.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import TensorboardWriter, inf_loop

try:  # optional third sink (reference logs to wandb, trainer/trainer.py:92,120)
    import wandb as _wandb
except ImportError:  # pragma: no cover
    _wandb = None


def _wandb_log(payload: dict) -> None:
    if _wandb is not None and getattr(_wandb, "run", None) is not None:
        _wandb.log(payload)
from .checkpoints import (
    assert_warm_start_keys,
    graft_params,
    load_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from .metrics import LossMetric, MetricTracker

logger = logging.getLogger(__name__)


class TrainState(flax.struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any
    batch_stats: Any


def global_truncate_tokens(data, multihost: bool):
    """EOT-bucket truncation with host-independent shapes.

    Single-host: bucket from the local batch's max EOT (the measured
    2.6x-eval/+44%-train text lever, PERFORMANCE.md). Multihost: every
    process sees a different slice, so a local-max bucket would diverge
    across controllers (different traced shapes -> crash/deadlock at the
    first collective). Instead allgather ONE int32 — the local coverage —
    and bucket on the global max, so all controllers trace identical shapes
    and the lever survives pod runs (round 4 disabled it wholesale there)."""
    from ..data.tokenizer import batch_token_need, truncate_batch_tokens

    if not multihost:
        return truncate_batch_tokens(data)
    need = batch_token_need(data)
    if need is None:
        return list(data)
    from jax.experimental import multihost_utils

    global_need = int(
        np.max(multihost_utils.process_allgather(np.asarray(need, np.int32)))
    )
    return truncate_batch_tokens(data, need=global_need)


def _flatten_data(data):
    """Flatten one level of tuple nesting (the audio-with-comments case,
    ``dataset_loaders.py:1039``)."""
    flat = []
    for d in data:
        if isinstance(d, (tuple, list)):
            flat.extend(d)
        else:
            flat.append(d)
    return tuple(flat)


def _logit_scale(params):
    """The contrastive temperature leaf (``retrieval.py:_sim`` computes
    ``exp(logit_scale) * v @ t.T``; the CLIP-family models keep it on the
    clip tower). Accumulation reconstructs the full-batch similarity from
    the concatenated features, so it needs this leaf explicitly. Mapping
    (`in`/`get`) access so flax FrozenDict trees work too."""
    node = params.get("clip", params)
    if "logit_scale" in node:
        return node["logit_scale"]
    raise ValueError(
        "accum_steps > 1 needs a contrastive model with a logit_scale "
        "param (the CLIP retrieval families); this model has none"
    )


def make_step_fns(module, criterion, tx, donate: bool = True,
                  aux_loss_weight: float = 0.01, accum_steps: int = 1,
                  mesh=None):
    """Build (train_step, eval_step) for a model module.

    ``aux_loss_weight`` scales any auxiliary losses modules sow into the
    "losses" collection (currently the MoE adapter's load-balance loss,
    ``parallel/expert.py`` — the Switch-standard 0.01 default).

    ``accum_steps > 1`` enables EXACT large-batch contrastive gradient
    accumulation (beyond reference; config ``trainer.accum_steps`` /
    ``train.py --accum_steps``): the batch is scanned in ``accum_steps``
    microbatches with the encode wrapped in ``jax.checkpoint``, the
    per-microbatch features are concatenated, and the symmetric InfoNCE is
    computed over the FULL batch's similarity matrix — so the in-batch
    negatives (and therefore loss and gradients) are those of the large
    batch, not of the microbatches. Activation memory is one microbatch's;
    the backward re-encodes each microbatch (GradCache's two-pass schedule,
    expressed as rematerialization instead of hand-rolled VJP plumbing).
    Naive per-microbatch loss averaging would silently shrink the negative
    set — the thing large batches are FOR in contrastive training.

    Eligibility: models with BatchNorm running stats are REFUSED (per-
    microbatch statistics would change semantics; raised at trace time).
    MoE aux losses become the mean of per-microbatch load-balance losses —
    the standard microbatched-Switch formulation, deliberately not the
    full-batch balance. Per-sample PRNG streams fold per microbatch.

    ``mesh`` (the training mesh, when sharded) lets the accumulation split
    carry explicit sharding constraints so the microbatch reshape never
    forces a GSPMD reshard — see ``_split_microbatches``."""
    import inspect

    call_params = inspect.signature(type(module).__call__).parameters
    has_train_kwarg = "train" in call_params
    has_branch_kwarg = "branch_override" in call_params

    _batch_axes = None
    if mesh is not None:
        from ..parallel.mesh import batch_pspec

        _batch_axes = batch_pspec(mesh)[0]

    def _constrain(x, spec):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    def _split_microbatches(x):
        """[B, ...] -> [k, B/k, ...] microbatches WITHOUT resharding.

        Strided assignment — sample ``j*k + i`` goes to microbatch ``i``,
        row ``j`` — keeps each device's contiguous batch block intact under
        the ``[B/k, k]`` reshape, so both the reshape and the transpose are
        local. The contiguous ``[k, B/k]`` split used before round 5 divided
        the SHARDED axis itself, which GSPMD can only realize by fully
        replicating the tensor ("Involuntary full rematerialization", the
        round-4 dryrun warning) — on a real pod that replicates the
        [B, F, 3, H, W] video batch to every device on every accumulated
        step. Microbatch composition changes, but the loss is the full
        batch's either way and ``_unsplit_microbatches`` restores original
        row order for the outputs."""
        k = accum_steps
        x = x.reshape((x.shape[0] // k, k) + x.shape[1:])
        x = _constrain(x, (_batch_axes, None))
        return jnp.swapaxes(x, 0, 1)

    def _unsplit_microbatches(y):
        """[k, B/k, ...] scan outputs -> [B, ...] in ORIGINAL batch order
        (inverse of the strided split: row ``j*k + i`` = ``y[i, j]``), so
        metrics/meta pairing and the sim-matrix diagonal are untouched."""
        y = jnp.swapaxes(y, 0, 1)
        y = y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:])
        return _constrain(y, (_batch_axes,))

    def _apply(params, batch_stats, data, train, rngs, branch_override=None):
        # uint8 HWC images normalize on device (4x less host->device traffic
        # than fp32 CHW; identical arithmetic to the host transform on
        # already-resized frames)
        from ..data.preprocess import normalize_uint8_images

        data = tuple(normalize_uint8_images(d) for d in data)
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        kwargs = {}
        if has_train_kwarg:
            kwargs["train"] = train
        if branch_override is not None and has_branch_kwarg:
            kwargs["branch_override"] = branch_override
        # "losses" collects sown auxiliary losses (empty for dense models)
        mutable_arg = mutable + ["losses"] if train else False
        out = module.apply(
            variables, *data, rngs=rngs, mutable=mutable_arg, **kwargs
        )
        if mutable_arg:
            return out
        return out, {}

    def train_step(state: TrainState, data, meta, rng):
        rngs = {
            "adapter_skip": jax.random.fold_in(rng, 1),
            "comment_mask": jax.random.fold_in(rng, 2),
            "dropout": jax.random.fold_in(rng, 3),
        }

        def loss_fn(params):
            out, new_vars = _apply(params, state.batch_stats, data, True, rngs)
            loss = criterion(out, meta)
            aux = jax.tree_util.tree_leaves(new_vars.get("losses", {}))
            if aux:  # static: present only when the model sows aux losses
                loss = loss + aux_loss_weight * sum(
                    jnp.mean(a) for a in aux
                )
            return loss, (out, new_vars)

        (loss, (out, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if hasattr(tx, "apply"):
            # fused single-pass optimizer: the param write rides the same
            # per-leaf kernel as the moment updates (PERFORMANCE.md round 3)
            new_params, new_opt_state = tx.apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_vars.get("batch_stats", state.batch_stats),
        )
        return new_state, loss, out

    def accum_train_step(state: TrainState, data, meta, rng):
        k = int(accum_steps)
        if any(d.shape[0] % k for d in data):
            raise ValueError(
                f"accum_steps={k} must divide the batch "
                f"({[d.shape[0] for d in data]})"
            )
        if state.batch_stats:
            # BatchNorm running stats under microbatching would normalize
            # each microbatch with its own statistics and take k momentum
            # updates per step — NOT the large-batch semantics this step
            # advertises. Refuse rather than silently deviate (the bn/
            # sub_mean residual-activation variants are the only archs
            # with batch_stats).
            raise ValueError(
                "accum_steps > 1 is not supported for models with "
                "BatchNorm running stats (batch_stats non-empty): "
                "per-microbatch statistics change the training semantics"
            )

        def mb_rngs(i):
            # per-sample streams (adapter_skip/comment_mask draw [b,·]
            # uniforms, cam.py:180,206) — fold by microbatch index so draws
            # are independent across microbatches, not repeated
            base = {
                "adapter_skip": jax.random.fold_in(rng, 1),
                "comment_mask": jax.random.fold_in(rng, 2),
                "dropout": jax.random.fold_in(rng, 3),
            }
            return {n: jax.random.fold_in(r, i) for n, r in base.items()}

        def loss_fn(params):
            def encode_mb(bs, idx_and_data):
                i, mb = idx_and_data
                out, new_vars = _apply(params, bs, mb, True, mb_rngs(i))
                aux = jax.tree_util.tree_leaves(new_vars.get("losses", {}))
                aux = (
                    sum(jnp.mean(a) for a in aux)
                    if aux
                    else jnp.zeros((), jnp.float32)
                )
                new_bs = new_vars.get("batch_stats", bs)
                return new_bs, (out[0], out[1], aux)

            # rematerialize each microbatch's encode: forward stores only
            # the features; backward re-encodes one microbatch at a time —
            # GradCache's memory profile out of jax.checkpoint + lax.scan
            encode_mb = jax.checkpoint(encode_mb)
            mbs = jax.tree_util.tree_map(_split_microbatches, tuple(data))
            final_bs, (vs, ts, auxs) = jax.lax.scan(
                encode_mb, state.batch_stats, (jnp.arange(k), mbs)
            )
            feats_vis = _unsplit_microbatches(vs)
            feats_text = _unsplit_microbatches(ts)
            # the FULL batch's similarity matrix — the whole point: the
            # InfoNCE negatives are the large batch's, not a microbatch's
            # (retrieval.py:_sim; logit_scale lives under the clip tower)
            scale = jnp.exp(_logit_scale(params))
            sim = scale * jnp.matmul(
                feats_vis, feats_text.T, preferred_element_type=jnp.float32
            )
            out = (feats_vis, feats_text, sim)
            loss = criterion(out, meta) + aux_loss_weight * jnp.mean(auxs)
            return loss, (out, {"batch_stats": final_bs})

        (loss, (out, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if hasattr(tx, "apply"):
            new_params, new_opt_state = tx.apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_vars.get("batch_stats", state.batch_stats),
        )
        return new_state, loss, out

    def eval_step(state: TrainState, data, meta, branch_override=None):
        out, _ = _apply(
            state.params, state.batch_stats, data, False, None, branch_override
        )
        loss = criterion(out, meta)
        return loss, out

    step = train_step if accum_steps <= 1 else accum_train_step
    donate_args = {"donate_argnums": (0,)} if donate else {}
    return (
        jax.jit(step, **donate_args),
        jax.jit(eval_step, static_argnames=("branch_override",)),
    )


class Trainer:
    """Reference Trainer + BaseTrainer merged (the split added nothing)."""

    def __init__(
        self,
        module,
        variables,
        criterion,
        metrics,
        tx,
        config,
        data_loader,
        valid_data_loader=None,
        len_epoch: Optional[int] = None,
        mesh=None,
        seed: int = 1023,
        probe_fn: Optional[Callable] = None,
        branch_to_adapt_val: Optional[str] = None,
        arch_name: str = "model",
    ):
        self.module = module
        self.criterion = criterion
        self.metrics = metrics
        self.tx = tx
        self.config = config
        self.mesh = mesh
        self.base_rng = jax.random.PRNGKey(seed)
        self.probe_fn = probe_fn
        self.branch_to_adapt_val = branch_to_adapt_val
        self.arch_name = arch_name

        cfg_trainer = config["trainer"]
        self.epochs = cfg_trainer["epochs"]
        self.save_period = cfg_trainer.get("save_period", 1)
        # overlap the checkpoint disk write with the next epoch's steps
        self.async_checkpoint = bool(cfg_trainer.get("async_checkpoint", False))
        self.monitor = cfg_trainer.get("monitor", "off")
        self.checkpoint_dir = config.save_dir
        self.logger = (
            config.get_logger("trainer", cfg_trainer.get("verbosity", 2))
            if hasattr(config, "get_logger")
            else logger
        )

        if self.monitor == "off":
            self.mnt_mode = "off"
            self.mnt_best = 0
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
            assert self.mnt_mode in ["min", "max"]
            self.mnt_best = np.inf if self.mnt_mode == "min" else -np.inf
            self.early_stop = cfg_trainer.get("early_stop", np.inf)
            if self.early_stop <= 0:
                self.early_stop = np.inf

        self.start_epoch = 1
        self.writer = TensorboardWriter(
            config.log_dir if hasattr(config, "log_dir") else ".",
            self.logger,
            cfg_trainer.get("tensorboard", False),
        )

        self.data_loader = data_loader
        self._persistent_batches = None
        self._inf_mode = len_epoch is not None
        if len_epoch is None:
            self.len_epoch = len(data_loader)
        else:
            self.data_loader = inf_loop(data_loader)
            self.len_epoch = len_epoch
        self.valid_data_loader = valid_data_loader
        self.do_validation = valid_data_loader is not None
        self.log_step = max(int(np.sqrt(getattr(data_loader, "batch_size", 32))), 1)

        self.train_metrics = MetricTracker(*[m for m in metrics if m.is_train])
        self.train_metrics.add_metric(LossMetric())
        self.train_metrics.set_writer(self.writer)
        self.valid_metrics = MetricTracker(*[m for m in metrics if m.is_val])
        self.valid_metrics.add_metric(LossMetric())
        self.valid_metrics.set_writer(self.writer)

        # config-surfaced MoE load-balance weight (Switch-standard default;
        # only consumed when the model sows aux losses)
        aux_w = float(config.get("moe_aux_loss_weight", 0.01))
        accum = int(cfg_trainer.get("accum_steps", 1))
        self.train_step, self.eval_step = make_step_fns(
            module, criterion, tx, aux_loss_weight=aux_w, accum_steps=accum,
            mesh=mesh,
        )

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        self.fsdp = bool(config.get("fsdp", False))
        if self.fsdp and jax.process_count() > 1:
            # fsdp shards state across HOSTS' devices: checkpoints go down
            # the distributed path (save_checkpoint hands the global
            # jax.Arrays straight to orbax — each host writes only its own
            # shards; graft_params never host-materializes live leaves on
            # resume). The checkpoint dir must be on a filesystem every
            # host sees (orbax's collective-commit contract).
            self.logger.info(
                "fsdp + multihost: distributed checkpointing (per-host "
                "shard writes; save_dir must be shared across hosts)"
            )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats,
        )
        self._shard_state()

        if getattr(config, "resume", None) is not None:
            self._resume_checkpoint(config.resume)

    # ------------------------------------------------------------------ #

    def _shard_state(self):
        """Lay the train state out over the mesh: TP params by the Megatron
        rules, everything else replicated — or, with ``fsdp`` in the config,
        large params AND their Adam moments sharded over the data axis
        (ZeRO-3; parallel/mesh.py module docstring). The reference replicates
        the full model per GPU (``train.py:77-79``)."""
        if self.mesh is None:
            return
        from ..parallel.mesh import tree_shardings

        self.state = jax.device_put(
            self.state, tree_shardings(self.state, self.mesh, fsdp=self.fsdp)
        )

    def _put_batch(self, tree):
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(tree, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, tree)

    def _batches(self, loader):
        """Host batching overlapped with device compute: device_put up to 2
        batches ahead (the sharded analogue of pin_memory + prefetch)."""
        multihost = jax.process_count() > 1

        def gen():
            for *data, meta in loader:
                # EOT-bucket truncation (exactness-preserving: causal tower,
                # EOT pooling) — the eval path's measured 2.6x text lever,
                # applied to training too; one shared bucket per batch keeps
                # the compile count bounded by the bucket list. Multihost
                # buckets on the allgathered GLOBAL max EOT so shapes stay
                # lockstep across controllers (global_truncate_tokens); the
                # loaders' shard_by_process + drop_last guarantee every host
                # reaches this collective the same number of times.
                data = _flatten_data(data)
                data = global_truncate_tokens(data, multihost)
                meta_dev = {
                    k: v for k, v in meta.items() if hasattr(v, "shape")
                }
                yield data, meta_dev

        from ..data.loader import prefetch_to_device

        yield from prefetch_to_device(gen(), self.mesh, size=2)

    def _train_epoch(self, epoch: int) -> dict:
        self.train_metrics.reset()
        batch_tic = time.time()
        hz_list = []

        profile_dir = self.config.get("trainer", {}).get("profile_dir") if isinstance(
            self.config.get("trainer", {}), dict
        ) else None
        if profile_dir and epoch == 1:
            jax.profiler.start_trace(profile_dir)

        # one dispatched step stays in flight: step N's loss is pulled to
        # host only after step N+1 has been dispatched, so the device never
        # idles on the host's float(loss) sync (on a tunneled backend a
        # per-step sync costs ~0.6 s; on real hardware it still forfeits
        # async dispatch). Metric values and cadence are unchanged — each
        # batch is flushed individually, one step later.
        pending = None  # (batch_idx, loss_dev, out, meta, batch_size, grid)

        def _flush(entry):
            nonlocal batch_tic, hz_list
            b_idx, loss_dev, out, meta_f, bsz, grid = entry
            loss = float(loss_dev)
            self.writer.set_step((epoch - 1) * self.len_epoch + b_idx)
            self.train_metrics.update(loss, out, meta_f)
            toc = time.time() - batch_tic
            hz = bsz / toc
            hz_list = (hz_list + [hz])[-1000:]
            batch_tic = time.time()
            if b_idx % self.log_step == 0:
                _wandb_log({"loss": loss})
                self.logger.debug(
                    "Train Epoch: %d [%d/%d] Loss: %.6f Speed: %.2fHz (av %.2fHz)",
                    epoch, b_idx, self.len_epoch, loss,
                    hz, float(np.mean(hz_list[-500:])),
                )
                if grid is not None:
                    self.writer.add_image("input", make_grid(grid, nrow=8))

        # In len_epoch (inf_loop) mode the prefetch chain must persist
        # across epochs: rebuilding it each epoch abandons its 2-3 buffered
        # batches of the shared infinite stream at every boundary (samples
        # silently never trained on).
        if self._inf_mode:
            if self._persistent_batches is None:
                self._persistent_batches = self._batches(self.data_loader)
            batch_iter = self._persistent_batches
        else:
            batch_iter = self._batches(self.data_loader)

        # the fold stride must match the ACTUAL steps per epoch: in
        # len_epoch mode an epoch runs len_epoch+1 batches (the post-step
        # break below mirrors the reference's own batch_idx == len_epoch
        # quirk), so a len_epoch stride would reuse the boundary key on the
        # next epoch's first step (identical adapter_skip/comment_mask/
        # dropout draws two steps in a row)
        fold_stride = self.len_epoch + 1 if self._inf_mode else self.len_epoch
        for batch_idx, (data, meta) in enumerate(batch_iter):
            batch_size = data[0].shape[0]
            step_rng = jax.random.fold_in(
                self.base_rng, (epoch - 1) * fold_stride + batch_idx
            )
            self.state, loss, out = self.train_step(
                self.state, data, meta, step_rng
            )
            grid = None
            if batch_idx % self.log_step == 0:
                from ..utils import is_image_like_batch

                if self.writer.writer is not None and is_image_like_batch(
                    data[0]
                ):
                    grid = np.asarray(data[0])
            if pending is not None:
                _flush(pending)
            pending = (batch_idx, loss, out, meta, batch_size, grid)
            if batch_idx == self.len_epoch:
                break
        if pending is not None:
            _flush(pending)

        if profile_dir and epoch == 1:
            jax.profiler.stop_trace()
            self.logger.info("Wrote profiler trace to %s", profile_dir)

        log = self.train_metrics.result()

        if self.do_validation:
            val_log = self._valid_epoch(epoch)
            log.update(**{"val_" + k: v for k, v in val_log.items()})
            _wandb_log({"val_" + k: v for k, v in val_log.items()})
        return log

    def _valid_epoch(self, epoch: int) -> dict:
        self.logger.debug("Starting validation")
        self.valid_metrics.reset()
        n_batches = 0
        for batch_idx, (*data, meta) in enumerate(self.valid_data_loader):
            data = _flatten_data(data)
            data = self._put_batch(data)
            meta_dev = self._put_batch(
                {k: v for k, v in meta.items() if hasattr(v, "shape")}
            )
            loss, out = self.eval_step(
                self.state, data, meta_dev,
                branch_override=self.branch_to_adapt_val,
            )
            self.writer.set_step(
                (epoch - 1) * len(self.valid_data_loader) + batch_idx, "valid"
            )
            self.valid_metrics.update(float(loss), out, meta)
            n_batches += 1
        if n_batches == 0:
            # drop_last validation (reference parity, train.py:57-62) with a
            # per-host split smaller than batch_size yields NO batches — the
            # val metrics come back empty and monitoring silently turns off
            # downstream. Surfaced by the real 2-process multihost test; say
            # the root cause out loud so an operator fixes the batch size
            # instead of chasing the "Metric not found" symptom.
            n_items = len(getattr(self.valid_data_loader, "dataset", []))
            n_hosts = jax.process_count()
            self.logger.warning(
                "Validation loader yielded ZERO batches (val dataset of %s "
                "items across %s host(s): the PER-HOST split is smaller "
                "than batch_size, so drop_last discards everything): val "
                "metrics are empty and monitoring will be disabled. Reduce "
                "batch_size or grow the validation split.",
                n_items, n_hosts,
            )

        # per-epoch retrieval probe, normal + adapter-skip
        # (trainer/trainer.py:152-182)
        if self.probe_fn is not None:
            try:
                probe = self.probe_fn(self, branch_override=None)
                for k, v in probe.items():
                    self.writer.add_scalar(f"probe_{k}", v)
                probe_skip = self.probe_fn(self, branch_override="skip")
                for k, v in probe_skip.items():
                    self.writer.add_scalar(f"probe_skipadapt_{k}", v)
            except FileNotFoundError as e:
                self.logger.warning("Skipping retrieval probe: %s", e)
                self.probe_fn = None

        # per-parameter histograms (trainer/trainer.py:185-186). One
        # device_get for the whole tree — per-leaf np.asarray would pay a
        # host round-trip per parameter (minutes on a tunneled backend,
        # CLAUDE.md "per-leaf host transfers")
        if self.writer.writer is not None:
            host_params = jax.device_get(self.state.params)
            flat = jax.tree_util.tree_leaves_with_path(host_params)
            for path, p in flat:
                name = "/".join(
                    str(getattr(k, "key", k)) for k in path
                )
                self.writer.add_histogram(name, np.asarray(p), bins="auto")

        return self.valid_metrics.result()

    # ------------------------------------------------------------------ #

    def train(self) -> dict:
        not_improved_count = 0
        log: dict = {}
        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)
            log = {"epoch": epoch}
            log.update(result)

            for key, value in log.items():
                self.logger.info("    %15s: %s", str(key), value)

            best = False
            if self.mnt_mode != "off":
                try:
                    improved = (
                        self.mnt_mode == "min"
                        and log[self.mnt_metric] <= self.mnt_best
                    ) or (
                        self.mnt_mode == "max"
                        and log[self.mnt_metric] >= self.mnt_best
                    )
                except KeyError:
                    self.logger.warning(
                        "Metric '%s' not found; disabling monitoring.",
                        self.mnt_metric,
                    )
                    self.mnt_mode = "off"
                    improved = False

                if improved:
                    self.mnt_best = log[self.mnt_metric]
                    not_improved_count = 0
                    best = True
                else:
                    not_improved_count += 1

                if not_improved_count > self.early_stop:
                    self.logger.info(
                        "Validation performance didn't improve for %s epochs. "
                        "Training stops.", self.early_stop,
                    )
                    break

            if epoch % self.save_period == 0:
                self._save_checkpoint(epoch, save_best=best)
        wait_for_checkpoints()  # commit any in-flight async save
        return log

    # ------------------------------------------------------------------ #

    def _save_checkpoint(self, epoch: int, save_best: bool = False):
        # multihost note: every process must reach save_checkpoint — orbax
        # saves are collective (primary writes, the rest barrier); skipping
        # on nonzero ranks would deadrank the barrier. The plain-file
        # sidecar inside IS rank-0-only (checkpoints.py).
        cfg = self.config.config if hasattr(self.config, "config") else self.config
        path = save_checkpoint(
            self.checkpoint_dir,
            f"checkpoint-epoch{epoch}",
            arch=self.arch_name,
            epoch=epoch,
            params=self.state.params,
            opt_state=self.state.opt_state,
            batch_stats=self.state.batch_stats,
            monitor_best=self.mnt_best,
            config=cfg,
            async_save=self.async_checkpoint,
        )
        self.logger.info("Saving checkpoint: %s ...", path)
        if save_best:
            best = save_checkpoint(
                self.checkpoint_dir,
                "model_best",
                arch=self.arch_name,
                epoch=epoch,
                params=self.state.params,
                opt_state=self.state.opt_state,
                batch_stats=self.state.batch_stats,
                monitor_best=self.mnt_best,
                config=cfg,
                async_save=self.async_checkpoint,
            )
            self.logger.info("Saving current best: %s ...", best)

    def _resume_checkpoint(self, resume_path):
        self.logger.info("Loading checkpoint: %s ...", resume_path)
        ckpt = load_checkpoint(resume_path)
        self.start_epoch = int(ckpt.get("epoch", 0)) + 1
        self.mnt_best = float(np.asarray(ckpt.get("monitor_best", self.mnt_best)))

        if ckpt.get("arch") and ckpt["arch"] != self.arch_name:
            self.logger.warning(
                "Checkpoint architecture %s differs from config %s.",
                ckpt["arch"], self.arch_name,
            )

        params, missing, unexpected = graft_params(
            self.state.params, ckpt["params"]
        )
        if missing:
            self.logger.warning("%d missing checkpoint keys", len(missing))
        if unexpected:
            self.logger.warning("%d unexpected checkpoint keys", len(unexpected))
        assert_warm_start_keys(missing, unexpected)

        batch_stats = self.state.batch_stats
        if ckpt.get("batch_stats"):
            batch_stats, _, _ = graft_params(batch_stats, ckpt["batch_stats"])

        opt_state = self.state.opt_state
        restored_opt = ckpt.get("opt_state")
        # the reference does NOT resume optimizer state when the optimizer
        # type or lr changed (base_trainer.py:178-194) — stale Adam moments
        # (and amsgrad's never-decaying nu_max) under a new lr silently
        # change the run's dynamics
        ckpt_opt = dict((ckpt.get("config") or {}).get("optimizer") or {})
        live_opt = dict(self.config.get("optimizer") or {})
        if restored_opt is not None and ckpt_opt and live_opt:
            t_old, t_new = ckpt_opt.get("type"), live_opt.get("type")
            lr_old = (ckpt_opt.get("args") or {}).get("lr")
            lr_new = (live_opt.get("args") or {}).get("lr")
            type_changed = t_old and t_new and t_old != t_new
            lr_changed = (
                lr_old is not None and lr_new is not None
                and float(lr_old) != float(lr_new)
            )
            if type_changed or lr_changed:
                self.logger.warning(
                    "Optimizer %s changed (checkpoint %s -> config %s); "
                    "optimizer state not resumed.",
                    "type" if type_changed else "lr",
                    t_old if type_changed else lr_old,
                    t_new if type_changed else lr_new,
                )
                restored_opt = None
        if restored_opt is not None and not (missing or unexpected):
            # Orbax restores optax's namedtuples/tuples as generic
            # lists/dicts, so a structural tree_map against the live state
            # never matches — graft by flattened leaf order instead (the
            # serialization preserves traversal order), guarded by
            # leaf-count and shape checks so a genuinely changed optimizer
            # still falls back to fresh state with a warning.
            live_leaves, treedef = jax.tree_util.tree_flatten(opt_state)
            restored_leaves = jax.tree_util.tree_leaves(restored_opt)
            shapes_ok = len(live_leaves) == len(restored_leaves) and all(
                getattr(t, "shape", None) == np.asarray(s).shape
                for t, s in zip(live_leaves, restored_leaves)
                if hasattr(t, "shape")
            )
            if shapes_ok:
                opt_state = jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        jnp.asarray(s, dtype=t.dtype)
                        if hasattr(t, "dtype")
                        else s
                        for t, s in zip(live_leaves, restored_leaves)
                    ],
                )
            else:
                # Layout changed (e.g. a checkpoint from the optax-chain
                # formulation resumed into the fused optimizer, or vice
                # versa). The moments can't be mapped structurally, but the
                # step count can: every optax/fused counter is a scalar int
                # equal to the total steps taken, so recovering it keeps the
                # lr schedule at its decayed position — resuming a StepLR
                # run at the undecayed base lr is the divergence risk;
                # fresh Adam moments re-warm within tens of steps.
                def _is_count(leaf):
                    return np.ndim(leaf) == 0 and np.issubdtype(
                        np.asarray(leaf).dtype, np.integer
                    )

                counts = [
                    int(np.asarray(leaf))
                    for leaf in restored_leaves
                    if _is_count(leaf)
                ]
                if counts and any(_is_count(leaf) for leaf in live_leaves):
                    # set EVERY scalar-int counter in the live state (the
                    # fused state's single count, or the chain's per-group
                    # adam/schedule counts — they all advance in lockstep)
                    step = max(counts)
                    opt_state = jax.tree_util.tree_map(
                        lambda leaf: jnp.asarray(
                            step, np.asarray(leaf).dtype
                        ) if _is_count(leaf) else leaf,
                        opt_state,
                    )
                    self.logger.warning(
                        "Optimizer state layout changed (%d vs %d leaves): "
                        "moments reset, lr schedule resumed at step %d.",
                        len(restored_leaves), len(live_leaves), step,
                    )
                else:
                    self.logger.warning(
                        "Optimizer state structure changed "
                        "(%d vs %d leaves); not resuming it.",
                        len(restored_leaves), len(live_leaves),
                    )

        # asarray only host leaves: graft_params returns the LIVE jax.Array
        # for params missing from the checkpoint (possibly multi-host
        # sharded — jnp.asarray on those would try to materialize them)
        def _host_to_dev(x):
            return x if isinstance(x, jax.Array) else jnp.asarray(x)

        self.state = self.state.replace(
            params=jax.tree_util.tree_map(_host_to_dev, params),
            batch_stats=jax.tree_util.tree_map(_host_to_dev, batch_stats),
            opt_state=opt_state,
        )
        self._shard_state()
        self.logger.info(
            "Checkpoint loaded. Resume training from epoch %d", self.start_epoch
        )


def make_grid(images: "np.ndarray", nrow: int = 8, normalize: bool = True):
    """Tile a [b, 3, h, w] (or [b, h, w, 3] — the uint8 transfer path ships
    HWC) batch into one [3, H, W] image for TensorBoard (the
    torchvision.utils.make_grid usage at ``trainer/trainer.py:103-106``)."""
    if images.shape[-1] == 3 and images.shape[1] != 3:
        images = np.transpose(images, (0, 3, 1, 2))
    images = images.astype(np.float32)
    b, c, h, w = images.shape
    ncol = min(nrow, b)
    nrows = (b + ncol - 1) // ncol
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(float(hi - lo), 1e-6)
    grid = np.zeros((c, nrows * h, ncol * w), dtype=np.float32)
    for i in range(b):
        r, col = divmod(i, ncol)
        grid[:, r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid
