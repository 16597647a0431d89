"""Small utilities mirroring the reference's ``utils/util.py`` for JAX.

The torch-specific helpers translate as:

* ``move_to(obj, device)`` (``utils/util.py:15-31``) -> :func:`device_put_tree`
  using ``jax.device_put`` over a pytree (nested dict/list/tuple of arrays).
* ``extract_tensors`` (``utils/util.py:34-51``) -> :func:`extract_arrays` via
  ``jax.tree_util.tree_leaves``.
* ``inf_loop`` (``utils/util.py:72-75``) -> :func:`inf_loop` (identical
  semantics for any iterable-of-batches factory).
* ``prepare_device`` (``utils/util.py:78-98``) -> :func:`prepare_devices`
  returning the JAX device list (TPU chips instead of CUDA ids).
"""

from __future__ import annotations

from itertools import repeat
from pathlib import Path

import jax
import numpy as np

from .jsonc import read_json, write_json  # re-export  # noqa: F401


def is_image_like_batch(obj) -> bool:
    """True if ``obj`` looks like a batch of RGB images ([b, 3, h, w] or
    [b, h, w, 3]). Mirrors ``utils/util.py:10-12``."""
    arr = obj if hasattr(obj, "shape") else None
    if arr is None or len(arr.shape) != 4:
        return False
    return arr.shape[1] == 3 or arr.shape[-1] == 3


def device_put_tree(obj, device_or_sharding=None):
    """Transfer a nested structure of arrays to a device / sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device_or_sharding), obj
    )


def extract_arrays(obj):
    """List of array leaves from a nested structure."""
    return [x for x in jax.tree_util.tree_leaves(obj) if hasattr(x, "shape")]


def ensure_dir(dirname):
    dirname = Path(dirname)
    if not dirname.is_dir():
        dirname.mkdir(parents=True, exist_ok=False)


def inf_loop(data_loader):
    """Endless data loader wrapper (``utils/util.py:72-75``)."""
    for loader in repeat(data_loader):
        yield from loader


def prepare_devices(n_devices_use: int):
    """Select TPU/accelerator devices analogous to ``prepare_device``
    (``utils/util.py:78-98``). Returns (devices, n_used)."""
    devices = jax.devices()
    n_avail = len(devices)
    if n_devices_use > n_avail:
        print(
            f"Warning: {n_devices_use} devices configured but only "
            f"{n_avail} available on this host."
        )
        n_devices_use = n_avail
    if n_devices_use <= 0:
        n_devices_use = n_avail
    return devices[:n_devices_use], n_devices_use


def to_numpy_tree(obj):
    """Bring a pytree of device arrays back to host numpy."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), obj)


def allgather_varlen(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-process variable-length (leading-axis) arrays across
    all processes, in process order. Two tiny collectives: counts, then the
    max-padded payload (``multihost_utils.process_allgather`` needs equal
    shapes on every host). Single-process: identity."""
    from jax.experimental import multihost_utils as mhu

    arr = np.asarray(arr)
    counts = np.asarray(mhu.process_allgather(np.asarray(arr.shape[0], np.int64)))
    m = int(counts.max())
    if arr.shape[0] < m:
        pad = np.zeros((m - arr.shape[0],) + arr.shape[1:], arr.dtype)
        arr = np.concatenate([arr, pad])
    gathered = np.asarray(mhu.process_allgather(arr))  # [P, m, ...]
    return np.concatenate([gathered[p, : int(c)] for p, c in enumerate(counts)])


def init_distributed():
    """Initialize the JAX distributed runtime for a multi-controller pod run
    (``train.py --multihost`` / ``evaluation/eval.py --multihost``). Must run
    BEFORE any device use so ``jax.devices()`` sees the whole slice; the
    no-args form auto-detects coordinator and process topology on TPU pods.

    Off a TPU pod there is nothing to auto-detect, so the standard JAX
    topology env vars are honored explicitly: ``JAX_COORDINATOR_ADDRESS`` +
    ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID`` (the launcher — mpirun wrapper,
    k8s indexed job, or the real-2-process integration test — exports them).

    A sitecustomize (or an importing caller) may have initialized backends
    already — ``jax.distributed.initialize`` refuses then, so reset the
    backend caches (BOTH of them) and retry."""
    import os

    triplet = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    have = {k: os.environ.get(k) for k in triplet}
    kwargs = {}
    if any(have.values()):
        missing = [k for k in triplet if not have[k]]
        if missing:
            # a partially-exported topology (the per-worker JAX_PROCESS_ID is
            # the easiest to miss in a launcher template) must name the
            # contract, not die with a bare KeyError
            raise RuntimeError(
                f"off-pod --multihost needs all three topology env vars "
                f"{triplet} set together; missing: {missing}"
            )
        kwargs = dict(
            coordinator_address=have["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(have["JAX_NUM_PROCESSES"]),
            process_id=int(have["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        import jax._src.xla_bridge as xb

        if not getattr(xb, "_backends", None):
            raise
        xb._clear_backends()
        xb.get_backend.cache_clear()
        jax.distributed.initialize(**kwargs)
