"""Multi-host input sharding (``data/loader.py``): with ``shard_by_process``
each host must read a DISJOINT slice of one identically-shuffled index
stream whose union covers the dataset — the JAX-multihost analogue of the
reference's single-host DataLoader semantics (``train.py:48-64``).

No real multi-host runtime exists in tests; ``jax.process_index`` /
``jax.process_count`` are monkeypatched, which is exactly the surface the
loaders consult.
"""

import numpy as np
import pytest


class _IndexDataset:
    """__getitem__ returns its own index — batches reveal the index stream."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.asarray(i, dtype=np.int64)


def _patch_process(monkeypatch, index, count):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: index)
    monkeypatch.setattr(jax, "process_count", lambda: count)


def _drain(loader):
    return np.concatenate([np.asarray(b).ravel() for b in loader])


@pytest.mark.parametrize("n_hosts", [2, 4])
def test_threaded_loader_hosts_are_disjoint_and_cover(monkeypatch, n_hosts):
    from vtc_tpu.data.loader import DataLoader

    n = 64  # divides evenly over 2 and 4 hosts
    per_host = []
    for h in range(n_hosts):
        _patch_process(monkeypatch, h, n_hosts)
        dl = DataLoader(
            _IndexDataset(n), batch_size=4, shuffle=True, seed=7,
            num_workers=0, shard_by_process=True,
        )
        assert dl.process_count == n_hosts
        assert len(dl) == (n // n_hosts) // 4
        per_host.append(_drain(dl))

    sets = [set(map(int, s)) for s in per_host]
    for a in range(n_hosts):
        for b in range(a + 1, n_hosts):
            assert not sets[a] & sets[b], (a, b)
    assert set.union(*sets) == set(range(n))

    # identical shuffle stream: the hosts' slices concatenate back into ONE
    # global permutation (all hosts drew the same epoch-seeded shuffle)
    _patch_process(monkeypatch, 0, 1)
    global_dl = DataLoader(
        _IndexDataset(n), batch_size=4, shuffle=True, seed=7, num_workers=0
    )
    global_stream = _drain(global_dl)
    np.testing.assert_array_equal(np.concatenate(per_host), global_stream)


def test_threaded_loader_epochs_reshuffle_consistently(monkeypatch):
    """Epoch 2's stream differs from epoch 1's but is still the SAME
    permutation on every host (epoch counter advances in lockstep)."""
    from vtc_tpu.data.loader import DataLoader

    n, n_hosts = 32, 2
    streams = []  # [host][epoch]
    for h in range(n_hosts):
        _patch_process(monkeypatch, h, n_hosts)
        dl = DataLoader(
            _IndexDataset(n), batch_size=4, shuffle=True, seed=3,
            num_workers=0, shard_by_process=True,
        )
        streams.append([_drain(dl), _drain(dl)])

    for epoch in (0, 1):
        joined = set(map(int, np.concatenate([s[epoch] for s in streams])))
        assert joined == set(range(n))
    assert not np.array_equal(streams[0][0], streams[0][1])  # reshuffled


def test_threaded_loader_uneven_tail(monkeypatch):
    """n % hosts != 0: the tail is dropped host-symmetrically (every host
    gets exactly n // hosts samples — no host can run longer than another,
    which would deadlock collectives)."""
    from vtc_tpu.data.loader import DataLoader

    n, n_hosts = 67, 4  # 67 = 4*16 + 3
    lens, all_idx = [], []
    for h in range(n_hosts):
        _patch_process(monkeypatch, h, n_hosts)
        dl = DataLoader(
            _IndexDataset(n), batch_size=4, shuffle=True, seed=0,
            num_workers=0, shard_by_process=True, drop_last=True,
        )
        got = _drain(dl)
        lens.append(len(got))
        all_idx.append(got)
        assert len(dl) == (n // n_hosts) // 4 == len(got) // 4

    assert len(set(lens)) == 1  # identical step counts across hosts
    joined = np.concatenate(all_idx)
    assert len(joined) == len(set(map(int, joined)))  # still disjoint
    assert len(joined) == n_hosts * (n // n_hosts)


def test_threaded_loader_drop_last_interaction(monkeypatch):
    """drop_last applies to the PER-HOST slice: 34 samples over 2 hosts is
    17 each; batch 4 -> 4 full batches per host with drop_last."""
    from vtc_tpu.data.loader import DataLoader

    n, n_hosts = 34, 2
    for h in range(n_hosts):
        _patch_process(monkeypatch, h, n_hosts)
        dl = DataLoader(
            _IndexDataset(n), batch_size=4, shuffle=False, num_workers=0,
            shard_by_process=True, drop_last=True,
        )
        assert len(dl) == 4
        assert len(_drain(dl)) == 16
        dl2 = DataLoader(
            _IndexDataset(n), batch_size=4, shuffle=False, num_workers=0,
            shard_by_process=True, drop_last=False,
        )
        assert len(dl2) == 5  # 17 -> 4 full + 1 tail batch
        assert len(_drain(dl2)) == 17


def test_grain_loader_hosts_are_disjoint_and_cover(monkeypatch):
    from vtc_tpu.data.loader import GrainDataLoader

    n, n_hosts = 64, 2
    per_host = []
    for h in range(n_hosts):
        _patch_process(monkeypatch, h, n_hosts)
        dl = GrainDataLoader(
            _IndexDataset(n), batch_size=4, shuffle=True, seed=5,
            num_workers=0, shard_by_process=True,
        )
        assert len(dl) == (n // n_hosts) // 4
        per_host.append(_drain(dl))

    sets = [set(map(int, s)) for s in per_host]
    assert not sets[0] & sets[1]
    assert set.union(*sets) == set(range(n))


def test_grain_loader_len_counts_per_process_batches(monkeypatch):
    """__len__ is the PER-PROCESS batch count (an unsharded count would
    inflate len_epoch / StepLR steps_per_epoch by process_count)."""
    from vtc_tpu.data.loader import GrainDataLoader

    _patch_process(monkeypatch, 1, 4)
    dl = GrainDataLoader(
        _IndexDataset(64), batch_size=4, shuffle=False,
        num_workers=0, shard_by_process=True,
    )
    assert len(dl) == 4  # 64/4 hosts = 16 records -> 4 batches
    assert len(list(dl)) == 4


def test_shard_batch_routes_multihost_through_process_local(monkeypatch):
    """`parallel.mesh.shard_batch` must assemble the global array from the
    process-LOCAL slice on multi-host (jax.make_array_from_process_local_data)
    — a plain device_put against the global sharding would treat each host's
    slice as the whole batch. Single-host keeps the device_put fast path."""
    import jax
    import jax.numpy as jnp

    from vtc_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh(2, 1, devices=jax.devices()[:2])
    batch = (np.arange(8, dtype=np.float32).reshape(4, 2), {"n": 3})

    # single-host: device_put path, correctly sharded global array
    out = shard_batch(batch, mesh)
    assert out[0].shape == (4, 2)
    assert out[1]["n"] == 3
    np.testing.assert_array_equal(np.asarray(out[0]), batch[0])

    calls = []

    def fake_from_local(sharding, x):
        calls.append(tuple(x.shape))
        return jax.device_put(jnp.asarray(x), sharding)  # stand-in

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        jax, "make_array_from_process_local_data", fake_from_local
    )
    out2 = shard_batch(batch, mesh)
    assert calls == [(4, 2)]  # every array leaf routed; scalars untouched
    assert out2[1]["n"] == 3
