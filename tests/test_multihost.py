"""Real 2-process multihost tests (jax.distributed over CPU/Gloo).

The round-1 suite only exercised the single-process identity path of
`gather_eval_stats`; here two actual processes initialize
jax.distributed, all-gather ragged per-host eval stats (including an
empty tuple), and must compute identical global metrics.  Also pins the
per-host input sharding (disjoint strided cover, equal per batch).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, %r)
import numpy as np
from fastdet.parallel.multihost import gather_eval_stats, process_shard
from fastdet.eval.metrics import ap_per_class

if pid == 0:
    stats = [(np.array([1., 0.]), np.array([0.9, 0.8]), np.array([0., 1.])),
             (np.zeros(0), np.zeros(0), np.zeros(0))]   # empty-batch tuple
    labels = [0.0, 1.0, 1.0]
else:
    stats = [(np.array([1., 1., 0.]), np.array([0.7, 0.6, 0.5]),
              np.array([0., 0., 2.]))]
    labels = [0.0, 2.0]

gs, gl = gather_eval_stats(stats, labels)
assert len(gs) == 3, f"expected 3 stat tuples, got {len(gs)}"
assert sorted(gl) == [0.0, 0.0, 1.0, 1.0, 2.0], gl
# exact reconstruction of every host's ragged tuples, in host order
np.testing.assert_array_equal(gs[0][1], np.asarray([0.9, 0.8], np.float32))
assert gs[1][0].size == 0
np.testing.assert_array_equal(gs[2][2], np.asarray([0., 0., 2.], np.float32))

tp = np.concatenate([s[0] for s in gs])
conf = np.concatenate([s[1] for s in gs])
cls = np.concatenate([s[2] for s in gs])
p, r, mAP, f1 = ap_per_class(tp, conf, cls, np.asarray(gl))
lo, hi = process_shard(10)
print(f"RESULT {pid} {mAP:.8f} {p:.8f} {r:.8f} SHARD {lo} {hi}", flush=True)
""" % REPO


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_eval_stats():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), str(port)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    results = {}
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = tuple(float(v) for v in parts[2:5])
                shards[int(parts[1])] = (int(parts[6]), int(parts[7]))
    assert set(results) == {0, 1}
    # every host computes identical global metrics
    assert results[0] == results[1]
    # process_shard: disjoint contiguous cover of [0, 10)
    (a0, a1), (b0, b1) = shards[0], shards[1]
    assert a0 == 0 and a1 == b0 and b1 == 10


def test_loader_shard_disjoint_cover():
    """shard=(i,n) index streams are disjoint, equal-size per batch, and
    cover the dataset; identical shuffles across 'hosts'."""
    from fastdet.data.loader import DataLoader

    class FakeDS:
        def __len__(self):
            return 23

    def indices(shard, epoch):
        dl = DataLoader(FakeDS(), batch_size=4, shuffle=True,
                        drop_last=False, shard=shard)
        dl.set_epoch(epoch)
        return [i for chunk in dl._batch_indices() for i in chunk]

    full = set(range(23))
    for epoch in (0, 3):
        i0 = indices((0, 2), epoch)
        i1 = indices((1, 2), epoch)
        assert not (set(i0) & set(i1))
        assert set(i0) | set(i1) == full
        # shuffle identical across hosts: shard streams interleave the
        # same global permutation
        merged = [None] * 23
        merged[0::2], merged[1::2] = i0, i1
        assert sorted(merged) == sorted(full)
        # deterministic per epoch
        assert i0 == indices((0, 2), epoch)
    # different epochs shuffle differently
    assert indices((0, 2), 0) != indices((0, 2), 1)

    # len() reflects the shard
    dl = DataLoader(FakeDS(), batch_size=4, shuffle=False, shard=(0, 2))
    assert len(dl) == 3  # 12 items -> 3 batches
    dl2 = DataLoader(FakeDS(), batch_size=4, shuffle=False, shard=(1, 2))
    assert len(dl2) == 3  # 11 items -> 2.75 -> 3
