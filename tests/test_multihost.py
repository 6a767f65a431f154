"""Two-process jax.distributed smoke tests.

Everything else in the suite runs single-process on an 8-virtual-device CPU
mesh; these tests launch REAL second processes so the
`launch.bootstrap_distributed` rank plumbing and the multi-host eval merge
(`eval.distributed`) are exercised under process_count=2, which the
reference only ever tested on live Slurm (reference: dinov2/utils/
cluster.py:12-115, dinov2/eval/utils.py:86-146).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_CHILD = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
from octic_vits_tpu.launch import bootstrap_distributed, is_main_process
bootstrap_distributed(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert is_main_process() == (pid == 0)

from octic_vits_tpu.eval.distributed import gather_features_across_processes

# odd total so the two shards differ in length (padding path)
total = 5
idx = np.arange(pid, total, 2)
feats = np.stack([np.full((3,), float(i), np.float32) for i in idx])
labels = (idx * 10).astype(np.int64)
f, y = gather_features_across_processes(feats, labels, idx, total)
assert f.shape == (total, 3), f.shape
assert np.allclose(f[:, 0], np.arange(total)), f[:, 0]
assert np.array_equal(y, np.arange(total) * 10), y

# end-to-end: sharded extraction over a toy dataset, identical result on
# both processes and equal to the direct single-pass computation
from octic_vits_tpu.eval.distributed import extract_features_sharded

class ToyDS:
    def __len__(self):
        return 7
    def __getitem__(self, i):
        return np.full((2, 2, 3), float(i), np.float32), i

apply_fn = lambda images: np.asarray(images).mean(axis=(1, 2))  # [B, 3]
fe, ye = extract_features_sharded(apply_fn, ToyDS(), batch_size=2,
                                  num_workers=0)
assert fe.shape == (7, 3), fe.shape
assert np.allclose(fe[:, 0], np.arange(7)), fe[:, 0]
assert np.array_equal(ye, np.arange(7)), ye
print("CHILD_OK", pid, flush=True)
"""


def test_single_process_gather_is_pure_scatter():
    from octic_vits_tpu.eval.distributed import (
        gather_features_across_processes,
    )

    idx = np.array([3, 0, 2, 1])
    feats = np.arange(8, dtype=np.float32).reshape(4, 2)
    labels = np.array([30, 0, 20, 10])
    f, y = gather_features_across_processes(feats, labels, idx, 4)
    assert np.array_equal(y, [0, 10, 20, 30])
    np.testing.assert_array_equal(f[3], feats[0])
    np.testing.assert_array_equal(f[0], feats[1])


def test_two_process_bootstrap_and_eval_merge(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each child gets plain single-device CPU
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, f"127.0.0.1:{port}", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=420))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i}:\n{out}\n{err}"
        assert f"CHILD_OK {i}" in out, f"proc {i}:\n{out}\n{err}"
