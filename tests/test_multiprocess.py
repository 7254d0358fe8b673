"""REAL multi-process distributed semantics: two separate Python processes
joined via jax.distributed.initialize (the TPU-pod analogue of the
reference's 4-node DDP runs).

Verifies with process_count=2 actually running:
- gather_dict's cross-host reduce semantics: arrays/lists concatenate in
  process order, floats average (ref: scripts/train_utils.py:615-629)
- the data loader's host sharding: each process sees a disjoint,
  exhaustive slice of the epoch order (ref: DistributedSampler semantics)

The worker runs in subprocesses with JAX_PLATFORMS=cpu; results come back
as JSON. Marked slow: two cold JAX inits.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from synchformer_tpu.train.metrics import gather_dict
from synchformer_tpu.data.pipeline import EpochSampler

# 1) gather semantics: arrays concat in process order, floats average
local = {"logits": np.full((3, 2), float(pid), np.float32),
         "loss": float(pid),
         "tag": "keep-me"}
g = gather_dict(local)

# 2) loader host sharding: disjoint + exhaustive across the two processes
sampler = EpochSampler(10, shuffle=True, seed=0,
                       process_index=pid, process_count=2)
idx = [int(i) for i in sampler.indices(3)]

json.dump({"pid": pid,
           "gathered_logits": np.asarray(g["logits"]).tolist(),
           "gathered_loss": g["loss"],
           "tag": g["tag"],
           "indices": idx}, open(out_path, "w"))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_gather_and_shard(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, stderr.decode()[-2000:]

    results = [json.load(open(o)) for o in outs]
    for r in results:
        # arrays concat in process order: 3 rows of 0.0 then 3 rows of 1.0
        logits = np.asarray(r["gathered_logits"])
        assert logits.shape == (6, 2)
        np.testing.assert_array_equal(logits[:3], 0.0)
        np.testing.assert_array_equal(logits[3:], 1.0)
        # floats average across processes
        assert r["gathered_loss"] == pytest.approx(0.5)
        # non-numeric values pass through untouched
        assert r["tag"] == "keep-me"
    # loader shards are disjoint and exhaustive
    i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
    assert i0.isdisjoint(i1)
    assert i0 | i1 == set(range(10))
    assert len(results[0]["indices"]) == len(results[1]["indices"]) == 5
