"""REAL two-process multi-host execution (VERDICT r2 next-round #4).

Spawns two separate Python processes that rendezvous through
``jax.distributed.initialize`` (setup_runtime's SR3_MULTIHOST +
SR3_COORDINATOR path — the same code a two-node launch runs), each with 4
local CPU devices forming one global 8-device data mesh. Asserts:

- process_count()==2 / device_count()==8 for real (not monkeypatched);
- one sharded train step over process-local half-batches produces the SAME
  loss on both processes AND the same loss as a single-process 8-device
  run of the identical global batch (shard_batch's
  make_array_from_process_local_data assembly is numerically transparent);
- the loader's per-process epoch shards are disjoint and cover the dataset.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_train_step(tmp_path):
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update({
            "SR3_PLATFORM": "cpu",
            "SR3_MULTIHOST": "1",
            "SR3_COORDINATOR": f"localhost:{port}",
            "SR3_NUM_PROCESSES": "2",
            "SR3_PROCESS_ID": str(i),
            "SR3_TEST_CKPT_DIR": str(tmp_path),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        ))
    results = {}
    for p in procs:
        # generous: two worker processes share whatever CPUs the host has
        # and each compiles several jits (train step, spatial step, val
        # chain); on a loaded 1-CPU box 540 s was not enough (r04)
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results[r["process"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["local_device_count"] == 4

    # same compiled step, same global batch -> identical loss on both hosts
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-7)

    # spatial (data=4, space=2) mesh spanning the two processes: the
    # H-sharded step executes cross-process and GSPMD preserves numerics
    assert results[0]["loss_spatial"] == pytest.approx(
        results[1]["loss_spatial"], abs=1e-7)
    assert results[0]["loss_spatial"] == pytest.approx(
        results[0]["loss"], abs=1e-5)

    # loader epoch shards: disjoint, covering, deterministic split of the
    # identically-seeded global shuffle
    i0, i1 = results[0]["indices"], results[1]["indices"]
    assert set(i0).isdisjoint(i1)
    assert sorted(i0 + i1) == list(range(16))

    # ckpt save -> resume spanning both processes: both resumed trainers
    # hold identical params (process-0 write + durability barrier + shared
    # restore) and the restored opt counter round-trips
    assert results[0]["param_checksum"] == pytest.approx(
        results[1]["param_checksum"], rel=1e-7)
    assert results[0]["resumed_iter"] == results[1]["resumed_iter"] == 2

    # batched val: the grouped evaluator's collective chains produce the
    # same images on both hosts (host_fetch allgathers the global output)
    assert results[0]["val_checksum"] == pytest.approx(
        results[1]["val_checksum"], rel=1e-6)

    # cross-check vs a single-process 8-device run of the same global batch
    import jax

    if len(jax.devices()) >= 8:
        from sr3_tpu.parallel.mesh import create_mesh
        from sr3_tpu.training.trainer import Trainer
        from tests.test_trainer import _batch, _opt

        os.makedirs(tmp_path / "ckpt", exist_ok=True)
        t = Trainer(_opt(tmp_path), mesh=create_mesh(num_data=8))
        t.set_new_noise_schedule(
            t.opt["model"]["beta_schedule"]["train"], "train")
        t.feed_data(_batch(8))
        t.optimize_parameters()
        single = float(np.asarray(jax.device_get(t.log_dict["l_pix"])))
        assert results[0]["loss"] == pytest.approx(single, abs=1e-6)
