"""Two-process jax.distributed training on CPU: the real multi-host path —
host-strided disjoint batches, one GSPMD global batch per step, implicit
gradient sync, orbax-coordinated checkpointing.

Each subprocess gets 2 local CPU devices (4 global); the mesh spans both
processes, so every train step's collectives actually cross the process
boundary.  Asserts: identical per-step losses and final params on both
ranks (grad sync works), disjoint data, one coordinated checkpoint."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np

rank = int(sys.argv[1])
coord = sys.argv[2]
workdir = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=rank)
assert jax.process_count() == 2 and jax.device_count() == 4, \
    (jax.process_count(), jax.device_count())

sys.path.insert(0, "__REPO__")
sys.path.insert(0, os.path.join("__REPO__", "tests"))
import dataclasses
from test_trainer import _make_dataset, _tcfg
from pathlib import Path
from voicecraft_tpu.parallel.mesh import make_mesh
from voicecraft_tpu.training.trainer import Trainer

root = os.path.join(workdir, "data")
marker = os.path.join(workdir, "data_ready")
if rank == 0:
    cfg = _make_dataset(root, n_items=12)
    open(marker, "w").write("ok")
else:
    import time
    for _ in range(300):
        if os.path.exists(marker):
            break
        time.sleep(0.1)
    from voicecraft_tpu.config import tiny_test
    cfg = tiny_test()

cfg = dataclasses.replace(cfg, compute_dtype="float32", mask_len_max=40)
# keep the fixed-shape padded batches small: tight token budget + text cap;
# exp_dir is SHARED — orbax multihost save coordinates the single writer
tcfg = dataclasses.replace(
    _tcfg(root, Path(workdir)),
    num_steps=3, val_every_n_steps=2, max_num_tokens=600,
    val_max_num_tokens=600, text_max_length=64)

mesh = make_mesh(4, 1)
losses = []

tr = Trainer(cfg, tcfg, mesh=mesh)
# capture the per-step data this host consumed + loss trajectory
orig_step = tr.step_fn
batch_ids = [sorted(i for b in tr.batcher.epoch_batches(0) for i in b)]

def wrapped(params, opt, batch, rng):
    params, opt, m = orig_step(params, opt, batch, rng)
    losses.append(float(np.asarray(m["loss"])))
    return params, opt, m

tr.step_fn = wrapped
tr.train()

out = {
    "rank": rank,
    "losses": losses,
    "epoch0_indices": batch_ids[0],
    "param_sum": float(np.asarray(tr.params["mask_emb"]).astype(np.float64).sum()),
    "ckpt_written": os.path.isdir(os.path.join(tcfg.exp_dir, "ckpt_latest")),
    "tmp_left": os.path.isdir(os.path.join(tcfg.exp_dir,
                                           "ckpt_latest.tmp_ocp")),
}
with open(os.path.join(workdir, "out_rank%d.json" % rank), "w") as f:
    json.dump(out, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__REPO__", REPO))
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="")
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(r), coord, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for r in range(2)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]

    r0 = json.load(open(tmp_path / "out_rank0.json"))
    r1 = json.load(open(tmp_path / "out_rank1.json"))

    # gradient sync: both ranks saw the same global loss every step and
    # ended with identical parameters
    assert len(r0["losses"]) == len(r1["losses"]) > 0
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["param_sum"], r1["param_sum"], rtol=1e-9)

    # host-strided data: disjoint item coverage, equal step counts
    s0, s1 = set(r0["epoch0_indices"]), set(r1["epoch0_indices"])
    assert s0 and s1 and not (s0 & s1)

    # one coordinated checkpoint in the shared exp_dir (orbax multihost:
    # every process enters save(), the primary finalises the write)
    assert r0["ckpt_written"] and r1["ckpt_written"]
    assert not r0["tmp_left"] and not r1["tmp_left"]
    meta = json.load(open(tmp_path / "exp" / "meta_latest.json"))
    assert meta["progress"]["step"] >= 3
