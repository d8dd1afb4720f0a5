"""Multi-process TRAIN correctness: two real jax processes over a
localhost coordinator run the jitted DP train step on a process-sharded
batch; the psum'd loss must be identical on both processes and match a
single-process run over the same global batch.

The single-process dryrun and 8-virtual-device tests cannot exercise
`make_array_from_process_local_data` + cross-process gradient psum —
this is the reference's actual multi-node protocol
(/root/reference/slowfast/utils/multiprocessing.py:45-57) in its TPU
form (mesh over all chips of all processes).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs

import jax.numpy as jnp
import __graft_entry__ as ge
from focus_tpu.datasets.loader import DataLoader
from focus_tpu.engine.trainer import (
    build_supervised_state, make_supervised_train_step, _split_batch,
)
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib

cfg = ge._flagship_cfg(tiny=True)
mesh = mesh_lib.build_mesh(cfg)
model = build_model(cfg)


class TinyVideoSet:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        rs = np.random.RandomState(100 + i)
        video = rs.rand(4, 32, 32, 3).astype(np.float32)
        boxes = (rs.rand(2, 4, 4) * 0.5 + 0.25).astype(np.float32)
        return (video, np.int32(i % cfg.MODEL.NUM_CLASSES), np.int32(i),
                {"orvit_bboxes": boxes})


loader = DataLoader(
    TinyVideoSet(), global_batch_size=4, shuffle=False, drop_last=True,
    num_workers=1, sharding=mesh_lib.batch_sharded(mesh),
)

batch0 = next(iter(loader))
video, labels, meta = _split_batch(batch0)
host_batch = None
state = build_supervised_state(
    cfg, model, mesh,
    ((np.zeros((4, 4, 32, 32, 3), np.float32)),
     np.zeros((4,), np.int32), np.arange(4, dtype=np.int32),
     {"orvit_bboxes": np.zeros((4, 2, 4, 4), np.float32)}),
    steps_per_epoch=10,
)
step = make_supervised_train_step(
    model, cfg, mesh, losses_lib.get_loss_func(cfg),
    state_sharding=mesh_lib.state_shardings(mesh, state),
)
losses = []
for _ in range(2):
    state, stats = step(state, video, labels, meta, jax.random.PRNGKey(0))
    losses.append(float(jax.device_get(stats["loss"])))

with open(out_path, "w") as f:
    json.dump(losses, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nprocs, tmp_path, tag):
    port = _free_port()
    worker = tmp_path / f"worker_{tag}.py"
    worker.write_text(WORKER)
    outs = [str(tmp_path / f"out_{tag}{i}.json") for i in range(nprocs)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nprocs), str(port),
             outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nprocs)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    two = _run(2, tmp_path, "mp")
    # the psum'd loss is replicated: both processes see the same values
    assert two[0] == pytest.approx(two[1], rel=1e-6)
    one = _run(1, tmp_path, "sp")
    # and the 2-process global batch reproduces the single-process run
    assert two[0] == pytest.approx(one[0], rel=2e-4)
