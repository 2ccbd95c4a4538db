"""True multi-process distributed validation: two coordinator-connected
processes (4 virtual CPU devices each) run the SAME data-parallel train
step over the 8-device global mesh, each feeding its local shard — the
closest this single machine can get to a 2-host DCN deployment
(SURVEY 2.8 distributed backend)."""

import os
import socket
import subprocess
import sys

WORKER = r'''
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from topaz_tpu.parallel.devices import maybe_distributed_init
assert maybe_distributed_init()
assert jax.process_count() == 2 and jax.device_count() == 8

from topaz_tpu.models.factory import new_picker
from topaz_tpu.parallel.mesh import make_dp_train_step, make_mesh
from topaz_tpu.train.methods import make_loss_fn
from topaz_tpu.train.trainer import init_train_state, make_optimizer

spec, params, state = new_picker("resnet8", units=4, seed=0)
mesh = make_mesh(n_data=8, n_space=1)
loss_fn, _, _ = make_loss_fn("PN", 0.05)
opt = make_optimizer(2e-4)
tstate = init_train_state(spec, params, state, opt, 0.05, seed=0)
step = make_dp_train_step(spec, loss_fn, opt, n_pos=4, mesh=mesh)

# every process sees the same global batch definition; each feeds the
# local half (8 of 16 crops)
rng = np.random.default_rng(0)
global_crops = rng.normal(size=(16, 71, 71)).astype(np.float32)
local = global_crops[jax.process_index() * 8 : (jax.process_index() + 1) * 8]
tstate, metrics = step(tstate, local)
loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"MHOST-OK proc={jax.process_index()} loss={loss:.6f}", flush=True)
'''


def test_two_process_dp_train_step():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "TOPAZ_COORDINATOR": f"localhost:{port}",
            "TOPAZ_NUM_PROCESSES": "2",
            "TOPAZ_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": "/root/repo",
        })
        env.pop("TOPAZ_DRYRUN_CHILD", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    losses = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if l.startswith("MHOST-OK")][0]
        losses.append(float(line.split("loss=")[1]))
    # the psum'd loss must agree across processes
    assert abs(losses[0] - losses[1]) < 1e-6, losses
