"""True multi-process distributed validation: two coordinator-connected
processes (4 virtual CPU devices each) run the SAME data-parallel train
step over the 8-device global mesh, each feeding its local shard — the
closest this single machine can get to a 2-host DCN deployment
(SURVEY 2.8 distributed backend)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
step = make_dp_train_step(spec, loss_fn, opt, mesh=mesh)

# snapshot the initial weights on host — the train step donates its
# state buffers, deleting the original device arrays
params = jax.tree_util.tree_map(np.asarray, params)
state = jax.tree_util.tree_map(np.asarray, state)

# the CLI convention: each process samples its OWN local batch; labels
# travel with the crops (training.py sampler), so cross-process batches
# need no positive-first reordering
rng = np.random.default_rng(jax.process_index())
local = rng.normal(size=(8, 71, 71)).astype(np.float32)
local_labels = (np.arange(8) < 4).astype(np.float32)
tstate, metrics = step(tstate, local, local_labels)
loss = float(metrics["loss"])
assert np.isfinite(loss)

# expected: forward the known global batch through the ORIGINAL params
# with the concatenated global labels — regression guard for the
# positional-label bug (only process 0's positives were treated as
# labeled before labels became per-item)
from topaz_tpu.models.picker import apply_picker
from topaz_tpu.train.methods import init_method_state
import jax.numpy as jnp
blocks = [np.random.default_rng(p).normal(size=(8, 71, 71)).astype(np.float32)
          for p in range(2)]
glob = np.concatenate(blocks)
glob_labels = np.concatenate([(np.arange(8) < 4).astype(np.float32)] * 2)
score, _ = apply_picker(spec, params, jnp.asarray(glob), state=state,
                        dense=False, train=True,
                        dropout_rng=jax.random.PRNGKey(0))
expected_loss, _, _ = loss_fn(jnp.asarray(score).reshape(-1),
                              jnp.asarray(glob_labels),
                              init_method_state(0.05))
assert abs(loss - float(expected_loss)) < 1e-4, (loss, float(expected_loss))
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
            "PYTHONPATH": REPO,
        })
        env.pop("TOPAZ_DRYRUN_CHILD", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    losses = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if l.startswith("MHOST-OK")][0]
        losses.append(float(line.split("loss=")[1]))
    # the psum'd loss must agree across processes
    assert abs(losses[0] - losses[1]) < 1e-6, losses
