"""Device-flag resolution and multi-host runtime initialization.

Maps the reference's ``-d/--device`` convention onto JAX devices:

  * ``-2`` -> ALL visible devices (the reference's multi-GPU mode,
    topaz/commands/denoise3d.py:62-85 -> nn.DataParallel at :103,118; here
    it selects a jax.sharding.Mesh scale-out instead)
  * ``-1`` -> CPU (topaz/cuda.py:16-32 semantics)
  * ``N >= 0`` -> device N, with a warning fallback to device 0 when out of
    range (topaz/cuda.py:24-30 falls back to CPU with a warning)

Multi-host: the reference has no distributed backend at all (SURVEY 2.8).
Here ``maybe_distributed_init`` wires ``jax.distributed.initialize`` from
environment variables so the same CLI commands scale over DCN-connected
hosts: launch one process per host with

    TOPAZ_COORDINATOR=<host:port> TOPAZ_NUM_PROCESSES=<n> \
    TOPAZ_PROCESS_ID=<i> topaz <command> ... -d -2

(the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
variables are honored too). After initialization ``jax.devices()`` spans
every host, so the mesh paths below shard over ICI within a slice and DCN
across slices without further changes.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

_DIST_INITIALIZED = False


def maybe_distributed_init() -> bool:
    """Initialize the multi-host JAX runtime when coordinator env vars are
    set. Idempotent; returns True when running distributed."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    addr = os.environ.get("TOPAZ_COORDINATOR") or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False

    import jax

    kwargs = {"coordinator_address": addr}
    nproc = os.environ.get("TOPAZ_NUM_PROCESSES") or \
        os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("TOPAZ_PROCESS_ID") or \
        os.environ.get("JAX_PROCESS_ID")
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True
    print(f"# distributed runtime: process {jax.process_index()} of "
          f"{jax.process_count()}, {jax.device_count()} devices total",
          file=sys.stderr)
    return True


def resolve_devices(device: int) -> List:
    """Resolve a ``-d`` flag value to the list of JAX devices to use."""
    maybe_distributed_init()

    import jax

    if device == -1:
        try:
            return jax.devices("cpu")[:1]
        except RuntimeError:
            print("# WARNING: no CPU backend available, falling back to "
                  "default device", file=sys.stderr)
            return jax.devices()[:1]

    devices = jax.devices()
    if device == -2:
        return devices
    if device >= len(devices):
        print(f"# WARNING: device {device} not available, falling back to "
              f"device 0 ({len(devices)} device(s) visible)", file=sys.stderr)
        device = 0
    return [devices[device]]


def data_mesh_for(devices, batch_size: Optional[int] = None):
    """A 'data'-axis mesh over ``devices``, shrunk to the largest device
    count that divides ``batch_size`` (jit sharding needs the batch axis
    divisible by the mesh axis). Returns None when one device remains."""
    if devices is None or len(devices) < 2:
        return None
    n = len(devices)
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    if n < 2:
        return None

    from topaz_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=n, n_space=1, devices=devices[:n])


def space_mesh_for(devices):
    """A 'space'-axis mesh over ``devices`` for halo-sharded single-image
    work. Returns None when fewer than two devices are given."""
    if devices is None or len(devices) < 2:
        return None

    from topaz_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=1, n_space=len(devices), devices=devices)
