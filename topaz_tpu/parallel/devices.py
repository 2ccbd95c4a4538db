"""Device-flag resolution and multi-host runtime initialization.

Maps the reference's ``-d/--device`` convention onto JAX devices:

  * ``-2`` -> ALL visible devices (the reference's multi-GPU mode,
    topaz/commands/denoise3d.py:62-85 -> nn.DataParallel at :103,118; here
    it selects a jax.sharding.Mesh scale-out instead)
  * ``-1`` -> the default backend device. Documented divergence: the
    reference maps -1 to CPU (topaz/cuda.py:16-32) because CPU torch is its
    no-GPU fallback; here the accelerator IS the default backend and
    silently forcing CPU would be a large perf footgun. Run with
    ``JAX_PLATFORMS=cpu`` to force CPU execution.
  * ``N >= 0`` -> device N, pinned via ``jax_default_device`` so ALL
    subsequent dispatches land on it; warning fallback to device 0 when out
    of range (topaz/cuda.py:24-30 falls back to CPU with a warning)

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

    if device == -1:  # auto: default backend device, no pinning needed
        return jax.local_devices()[:1]
    if device == -2:  # all devices, across hosts when distributed
        return jax.devices()
    # a specific index addresses THIS process's devices — in multi-host
    # mode jax.devices() entries can belong to other processes and cannot
    # be pinned here
    local = jax.local_devices()
    if device >= len(local):
        print(f"# WARNING: device {device} not available, falling back to "
              f"device 0 ({len(local)} local device(s))", file=sys.stderr)
        device = 0
    # pin so every later jit/device_put in the command lands on this chip
    # (otherwise a specific -d N would be a silent no-op outside the mesh
    # paths — all single-device compute uses the backend default)
    jax.config.update("jax_default_device", local[device])
    return [local[device]]


def data_mesh_for(devices, batch_size: Optional[int] = None,
                  warn: bool = False):
    """A 'data'-axis mesh over ``devices``, shrunk to the largest device
    count that divides ``batch_size`` (jit sharding needs the batch axis
    divisible by the mesh axis). Returns None when one device remains.

    ``warn`` prints a note when the mesh shrinks — pass True only from
    sites where ``batch_size`` is a user-controlled flag (internal
    micro-batches would make the advice unactionable)."""
    if devices is None or len(devices) < 2:
        return None
    n = len(devices)
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    if warn and n < len(devices):
        print(f"# note: batch size {batch_size} is not divisible by "
              f"{len(devices)} devices; using {max(n, 1)} "
              f"(pick a batch size that is a multiple of the device count "
              f"to use every chip)", file=sys.stderr)
    if n < 2:
        return None

    from topaz_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=n, n_space=1, devices=devices[:n])


def hybrid_mesh_for(devices, batch_size: Optional[int] = None,
                    warn: bool = False):
    """A (data, space) mesh that uses EVERY device: the batch axis shards
    over 'data' (largest device count dividing ``batch_size``, as in
    :func:`data_mesh_for`) and leftover devices shard the image H axis
    over 'space' (largest power of two with data*space <= n — powers of
    two keep the 64-multiple shape buckets divisible). With batch 2 on 8
    chips this yields a 2x4 mesh; with batch 1, 1x8 — pure spatial
    sharding — where :func:`data_mesh_for` would fall back to one chip.
    Returns None when fewer than two devices would participate."""
    if devices is None or len(devices) < 2:
        return None
    n = len(devices)
    n_data = n
    if batch_size is not None:
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
    n_space = 1
    while n_data * n_space * 2 <= n:
        n_space *= 2
    if n_data * n_space < 2:
        return None
    if warn and n_data * n_space < n:
        print(f"# note: using a {n_data}x{n_space} (data x space) mesh on "
              f"{n} devices; a batch size dividing the device count would "
              f"use every chip", file=sys.stderr)

    from topaz_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=n_data, n_space=n_space,
                     devices=devices[: n_data * n_space])


def space_mesh_for(devices):
    """A 'space'-axis mesh over ``devices`` for halo-sharded single-image
    work. Returns None when fewer than two devices are given."""
    if devices is None or len(devices) < 2:
        return None

    from topaz_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=1, n_space=len(devices), devices=devices)
