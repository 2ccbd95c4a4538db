"""Device-mesh scale-out: data-parallel batching and spatial halo sharding.

The reference's only parallelism is single-process DataParallel and CPU
pools (SURVEY 2.8). Here scale-out is one jax.sharding.Mesh with two axes:

  * ``data``  — micrograph/crop batch (the v5e-8 scale-out axis); jit over
    sharded batches makes XLA insert gradient psums — this replaces both
    DataParallel and the multiprocessing fan-outs.
  * ``space`` — spatial sharding of one large image/volume across devices
    with receptive-field halo exchange (ppermute over ICI); this is the
    "context parallel" analog of the reference's Python patch loops
    (topaz/model/utils.py:110-193).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_space: int = 1,
              devices=None) -> Mesh:
    """Create a (data, space) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    devs = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, ("data", "space"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits an array's leading axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def jit_sharded_args(fn, mesh: Optional[Mesh], specs):
    """jit ``fn`` with each positional arg replicated (``"rep"``), sharded
    over the mesh's data axis (``"data"``), or sharded over data AND the
    second axis over space (``"data_space"`` — GSPMD inserts the conv halo
    exchanges); plain ``jax.jit`` when ``mesh`` is None. The returned
    callable device_puts every argument to its sharding so host arrays
    land already-sharded instead of being uploaded to one device and
    resharded. Single home for the mesh-or-not jit idiom used by the
    batched denoise/normalize/pipeline paths."""
    if mesh is None:
        return jax.jit(fn)
    part = {"data": P("data"), "data_space": P("data", "space"),
            "rep": P()}
    shardings = tuple(NamedSharding(mesh, part[s]) for s in specs)
    jitted = jax.jit(fn, in_shardings=shardings)

    def run(*args):
        return jitted(*(jax.device_put(a, s)
                        for a, s in zip(args, shardings)))

    return run


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding on the mesh."""
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# batched data-parallel scoring (config 5: micrograph batch over the mesh)
# ---------------------------------------------------------------------------

def make_batched_scorer(spec, params, state, mesh: Mesh, precision=None):
    """Batch dense scorer sharded over the mesh's data axis.

    Input (B, H, W) with B divisible by the data-axis size; output the
    (B, H, W) score maps, sharded the same way (no cross-device talk —
    embarrassingly parallel, the collectives appear in training)."""
    from topaz_tpu.models.picker import apply_picker

    in_shard = NamedSharding(mesh, P("data", None, None))

    @partial(jax.jit, in_shardings=(in_shard,), out_shardings=in_shard)
    def score(batch):
        y, _ = apply_picker(spec, params, batch, state=state, dense=True,
                            precision=precision)
        return y

    return score


# ---------------------------------------------------------------------------
# spatial halo sharding (the sequence/context-parallel analog)
# ---------------------------------------------------------------------------

def make_halo_dense_scorer(spec, params, state, mesh: Mesh, precision=None):
    """Dense scoring of ONE large micrograph with rows sharded over the
    mesh's ``space`` axis and receptive-field halos exchanged via ppermute.

    Result equals whole-image dense scoring: each shard pads its block with
    the neighbors' edge rows (width//2 deep) instead of zeros, scores it
    valid, and keeps its own rows.
    """
    from jax import shard_map

    from topaz_tpu.models.picker import apply_picker

    halo = spec.width // 2
    axis = "space"
    n_shards = mesh.shape[axis]

    def shard_fn(block):  # block: (H/n, W) on each device
        if block.shape[0] < halo:
            raise ValueError(
                f"halo-sharded scoring needs >= {halo} rows per shard "
                f"(receptive field {spec.width}), got {block.shape[0]}; "
                f"use fewer 'space' shards for this image")
        # shard i receives the bottom rows of shard i-1 (its top halo) and
        # the top rows of shard i+1 (its bottom halo); the ring wraparound
        # at the outer edges is zeroed to restore open boundaries
        top_halo = jax.lax.ppermute(
            block[-halo:], axis,
            [(i, (i + 1) % n_shards) for i in range(n_shards)])
        bottom_halo = jax.lax.ppermute(
            block[:halo], axis,
            [(i, (i - 1) % n_shards) for i in range(n_shards)])
        idx = jax.lax.axis_index(axis)
        top_halo = jnp.where(idx > 0, top_halo, jnp.zeros_like(top_halo))
        bottom_halo = jnp.where(idx < n_shards - 1, bottom_halo,
                                jnp.zeros_like(bottom_halo))
        x = jnp.concatenate([top_halo, block, bottom_halo], axis=0)
        # pad W fully and H only by the remaining amount handled above
        x = jnp.pad(x, ((0, 0), (halo, halo)))
        y, _ = apply_picker(spec, params, x[None], state=state, dense=True,
                            pad=False, precision=precision)
        return y[0]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )

    @jax.jit
    def score(image):
        return sharded(image)

    return score


def make_halo_denoiser(meta: Dict, params, mesh: Mesh, halo: int = 256,
                       precision=None, dtype=None):
    """Denoise ONE large micrograph with rows sharded over the mesh's
    ``space`` axis.

    Each shard receives a ``halo``-row apron from its neighbors (ppermute),
    denoises block+apron, and keeps its own rows; the image mean/std used
    for normalization is computed globally via psum so the result matches
    whole-image semantics (topaz/denoise.py:274-296). For the pooling
    U-Nets the result is approximate near shard boundaries exactly like the
    reference's own patch mode (denoise.py:299-324); for pool-free models
    (fcnn, affine) a halo >= the receptive field makes it exact.
    """
    from jax import shard_map

    from topaz_tpu.models.denoise_factory import apply_fn_for

    apply_fn = apply_fn_for(meta)
    dims = meta.get("dims", 2)
    axis = "space"
    n_shards = mesh.shape[axis]
    # opt-in bf16 fast mode (matches Denoise's single-device fast path):
    # activations cast to bfloat16 around the net, statistics kept in f32
    bf16 = dtype in ("bf16", "bfloat16")

    def shard_fn(block):  # (H/n, W) for 2D; (D/n, H, W) for 3D
        if block.shape[0] < halo:
            raise ValueError(
                f"halo-sharded denoising needs >= {halo} leading rows per "
                f"shard, got {block.shape[0]}; lower the halo or use fewer "
                f"'space' shards for this image")
        # global statistics over the whole image
        stats = jax.lax.psum(
            jnp.stack([jnp.sum(block), jnp.sum(block**2),
                       jnp.asarray(block.size, block.dtype)]),
            axis,
        )
        mu = stats[0] / stats[2]
        std = jnp.sqrt(stats[1] / stats[2] - mu**2)

        # normalize BEFORE building aprons so the zero fill at the true
        # image edges matches the whole-image SAME-conv zero padding
        bn = (block - mu) / std
        top_halo = jax.lax.ppermute(
            bn[-halo:], axis,
            [(i, (i + 1) % n_shards) for i in range(n_shards)])
        bottom_halo = jax.lax.ppermute(
            bn[:halo], axis,
            [(i, (i - 1) % n_shards) for i in range(n_shards)])
        idx = jax.lax.axis_index(axis)
        top_halo = jnp.where(idx > 0, top_halo, jnp.zeros_like(top_halo))
        bottom_halo = jnp.where(idx < n_shards - 1, bottom_halo,
                                jnp.zeros_like(bottom_halo))
        xn = jnp.concatenate([top_halo, bn, bottom_halo], axis=0)
        if bf16:
            xn = xn.astype(jnp.bfloat16)
        y = apply_fn(params, xn[None, ..., None], dims=dims,
                     precision=precision)[0, ..., 0]
        return y[halo:-halo].astype(block.dtype) * std + mu

    # shard the leading spatial axis (rows for 2D, z for 3D)
    spec_in = P(*((axis,) + (None,) * (dims - 1)))
    sharded = shard_map(shard_fn, mesh=mesh, in_specs=spec_in,
                        out_specs=spec_in)

    @jax.jit
    def denoise(image):
        return sharded(image)

    return denoise


# ---------------------------------------------------------------------------
# data-parallel training step (multi-chip config for dryrun/bench)
# ---------------------------------------------------------------------------

def make_dp_train_step(spec, loss_fn, optimizer, mesh: Mesh,
                       l2: float = 0.0, precision=None):
    """Training step with the crop batch sharded over 'data' and params
    replicated; XLA inserts the gradient all-reduce over ICI. The step
    takes (state, crops, labels) — labels shard with their crops, so no
    cross-shard reordering is needed for the P/U losses."""
    from topaz_tpu.train.trainer import make_train_step

    return make_train_step(spec, loss_fn, optimizer, l2=l2, mesh=mesh,
                           precision=precision)
