"""Pallas TPU kernel for the disk max-filter used by greedy NMS.

The lax fallback (ops/nms.py disk_max) decomposes the disk into per-chord
horizontal max-pools + shifted vertical maxes; every intermediate is an
HBM round trip (~3r passes over the image per call, three calls per NMS
round). This kernel computes the whole filter in one pass: each grid tile
DMAs its (tile + halo) window from HBM into VMEM, builds the chord maxima
incrementally on the VPU, and writes one output tile — one HBM read + one
write total.

The incremental trick: with m_w = the max over a horizontal window of
half-width w, m_w = max(m_{w-1}, shift(x, +w), shift(x, -w)); all r+1
chord widths cost 2r vector maxes, and the vertical combine another 2r+1.
Shift fill values wrap garbage only into the outer halo band (width <= r),
which the central-tile slice never reads. Halos are rounded up to the
(8, 128) VMEM tiling so DMA slices stay aligned.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topaz_tpu.ops.nms import _chords_2d


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _disk_max_kernel(r: int, tile: int, hy: int, hx: int, x_hbm, out_ref,
                     scratch, sem):
    batched = len(x_hbm.shape) == 3
    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        src = x_hbm.at[b]
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
        src = x_hbm
    win_y = tile + 2 * hy
    win_x = tile + 2 * hx
    dma = pltpu.make_async_copy(
        src.at[pl.ds(i * tile, win_y), pl.ds(j * tile, win_x)], scratch, sem
    )
    dma.start()
    dma.wait()

    xs = scratch[:]
    S = win_x
    chords = _chords_2d(r)  # {half-width: [dy, ...]}
    max_w = max(chords)

    width_maxes = {0: xs}
    cur = xs
    for w in range(1, max_w + 1):
        shift_l = jnp.concatenate([xs[:, w:], xs[:, S - w :]], axis=1)
        shift_r = jnp.concatenate([xs[:, :w], xs[:, : S - w]], axis=1)
        cur = jnp.maximum(cur, jnp.maximum(shift_l, shift_r))
        if w in chords:
            width_maxes[w] = cur

    acc = None
    for w, dys in chords.items():
        h = width_maxes[w]
        for dy in dys:
            part = h[hy + dy : hy + dy + tile, hx : hx + tile]
            acc = part if acc is None else jnp.maximum(acc, part)
    if len(out_ref.shape) == 3:
        out_ref[0] = acc
    else:
        out_ref[:] = acc


@partial(jax.jit, static_argnames=("r", "tile", "interpret"))
def disk_max_pallas(x: jnp.ndarray, r: int, init, tile: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """Disk max-filter over the clipped integer disk of radius r; matches
    ops/nms.disk_max for 2D (H, W) or batched (B, H, W) inputs."""
    batched = x.ndim == 3
    H, W = x.shape[-2:]
    hy = _round_up(r, 8)
    hx = _round_up(r, 128)
    gh = -(-H // tile)
    gw = -(-W // tile)
    pad = ((hy, hy + gh * tile - H), (hx, hx + gw * tile - W))
    if batched:
        B = x.shape[0]
        xp = jnp.pad(x, ((0, 0),) + pad, constant_values=init)
        grid = (B, gh, gw)
        out_spec = pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j))
        out_shape = jax.ShapeDtypeStruct((B, gh * tile, gw * tile), x.dtype)
    else:
        xp = jnp.pad(x, pad, constant_values=init)
        grid = (gh, gw)
        out_spec = pl.BlockSpec((tile, tile), lambda i, j: (i, j))
        out_shape = jax.ShapeDtypeStruct((gh * tile, gw * tile), x.dtype)

    win_y = tile + 2 * hy
    win_x = tile + 2 * hx
    out = pl.pallas_call(
        partial(_disk_max_kernel, r, tile, hy, hx),
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((win_y, win_x), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[..., :H, :W]
