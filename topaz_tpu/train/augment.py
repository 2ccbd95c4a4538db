"""On-device crop augmentation: random rotation + flips + center crop.

The reference augments per-crop on the host with torchvision (nearest
rotation of a sqrt(2)-over-sized crop, then center crop, then flips —
topaz/utils/data/memory_mapped_data.py:216-231). This module applies the
same transform inside the jitted train step, vmapped over the batch.

NOTE on the current training flow: the 2D CropSampler delivers crops
already augmented at the final size via the fused load-time gather
(train/data.py _augmented_crops, native C fast path), so trainer.py's
`crops.shape[1] == crop` check takes the passthrough branch and this
module only runs when a sampler hands in RAW over-sized crops (custom
library use and any raw-window pipeline).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rotate_nearest(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate one 2D image counter-clockwise by angle (degrees) about its
    center with nearest-neighbor sampling and zero fill (torchvision
    rotate semantics)."""
    H, W = img.shape
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # inverse rotation of output coords into input space
    y0, x0 = yy - cy, xx - cx
    src_y = cos * y0 + sin * x0 + cy
    src_x = -sin * y0 + cos * x0 + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    return jnp.where(valid, img[iy, ix], 0.0)


@partial(jax.jit, static_argnames=("out_size", "rotate", "flip"))
def augment_crops(crops: jnp.ndarray, rng: jax.Array, out_size: int,
                  rotate: bool = True, flip: bool = True) -> jnp.ndarray:
    """Randomly rotate (if enabled), center-crop to ``out_size``, and
    randomly h/v-flip a batch of square crops (B, S, S)."""
    B, S, _ = crops.shape
    k_angle, k_h, k_v = jax.random.split(rng, 3)

    if rotate:
        angles = jax.random.uniform(k_angle, (B,), minval=0.0, maxval=360.0)
        crops = jax.vmap(_rotate_nearest)(crops, angles)

    if S != out_size:
        off = (S - out_size) // 2
        crops = crops[:, off : off + out_size, off : off + out_size]

    if flip:
        hflip = jax.random.bernoulli(k_h, 0.5, (B,))
        vflip = jax.random.bernoulli(k_v, 0.5, (B,))
        crops = jnp.where(hflip[:, None, None], crops[:, :, ::-1], crops)
        crops = jnp.where(vflip[:, None, None], crops[:, ::-1, :], crops)
    return crops


@partial(jax.jit, static_argnames=("out_size", "rotate", "flip"))
def augment_crops_3d(crops: jnp.ndarray, rng: jax.Array, out_size: int,
                     rotate: bool = True, flip: bool = True) -> jnp.ndarray:
    """Augment a batch of 3D crops (B, D, S, S): random xy-plane rotation
    about the z-axis, center crop to ``out_size`` per axis, and random
    x/y/z flips.

    Extension — the reference never augments 3D picker crops (its 3D
    sampler path, memory_mapped_data.py:52-60, gathers raw windows). The
    group used here (in-plane rotations about z + axis flips) is the
    missing-wedge-safe one for single-axis-tilt tomograms: rotations that
    move the z-axis would mix the wedge-degraded resolution directions
    into the xy-plane. Each z-slice of a crop rotates by the same angle."""
    B, D, S = crops.shape[0], crops.shape[1], crops.shape[2]
    k_angle, k_h, k_v, k_z = jax.random.split(rng, 4)

    if rotate:
        angles = jax.random.uniform(k_angle, (B,), minval=0.0, maxval=360.0)
        rot_vol = jax.vmap(_rotate_nearest, in_axes=(0, None))  # over z
        crops = jax.vmap(rot_vol)(crops, angles)

    if S != out_size:
        off = (S - out_size) // 2
        crops = crops[:, :, off : off + out_size, off : off + out_size]
    if D != out_size:
        offz = (D - out_size) // 2
        crops = crops[:, offz : offz + out_size]

    if flip:
        hflip = jax.random.bernoulli(k_h, 0.5, (B,))[:, None, None, None]
        vflip = jax.random.bernoulli(k_v, 0.5, (B,))[:, None, None, None]
        zflip = jax.random.bernoulli(k_z, 0.5, (B,))[:, None, None, None]
        crops = jnp.where(hflip, crops[:, :, :, ::-1], crops)
        crops = jnp.where(vflip, crops[:, :, ::-1, :], crops)
        crops = jnp.where(zflip, crops[:, ::-1, :, :], crops)
    return crops
