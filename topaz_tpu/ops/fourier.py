"""Fourier-domain ops: Fourier-crop downsampling and low-pass filtering.

TPU-native jnp.fft implementations of the reference's numpy FFT hot loops:
  * ``downsample`` reproduces topaz/utils/image.py:38-61 (rfft2, keep the
    low-frequency corner blocks, rescale by the area ratio, irfft2) but is
    jittable and batched over leading axes.
  * ``lowpass`` reproduces topaz/denoise.py:174-197.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(1, 2))
def _downsample_shape(x: jnp.ndarray, m: int, n: int) -> jnp.ndarray:
    F = jnp.fft.rfft2(x)
    # keep the lowest m//2 positive-frequency rows and the top m//2
    # negative-frequency rows, and the first n//2+1 columns
    A = F[..., 0 : m // 2, 0 : n // 2 + 1]
    B = F[..., F.shape[-2] - (m - m // 2) :, 0 : n // 2 + 1]
    F = jnp.concatenate([A, B], axis=-2)
    # energy rescale by the pixel-count ratio (image.py:54-57)
    a = n * m
    b = x.shape[-2] * x.shape[-1]
    F = F * (a / b)
    return jnp.fft.irfft2(F, s=(m, n))


def downsample_numpy(x: np.ndarray, factor: float = 1, shape=None) -> np.ndarray:
    """Host-side twin of :func:`downsample` (same crop/rescale arithmetic,
    numpy pocketfft). Used by the pipeline's prefetch threads when raw
    pixels should not cross the host->device link at full resolution;
    pocketfft releases the GIL, so loader threads scale."""
    x = np.asarray(x, dtype=np.float32)
    if shape is None:
        shape = (int(x.shape[-2] / factor), int(x.shape[-1] / factor))
    m, n = int(shape[0]), int(shape[1])
    try:  # scipy's pocketfft keeps float32 and is ~100x faster here
        from scipy.fft import irfft2, rfft2
    except ImportError:
        from numpy.fft import irfft2, rfft2
    F = rfft2(x)
    A = F[..., 0 : m // 2, 0 : n // 2 + 1]
    B = F[..., F.shape[-2] - (m - m // 2) :, 0 : n // 2 + 1]
    F = np.concatenate([A, B], axis=-2)
    F *= (n * m) / (x.shape[-2] * x.shape[-1])
    return irfft2(F, s=(m, n)).astype(np.float32)


def downsample(x, factor: float = 1, shape=None):
    """Downsample a 2D array (or batch of them) by Fourier cropping.

    Matches topaz/utils/image.py:38-61: output shape is
    ``(int(H/factor), int(W/factor))`` unless ``shape`` is given explicitly.
    """
    x = jnp.asarray(x)
    if shape is None:
        m = int(x.shape[-2] / factor)
        n = int(x.shape[-1] / factor)
        shape = (m, n)
    m, n = int(shape[0]), int(shape[1])
    out = _downsample_shape(x.astype(jnp.float32), m, n)
    return out


@partial(jax.jit, static_argnums=(1,))
def _downsample_3d_shape(x: jnp.ndarray, shape) -> jnp.ndarray:
    d, m, n = shape
    F = jnp.fft.rfftn(x, axes=(-3, -2, -1))

    def crop_axis(F, size, axis):
        lo = jax.lax.slice_in_dim(F, 0, size // 2, axis=axis)
        hi = jax.lax.slice_in_dim(
            F, F.shape[axis] - (size - size // 2), F.shape[axis], axis=axis
        )
        return jnp.concatenate([lo, hi], axis=axis)

    F = F[..., 0 : n // 2 + 1]
    F = crop_axis(F, m, -2)
    F = crop_axis(F, d, -3)
    a = d * m * n
    b = x.shape[-3] * x.shape[-2] * x.shape[-1]
    F = F * (a / b)
    return jnp.fft.irfftn(F, s=(d, m, n), axes=(-3, -2, -1))


def downsample_3d(x, factor: float = 1, shape=None):
    """Fourier-crop a 3D volume (TPU-build extension for tomograms)."""
    x = jnp.asarray(x)
    if shape is None:
        shape = tuple(int(s / factor) for s in x.shape[-3:])
    return _downsample_3d_shape(x.astype(jnp.float32), tuple(int(s) for s in shape))


@partial(jax.jit, static_argnums=(1, 2))
def lowpass(x: jnp.ndarray, factor: float = 1, dims: int = 2) -> jnp.ndarray:
    """Low-pass filter: zero every Fourier coefficient whose frequency
    magnitude exceeds nyquist/factor along *any* axis.

    Reproduces topaz/denoise.py:174-197 (mask = any(|freq| > 0.5/factor)).
    """
    if factor == 1:
        return x
    shape = x.shape[-dims:]
    F = jnp.fft.rfftn(x, axes=tuple(range(-dims, 0)))
    keep = jnp.ones(F.shape[-dims:], dtype=bool)
    for d in range(dims):
        if d == dims - 1:
            freq = jnp.fft.rfftfreq(shape[d])
        else:
            freq = jnp.fft.fftfreq(shape[d])
        bshape = [1] * dims
        bshape[d] = -1
        keep = keep & (jnp.abs(freq).reshape(bshape) <= 0.5 / factor)
    F = jnp.where(keep, F, 0)
    out = jnp.fft.irfftn(F, s=shape, axes=tuple(range(-dims, 0)))
    return out.astype(x.dtype)
