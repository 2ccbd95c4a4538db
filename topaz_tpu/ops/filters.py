"""Classical image filters: Gaussian, inverse-Gaussian, affine, and the
whitening ("unblur") deconvolution filter estimated from the image's own
autocovariance.

jnp equivalents of topaz/filters.py and topaz/denoise.py:22-172.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax



def gaussian_filter(sigma: float, s: int = 11, dims: int = 2) -> np.ndarray:
    """Unnormalized Gaussian kernel (topaz/filters.py:6-19)."""
    dim = s // 2
    r = np.arange(-dim, dim + 1)
    if dims == 2:
        d = r[:, None] ** 2 + r[None, :] ** 2
    else:
        d = r[:, None, None] ** 2 + r[None, :, None] ** 2 + r[None, None, :] ** 2
    return np.exp(-0.5 * d / sigma**2)


def inverse_filter(w: np.ndarray) -> np.ndarray:
    """Spatial kernel of the Fourier inverse of w (topaz/filters.py:22-25)."""
    F = np.fft.rfft2(np.fft.ifftshift(w))
    return np.fft.fftshift(np.fft.irfft2(1 / F, s=w.shape))


def apply_kernel(x: jnp.ndarray, w: jnp.ndarray, dims: int = 2) -> jnp.ndarray:
    """SAME-convolve a single image/volume with a dense kernel
    (AffineFilter/GaussianDenoise.apply semantics, filters.py:28-80)."""
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    xb = x[None, ..., None]
    wb = w[..., None, None]
    y = lax.conv_general_dilated(xb, wb, (1,) * dims, "SAME",
                                 dimension_numbers=dn)
    return y[0, ..., 0]


def gaussian_denoise_kernel(sigma: float, scale: int = 5, dims: int = 2) -> np.ndarray:
    """Normalized truncated Gaussian (filters.py:51-66)."""
    width = 1 + 2 * int(np.ceil(sigma * scale))
    f = gaussian_filter(sigma, s=width, dims=dims)
    return (f / f.sum()).astype(np.float32)


def inv_gaussian_kernel(sigma: float, scale: int = 5) -> np.ndarray:
    """Inverse of the normalized Gaussian (filters.py:83-96)."""
    f = gaussian_denoise_kernel(sigma, scale=scale, dims=2)
    return inverse_filter(f).astype(np.float32)


@partial(jax.jit, static_argnames=("n",))
def spatial_covariance(x: jnp.ndarray, n: int = 11) -> jnp.ndarray:
    """Autocovariance of x over an n x n window (topaz/denoise.py:22-49):
    VALID-correlate the image with its own center crop."""
    p = n // 2
    x_c = x[p:-p, p:-p]
    dn = ("NHWC", "HWIO", "NHWC")
    cov = lax.conv_general_dilated(
        x[None, :, :, None], x_c[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=dn,
    )[0, :, :, 0]
    return cov / (x_c.shape[0] * x_c.shape[1])


def estimate_unblur_filter(x, width: int = 11) -> Tuple[np.ndarray, np.ndarray]:
    """Whitening filter that flattens the autocovariance power spectrum
    (topaz/denoise.py:52-75). Returns (kernel, covariance)."""
    cov = np.asarray(spatial_covariance(jnp.asarray(x, jnp.float32), n=width))
    ps = np.fft.fft2(np.fft.ifftshift(cov))
    re = ps.real.copy()
    re[re <= 0] = 1
    re[0, 0] = 1
    F = 1 / np.sqrt(re)
    w_inv = np.fft.fftshift(np.fft.ifft2(F)).real
    return w_inv.astype(np.float32), cov


def estimate_unblur_filter_gaussian(x, width: int = 11, s: int = 11):
    """Gaussian-parameterized whitening filter (topaz/denoise.py:77-127):
    fit (sigma, alpha) in log space so that correlating the Gaussian
    kernel with itself best matches the observed autocovariance, then
    return the inverse of that filter. Dead code upstream (no command
    calls it) — ported for completeness. The gradient comes from jax.grad
    instead of the reference's torch-autograd round trip; the
    2-parameter BFGS stays on host (scipy). Returns
    (inverse kernel, sigma, alpha, covariance)."""
    from scipy.optimize import minimize

    cov = spatial_covariance(jnp.asarray(x, jnp.float32), n=width)

    dim = s // 2
    r = jnp.arange(-dim, dim + 1)
    d = (r[:, None] ** 2 + r[None, :] ** 2).astype(jnp.float32)
    p = width // 2
    dn = ("NHWC", "HWIO", "NHWC")

    def loss(params):
        sigma = jnp.exp(params[0])
        alpha = jnp.exp(params[1])
        w = alpha * jnp.exp(-0.5 * d / sigma**2)
        c_w = lax.conv_general_dilated(
            w[None, :, :, None], w[:, :, None, None], (1, 1),
            [(p, p), (p, p)], dimension_numbers=dn)[0, :, :, 0]
        return jnp.sum((c_w - cov) ** 2)

    val_grad = jax.jit(jax.value_and_grad(loss))

    def fun(params):
        v, g = val_grad(jnp.asarray(params, jnp.float32))
        return float(v), np.asarray(g, np.float64)

    result = minimize(fun, np.zeros(2), jac=True)
    sigma = float(np.exp(result.x[0]))
    alpha = float(np.exp(result.x[1]))
    w = gaussian_filter(sigma, s=s) * alpha
    w_inv = inverse_filter(w)
    return w_inv.astype(np.float32), sigma, alpha, np.asarray(cov)


def correct_spatial_covariance(x, width: int = 11, patch: int = 1):
    """Estimate the whitening filter and apply it, optionally per-patch
    (topaz/denoise.py:129-172)."""
    x = jnp.asarray(x, jnp.float32)
    if patch > 1:
        H, W = x.shape
        N = [H // patch] * patch
        for i in range(H % patch):
            N[i] += 1
        M = [W // patch] * patch
        for i in range(W % patch):
            M[i] += 1
        y = np.zeros(x.shape, dtype=np.float32)
        xh = np.asarray(x)
        i = 0
        for n in N:
            j = 0
            for m in M:
                pad_ii = max(0, i - width // 2)
                pad_ij = min(H, i + n + width // 2)
                pad_ji = max(0, j - width // 2)
                pad_jj = min(W, j + m + width // 2)
                x_ij = xh[pad_ii:pad_ij, pad_ji:pad_jj]
                y_ij = np.asarray(correct_spatial_covariance(x_ij, width=width))
                y[i : i + n, j : j + m] = y_ij[i - pad_ii : i - pad_ii + n,
                                               j - pad_ji : j - pad_ji + m]
                j += m
            i += n
        return jnp.asarray(y)
    w, _ = estimate_unblur_filter(x, width=width)
    return apply_kernel(x, jnp.asarray(w))
