"""DCGAN-style transposed-conv decoder for the autoencoder regularizer
(topaz/model/generative.py:31-65, used by the --autoencoder training flag
via topaz/methods.py:11-23).

Architecture: latent (B, nin) -> ConvT k4 s1 -> BN -> LeakyReLU ->
depth x [ConvT k4 s2 p1 -> BN -> LeakyReLU] -> ConvT k3 s2 p1 -> 1 channel.
Output width = 8 * 2**depth - 1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def conv_transpose2d(x, w, stride: int, padding: int, precision=None):
    """torch ConvTranspose2d semantics on channels-last input.

    x: (N, H, W, Cin); w: (k, k, Cout, Cin) (note the transposed channel
    order, matching torch's (Cin, Cout, k, k) after spatial transpose).
    out spatial = (n-1)*stride - 2*padding + k.
    """
    k = w.shape[0]
    # transposed conv = conv with input dilation, flipped kernel, swapped io
    w_flip = w[::-1, ::-1]  # rotate 180
    w_conv = jnp.swapaxes(w_flip, 2, 3)  # -> (k, k, Cin, Cout)
    pad = k - 1 - padding
    return lax.conv_general_dilated(
        x,
        w_conv,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def generator_width(depth: int) -> int:
    return 8 * 2**depth - 1


def init_generator(nin: int, rng, units: int = 32, depth: int = 3) -> Dict:
    """Parameters keyed like the torch Sequential: layers.{idx}."""
    ngf = units
    scale = 2**depth
    params: Dict[str, Dict] = {}

    def convt(rng, cin, cout, k):
        # torch ConvTranspose2d default init: kaiming_uniform(a=sqrt(5)) with
        # fan_in = weight.size(1) * k * k — and size(1) is the OUTPUT channel
        # axis for transposed convs (weight is (Cin, Cout, k, k)), so the
        # bound is 1/sqrt(cout*k*k), not 1/sqrt(cin*k*k)
        bound = 1.0 / np.sqrt(cout * k * k)
        return jax.random.uniform(rng, (k, k, cout, cin), jnp.float32,
                                  -bound, bound)

    rngs = jax.random.split(rng, depth + 2)
    idx = 0
    params[str(idx)] = {"w": convt(rngs[0], nin, ngf * scale, 4)}
    params[f"bn{idx}"] = {"scale": jnp.ones(ngf * scale),
                          "bias": jnp.zeros(ngf * scale)}
    layers = [(nin, ngf * scale, 4, 1, 0)]
    s = scale
    for d in range(depth):
        idx += 1
        params[str(idx)] = {"w": convt(rngs[d + 1], ngf * s, ngf * s // 2, 4)}
        params[f"bn{idx}"] = {"scale": jnp.ones(ngf * s // 2),
                              "bias": jnp.zeros(ngf * s // 2)}
        layers.append((ngf * s, ngf * s // 2, 4, 2, 1))
        s //= 2
    idx += 1
    params[str(idx)] = {"w": convt(rngs[-1], ngf, 1, 3)}
    layers.append((ngf, 1, 3, 2, 1))
    layer_spec = tuple((k, st, p) for (_, _, k, st, p) in layers)
    return params, layer_spec


def layer_spec_for(depth: int) -> Tuple:
    """Static (kernel, stride, padding) per layer for a given depth."""
    layers = [(4, 1, 0)] + [(4, 2, 1)] * depth + [(3, 2, 1)]
    return tuple(layers)


def apply_generator(params: Dict, z: jnp.ndarray, train: bool = False,
                    precision=None, layer_spec: Tuple = None) -> jnp.ndarray:
    """z: (B, nin) or (B, 1, 1, nin) -> (B, width, width, 1).

    Batch statistics are always used for BN (this auxiliary decoder only
    exists at train time)."""
    if layer_spec is None:
        layer_spec = layer_spec_for(len(params) // 2 - 1)
    if z.ndim == 2:
        z = z[:, None, None, :]
    h = z
    n_layers = len(layer_spec)
    for idx in range(n_layers):
        k, stride, pad = layer_spec[idx]
        h = conv_transpose2d(h, params[str(idx)]["w"], stride, pad,
                             precision=precision)
        if idx < n_layers - 1:
            bn = params[f"bn{idx}"]
            mean = jnp.mean(h, axis=(0, 1, 2))
            var = jnp.var(h, axis=(0, 1, 2))
            h = (h - mean) * lax.rsqrt(var + 1e-5) * bn["scale"] + bn["bias"]
            h = jax.nn.leaky_relu(h, 0.01)
    return h
