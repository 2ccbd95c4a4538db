"""Functional conv-net building blocks over explicit parameter pytrees.

Each picker architecture is one *static spec* (a tuple of layer descriptors)
from which two pure apply functions are derived:

  * strided ("training") form — convolutions keep their native strides; a
    width-sized crop maps to a single logit.
  * dense ("inference") form — every stride-s layer becomes a stride-1 layer
    whose dilation is multiplied by the accumulated stride, producing a
    per-pixel score map. This statically reproduces what the reference does
    by mutating module attributes at runtime
    (fill()/unfill(), topaz/model/features/resnet.py:31-44,87-99,153-176)
    without any mutable state — one weight set serves both forms.

Supports 2D and 3D. Parameters are nested dicts of jnp arrays with HWIO
(DHWIO for 3D) conv kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# layer specs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConvSpec:
    """BasicConv: conv [+ batchnorm] + activation
    (topaz/model/features/resnet.py:50-105)."""
    nin: int
    nout: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    bn: bool = False
    activation: str = "relu"


@dataclass(frozen=True)
class ResidSpec:
    """ResidA residual block (topaz/model/features/resnet.py:108-204):
    conv0 3x3 -> act -> conv1 3x3 (dilation, stride) added to the
    edge-cropped (and 1x1-projected when nin != nout) input."""
    nin: int
    nhidden: int
    nout: int
    dilation: int = 1
    stride: int = 1
    bn: bool = False
    activation: str = "relu"

    @property
    def kernel(self) -> int:  # composite receptive field (resnet.py:138)
        return 2 * self.dilation + 3


@dataclass(frozen=True)
class PoolSpec:
    """Pooling with fill-aware dilation (topaz/model/features/resnet.py:10-47).

    ``kind`` selects max or avg (the convN archs accept both,
    topaz/model/features/basic.py:34-38); ``padding`` mirrors the
    reference's padded pools there (``pooling(3, stride=2, padding=1)``,
    basic.py:55) — the resnet archs' MaxPool is unpadded."""
    kernel: int
    stride: int
    kind: str = "max"
    padding: int = 0


@dataclass(frozen=True)
class DropoutSpec:
    rate: float


LayerSpec = Union[ConvSpec, ResidSpec, PoolSpec, DropoutSpec]


def receptive_field(specs: Sequence[LayerSpec]) -> int:
    """Input size producing one output (insize_from_outsize,
    topaz/model/utils.py:39-68). ResidA counts as one kernel-(2d+3) layer."""
    out = 1
    for spec in reversed(list(specs)):
        if isinstance(spec, DropoutSpec):
            continue
        k = spec.kernel
        s = spec.stride
        d = spec.dilation if isinstance(spec, ConvSpec) else 1
        pad = getattr(spec, "padding", 0)
        out = (out - 1) * s + 1 + (k - 1) * d - 2 * pad
    return out


def total_stride(specs: Sequence[LayerSpec]) -> int:
    st = 1
    for spec in specs:
        if isinstance(spec, DropoutSpec):
            continue
        st *= spec.stride
    return st


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------

def _dim_numbers(dims: int):
    if dims == 2:
        return ("NHWC", "HWIO", "NHWC")
    if dims == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"dims must be 2 or 3, got {dims}")


def conv_nd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    dims: int = 2,
    precision=None,
) -> jnp.ndarray:
    """VALID N-d convolution (cross-correlation) on channels-last layout."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,) * dims,
        padding="VALID",
        rhs_dilation=(dilation,) * dims,
        dimension_numbers=_dim_numbers(dims),
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def max_pool_nd(x: jnp.ndarray, kernel: int, stride: int = 1,
                dilation: int = 1, dims: int = 2) -> jnp.ndarray:
    window = (1,) + (kernel,) * dims + (1,)
    strides = (1,) + (stride,) * dims + (1,)
    wd = (1,) + (dilation,) * dims + (1,)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window, strides, padding="VALID", window_dilation=wd
    )


def pool_nd(x: jnp.ndarray, kernel: int, stride: int = 1, dilation: int = 1,
            dims: int = 2, kind: str = "max", padding: int = 0) -> jnp.ndarray:
    """Max or average pooling with optional symmetric padding.

    avg follows torch AvgPool defaults (count_include_pad=True: padded
    zeros count toward the divisor). In the dense (filled) form the
    padding scales with the accumulated dilation, like the kernel."""
    window = (1,) + (kernel,) * dims + (1,)
    strides = (1,) + (stride,) * dims + (1,)
    wd = (1,) + (dilation,) * dims + (1,)
    pad = padding * dilation
    pads = ((0, 0),) + ((pad, pad),) * dims + ((0, 0),)
    if kind == "avg":
        s = lax.reduce_window(x, 0.0, lax.add, window, strides, padding=pads,
                              window_dilation=wd)
        return s / float(kernel**dims)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides,
                             padding=pads, window_dilation=wd)


def _activate(x: jnp.ndarray, activation: str, params=None) -> jnp.ndarray:
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "prelu":
        # single learnable slope, torch nn.PReLU default
        a = params["prelu"] if params is not None and "prelu" in params else 0.25
        return jnp.where(x >= 0, x, a * x)
    if activation == "leaky_relu":
        return jax.nn.leaky_relu(x)
    if activation == "linear":
        return x
    raise ValueError(f"unknown activation: {activation}")


def batch_norm_apply(x, p, state, train: bool, momentum: float = 0.1,
                     eps: float = 1e-5):
    """Functional batchnorm with torch semantics (biased batch var for the
    normalization, unbiased for the running update)."""
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_state


# ---------------------------------------------------------------------------
# layer application
# ---------------------------------------------------------------------------

def apply_layer(
    spec: LayerSpec,
    params,
    state,
    x: jnp.ndarray,
    acc_stride: int,
    dense: bool,
    dims: int,
    train: bool = False,
    dropout_rng=None,
    precision=None,
):
    """Apply one layer; returns (y, new_state, new_acc_stride).

    dense=True implements the filled form: effective dilation is the layer's
    dilation times the accumulated stride, strides become 1.
    """
    if isinstance(spec, DropoutSpec):
        if train and spec.rate > 0 and dropout_rng is not None:
            keep = 1.0 - spec.rate
            mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
            x = jnp.where(mask, x / keep, 0)
        return x, state, acc_stride

    if dense:
        eff_stride = 1
        base_dil = acc_stride
    else:
        eff_stride = spec.stride
        base_dil = 1

    if isinstance(spec, PoolSpec):
        y = pool_nd(x, spec.kernel, stride=eff_stride, dilation=base_dil,
                    dims=dims, kind=spec.kind, padding=spec.padding)
        return y, state, acc_stride * spec.stride

    if isinstance(spec, ConvSpec):
        y = conv_nd(
            x,
            params["conv_w"],
            params.get("conv_b"),
            stride=eff_stride,
            dilation=spec.dilation * base_dil,
            dims=dims,
            precision=precision,
        )
        new_state = state
        if spec.bn:
            y, new_state = batch_norm_apply(y, params["bn"], state["bn"], train)
            new_state = {**state, "bn": new_state}
        y = _activate(y, spec.activation, params)
        return y, new_state, acc_stride * spec.stride

    if isinstance(spec, ResidSpec):
        d0 = base_dil                      # conv0 effective dilation
        d1 = spec.dilation * base_dil      # conv1 effective dilation
        new_state = state

        h = conv_nd(x, params["conv0_w"], params.get("conv0_b"),
                    stride=1, dilation=d0, dims=dims, precision=precision)
        if spec.bn:
            h, bn0 = batch_norm_apply(h, params["bn0"], state["bn0"], train)
            new_state = {**new_state, "bn0": bn0}
        h = _activate(h, spec.activation, params)
        y = conv_nd(h, params["conv1_w"], params.get("conv1_b"),
                    stride=eff_stride, dilation=d1, dims=dims, precision=precision)

        # skip path: crop the input to align with the valid-conv output
        # (resnet.py:185-197)
        edge = d0 + d1
        sl = (slice(None),) + (slice(edge, -edge),) * dims + (slice(None),)
        xc = x[sl]
        if "proj_w" in params:
            xc = conv_nd(xc, params["proj_w"], None, stride=eff_stride,
                         dims=dims, precision=precision)
        elif eff_stride > 1:
            sub = (slice(None),) + (slice(None, None, eff_stride),) * dims + (slice(None),)
            xc = xc[sub]

        y = y + xc
        if spec.bn:
            y, bn1 = batch_norm_apply(y, params["bn1"], state["bn1"], train)
            new_state = {**new_state, "bn1": bn1}
        y = _activate(y, spec.activation, params)
        return y, new_state, acc_stride * spec.stride

    raise TypeError(f"unknown layer spec: {spec}")


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def _kaiming_uniform(rng, shape, fan_in, dtype=jnp.float32):
    # torch Conv default init: kaiming_uniform(a=sqrt(5)) ->
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bound on weight and bias
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def init_layer_params(spec: LayerSpec, rng, dims: int):
    """Initialize one layer's params/state with torch-compatible scales."""
    if isinstance(spec, (PoolSpec, DropoutSpec)):
        return {}, {}

    def conv_init(rng, nin, nout, k):
        kshape = (k,) * dims + (nin, nout)
        fan_in = nin * k**dims
        r1, r2 = jax.random.split(rng)
        w = _kaiming_uniform(r1, kshape, fan_in)
        # kaiming_uniform with a=sqrt(5) gives gain sqrt(2/(1+5)) = 1/sqrt(3),
        # bound = sqrt(3)*gain/sqrt(fan_in) = 1/sqrt(fan_in)  (matches above)
        b = _kaiming_uniform(r2, (nout,), fan_in)
        return w, b

    if isinstance(spec, ConvSpec):
        r1, _ = jax.random.split(rng)
        w, b = conv_init(r1, spec.nin, spec.nout, spec.kernel)
        params = {"conv_w": w}
        state = {}
        if spec.bn:
            params["bn"] = {"scale": jnp.ones(spec.nout), "bias": jnp.zeros(spec.nout)}
            state["bn"] = {"mean": jnp.zeros(spec.nout), "var": jnp.ones(spec.nout)}
        else:
            params["conv_b"] = b
        if spec.activation == "prelu":
            params["prelu"] = jnp.array(0.25)
        return params, state

    if isinstance(spec, ResidSpec):
        r0, r1, r2 = jax.random.split(rng, 3)
        w0, b0 = conv_init(r0, spec.nin, spec.nhidden, 3)
        w1, b1 = conv_init(r1, spec.nhidden, spec.nout, 3)
        params = {"conv0_w": w0, "conv1_w": w1}
        state = {}
        if spec.bn:
            for name, n in (("bn0", spec.nhidden), ("bn1", spec.nout)):
                params[name] = {"scale": jnp.ones(n), "bias": jnp.zeros(n)}
                state[name] = {"mean": jnp.zeros(n), "var": jnp.ones(n)}
        else:
            params["conv0_b"] = b0
            params["conv1_b"] = b1
        if spec.nin != spec.nout:
            wp, _ = conv_init(r2, spec.nin, spec.nout, 1)
            params["proj_w"] = wp
        if spec.activation == "prelu":
            params["prelu"] = jnp.array(0.25)
        return params, state

    raise TypeError(f"unknown layer spec: {spec}")
