"""Extra feature-extractor families: dense nets and multiscale residual nets.

Functional equivalents of topaz/model/features/densenet.py and
topaz/model/features/msnet.py. Note these are *dead code in the reference*:
its arch lookup (factory.py:29 eval) has no bindings for them, so they are
unreachable from the reference CLI. Here they are constructible through
``EXTRA_ARCHS`` and usable as picker feature extractors.

Parameter trees mirror the torch module structure so random torch weights
convert directly (tests/test_extras.py checks forward parity).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topaz_tpu.models.layers import conv_nd, max_pool_nd


def _conv(x, p, dilation=1, same=False, precision=None):
    if same:
        k = p["w"].shape[0]
        pad = dilation * (k // 2)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return conv_nd(x, p["w"], p.get("b"), dilation=dilation, precision=precision)


def _relu(x):
    return jax.nn.relu(x)


def _center_crop_to(x, h, w):
    n = (x.shape[1] - h) // 2
    m = (x.shape[2] - w) // 2
    return x[:, n : n + h, m : m + w]


# ---------------------------------------------------------------------------
# MultiscaleDenseNet (densenet.py:10-73)
# ---------------------------------------------------------------------------

def apply_multiscale_densenet(params: Dict, x: jnp.ndarray, num_blocks: int = 4,
                              precision=None) -> jnp.ndarray:
    """SAME-padded dense blocks with dilations 1/2/4, 1x1 projections, and a
    final dilation-12 7x7 conv (receptive field 73)."""
    li = 0
    h = _relu(_conv(x, params["layers"][str(li)], same=True, precision=precision))
    li += 2
    for _ in range(num_blocks):
        blk = params["layers"][str(li)]
        d1 = _relu(_conv(h, blk["conv1"], dilation=1, same=True, precision=precision))
        h = jnp.concatenate([h, d1], axis=-1)
        d2 = _relu(_conv(h, blk["conv2"], dilation=2, same=True, precision=precision))
        h = jnp.concatenate([h, d2], axis=-1)
        d3 = _relu(_conv(h, blk["conv3"], dilation=4, same=True, precision=precision))
        h = jnp.concatenate([h, d3], axis=-1)
        li += 1
        h = _relu(_conv(h, params["layers"][str(li)], precision=precision))
        li += 2
    h = _relu(_conv(h, params["layers"][str(li)], dilation=12, precision=precision))
    return h


# ---------------------------------------------------------------------------
# DenseNet (densenet.py:77-169), VALID convs with center-cropped concats
# ---------------------------------------------------------------------------

def apply_densenet(params: Dict, x: jnp.ndarray, num_layers: int = 12,
                   bn: bool = False, precision=None) -> jnp.ndarray:
    h = _relu(_conv(x, params["base"]["0"], precision=precision))
    h = max_pool_nd(h, 3, stride=1)
    for i in range(num_layers):
        d = (4, 2, 1)[i % 3]
        lp = params["layers"][str(i)]
        z = _relu(_conv(h, lp["conv1"], dilation=d, precision=precision))
        z = _relu(_conv(z, lp["conv2"], precision=precision))
        h = _center_crop_to(h, z.shape[1], z.shape[2])
        h = jnp.concatenate([h, z], axis=-1)
    return _relu(_conv(h, params["fc"], precision=precision))


def densenet_width(num_layers: int = 12) -> int:
    width = 9
    for i in range(num_layers):
        width += 2 * (4, 2, 1)[i % 3] + 2
    return width + 6


# ---------------------------------------------------------------------------
# ResidMultiScaleBlock / nets (msnet.py:10-202)
# ---------------------------------------------------------------------------

def apply_rms_block(params: Dict, x: jnp.ndarray,
                    scales: Tuple[int, ...] = (1, 2, 4),
                    padding: bool = False, precision=None) -> jnp.ndarray:
    """Residual multiscale block: parallel dilated 3x3 branches (each with a
    pre-maxpool at its scale and a 1x1 projection), summed onto a cropped
    skip path (msnet.py:40-57)."""
    h = x
    if "proj" in params:
        h = conv_nd(x, params["proj"]["w"], None, precision=precision)
    for bi, s in enumerate(scales):
        blk = params["blocks"][str(bi)]
        z = x
        idx = 0
        if s > 1:
            pad = s - 1
            zp = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                         constant_values=-jnp.inf)
            z = max_pool_nd(zp, 2 * (s - 1) + 1, stride=1)
            idx += 1
        z = _conv(z, blk[str(idx)], dilation=s, same=padding, precision=precision)
        z = _relu(z)
        z = _conv(z, blk[str(idx + 2)], precision=precision)
        h = _center_crop_to(h, z.shape[1], z.shape[2])
        h = h + z
    return _relu(h)


RMS_LAYOUTS = {
    # arch -> (units, per-layer (scales, padding))
    "rmsnet": (
        [64, 64, 64, 128, 128, 128, 128, 128, 128, 256, 256, 256],
        None,  # uniform scales (1,2,4) over units[1:-1]
    ),
    "rmsnet7": (
        [64, 64, 128, 128, 256],
        [((1, 2, 4), False), ((1, 2, 8), False), ((1, 2, 8), False),
         ((1, 4, 16), False), ((1, 4, 16), False)],
    ),
    "rmsnet10": (
        [64, 64, 128, 128, 256],
        [((1, 2, 4), False), ((1, 2, 4), True), ((1, 2, 4), True),
         ((1, 2, 8), False), ((1, 2, 8), False), ((1, 2, 8), True),
         ((1, 4, 16), False), ((1, 4, 16), False)],
    ),
}


def apply_rmsnet(params: Dict, x: jnp.ndarray, arch: str = "rmsnet",
                 precision=None) -> jnp.ndarray:
    units, layout = RMS_LAYOUTS[arch]
    h = _relu(_conv(x, params["base"]["0"], precision=precision))
    if layout is None:
        layout = [((1, 2, 4), False)] * len(units[1:-1])
    for i, (scales, padding) in enumerate(layout):
        h = apply_rms_block(params["layers"][str(i)], h, scales=scales,
                            padding=padding, precision=precision)
    return _relu(_conv(h, params["fc"]["0"], precision=precision))


# ---------------------------------------------------------------------------
# PyramidNet (msnet.py:204-291)
# ---------------------------------------------------------------------------

def apply_pyramidnet(params: Dict, x: jnp.ndarray,
                     scales: Tuple[int, ...] = (2, 4, 8, 16),
                     precision=None) -> jnp.ndarray:
    zs = []
    h = _relu(_conv(x, params["encoder_blocks"]["0"]["0"], same=True,
                    precision=precision))
    zs.append(h)
    for ei, s in enumerate(scales, start=1):
        blk = params["encoder_blocks"][str(ei)]
        pad = s - 1
        hp = jnp.pad(h, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=-jnp.inf)
        h = max_pool_nd(hp, 2 * (s - 1) + 1, stride=1)
        h = _relu(_conv(h, blk["1"], dilation=s, same=True, precision=precision))
        h = _relu(_conv(h, blk["3"], dilation=s, same=True, precision=precision))
        zs.append(h)

    skips = zs[:-1][::-1]
    # decoder dilations mirror the encoder: scales[::-1][1:] (msnet.py:278)
    for di, s in enumerate(list(reversed(scales))[1:]):
        blk = params["decoder_blocks"][str(di)]
        h = _relu(_conv(h, blk["0"], dilation=s, precision=precision))
        h = _relu(_conv(h, blk["2"], dilation=s, precision=precision))
        z = _center_crop_to(skips[di], h.shape[1], h.shape[2])
        h = jnp.concatenate([z, h], axis=-1)

    h = _relu(_conv(h, params["final_block"]["0"], precision=precision))
    h = _relu(_conv(h, params["final_block"]["2"], precision=precision))
    return h


def pyramidnet_width(scales=(2, 4, 8, 16)) -> int:
    return sum(4 * s for s in list(scales)[::-1][1:]) + 9


def extras_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map a torch state dict of any extras module to our tree (module path
    -> nested dict, weights to HWIO). Rejects batch-norm state dicts with
    a clear error: the extras apply paths do not implement batchnorm, so
    loading bn weights would be silently wrong (the reference DenseNet
    defaults to bn=True — pass bn=False when exporting for conversion)."""
    from topaz_tpu.models.convert import params_tree_from_state_dict

    return params_tree_from_state_dict(sd, allow_bn=False)


EXTRA_ARCHS = {
    "msdensenet": {"apply": apply_multiscale_densenet, "width": 73},
    "densenet": {"apply": apply_densenet, "width": densenet_width()},
    "rmsnet": {"apply": lambda p, x, **kw: apply_rmsnet(p, x, "rmsnet", **kw),
               "width": 10 + 8 * 10 + 5},
    "rmsnet7": {"apply": lambda p, x, **kw: apply_rmsnet(p, x, "rmsnet7", **kw),
                "width": 125},
    "rmsnet10": {"apply": lambda p, x, **kw: apply_rmsnet(p, x, "rmsnet10", **kw),
                 "width": 125},
    "pyramidnet": {"apply": apply_pyramidnet, "width": pyramidnet_width()},
}
