"""Noise2noise denoiser model family (2D + 3D), functional JAX.

Architectures with the contract of topaz/denoising/models.py:
  * UDenoiseNet        (models.py:74-175)  — 5-level U-Net, nearest-neighbor
    upsampling, skip concats from every encoder level plus the raw input
  * UDenoiseNetSmall   (models.py:178-244) — 3-level variant
  * UDenoiseNet2       (models.py:247-346) — no concat on the top two levels
  * UDenoiseNet3       (models.py:349-449) — predicts the noise residual
  * UDenoiseNet3D      (models.py:452-564) — 3D U-Net
  * DenoiseNet2        (models.py:52-66)   — 3-layer wide FCNN ("fcnn")
  * AffineDenoise      (topaz/filters.py:40-48) — one learnable 31x31 conv

Parameter trees mirror the torch state-dict structure (module name ->
sequential index -> w/b) so conversion from the bundled pretrained .sav
files is a pure layout transpose. All convs are SAME-padded; pooling is
2x max; upsampling uses torch's floor-indexed nearest-neighbor rule so
odd-sized levels reproduce the reference exactly.

Known reference divergences (not replicated): DenoiseNet (models.py:25-49)
has mismatched channel counts at models.py:41 and cannot run; the 'fcnet2'
CLI arch therefore has no working reference definition.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conv(x, p, dims=2, precision=None):
    """SAME-padded conv on channels-last input."""
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    y = lax.conv_general_dilated(
        x, p["w"], (1,) * dims, "SAME", dimension_numbers=dn,
        precision=precision,
    )
    return y + p["b"]


def _conv_cat(a, b, p, dims=2, precision=None):
    """``conv(concat([a, b], -1))`` — identical values either way; the
    implementation strategy is chosen at trace time by spatial size.

    Kernel-split form (two convs summed, by linearity) avoids
    materializing the concatenated tensor and measured ~8% faster at 512^2
    on v5e (a TPU-profiler trace showed ~38% of U-Net device time in
    copy/reshape/broadcast data movement). At 4096^2, however, it pushes
    XLA into catastrophic conv layouts (2x padded f32[4096,8,513,64]
    temps -> 16 GB HBM, OOM), so large images keep the concat form.

    This is the fallback for non-exact-2x upsamples; exact-2x levels use
    the fused input-dilated form (_conv_up_cat), measured faster still
    (v5e whole U-Net: 37.9 -> 33.1 ms at 512^2, 164 -> 160 ms on 2x96^3
    3D patches, 415 -> 408 ms at 4096^2)."""
    area = 1
    for s in a.shape[1 : 1 + dims]:
        area *= int(s)
    if area > _fused_area_cap(a.dtype):
        return _conv(jnp.concatenate([a, b], axis=-1), p, dims, precision)
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    ca = a.shape[-1]
    w = p["w"]
    ya = lax.conv_general_dilated(a, w[..., :ca, :], (1,) * dims, "SAME",
                                  dimension_numbers=dn, precision=precision)
    yb = lax.conv_general_dilated(b, w[..., ca:, :], (1,) * dims, "SAME",
                                  dimension_numbers=dn, precision=precision)
    return ya + yb + p["b"]


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _upconv_kernel(w):
    """Compose a k-tap SAME conv with a preceding exact-2x nearest upsample
    into one (k+1)-tap kernel for an input-dilated conv.

    nearest-2x(h)[j] = h[j//2] equals the dilated signal d (h at even
    positions, zeros between) correlated with ones(2):  up = ones2 * d.
    Hence  conv_k(up) = (conv_k * ones2)(d)  with the combined kernel
    W'[m] = W[m-1] + W[m]  (out-of-range taps zero), per spatial axis."""
    dims = w.ndim - 2
    out = 0.0
    for shifts in np.ndindex(*((2,) * dims)):
        pad = [(1 - s, s) for s in shifts] + [(0, 0), (0, 0)]
        out = out + jnp.pad(w, pad)
    return out


def _conv_up(h, w, dims=2, precision=None):
    """conv_k(nearest_2x_upsample(h)) without materializing the upsample:
    one input-dilated conv with the composed (k+1)-tap kernel. Exact for
    even output sizes (out = 2*in per axis). No bias added."""
    k = w.shape[0]
    p = (k + 1) // 2  # composed kernel size k+1; SAME-on-upsampled padding
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    return lax.conv_general_dilated(
        h, _upconv_kernel(w), (1,) * dims, [(p, p)] * dims,
        lhs_dilation=(2,) * dims, dimension_numbers=dn, precision=precision,
    )


def _fused_up_enabled():
    import os

    return os.environ.get("TOPAZ_FUSED_UP", "1") != "0"


# Above this output area XLA's input-dilated conv lowering splits the conv
# into a padded spatial layout whose temp copies OOM 16 GB HBM at 4096^2
# (measured: f32[4096,8,513,64] copy, 2x pad expansion, 8 GB). The fused
# form is used at or below it; larger levels take the banded path below.
_FUSED_UP_MAX_AREA = 2048 * 2048


def _fused_area_cap(dtype) -> int:
    """The OOM behind _FUSED_UP_MAX_AREA is a bytes phenomenon: the f32
    input-dilated lowering materializes an 8 GB temp at 4096^2 while
    2048^2 compiles fine (the true f32 edge is somewhere in between, so
    the f32 cap stays at the proven 2048^2). Half-width activations halve
    the temp: bfloat16 at 4096^2 compiles AND wins (v5e measured: 280 ms
    concat -> 251 ms fused for the whole U-Net, -11%), so the bf16 cap is
    the measured-safe 4096^2; 8k images would double the f32 temp bytes
    again and fall back to the concat form."""
    try:
        if jnp.dtype(dtype).itemsize <= 2:
            return 4 * _FUSED_UP_MAX_AREA  # 4096*4096, measured safe
    except TypeError:
        pass
    return _FUSED_UP_MAX_AREA


def _conv_up_cat(h, skip, p, dims=2, precision=None):
    """``conv(concat([nearest_2x(h), skip], -1))`` with neither the upsample
    nor the concat materialized: the h half of the kernel becomes one
    input-dilated conv on the low-res h (see _conv_up) and the skip half a
    plain conv, summed by linearity. Exact; used when every spatial axis
    doubles (the power-of-two case). A v5e profiler trace showed ~38% of 4k
    U-Net device time in copy/reshape/broadcast/pad from the materialized
    upsample+concat — this removes all of it."""
    ch = h.shape[-1]
    w = p["w"]
    ya = _conv_up(h, w[..., :ch, :], dims, precision)
    dn = ("NHWC", "HWIO", "NHWC") if dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    yb = lax.conv_general_dilated(skip, w[..., ch:, :], (1,) * dims, "SAME",
                                  dimension_numbers=dn, precision=precision)
    return ya + yb + p["b"]


def _dec1_block(params_dec1, h, x, dims=2, precision=None):
    """Top decoder level: up(h) ∥ x -> conv -> lrelu -> conv -> lrelu -> conv.

    For large 2D images (output area > _FUSED_UP_MAX_AREA) the three convs
    are computed in exact row bands: each band slices h and x with a halo
    wide enough that SAME-pad corruption at interior band edges is cropped
    away, so the result is bit-identical to the whole-image form while every
    temp is a band (~1/bands of a full-res 64-channel map). This removes the
    materialized 2x upsample + concat of the top level — the dominant term
    in a measured v5e profile (38% of 4k device time in copy/reshape/
    broadcast/pad) — without the 16 GB HBM OOM that a whole-image
    input-dilated conv provokes at 4096^2."""
    w0 = params_dec1["0"]["w"]
    k = int(w0.shape[0])
    hs, xs_sp = _spatial(h, dims), _spatial(x, dims)
    area = 1
    for s in xs_sp:
        area *= int(s)
    import os

    # Banding measured slower than the concat fallback on v5e at 4096^2
    # (434 vs 415 ms: the per-band slice copies and output concat cost more
    # than the saved upsample+concat) — off by default, kept for parts with
    # more HBM pressure or future XLA layout changes.
    banding = os.environ.get("TOPAZ_BAND_DEC1", "0") == "1"
    exact2x = all(s == 2 * hh for hh, s in zip(hs, xs_sp))
    if (dims != 2 or not exact2x or not banding or not _fused_up_enabled()
            or area <= _fused_area_cap(x.dtype)):
        hh = _lrelu(_up_block(h, x, params_dec1["0"], dims, precision))
        hh = _lrelu(_conv(hh, params_dec1["2"], dims, precision))
        return _conv(hh, params_dec1["4"], dims, precision)

    n_rows, n_cols = xs_sp
    n_bands = int(np.ceil(area / _FUSED_UP_MAX_AREA))
    rows = int(np.ceil(n_rows / n_bands / 2) * 2)
    p = (k - 1) // 2
    halo = 4 * p + 4  # > corruption depth (3p+1), kept even for alignment
    outs = []
    r0 = 0
    while r0 < n_rows:
        r1 = min(n_rows, r0 + rows)
        e0 = max(0, r0 - halo)
        e0 -= e0 % 2
        e1 = min(n_rows, r1 + halo)
        e1 += e1 % 2
        hb = _lrelu(_conv_up_cat(h[:, e0 // 2 : e1 // 2], x[:, e0:e1],
                                 params_dec1["0"], dims, precision))
        hb = _lrelu(_conv(hb, params_dec1["2"], dims, precision))
        yb = _conv(hb, params_dec1["4"], dims, precision)
        outs.append(yb[:, r0 - e0 : r1 - e0])
        r0 = r1
    return jnp.concatenate(outs, axis=1)


def _up_block(h, skip, p, dims=2, precision=None):
    """Decoder entry: upsample h to skip's spatial size, concat, conv.
    Routes to the fused dilated-conv form when all axes exactly double."""
    hs, ss = _spatial(h, dims), _spatial(skip, dims)
    area = 1
    for s in ss:
        area *= int(s)
    if (_fused_up_enabled() and area <= _fused_area_cap(h.dtype)
            and all(s == 2 * hh for hh, s in zip(hs, ss))):
        return _conv_up_cat(h, skip, p, dims, precision)
    h = _up_nearest(h, ss, dims)
    return _conv_cat(h, skip, p, dims, precision)


def _pool2(x, dims=2):
    window = (1,) + (2,) * dims + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, window, "VALID")


def _up_nearest(x, size, dims=2):
    """torch F.interpolate(mode='nearest'): src index = floor(dst * in/out).

    Exact-2x axes (every level of a power-of-two image) use a broadcast
    reshape instead of a gather — identical result (floor indexing maps
    each source element to two consecutive outputs), far cheaper on TPU."""
    for d in range(dims):
        axis = 1 + d
        n_in = x.shape[axis]
        n_out = size[d]
        if n_in == n_out:
            continue
        if n_out == 2 * n_in:
            expanded = jnp.expand_dims(x, axis + 1)
            tiled = jnp.broadcast_to(
                expanded, expanded.shape[: axis + 1] + (2,) + expanded.shape[axis + 2 :]
            )
            x = tiled.reshape(x.shape[:axis] + (n_out,) + x.shape[axis + 1 :])
        else:
            idx = (jnp.arange(n_out) * n_in) // n_out
            x = jnp.take(x, idx, axis=axis)
    return x


def _spatial(x, dims):
    return tuple(x.shape[1 : 1 + dims])


def apply_unet(params: Dict, x: jnp.ndarray, dims: int = 2,
               residual: bool = False, precision=None) -> jnp.ndarray:
    """UDenoiseNet / UDenoiseNet3 / UDenoiseNet3D forward
    (models.py:130-175, 404-449, 508-564). x: (N, *spatial, 1)."""
    c = lambda h, name, i: _conv(h, params[name][str(i)], dims, precision)

    p1 = _pool2(_lrelu(c(x, "enc1", 0)), dims)
    p2 = _pool2(_lrelu(c(p1, "enc2", 0)), dims)
    p3 = _pool2(_lrelu(c(p2, "enc3", 0)), dims)
    p4 = _pool2(_lrelu(c(p3, "enc4", 0)), dims)
    p5 = _pool2(_lrelu(c(p4, "enc5", 0)), dims)
    h = _lrelu(c(p5, "enc6", 0))

    for name, skip in (("dec5", p4), ("dec4", p3), ("dec3", p2), ("dec2", p1)):
        h = _lrelu(_up_block(h, skip, params[name]["0"], dims, precision))
        h = _lrelu(c(h, name, 2))

    y = _dec1_block(params["dec1"], h, x, dims, precision)
    return x - y if residual else y


def apply_unet_small(params: Dict, x: jnp.ndarray, dims: int = 2,
                     precision=None) -> jnp.ndarray:
    """UDenoiseNetSmall forward (models.py:215-244)."""
    c = lambda h, name, i: _conv(h, params[name][str(i)], dims, precision)
    p1 = _pool2(_lrelu(c(x, "enc1", 0)), dims)
    p2 = _pool2(_lrelu(c(p1, "enc2", 0)), dims)
    p3 = _pool2(_lrelu(c(p2, "enc3", 0)), dims)
    h = _lrelu(c(p3, "enc4", 0))

    for name, skip in (("dec3", p2), ("dec2", p1)):
        h = _lrelu(_up_block(h, skip, params[name]["0"], dims, precision))
        h = _lrelu(c(h, name, 2))

    return _dec1_block(params["dec1"], h, x, dims, precision)


def apply_unet2(params: Dict, x: jnp.ndarray, dims: int = 2,
                precision=None) -> jnp.ndarray:
    """UDenoiseNet2 forward (models.py:303-346): top two decoder levels
    upsample without skip concats."""
    c = lambda h, name, i: _conv(h, params[name][str(i)], dims, precision)
    p1 = _pool2(_lrelu(c(x, "enc1", 0)), dims)
    p2 = _pool2(_lrelu(c(p1, "enc2", 0)), dims)
    p3 = _pool2(_lrelu(c(p2, "enc3", 0)), dims)
    p4 = _pool2(_lrelu(c(p3, "enc4", 0)), dims)
    p5 = _pool2(_lrelu(c(p4, "enc5", 0)), dims)
    h = _lrelu(c(p5, "enc6", 0))

    for name, skip in (("dec5", p4), ("dec4", p3), ("dec3", p2)):
        h = _up_nearest(h, _spatial(skip, dims), dims)
        h = _lrelu(_conv_cat(h, skip, params[name]["0"], dims, precision))
        h = _lrelu(c(h, name, 2))

    for name, target in (("dec2", _spatial(p1, dims)), ("dec1", _spatial(x, dims))):
        hs = _spatial(h, dims)
        area = 1
        for t in target:
            area *= int(t)
        if (_fused_up_enabled() and area <= _fused_area_cap(h.dtype)
                and all(t == 2 * s for s, t in zip(hs, target))):
            p = params[name]["0"]
            h = _lrelu(_conv_up(h, p["w"], dims, precision) + p["b"])
        else:
            h = _up_nearest(h, target, dims)
            h = _lrelu(c(h, name, 0))
        h = _lrelu(c(h, name, 2))
    return c(h, "dec1", 4)


def apply_fcnn(params: Dict, x: jnp.ndarray, dims: int = 2,
               precision=None) -> jnp.ndarray:
    """DenoiseNet2 forward (models.py:52-66)."""
    c = lambda h, i: _conv(h, params["net"][str(i)], dims, precision)
    h = _lrelu(c(x, 0))
    h = _lrelu(c(h, 2))
    return c(h, 4)


def apply_affine(params: Dict, x: jnp.ndarray, dims: int = 2,
                 precision=None) -> jnp.ndarray:
    """AffineDenoise forward (topaz/filters.py:40-48)."""
    return _conv(x, params["filter"], dims, precision)


# ---------------------------------------------------------------------------
# architecture registry
# ---------------------------------------------------------------------------

APPLY_FNS = {
    "unet": lambda p, x, dims=2, precision=None: apply_unet(p, x, dims, False, precision),
    "unet3": lambda p, x, dims=2, precision=None: apply_unet(p, x, dims, True, precision),
    "unet-small": apply_unet_small,
    "unet2": apply_unet2,
    "fcnet": apply_fcnn,
    "affine": apply_affine,
}


def _unet_layout(nf, base_width, top_width, levels=5):
    layout = {"enc1": {"0": (base_width, 1, nf)}}
    for i in range(2, levels + 1):
        layout[f"enc{i}"] = {"0": (3, nf, nf)}
    layout[f"enc{levels + 1}"] = {"0": (3, nf, nf)}
    decs = list(range(levels, 1, -1))
    first = True
    for d in decs:
        cin = 2 * nf if first else 3 * nf
        layout[f"dec{d}"] = {"0": (3, cin, 2 * nf), "2": (3, 2 * nf, 2 * nf)}
        first = False
    layout["dec1"] = {
        "0": (top_width, 2 * nf + 1, 64),
        "2": (top_width, 64, 32),
        "4": (top_width, 32, 1),
    }
    return layout


def min_input_size(arch: str) -> int:
    """Smallest spatial extent (per dimension) the arch's pooling pyramid
    accepts: each of the L pooling levels halves the grid, so an input
    below 2**L collapses an axis to zero mid-network and fails deep inside
    the upsample (the reference crashes the same way inside
    F.interpolate; topaz/denoising/models.py:303-346). Callers turn this
    into a clear error naming the flag to raise."""
    if arch in ("unet", "unet3", "unet2"):
        return 32
    if arch == "unet-small":
        return 8
    return 1


def arch_layout(arch: str, nf: int = 48, base_width: int = 11,
                top_width: int = 3) -> Dict[str, Dict[str, Tuple[int, int, int]]]:
    """Conv shape layout {module: {idx: (kernel, cin, cout)}} per arch."""
    if arch in ("unet", "unet3"):
        return _unet_layout(nf, base_width, top_width, levels=5)
    if arch == "unet-small":
        return _unet_layout(nf, base_width, top_width, levels=3)
    if arch == "unet2":
        lay = _unet_layout(nf, base_width, top_width, levels=5)
        lay["dec2"] = {"0": (3, 2 * nf, 2 * nf), "2": (3, 2 * nf, 2 * nf)}
        lay["dec1"] = {"0": (top_width, 2 * nf, 64), "2": (top_width, 64, 32),
                       "4": (top_width, 32, 1)}
        return lay
    if arch == "fcnet":
        return {"net": {"0": (base_width, 1, nf), "2": (base_width, nf, nf),
                        "4": (base_width, nf, 1)}}
    if arch == "affine":
        return {"filter": {"": (31, 1, 1)}}
    raise ValueError(f"unknown denoiser arch: {arch}")


def init_denoiser(arch: str, rng, nf: int = 48, base_width: int = 11,
                  top_width: int = 3, dims: int = 2) -> Dict:
    """Initialize params with torch-compatible uniform init; the affine
    model is zero-initialized like the reference (filters.py:42-45)."""
    layout = arch_layout(arch, nf=nf, base_width=base_width, top_width=top_width)
    params: Dict = {}
    for mod, convs in layout.items():
        entry = {}
        for idx, (k, cin, cout) in convs.items():
            rng, r1, r2 = jax.random.split(rng, 3)
            fan_in = cin * k**dims
            bound = 1.0 / np.sqrt(fan_in)
            shape = (k,) * dims + (cin, cout)
            if arch == "affine":
                p = {"w": jnp.zeros(shape), "b": jnp.zeros(cout)}
            else:
                p = {
                    "w": jax.random.uniform(r1, shape, jnp.float32, -bound, bound),
                    "b": jax.random.uniform(r2, (cout,), jnp.float32, -bound, bound),
                }
            if idx == "":
                entry = p
            else:
                entry[idx] = p
        params[mod] = entry
    return params


def denoiser_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Map a torch denoiser state dict (enc1.0.weight, ...) to our tree
    (shared walker; AffineDenoise stores 'filter.weight' directly)."""
    from topaz_tpu.models.convert import params_tree_from_state_dict

    return params_tree_from_state_dict(sd, allow_bn=False)


def infer_denoiser_arch(sd: Dict[str, np.ndarray],
                        class_name: str = None) -> Dict:
    """Guess (arch, nf, base_width, top_width, dims) from state dict shapes.

    ``class_name`` (the pickled module's type name, available for the
    reference's whole-module .sav saves) resolves the one shape-ambiguous
    case: UDenoiseNet3 has the same weight shapes as UDenoiseNet but
    predicts the noise residual (y = x - dec1(h), models.py:447) — without
    the hint such checkpoints would silently denoise WRONG (returning the
    noise estimate instead of the image)."""
    if "filter.weight" in sd:
        return {"arch": "affine", "dims": 2}
    if "net.0.weight" in sd:
        w = sd["net.0.weight"]
        return {"arch": "fcnet", "nf": int(w.shape[0]),
                "base_width": int(w.shape[-1]), "dims": 2}
    w = sd["enc1.0.weight"]
    dims = w.ndim - 2
    nf = int(w.shape[0])
    base_width = int(w.shape[-1])
    top_width = int(sd["dec1.0.weight"].shape[-1])
    if "enc6.0.weight" in sd:
        dec1_in = sd["dec1.0.weight"].shape[1]
        if dec1_in == 2 * nf:
            arch = "unet2"
        elif class_name == "UDenoiseNet3":
            arch = "unet3"
        else:
            arch = "unet"
    else:
        arch = "unet-small"
    return {"arch": arch, "nf": nf, "base_width": base_width,
            "top_width": top_width, "dims": dims}
