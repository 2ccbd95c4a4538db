"""Denoiser registry + pretrained weight loading (torch-free at runtime).

Mirrors the alias map of topaz/denoising/models.py:568-625; reference .sav
files are converted to .npz on first use and cached in-package.
"""

from __future__ import annotations

import os
from typing import Dict

from topaz_tpu.models.denoise import (
    APPLY_FNS,
    denoiser_params_from_state_dict,
    infer_denoiser_arch,
    init_denoiser,
)
from topaz_tpu.utils.serialize import load_checkpoint, save_checkpoint

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED_DIR = os.path.join(_PKG_DIR, "pretrained", "denoise")
REFERENCE_PRETRAINED_DIR = "/root/reference/topaz/pretrained/denoise"

# alias -> reference weight file stem (denoising/models.py:568-579)
PRETRAINED_DENOISERS = {
    "unet": "unet_L2_v0.2.2",
    "unet-small": "unet_small_L1_v0.2.2",
    "fcnn": "fcnn_L1_v0.2.2",
    "affine": "affine_L1_v0.2.2",
    "unet-v0.2.1": "unet_L2_v0.2.1",
    "unet-3d": "unet-3d-10a-v0.2.4",
    "unet-3d-10a": "unet-3d-10a-v0.2.4",
    "unet-3d-20a": "unet-3d-20a-v0.2.4",
}


def _convert_torch(path: str):
    """Reference .sav -> (meta, params); the pickled module's class name
    disambiguates UDenoiseNet3 from UDenoiseNet (identical shapes,
    different output semantics)."""
    from topaz_tpu.models.convert import _state_dict_of, load_sav

    obj = load_sav(path)
    sd = _state_dict_of(obj)
    meta = infer_denoiser_arch(sd, class_name=type(obj).__name__)
    return meta, denoiser_params_from_state_dict(sd)


def _load_pretrained(stem: str):
    """Converted pretrained weights: serve the cached .npz, else convert
    from the reference .sav — caching when the install is writable and
    serving from memory when it is not (read-only site-packages)."""
    npz_path = os.path.join(PRETRAINED_DIR, stem + ".npz")
    if os.path.exists(npz_path):
        meta, trees = load_checkpoint(npz_path)
        return meta, trees["params"]
    sav_path = os.path.join(REFERENCE_PRETRAINED_DIR, stem + ".sav")
    if not os.path.exists(sav_path):
        raise FileNotFoundError(
            f"pretrained denoiser weights {stem!r} are unavailable "
            f"(looked for {sav_path})"
        )
    meta, params = _convert_torch(sav_path)
    try:
        os.makedirs(PRETRAINED_DIR, exist_ok=True)
        save_checkpoint(npz_path, meta, params=params)
    except OSError as e:
        import sys

        print(f"# note: could not cache converted weights ({e}); "
              f"serving from memory", file=sys.stderr)
    return meta, params


def load_denoiser(name_or_path: str):
    """Load a denoiser by alias, .npz path, or reference .sav path.
    Returns (meta, params); meta['arch'] keys APPLY_FNS, meta['dims'] is
    2 or 3. Arch geometry always comes from the checkpoint itself."""
    if name_or_path in PRETRAINED_DENOISERS:
        try:
            return _load_pretrained(PRETRAINED_DENOISERS[name_or_path])
        except FileNotFoundError:
            # this mirror ships v0.2.1 but not v0.2.2 of the default unet
            if name_or_path == "unet":
                import sys

                print("# WARNING: unet v0.2.2 weights unavailable; falling "
                      "back to unet-v0.2.1", file=sys.stderr)
                return _load_pretrained(PRETRAINED_DENOISERS["unet-v0.2.1"])
            raise

    path = name_or_path
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"denoising model {name_or_path!r} is neither a pretrained alias "
            f"({sorted(PRETRAINED_DENOISERS)}) nor a file"
        )

    if path.endswith(".npz"):
        meta, trees = load_checkpoint(path)
        return meta, trees["params"]

    return _convert_torch(path)


def new_denoiser(arch: str, nf: int = 48, base_width: int = 11,
                 top_width: int = 3, dims: int = 2, seed: int = 0):
    """Random-init denoiser: (meta, params) for an arch name."""
    import jax

    kind = "unet" if arch in ("unet-3d",) else arch
    meta = {"arch": kind, "nf": nf, "base_width": base_width,
            "top_width": top_width, "dims": dims}
    params = init_denoiser(kind, jax.random.PRNGKey(seed), nf=nf,
                           base_width=base_width, top_width=top_width,
                           dims=dims)
    return meta, params


def save_denoiser(path: str, meta: Dict, params: Dict) -> None:
    """Write a denoiser checkpoint (.npz: meta + param tree)."""
    import jax
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, params)
    save_checkpoint(path, meta, params=params)


def apply_fn_for(meta: Dict):
    """Forward function for a denoiser meta dict (keys APPLY_FNS by arch)."""
    arch = meta["arch"]
    if arch not in APPLY_FNS:
        raise ValueError(f"unknown denoiser arch {arch!r}")
    return APPLY_FNS[arch]
