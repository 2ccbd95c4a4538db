"""Picker model registry and checkpoint loading.

Replaces topaz/model/factory.py:28-64 (which uses eval() for arch lookup and
torch pickles for weights) with an explicit registry and torch-free .npz
checkpoints. Bundled pretrained weights are converted from the reference
.sav state dicts on first use (requires torch once) and cached in-package.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

from topaz_tpu.models.picker import PickerSpec, init_picker, make_picker_spec
from topaz_tpu.utils.serialize import load_checkpoint, save_checkpoint

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED_DIR = os.path.join(_PKG_DIR, "pretrained", "detector")
REFERENCE_PRETRAINED_DIR = "/root/reference/topaz/pretrained/detector"

# alias -> (arch, units, weight file stem); mirrors topaz/model/factory.py:33-51
PRETRAINED_PICKERS = {
    "resnet16": ("resnet16", 64, "resnet16_u64"),
    "resnet16_u64": ("resnet16", 64, "resnet16_u64"),
    "resnet16_u32": ("resnet16", 32, "resnet16_u32"),
    "resnet8": ("resnet8", 64, "resnet8_u64"),
    "resnet8_u64": ("resnet8", 64, "resnet8_u64"),
    "resnet8_u32": ("resnet8", 32, "resnet8_u32"),
}


def _spec_from_meta(meta: Dict) -> PickerSpec:
    return make_picker_spec(
        meta["arch"],
        units=meta.get("units", 32),
        bn=meta.get("bn", False),
        dropout=meta.get("dropout", 0.0),
        pooling=meta.get("pooling"),
        unit_scaling=meta.get("unit_scaling", 2),
        dims=meta.get("dims", 2),
        activation=meta.get("activation"),
    )


def _ensure_converted(stem: str) -> str:
    """Return path to the converted .npz for a bundled pretrained model,
    converting from the reference .sav if needed."""
    npz_path = os.path.join(PRETRAINED_DIR, stem + ".npz")
    if os.path.exists(npz_path):
        return npz_path
    sav_path = os.path.join(REFERENCE_PRETRAINED_DIR, stem + ".sav")
    if not os.path.exists(sav_path):
        raise FileNotFoundError(
            f"pretrained weights {stem!r} are not bundled and the reference "
            f".sav is unavailable ({sav_path}); available aliases with "
            f"weights: {sorted(available_pretrained())}"
        )
    from topaz_tpu.models.convert import convert_picker_sav

    meta, params, state = convert_picker_sav(sav_path)
    try:
        os.makedirs(PRETRAINED_DIR, exist_ok=True)
        save_checkpoint(npz_path, meta, params=params, state=state)
    except OSError as e:  # read-only install: reconvert per process
        import sys

        print(f"# note: could not cache converted weights ({e}); "
              f"converting in memory", file=sys.stderr)
        import tempfile

        tmp = os.path.join(tempfile.gettempdir(), stem + ".npz")
        save_checkpoint(tmp, meta, params=params, state=state)
        return tmp
    return npz_path


def available_pretrained():
    """Names of pretrained picker aliases bundled or convertible here."""
    out = set()
    for alias, (_, _, stem) in PRETRAINED_PICKERS.items():
        if os.path.exists(os.path.join(PRETRAINED_DIR, stem + ".npz")) or os.path.exists(
            os.path.join(REFERENCE_PRETRAINED_DIR, stem + ".sav")
        ):
            out.add(alias)
    return out


def load_picker(name_or_path: str) -> Tuple[PickerSpec, Dict, Dict]:
    """Load a picker by pretrained alias or checkpoint path.

    Accepts:
      * a pretrained alias (resnet8, resnet8_u32, resnet16, ...)
      * a topaz_tpu .npz checkpoint
      * a reference .sav checkpoint (state dict or whole module; needs torch)

    Returns (spec, params, state).
    """
    if name_or_path in PRETRAINED_PICKERS:
        _, _, stem = PRETRAINED_PICKERS[name_or_path]
        path = _ensure_converted(stem)
    else:
        path = name_or_path

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"model {name_or_path!r} is neither a pretrained alias "
            f"({sorted(PRETRAINED_PICKERS)}) nor a file"
        )

    if path.endswith(".npz"):
        meta, trees = load_checkpoint(path)
        return _spec_from_meta(meta), trees["params"], trees.get("state", {"features": {}})

    # torch checkpoint
    from topaz_tpu.models.convert import convert_picker_sav

    meta, params, state = convert_picker_sav(path)
    return _spec_from_meta(meta), params, state


def save_picker(path: str, spec: PickerSpec, params: Dict, state: Dict,
                extra_meta: Optional[Dict] = None) -> None:
    """Write a picker checkpoint (.npz: spec metadata + param/state trees)."""
    meta = {"arch": spec.arch, "dims": spec.dims}
    if spec.config is not None:
        # full constructor kwargs (units/bn/dropout/pooling/unit_scaling/...)
        meta.update({k: v for k, v in spec.config})
    else:
        # converted reference checkpoints: derive from the first conv
        from topaz_tpu.models.layers import ConvSpec, ResidSpec

        for lspec in spec.features:
            if isinstance(lspec, (ConvSpec, ResidSpec)):
                meta["units"] = lspec.nout
                meta["bn"] = lspec.bn
                break
    if extra_meta:
        meta.update(extra_meta)
    save_checkpoint(path, meta, params=params, state=state)


def new_picker(arch: str, units=32, bn: bool = False, dropout: float = 0.0,
               pooling=None, unit_scaling: int = 2, dims: int = 2, seed: int = 0):
    """Build a fresh picker: (spec, params, state) for an arch name."""
    import jax

    spec = make_picker_spec(arch, units=units, bn=bn, dropout=dropout,
                            pooling=pooling, unit_scaling=unit_scaling, dims=dims)
    params, state = init_picker(spec, jax.random.PRNGKey(seed))
    return spec, params, state
