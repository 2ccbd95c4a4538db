"""Convert reference PyTorch checkpoints (.sav) to topaz_tpu parameter trees.

Handles both bare state dicts (the bundled pretrained weights,
topaz/pretrained/) and whole pickled nn.Modules (per-epoch checkpoints
written by topaz/training.py:596-603 and topaz/denoising/models.py:628-633).
torch is only imported here — the runtime loads converted .npz checkpoints
without it.

Layout conversion: torch conv weights are OIHW (OIDHW for 3D); ours are
HWIO (DHWIO) channels-last for TPU-friendly convolutions.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _to_hwio(w: np.ndarray) -> np.ndarray:
    """OI<spatial> -> <spatial>IO."""
    nd = w.ndim
    perm = tuple(range(2, nd)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


def _load_torch(path_or_file):
    import torch

    obj = torch.load(path_or_file, map_location="cpu", weights_only=False)
    return obj


def _state_dict_of(obj) -> Dict[str, np.ndarray]:
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def params_tree_from_state_dict(sd: Dict[str, np.ndarray],
                                allow_bn: bool = False) -> Dict:
    """Generic torch state dict -> nested param tree (weights to HWIO).

    1-D 'weight' entries are batch-norm scales; modules whose apply paths
    do not implement batchnorm must reject them (``allow_bn=False``)
    rather than silently loading-and-ignoring them."""
    params: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf not in ("weight", "bias"):
            continue
        val = np.asarray(val)
        if leaf == "weight" and val.ndim == 1 and not allow_bn:
            raise ValueError(
                f"state dict entry {key!r} looks like batch-norm, which "
                f"this module's apply path does not implement; conversion "
                f"would silently drop the normalization")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if leaf == "weight" and val.ndim > 1:
            node["w"] = _to_hwio(val)
        elif leaf == "weight":
            node["scale"] = val
        else:
            node["b"] = val
    return params


def picker_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Map a LinearClassifier state dict to (params, state) pytrees.

    Reference key layout (topaz/model/classifier.py + features/*):
      features.features.{i}.conv.{weight,bias}         BasicConv
      features.features.{i}.{conv0,conv1,proj}.*       ResidA
      features.features.{i}.bn{,0,1}.{weight,bias,running_mean,running_var}
      classifier.{weight,bias}                         1x1 head
    """
    feat_params: Dict[str, Dict] = {}
    feat_state: Dict[str, Dict] = {}
    params: Dict = {"features": feat_params}
    state: Dict = {"features": feat_state}

    pat = re.compile(r"^features\.features\.(\d+)\.(.+)$")
    for key, val in sd.items():
        if key == "classifier.weight":
            params["classifier"] = params.get("classifier", {})
            params["classifier"]["w"] = _to_hwio(val)
            continue
        if key == "classifier.bias":
            params["classifier"] = params.get("classifier", {})
            params["classifier"]["b"] = val
            continue
        m = pat.match(key)
        if m is None:
            continue
        idx, rest = m.group(1), m.group(2)
        lp = feat_params.setdefault(idx, {})
        ls = feat_state.setdefault(idx, {})
        sub, _, leaf = rest.partition(".")
        if sub == "conv" and leaf == "weight":
            lp["conv_w"] = _to_hwio(val)
        elif sub == "conv" and leaf == "bias":
            lp["conv_b"] = val
        elif sub in ("conv0", "conv1", "proj") and leaf == "weight":
            lp[{"conv0": "conv0_w", "conv1": "conv1_w", "proj": "proj_w"}[sub]] = _to_hwio(val)
        elif sub in ("conv0", "conv1") and leaf == "bias":
            lp[f"{sub}_b"] = val
        elif sub.startswith("bn"):
            if leaf == "weight":
                lp.setdefault(sub, {})["scale"] = val
            elif leaf == "bias":
                lp.setdefault(sub, {})["bias"] = val
            elif leaf == "running_mean":
                ls.setdefault(sub, {})["mean"] = val
            elif leaf == "running_var":
                ls.setdefault(sub, {})["var"] = val
        elif sub == "act" and leaf == "weight":  # PReLU slope
            lp["prelu"] = np.asarray(val).reshape(())

    # prune empty entries
    for d in (feat_params, feat_state):
        for k in [k for k, v in d.items() if not v]:
            del d[k]
    return params, state


def infer_picker_config(sd: Dict[str, np.ndarray],
                        module_names: Optional[Dict[int, str]] = None) -> Dict:
    """Guess (arch, units, bn, pooling) from a reference picker state dict.

    ``module_names`` maps Sequential index -> module class name when the
    source was a whole-module pickle (convert_picker_sav reads it off the
    live module) — needed to tell MaxPool slots from Dropout slots.

    Pooling-trained resnets are detected by the param-less MaxPool modules'
    gaps in the Sequential indices; classification counts param-BEARING
    modules so pooled and plain variants classify identically. Our spec
    ordering mirrors the reference module ordering (pools and dropouts in
    the same slots), so the torch Sequential indices map 1:1 onto spec
    positions and the converted param keys line up without remapping."""
    if "features.features.0.conv.weight" not in sd:
        raise ValueError(
            "this .sav uses the reference BasicConv (conv31/63/127) module "
            "layout, which this converter does not support yet; train the "
            "conv architectures natively ('topaz train --model conv31 ...') "
            "instead of converting a reference checkpoint")
    idxs = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"^features\.features\.(\d+)\.", k))
    })
    n_layers = len(idxs)
    gaps = set(range(max(idxs) + 1)) - set(idxs)
    # param-less Sequential slots are MaxPool or Dropout — indices align
    # onto our spec either way (both occupy one spec slot), but the
    # GEOMETRY differs: pooled resnets use stride-1 convs + pools. The
    # state dict alone cannot distinguish them; whole-module pickles can
    # (module class names, see convert_picker_sav).
    pooling = None
    if gaps:
        if module_names is None:
            raise ValueError(
                "this picker state dict has param-less Sequential slots "
                "(MaxPool or Dropout) which change the architecture "
                "geometry; convert from the whole-module .sav (the "
                "reference's normal save format) so the module types can "
                "be read")
        if any("MaxPool" in module_names.get(i, "") for i in gaps):
            pooling = "max"
    units = sd["features.features.0.conv.weight"].shape[0]
    bn = any(".bn" in k for k in sd)
    k0 = sd["features.features.0.conv.weight"].shape[-1]
    if any(f"features.features.{i}.conv0.weight" in sd for i in idxs) and k0 == 7:
        arch = "resnet8" if n_layers == 5 else "resnet16"
    else:
        arch = "resnet6"
    out = {"arch": arch, "units": int(units), "bn": bool(bn)}
    if pooling:
        out["pooling"] = pooling
    return out


def convert_picker_sav(path: str) -> Tuple[Dict, Dict, Dict]:
    """Load a reference .sav picker -> (meta, params, state)."""
    obj = _load_torch(path)
    sd = _state_dict_of(obj)
    module_names = None
    try:  # whole-module pickles expose the Sequential's module types
        module_names = {i: type(m).__name__
                        for i, m in enumerate(obj.features.features)}
    except AttributeError:
        pass
    meta = infer_picker_config(sd, module_names=module_names)
    meta["dims"] = 2
    params, state = picker_params_from_state_dict(sd)
    return meta, params, state
