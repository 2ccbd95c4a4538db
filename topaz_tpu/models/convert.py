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
from typing import Dict, Tuple

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


def infer_picker_config(sd: Dict[str, np.ndarray]) -> Dict:
    """Guess (arch, units, bn) from a reference picker state dict shape map."""
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"^features\.features\.(\d+)\.", k))
    )
    units = sd["features.features.0.conv.weight"].shape[0]
    bn = any(".bn" in k for k in sd)
    k0 = sd["features.features.0.conv.weight"].shape[-1]
    if "features.features.1.conv0.weight" in sd and k0 == 7:
        arch = "resnet8" if n_layers == 5 else "resnet16"
    elif k0 == 5:
        arch = "resnet6"
    else:
        arch = {3: "conv31", 4: "conv63", 5: "conv127"}.get(n_layers, "conv127")
    return {"arch": arch, "units": int(units), "bn": bool(bn)}


def convert_picker_sav(path: str) -> Tuple[Dict, Dict, Dict]:
    """Load a reference .sav picker -> (meta, params, state)."""
    obj = _load_torch(path)
    sd = _state_dict_of(obj)
    meta = infer_picker_config(sd)
    meta["dims"] = 2
    params, state = picker_params_from_state_dict(sd)
    return meta, params, state
