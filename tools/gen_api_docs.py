#!/usr/bin/env python
"""Generate docs/api.md from module/function docstrings — the API
reference mirror of the reference's Sphinx autodoc stubs (docs/source/).
Run: python tools/gen_api_docs.py
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    # (module, one-line role)
    ("topaz_tpu.io.mrc", "MRC2000/IMOD parsing and writing"),
    ("topaz_tpu.io.image", "multi-format image load/save"),
    ("topaz_tpu.io.coordinates", "coordinate tables, splits, conversions"),
    ("topaz_tpu.io.star", "STAR file parsing/writing"),
    ("topaz_tpu.ops.fourier", "Fourier-crop downsampling, low-pass"),
    ("topaz_tpu.ops.gmm", "2-component GMM normalization (EM)"),
    ("topaz_tpu.ops.nms", "on-device non-maximum suppression"),
    ("topaz_tpu.ops.filters", "classical filters + whitening deconvolution"),
    ("topaz_tpu.ops.metrics", "AP / PR curves / Hungarian matching"),
    ("topaz_tpu.ops.masks", "coordinate rasterization, particle stacks"),
    ("topaz_tpu.models.factory", "picker registry + pretrained loading"),
    ("topaz_tpu.models.picker", "picker forward (strided + dense forms)"),
    ("topaz_tpu.models.denoise", "denoiser architectures"),
    ("topaz_tpu.models.denoise_factory", "denoiser registry + weights"),
    ("topaz_tpu.models.tiling", "patch-tiled inference"),
    ("topaz_tpu.train.methods", "PU-learning objectives"),
    ("topaz_tpu.train.trainer", "jitted train steps + optimizers"),
    ("topaz_tpu.train.data", "crop samplers"),
    ("topaz_tpu.train.denoise_data", "noise2noise pair samplers"),
    ("topaz_tpu.parallel.mesh", "device-mesh scale-out"),
    ("topaz_tpu.parallel.devices", "-d flag resolution, multi-host init"),
    ("topaz_tpu.training", "picker training workflow"),
    ("topaz_tpu.extract", "scoring + NMS extraction workflow"),
    ("topaz_tpu.denoise", "denoising workflows (2D/3D)"),
    ("topaz_tpu.preprocess", "normalization workflow"),
    ("topaz_tpu.pipeline", "batched mixed-size pipeline"),
    ("topaz_tpu.watch", "streaming acquisition watcher"),
]


def first_para(doc):
    if not doc:
        return ""
    return inspect.cleandoc(doc).split("\n\n")[0].replace("\n", " ")


def main():
    out = ["# API reference\n",
           "Generated from docstrings by `tools/gen_api_docs.py` — do not "
           "edit by hand.\n"]
    for modname, role in MODULES:
        mod = importlib.import_module(modname)
        out.append(f"\n## `{modname}` — {role}\n")
        head = first_para(mod.__doc__)
        if head:
            out.append(head + "\n")
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_"):
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            if len(sig) > 90:
                sig = sig[:87] + "..."
            kind = "class" if inspect.isclass(obj) else "def"
            out.append(f"\n- **`{kind} {name}{sig}`** — "
                       f"{first_para(obj.__doc__) or '(undocumented)'}")
        out.append("")
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api.md")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest}")
    # fail loudly on undocumented public API so docs stay honest
    n_undoc = "\n".join(out).count("(undocumented)")
    print(f"undocumented public symbols: {n_undoc}")
    if n_undoc:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
