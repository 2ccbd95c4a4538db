"""Dense score-map segmentation workflow (topaz/model/utils.py:71-105)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from topaz_tpu.io.image import load_image
from topaz_tpu.utils.printing import report


def segment_images(model: str, paths: List[str], output_dir: str,
                   patch_size: Optional[int] = None, verbose: bool = False,
                   precision=None) -> None:
    """Score images with a picker and write dense score maps (.tiff for 2D,
    .npy for 3D)."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker

    os.makedirs(output_dir, exist_ok=True)
    spec, params, state = load_picker(model)

    @jax.jit
    def _score(x):
        y, _ = apply_picker(spec, params, x[None], state=state, dense=True,
                            precision=precision)
        return y[0]

    for path in paths:
        image_name = os.path.splitext(os.path.basename(path))[0]
        image = np.asarray(load_image(path), dtype=np.float32)
        is_3d = image.ndim == 3

        if patch_size is not None:
            from topaz_tpu.models.tiling import classify_patches_3d, predict_in_patches

            if is_3d:
                score = classify_patches_3d(spec, params, state, image,
                                            patch_size=patch_size * 2,
                                            precision=precision)
            else:
                score = predict_in_patches(spec, params, state, image,
                                           patch_size * 2, precision=precision)
        else:
            score = np.asarray(_score(jnp.asarray(image)))

        out = os.path.join(output_dir, image_name)
        if verbose:
            report("saving:", out)
        if is_3d:
            np.save(out + ".npy", score)
        else:
            from PIL import Image

            Image.fromarray(score).save(out + ".tiff", "tiff")
