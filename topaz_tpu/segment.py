"""Dense score-map segmentation workflow (topaz/model/utils.py:71-105)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from topaz_tpu.io.image import load_image
from topaz_tpu.utils.printing import report


def segment_images(model: str, paths: List[str], output_dir: str,
                   patch_size: Optional[int] = None, verbose: bool = False,
                   precision=None, devices=None) -> None:
    """Score images with a picker and write dense score maps (.tiff for 2D,
    .npy for 3D). With multiple ``devices`` (the ``-d -2`` flag), 2D
    whole-image scoring is spatially sharded over a 'space' mesh with
    receptive-field halo exchange — exact, since zero row padding up to
    the shard multiple matches the picker's own SAME-conv zero edge."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.parallel.devices import space_mesh_for

    os.makedirs(output_dir, exist_ok=True)
    spec, params, state = load_picker(model)
    mesh = space_mesh_for(devices)
    halo_fns = {}

    @jax.jit
    def _score(x):
        y, _ = apply_picker(spec, params, x[None], state=state, dense=True,
                            precision=precision)
        return y[0]

    def _score_halo(image):
        from topaz_tpu.parallel.mesh import make_halo_dense_scorer, make_mesh

        # each shard must hold at least a receptive-field halo of rows;
        # shrink the space axis for small images (None = single device)
        halo = spec.width // 2
        n = min(mesh.shape["space"], max(1, image.shape[0] // max(halo, 1)))
        if n < 2:
            return None
        pad = (-image.shape[0]) % n
        xp = np.pad(image, ((0, pad), (0, 0))) if pad else image
        key = (xp.shape, n)
        if key not in halo_fns:
            sub = make_mesh(n_data=1, n_space=n,
                            devices=list(mesh.devices.ravel())[:n])
            halo_fns[key] = make_halo_dense_scorer(
                spec, params, state, sub, precision=precision)
        return np.asarray(halo_fns[key](jnp.asarray(xp)))[: image.shape[0]]

    for path in paths:
        image_name = os.path.splitext(os.path.basename(path))[0]
        image = np.asarray(load_image(path), dtype=np.float32)
        is_3d = image.ndim == 3

        if patch_size is not None:
            # the 2x is the reference's own convention for this command
            # (topaz/model/utils.py:90 passes patch_size*2) — keep for parity
            from topaz_tpu.models.tiling import classify_patches_3d, predict_in_patches

            if is_3d:
                score = classify_patches_3d(spec, params, state, image,
                                            patch_size=patch_size * 2,
                                            precision=precision)
            else:
                score = predict_in_patches(spec, params, state, image,
                                           patch_size * 2, precision=precision)
        else:
            score = _score_halo(image) if (not is_3d and mesh is not None) \
                else None
            if score is None:
                score = np.asarray(_score(jnp.asarray(image)))

        out = os.path.join(output_dir, image_name)
        if verbose:
            report("saving:", out)
        if is_3d:
            np.save(out + ".npy", score)
        else:
            from PIL import Image

            Image.fromarray(score).save(out + ".tiff", "tiff")
