"""Overlap-tiled dense scoring for images/volumes too large for one pass.

The reference tiles with ragged edge patches and reassembles on the host
(topaz/model/utils.py:110-193, topaz/model/classifier.py:69-103). Because
the dense (filled) scorer is shift-equivariant, tiled scoring with a
receptive-field halo is *exactly* whole-image scoring — so here tiles are
uniform (image padded up to a multiple of the step), giving one static jit
shape, batched tile evaluation, and no ragged retraces.

Note: the reference skips all-zero patches but its reassembly assumes no
patch was skipped (model/utils.py:159-166,172-193) — a latent misalignment
bug we do not replicate.
"""

from __future__ import annotations

import math
import numpy as np


def _tiled_scores(spec, params, state, image: np.ndarray, tile: int,
                  batch_size: int = 4, precision=None) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.picker import apply_picker

    dims = image.ndim
    pad = spec.width // 2
    shape = image.shape
    steps = [int(math.ceil(s / tile)) for s in shape]
    padded_shape = [n * tile for n in steps]
    pad_width = [(pad, pad + ps - s) for ps, s in zip(padded_shape, shape)]
    padded = np.pad(image, pad_width)

    @jax.jit
    def score_tiles(x):
        y, _ = apply_picker(spec, params, x, state=state, dense=True,
                            pad=False, precision=precision)
        return y

    # gather tile windows (tile + 2*pad each side)
    win = tile + 2 * pad
    origins = list(np.ndindex(*steps))
    out = np.zeros(shape, dtype=np.float32)
    for start in range(0, len(origins), batch_size):
        chunk = origins[start : start + batch_size]
        tiles = np.stack([
            padded[tuple(slice(o[d] * tile, o[d] * tile + win) for d in range(dims))]
            for o in chunk
        ])
        scores = np.asarray(score_tiles(jnp.asarray(tiles)))
        for o, s in zip(chunk, scores):
            dst = tuple(
                slice(o[d] * tile, min((o[d] + 1) * tile, shape[d]))
                for d in range(dims)
            )
            src = tuple(slice(0, dst[d].stop - dst[d].start) for d in range(dims))
            out[dst] = s[src]
    return out


def predict_in_patches(spec, params, state, image: np.ndarray, patch_size: int,
                       batch_size: int = 4, precision=None) -> np.ndarray:
    """2D tiled dense scoring; result equals whole-image dense scoring
    (contract of topaz/model/utils.py:110-130)."""
    return _tiled_scores(spec, params, state, image, int(patch_size),
                         batch_size=batch_size, precision=precision)


def classify_patches_3d(spec, params, state, volume: np.ndarray,
                        patch_size: int = 96, batch_size: int = 1,
                        precision=None) -> np.ndarray:
    """3D tiled dense scoring (contract of
    topaz/model/classifier.py:69-103)."""
    return _tiled_scores(spec, params, state, volume, int(patch_size),
                         batch_size=batch_size, precision=precision)
