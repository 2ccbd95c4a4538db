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
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=32)
def _score_tiles_fn(spec, precision):
    """One jitted tile scorer per (spec, precision) — reused across images
    and calls so N micrographs compile the picker once, not N times."""
    import jax

    from topaz_tpu.models.picker import apply_picker

    @jax.jit
    def score_tiles(params, state, x):
        y, _ = apply_picker(spec, params, x, state=state, dense=True,
                            pad=False, precision=precision)
        return y

    return score_tiles


_DEVICE_TREE_CACHE: "dict" = {}  # ordered: oldest entry evicted first


def _on_device(tree):
    """device_put a (numpy) param/state pytree once per tree: numpy-array
    jit arguments re-upload on EVERY call, so scoring many tile batches
    would re-ship the model weights each time.

    Keyed by the ids of the tree's leaves (not the container), so swapping
    new leaf arrays into an existing dict — e.g. assigning fine-tuned
    weights in place — misses the cache instead of silently serving stale
    device copies. A small FIFO bound keeps dead models from pinning HBM."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    key = tuple(id(a) for a in leaves)
    hit = _DEVICE_TREE_CACHE.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], leaves)):
        return hit[1]
    while len(_DEVICE_TREE_CACHE) >= 4:
        _DEVICE_TREE_CACHE.pop(next(iter(_DEVICE_TREE_CACHE)))
    placed = jax.device_put(tree)
    _DEVICE_TREE_CACHE[key] = (leaves, placed)
    return placed


def _tiled_scores(spec, params, state, image: np.ndarray, tile: int,
                  batch_size: int = 4, precision=None) -> np.ndarray:
    import jax.numpy as jnp

    dims = image.ndim
    pad = spec.width // 2
    shape = image.shape
    steps = [int(math.ceil(s / tile)) for s in shape]
    padded_shape = [n * tile for n in steps]
    pad_width = [(pad, pad + ps - s) for ps, s in zip(padded_shape, shape)]
    padded = np.pad(image, pad_width)

    score_tiles = _score_tiles_fn(spec, precision)
    params = _on_device(params)
    state = _on_device(state)

    # gather tile windows (tile + 2*pad each side)
    win = tile + 2 * pad
    origins = list(np.ndindex(*steps))
    # don't pad a small image's few tiles up to a larger batch — that
    # multiplies the FLOPs for nothing (the smaller shape compiles once)
    batch_size = min(batch_size, len(origins))
    out = np.zeros(shape, dtype=np.float32)
    for start in range(0, len(origins), batch_size):
        chunk = origins[start : start + batch_size]
        # pad the ragged final batch up to batch_size (repeat the last
        # window) so every call reuses the one compiled program shape
        padded_chunk = list(chunk) + [chunk[-1]] * (batch_size - len(chunk))
        tiles = np.stack([
            padded[tuple(slice(o[d] * tile, o[d] * tile + win) for d in range(dims))]
            for o in padded_chunk
        ])
        scores = np.asarray(score_tiles(params, state, jnp.asarray(tiles)))
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
