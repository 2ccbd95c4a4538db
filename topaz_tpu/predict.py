"""Micro-batched scoring helpers (topaz/predict.py:7-35)."""

from __future__ import annotations

from typing import Iterable, Iterator, List

import numpy as np


def batches(X: Iterable[np.ndarray], batch_size: int = 1) -> Iterator[np.ndarray]:
    """Group a stream of same-shaped arrays into stacked batches."""
    batch = []
    for x in X:
        batch.append(np.asarray(x, dtype=np.float32))
        if len(batch) >= batch_size:
            yield np.stack(batch, 0)
            batch = []
    if batch:
        yield np.stack(batch, 0)


def score_stream(spec, params, state, images: Iterable[np.ndarray],
                 batch_size: int = 1, dense: bool = True,
                 precision=None) -> Iterator[np.ndarray]:
    """Stream dense score maps for same-shaped images, batched per jit call."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.picker import apply_picker

    @jax.jit
    def _score(x):
        y, _ = apply_picker(spec, params, x, state=state, dense=dense,
                            precision=precision)
        return y

    for batch in batches(images, batch_size=batch_size):
        logits = np.asarray(_score(jnp.asarray(batch)))
        for row in logits:
            yield row


def score(spec, params, state, images: Iterable[np.ndarray],
          batch_size: int = 1, dense: bool = True,
          precision=None) -> List[np.ndarray]:
    return list(score_stream(spec, params, state, images,
                             batch_size=batch_size, dense=dense,
                             precision=precision))
