"""On-device greedy non-maximum suppression.

The reference's NMS (topaz/algorithms.py:25-103) is a sequential Python
loop: sort all pixels by score, walk down accepting any unsuppressed pixel
and suppressing the disk around it. That is the #1 CPU hot spot of
extraction (SURVEY 2.4).

TPU-native algorithm ("parallel greedy rounds"): per round, accept every
still-active pixel that is the strict maximum over its radius-r disk among
active pixels, then suppress the disks of all accepted peaks. A pixel that
is the strict disk-max among active pixels is necessarily accepted by the
sequential greedy (everything larger in its disk is already suppressed, so
nothing can suppress it first), and every suppression edge goes from a
larger to a smaller score — so the fixed point equals the sequential
result, in a data-dependent number of O(HW) vectorized rounds instead of
O(#peaks) serial steps. Ties inside a disk are broken toward the larger
linear index, matching np.argsort(A)[::-1] order (algorithms.py:36).

The disk max-filter is decomposed into per-row horizontal max-pools (one
per distinct chord half-width) combined by shifted vertical maxes — O(r)
reduce_window passes, all VPU-friendly.

Known divergence from the reference (documented, not replicated): the
reference clips suppression coordinates with an inclusive upper bound
(algorithms.py:58-59), which makes peaks near the right image edge suppress
column-0 pixels of the next row; 3D suppression (algorithms.py:100-101)
wraps unclipped linear indices. We suppress exactly the clipped disk/sphere.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG = -jnp.inf
INT_NEG = jnp.iinfo(jnp.int32).min


def _chords_2d(r: int):
    """(dy -> chord half-width) for the integer disk ii^2+jj^2 <= r^2,
    grouped by half-width: {w: [dy, ...]}."""
    groups = {}
    for dy in range(-r, r + 1):
        w = int(math.floor(math.sqrt(r * r - dy * dy)))
        groups.setdefault(w, []).append(dy)
    return groups


def _shift_rows(h: jnp.ndarray, dy: int, fill) -> jnp.ndarray:
    """out[y] = h[y + dy], padded with fill."""
    if dy == 0:
        return h
    W = h.shape[-1]
    pad = jnp.full(h.shape[:-2] + (abs(dy), W), fill, h.dtype)
    if dy > 0:
        return jnp.concatenate([h[..., dy:, :], pad], axis=-2)
    return jnp.concatenate([pad, h[..., :dy, :]], axis=-2)


def _hmax(x: jnp.ndarray, w: int, init) -> jnp.ndarray:
    """Horizontal max-pool with window 2w+1, SAME size."""
    if w == 0:
        return x
    ndim = x.ndim
    window = (1,) * (ndim - 1) + (2 * w + 1,)
    pads = ((0, 0),) * (ndim - 1) + ((w, w),)
    return lax.reduce_window(x, init, lax.max, window, (1,) * ndim, pads)


def disk_max(x: jnp.ndarray, r: int, init=NEG) -> jnp.ndarray:
    """Max filter over the clipped integer disk of radius r (2D, last two
    axes spatial)."""
    groups = _chords_2d(r)
    hpools = {w: _hmax(x, w, init) for w in groups}
    out = jnp.full_like(x, init)
    for w, dys in groups.items():
        h = hpools[w]
        for dy in dys:
            out = jnp.maximum(out, _shift_rows(h, dy, init))
    return out


def _sphere_chords(r: float):
    """{(dz, dy) -> half-width} for the integer sphere, grouped by width."""
    R = int(math.ceil(r))
    groups = {}
    for dz in range(-R, R + 1):
        for dy in range(-R, R + 1):
            m = r * r - dz * dz - dy * dy
            if m < 0:
                continue
            w = int(math.floor(math.sqrt(m)))
            groups.setdefault(w, []).append((dz, dy))
    return groups


def _shift_planes(h: jnp.ndarray, dz: int, dy: int, fill) -> jnp.ndarray:
    """out[z, y] = h[z + dz, y + dy] for 3D arrays (last three spatial)."""
    out = _shift_rows(h, dy, fill)
    if dz == 0:
        return out
    D, H, W = out.shape[-3:]
    pad = jnp.full(out.shape[:-3] + (abs(dz), H, W), fill, out.dtype)
    if dz > 0:
        return jnp.concatenate([out[..., dz:, :, :], pad], axis=-3)
    return jnp.concatenate([pad, out[..., :dz, :, :]], axis=-3)


def sphere_max(x: jnp.ndarray, r: float, init=NEG) -> jnp.ndarray:
    """Max filter over the clipped integer sphere of radius r (3D)."""
    groups = _sphere_chords(r)
    hpools = {w: _hmax(x, w, init) for w in groups}
    out = jnp.full_like(x, init)
    for w, offs in groups.items():
        h = hpools[w]
        for dz, dy in offs:
            out = jnp.maximum(out, _shift_planes(h, dz, dy, init))
    return out


def _greedy_rounds(score: jnp.ndarray, threshold: float, max_filter) -> jnp.ndarray:
    """Run parallel-greedy NMS rounds; returns the accepted-peak mask.
    Supports (H, W) and batched (..., H, W) inputs (the filters act on the
    last two axes only, so images never interact)."""
    shape = score.shape
    H, W = shape[-2:]
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape((1,) * (score.ndim - 2) + (H, W))
    lin = jnp.broadcast_to(lin, shape)

    def cond(state):
        active, _ = state
        return jnp.any(active)

    def body(state):
        active, accepted = state
        masked = jnp.where(active, score, NEG)
        dmax = max_filter(masked, NEG)
        is_max = active & (masked >= dmax)
        # tie-break toward larger linear index (argsort-descending order)
        cand_idx = jnp.where(is_max, lin, INT_NEG)
        imax = max_filter(cand_idx, INT_NEG)
        peaks = is_max & (lin >= imax)
        # suppress the disks of all accepted peaks
        dil = max_filter(jnp.where(peaks, 1, 0).astype(jnp.int32), INT_NEG) > 0
        return active & ~dil, accepted | peaks

    active0 = score > threshold
    accepted0 = jnp.zeros(shape, dtype=bool)
    _, accepted = lax.while_loop(cond, body, (active0, accepted0))
    return accepted


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("r", "threshold"))
def nms_mask_2d(score: jnp.ndarray, r: int, threshold: float) -> jnp.ndarray:
    """Accepted-peak mask for 2D greedy NMS (jittable, vmappable).

    On TPU the disk max-filter runs as a fused single-pass Pallas kernel
    (ops/nms_pallas.py, ~3x faster and far cheaper to compile than the
    multi-pass lax decomposition)."""
    if _on_tpu() and score.ndim == 2:
        from topaz_tpu.ops.nms_pallas import disk_max_pallas

        return _greedy_rounds(
            score, threshold, lambda x, init: disk_max_pallas(x, r, init)
        )
    return _greedy_rounds(score, threshold, lambda x, init: disk_max(x, r, init))


@partial(jax.jit, static_argnames=("r", "threshold"))
def nms_mask_3d(score: jnp.ndarray, r: float, threshold: float) -> jnp.ndarray:
    """Accepted-peak mask for 3D greedy NMS."""
    return _greedy_rounds(score, threshold, lambda x, init: sphere_max(x, r, init))


def _mask_to_sorted(score: np.ndarray, mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: enumerate accepted peaks sorted by descending score with
    descending-index tie-break (reference emission order, algorithms.py:36)."""
    flat_idx = np.flatnonzero(mask.ravel())
    vals = score.ravel()[flat_idx]
    order = np.lexsort((-flat_idx, -vals))
    flat_idx = flat_idx[order]
    return vals[order].astype(np.float32), flat_idx


def non_maximum_suppression(
    x, r: int, threshold: float = -np.inf
) -> Tuple[np.ndarray, np.ndarray]:
    """2D NMS with the reference's interface: returns (scores, coords[x, y])
    sorted by descending score (topaz/algorithms.py:25-63)."""
    x = np.asarray(x, dtype=np.float32)
    W = x.shape[1]
    mask = np.asarray(nms_mask_2d(jnp.asarray(x), int(r), float(threshold)))
    scores, flat_idx = _mask_to_sorted(x, mask)
    coords = np.stack([flat_idx % W, flat_idx // W], axis=1).astype(np.int32)
    return scores, coords


def non_maximum_suppression_3d(
    x, r: int, scale: float = 1.0, threshold: float = -np.inf
) -> Tuple[np.ndarray, np.ndarray]:
    """3D NMS (topaz/algorithms.py:66-103): radius is scaled, coords are
    (x, y, z)."""
    x = np.asarray(x, dtype=np.float32)
    rr = float(scale * r)
    D, H, W = x.shape
    mask = np.asarray(nms_mask_3d(jnp.asarray(x), rr, float(threshold)))
    scores, flat_idx = _mask_to_sorted(x, mask)
    zz = flat_idx // (H * W)
    rem = flat_idx % (H * W)
    coords = np.stack([rem % W, rem // W, zz], axis=1).astype(np.int32)
    return scores, coords


@partial(jax.jit, static_argnames=("r", "threshold", "k"))
def nms_topk_2d(score: jnp.ndarray, r: int, threshold: float, k: int):
    """Fully on-device NMS returning fixed-size top-k results for fused
    pipelines: (scores[k], coords[k, 2] as (x, y), count). Entries past
    ``count`` hold -inf / (-1, -1).

    Deliberately NOT routed through :func:`nms_topk_batched` with a length-1
    batch: that form wedged TPU compilation (measured twice, >9 min vs
    seconds for this one); the suppression mask comes from
    :func:`nms_mask_2d` so the filter dispatch still lives in one place."""
    mask = nms_mask_2d(score, r, threshold)
    W = score.shape[1]
    flat = jnp.where(mask, score, NEG).ravel()
    vals, idx = lax.top_k(flat, k)
    valid = vals > NEG
    xs = jnp.where(valid, idx % W, -1)
    ys = jnp.where(valid, idx // W, -1)
    return vals, jnp.stack([xs, ys], axis=1), jnp.sum(mask)


@partial(jax.jit, static_argnames=("r", "threshold", "k"))
def nms_topk_batched(scores: jnp.ndarray, r: int, threshold: float, k: int):
    """Batched fully on-device NMS: scores (B, H, W) ->
    (vals (B, k), coords (B, k, 2) as (x, y), counts (B,))."""
    if _on_tpu():
        from topaz_tpu.ops.nms_pallas import disk_max_pallas

        filt = lambda x, init: disk_max_pallas(x, r, init)
    else:
        filt = lambda x, init: disk_max(x, r, init)
    mask = _greedy_rounds(scores, threshold, filt)
    B = scores.shape[0]
    W = scores.shape[-1]
    flat = jnp.where(mask, scores, NEG).reshape(B, -1)
    vals, idx = lax.top_k(flat, k)
    valid = vals > NEG
    xs = jnp.where(valid, idx % W, -1)
    ys = jnp.where(valid, idx // W, -1)
    return vals, jnp.stack([xs, ys], axis=-1), jnp.sum(mask, axis=(-2, -1))


def exact_non_maximum_suppression(x, r: int, threshold: float = -np.inf,
                                  max_peaks: Optional[int] = None):
    """Sequential argmax-and-suppress NMS under lax.while_loop — the literal
    greedy order, used to validate the parallel-rounds algorithm."""
    x = np.asarray(x, dtype=np.float32)
    H, W = x.shape
    if max_peaks is None:
        max_peaks = int((H + r) * (W + r) / max(np.pi * (r / 2) ** 2, 1)) + 8
        max_peaks = min(max_peaks, H * W)
    scores, coords, count = _exact_nms_jit(
        jnp.asarray(x), int(r), float(threshold), int(max_peaks)
    )
    n = int(count)
    return np.asarray(scores)[:n], np.asarray(coords)[:n]


@partial(jax.jit, static_argnames=("r", "threshold", "max_peaks"))
def _exact_nms_jit(x: jnp.ndarray, r: int, threshold: float, max_peaks: int):
    H, W = x.shape
    flat = x.ravel()
    N = flat.size
    yy, xx = jnp.divmod(jnp.arange(N, dtype=jnp.int32), W)

    def cond(state):
        active, _, _, count, done = state
        return (~done) & (count < max_peaks)

    def body(state):
        active, out_s, out_c, count, _ = state
        masked = jnp.where(active, flat, NEG)
        # argmax with largest-index tie-break (reference processing order)
        i = N - 1 - jnp.argmax(masked[::-1])
        v = masked[i]
        stop = v <= threshold
        cy, cx = yy[i], xx[i]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        suppress = d2 <= r * r
        new_active = active & ~suppress
        out_s = out_s.at[count].set(jnp.where(stop, NEG, v))
        out_c = out_c.at[count].set(
            jnp.where(stop, -1, jnp.stack([cx, cy]))
        )
        return (
            jnp.where(stop, active, new_active),
            out_s,
            out_c,
            jnp.where(stop, count, count + 1),
            stop | ~jnp.any(new_active),
        )

    state = (
        flat > threshold,
        jnp.full((max_peaks,), NEG, jnp.float32),
        jnp.full((max_peaks, 2), -1, jnp.int32),
        jnp.array(0, jnp.int32),
        jnp.array(False),
    )
    active, out_s, out_c, count, done = lax.while_loop(cond, body, state)
    return out_s, out_c, count
