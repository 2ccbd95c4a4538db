"""Preprocessing workflows: per-micrograph normalization (+ downsampling).

Workflow layer equivalent of topaz/stats.py:282-355. The reference fans out
per-image work to a multiprocessing pool; here each image's GMM fit runs on
the TPU (all 12 EM initializations in parallel, ops/gmm.py) so the host
loop just streams files.
"""

from __future__ import annotations

import json
import os
import sys
from typing import List, Optional

import numpy as np

from topaz_tpu.io.image import load_image, save_image
from topaz_tpu.ops.fourier import downsample
from topaz_tpu.ops.gmm import normalize


def pixels_given_radius(radius: int, dims: int = 2) -> int:
    """Per-particle pixel count used by the pi/p_observed bookkeeping,
    REFERENCE-EXACT including its 2D bug (topaz/stats.py:17-25): the
    reference builds a 3D meshgrid even for dims=2 and sums the 2D disk
    mask over all 2r+1 z-planes, so its 2D count is (2r+1)x the true disk
    area (r=3: 203, not 29). pi, p_observed, the GE prior, and the
    GE->PN fallback weighting all inherit that factor, so matching it is
    what keeps ``-n``/``--pi`` semantics (and every published pi-tuning
    recipe) identical across stacks — measured on the hardened CTF
    fixture, the true-area count trains PN with a 7x smaller positive
    weight and loses ~0.05 AP at the published protocol (PARITY.md round-4
    table). Training LABELS are unaffected either way: the reference
    expands targets with a true 2D disk (train/data.expand_target_points
    matches), only this bookkeeping over-counts."""
    grid = np.arange(-radius, radius + 1)
    d2 = grid[:, None] ** 2 + grid[None, :] ** 2
    if dims == 3:
        d2 = d2[:, :, None] + grid[None, None, :] ** 2
        return int((d2 <= radius**2).sum())
    disk = int((d2 <= radius**2).sum())
    return disk * (2 * radius + 1)


def calculate_pi(expected_num_particles: float, radius: int, total_pixels: int,
                 dims: int = 2) -> float:
    """Expected positive fraction from particle count and radius
    (topaz/stats.py:28-33)."""
    return pixels_given_radius(radius, dims=dims) * expected_num_particles / total_pixels


def normalize_file(
    path: str,
    dest: str,
    scale: int = 1,
    affine: bool = False,
    num_iters: int = 100,
    alpha: float = 900,
    beta: float = 1,
    sample: int = 1,
    metadata: bool = False,
    formats: Optional[List[str]] = None,
    seed: int = 0,
    bins: int = 0,
    loaded=None,
) -> str:
    """Normalize one image file and write outputs (topaz/stats.py:296-335).
    ``loaded`` lets a prefetch thread hand in the already-read image."""
    formats = formats or ["mrc"]
    if loaded is None:
        loaded = load_image(path, return_header=True)
    image, header, ext_header = loaded
    x = np.asarray(image, dtype=np.float32)

    if scale > 1:
        # keep the header's original nx/ny: mrc.write's shape-mismatch
        # branch rescales mx/my with nx/ny so the voxel spacing stays right
        x = np.asarray(downsample(x, scale))

    method = "affine" if affine else "gmm"
    x, md = normalize(x, alpha=alpha, beta=beta, num_iters=num_iters,
                      method=method, sample=sample, seed=seed, bins=bins)

    name = os.path.splitext(os.path.basename(path))[0]
    base = os.path.join(dest, name)
    for f in formats:
        save_image(x, base, f=f, header=header, extended_header=ext_header)

    if metadata:
        if not affine:
            for k in ("mus", "stds", "pis", "logps"):
                md[k] = np.asarray(md[k]).tolist()
        with open(base + ".metadata.json", "w") as fh:
            json.dump(md, fh, indent=4)
    return name


def normalize_images_batched(
    paths: List[str],
    dest: str,
    scale: int = 1,
    affine: bool = False,
    num_iters: int = 100,
    alpha: float = 900,
    beta: float = 1,
    metadata: bool = False,
    formats: Optional[List[str]] = None,
    verbose: bool = False,
    bins: int = 0,
    num_workers: int = 2,
    batch_size: int = 0,
    mesh=None,
    bucket_step: int = 64,
    skip_errors: bool = False,
) -> None:
    """Batched/mesh-sharded normalization: micrographs are grouped into
    rounded shape buckets (zero-padded + masked, like pipeline.py), B
    images fit their GMMs at once — vmapped on one chip, sharded over the
    mesh's ``data`` axis when given. Replaces the reference's
    multiprocessing.Pool fan-out (topaz/stats.py:347-348) with device
    parallelism.

    The fit uses ALL valid pixels (exact weighted EM; ``bins > 0`` switches
    to the histogram EM) — the reference's ``--sample`` pixel subsampling
    is a CPU-cost workaround that the device path does not need.
    """
    from collections import defaultdict

    import jax
    import jax.numpy as jnp

    from topaz_tpu.ops.gmm import norm_fit, norm_fit_hist
    from topaz_tpu.pipeline import _image_shape
    from topaz_tpu.utils.batching import (iterate_prefetched, round_bucket,
                                          valid_mask, window_batches)

    formats = formats or ["mrc"]
    os.makedirs(dest, exist_ok=True)
    if batch_size <= 0:
        batch_size = (mesh.shape["data"] if mesh is not None
                      else max(1, len(jax.devices())))

    def ds_shape(shape):
        if scale > 1:
            return (int(shape[0] / scale), int(shape[1] / scale))
        return tuple(shape)

    import warnings

    buckets = defaultdict(list)
    for p in paths:
        try:
            shape = _image_shape(p)
        except Exception:
            # skip_errors: continue past unreadable files with a warning
            # (extension; default fail-fast like the reference)
            if not skip_errors:
                raise
            warnings.warn(f"{p}: unreadable header — skipped "
                          f"(--skip-errors)")
            continue
        buckets[round_bucket(ds_shape(shape), bucket_step)].append(p)

    fns = {}

    def fn_for(bucket):
        if bucket in fns:
            return fns[bucket]
        bh, bw = bucket

        def fit_batch(padded, valid):
            maskf = valid_mask((bh, bw), valid).astype(padded.dtype)
            B = padded.shape[0]
            xf, wf = padded.reshape(B, -1), maskf.reshape(B, -1)
            if affine:
                n = jnp.sum(wf, axis=1)
                mu = jnp.sum(xf * wf, axis=1) / n
                std = jnp.sqrt(
                    jnp.sum(wf * (xf - mu[:, None]) ** 2, axis=1) / n)
                # dead-frame guard (see ops/gmm._guard_degenerate): report
                # the true std but divide by 1 so output is zeros, not NaN
                stats = (mu, jnp.where(std > 0, std, 1.0), std)
            elif bins > 0:
                stats = jax.vmap(lambda x, w: norm_fit_hist(
                    x, bins=bins, alpha=alpha, beta=beta,
                    num_iters=num_iters, w=w))(xf, wf)
            else:
                stats = jax.vmap(lambda x, w: norm_fit(
                    x, alpha=alpha, beta=beta, num_iters=num_iters,
                    w=w))(xf, wf)
            mu, std = stats[0], stats[1]
            out = (padded - mu[:, None, None]) / std[:, None, None] * maskf
            return (out,) + tuple(stats)

        from topaz_tpu.parallel.mesh import jit_sharded_args

        fns[bucket] = jit_sharded_args(fit_batch, mesh, ("data", "data"))
        return fns[bucket]

    def load_one(path, bucket):
        image, header, ext_header = load_image(path, return_header=True)
        x = np.asarray(image, dtype=np.float32)
        if scale > 1:
            from topaz_tpu.ops.fourier import downsample_numpy

            # header keeps its original nx/ny — see normalize_file
            x = downsample_numpy(x, scale, shape=ds_shape(x.shape))
        out = np.zeros(bucket, np.float32)
        out[: x.shape[0], : x.shape[1]] = x
        return out, x.shape, header, ext_header

    class _LoadFailure:
        def __init__(self, exc):
            self.exc = exc

    def load_one_safe(p, bucket):
        if not skip_errors:
            return load_one(p, bucket)
        try:
            return load_one(p, bucket)
        except Exception as e:  # noqa: BLE001 - skipped with warning
            return _LoadFailure(e)

    def produce():
        for bucket, items in buckets.items():
            for chunk, n_real, loaded in window_batches(
                    items, lambda p, b=bucket: load_one_safe(p, b),
                    batch_size, batch_size + max(1, num_workers),
                    num_workers=num_workers):
                bad = [(c, l) for c, l in zip(chunk, loaded)
                       if isinstance(l, _LoadFailure)]
                for path, failure in bad:
                    warnings.warn(f"{path}: {failure.exc} — skipped "
                                  f"(--skip-errors)")
                if bad:
                    kept = [(c, l) for c, l in zip(chunk, loaded)
                            if not isinstance(l, _LoadFailure)]
                    if not kept:
                        continue
                    chunk = [c for c, _ in kept]
                    n_real = len(chunk)
                    loaded = [l for _, l in kept]
                    loaded = loaded + [loaded[-1]] * (batch_size
                                                      - len(loaded))
                arr = np.stack([l[0] for l in loaded])
                valid = np.array([l[1] for l in loaded], dtype=np.int32)
                yield (bucket, chunk, n_real, arr, valid,
                       [l[2] for l in loaded], [l[3] for l in loaded])

    for item in iterate_prefetched(produce, maxsize=2):
        bucket, chunk, n_real, arr, valid, headers, ext_headers = item
        out = fn_for(bucket)(jnp.asarray(arr), jnp.asarray(valid))
        normed = np.asarray(out[0])
        stats = [np.asarray(s) for s in out[1:]]
        for i, path in enumerate(chunk):
            name = os.path.splitext(os.path.basename(path))[0]
            base = os.path.join(dest, name)
            vh, vw = valid[i]
            img = normed[i, :vh, :vw]
            # degeneracy signals: affine carries the true std as stats[2],
            # GMM signals via logp=-inf (ops/gmm._guard_degenerate)
            if (affine and float(stats[2][i]) == 0) or \
                    (not affine and np.isneginf(stats[3][i])):
                import warnings

                warnings.warn(
                    f"{path}: constant image (std=0) — normalized output "
                    f"is all zeros (the reference NaNs such frames)")
            for f in formats:
                save_image(img, base, f=f, header=headers[i],
                           extended_header=ext_headers[i])
            if metadata:
                if affine:
                    md = {"mu": float(stats[0][i]),
                          "std": float(stats[2][i]), "pi": 1}
                else:
                    mu, std, pi, logp, mus, stds, pis, logps = \
                        (s[i] for s in stats)
                    md = {"mu": float(mu), "std": float(std),
                          "pi": float(pi), "logp": float(logp),
                          "mus": mus.tolist(), "stds": stds.tolist(),
                          "pis": pis.tolist(), "logps": logps.tolist(),
                          "alpha": alpha, "beta": beta,
                          "sample": 1, "bins": int(bins)}
                with open(base + ".metadata.json", "w") as fh:
                    json.dump(md, fh, indent=4)
            if verbose:
                print("# processed:", name, file=sys.stderr)


def normalize_images(
    paths: List[str],
    dest: str,
    scale: int = 1,
    affine: bool = False,
    num_iters: int = 100,
    alpha: float = 900,
    beta: float = 1,
    sample: int = 1,
    metadata: bool = False,
    formats: Optional[List[str]] = None,
    verbose: bool = False,
    bins: int = 0,
    num_workers: int = 2,
) -> None:
    """Normalize a set of images (topaz/stats.py:338-355).

    The reference fans out to a process pool (stats.py:347-348); here the
    GMM runs on the accelerator, so the host only needs a small prefetch
    window of loader threads to keep disk reads off the critical path."""
    from topaz_tpu.utils.batching import window_batches

    os.makedirs(dest, exist_ok=True)
    for (path,), _, (loaded,) in window_batches(
            list(paths), lambda p: load_image(p, return_header=True),
            1, max(1, num_workers) + 1, num_workers=num_workers):
        name = normalize_file(
            path, dest, scale=scale, affine=affine, num_iters=num_iters,
            alpha=alpha, beta=beta, sample=sample, metadata=metadata,
            formats=formats, bins=bins, loaded=loaded,
        )
        if verbose:
            print("# processed:", name, file=sys.stderr)
