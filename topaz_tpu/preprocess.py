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
    """Number of integer pixels within ``radius`` (topaz/stats.py:17-25)."""
    grid = np.arange(-radius, radius + 1)
    if dims == 2:
        d2 = grid[:, None] ** 2 + grid[None, :] ** 2
    else:
        d2 = (
            grid[:, None, None] ** 2
            + grid[None, :, None] ** 2
            + grid[None, None, :] ** 2
        )
    return int((d2 <= radius**2).sum())


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
        x = np.asarray(downsample(x, scale))
        if header is not None:
            header = header.replace(ny=x.shape[0], nx=x.shape[1])

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
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(dest, exist_ok=True)
    with ThreadPoolExecutor(max(1, num_workers)) as ex:
        window = max(1, num_workers) + 1
        futs: deque = deque()
        nxt = 0

        def fill(nxt):
            while nxt < len(paths) and len(futs) < window:
                futs.append(ex.submit(load_image, paths[nxt],
                                      return_header=True))
                nxt += 1
            return nxt

        nxt = fill(nxt)
        for path in paths:
            loaded = futs.popleft().result()
            nxt = fill(nxt)
            name = normalize_file(
                path, dest, scale=scale, affine=affine, num_iters=num_iters,
                alpha=alpha, beta=beta, sample=sample, metadata=metadata,
                formats=formats, bins=bins, loaded=loaded,
            )
            if verbose:
                print("# processed:", name, file=sys.stderr)
