"""Coordinate-to-mask rasterization and pick manipulation.

Equivalent of topaz/utils/picks.py:16-68 and
topaz/utils/data/coordinates.py: scatter ones at particle centers and
dilate by the integer disk/sphere (the reference convolves with a disk
kernel and binarizes; dilation by the same structuring element is the
identical result).
"""

from __future__ import annotations

import math
import sys
from typing import Optional, Tuple

import numpy as np
import pandas as pd


def _disk_chords(radius: float):
    R = int(math.floor(radius))
    return [
        (dy, int(math.floor(math.sqrt(radius * radius - dy * dy))))
        for dy in range(-R, R + 1)
    ]


def _dilate_rows(mask: np.ndarray, radius: float) -> np.ndarray:
    """Binary dilation of the last two axes by the integer disk."""
    H, W = mask.shape[-2:]
    out = np.zeros_like(mask)
    csum = np.cumsum(mask, axis=-1)
    for dy, w in _disk_chords(radius):
        ys = slice(max(0, -dy), min(H, H - dy))
        yd = slice(max(0, dy), min(H, H + dy))
        rows = mask[..., ys, :]
        # horizontal dilation width 2w+1 via padded sliding-window any
        if w > 0:
            p = np.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(w, w)])
            acc = np.zeros_like(rows, dtype=bool)
            for dx in range(2 * w + 1):
                acc |= p[..., dx : dx + W].astype(bool)
            rows = acc
        out[..., yd, :] |= rows.astype(bool)
    return out


def as_mask(shape: Tuple[int, ...], radius: float, x_coord, y_coord,
            z_coord=None) -> np.ndarray:
    """Binary mask of all pixels within ``radius`` of any coordinate
    (topaz/utils/picks.py:16-50)."""
    mask = np.zeros(shape, dtype=bool)
    x = np.asarray(x_coord, dtype=int)
    y = np.asarray(y_coord, dtype=int)
    if z_coord is not None:
        z = np.asarray(z_coord, dtype=int)
        mask[z, y, x] = True
        R = int(math.floor(radius))
        out = np.zeros_like(mask)
        for dz in range(-R, R + 1):
            rem = radius * radius - dz * dz
            if rem < 0:
                continue
            r2d = math.sqrt(rem)
            zs = slice(max(0, -dz), min(shape[0], shape[0] - dz))
            zd = slice(max(0, dz), min(shape[0], shape[0] + dz))
            out[zd] |= _dilate_rows(mask[zs], r2d)
        return out.astype(np.float32)
    mask[y, x] = True
    return _dilate_rows(mask, radius).astype(np.float32)


def coordinates_table_to_dict(coords: pd.DataFrame):
    """Particle table -> {image_name: coord array} (or nested by source),
    matching topaz/utils/data/coordinates.py:10-23."""
    root = {}
    cols = ["x_coord", "y_coord"] + (["z_coord"] if "z_coord" in coords.columns else [])
    if "source" in coords:
        for (source, name), group in coords.groupby(["source", "image_name"]):
            root.setdefault(source, {})[name] = group[cols].values
    else:
        for name, group in coords.groupby("image_name"):
            root[name] = group[cols].values
    return root


def match_coordinates_to_images(coords: pd.DataFrame, images: dict,
                                radius: float = -1):
    """Pair loaded images with coordinate arrays or rasterized masks
    (topaz/utils/data/coordinates.py:38-64)."""
    nested = "source" in coords
    coords_dict = coordinates_table_to_dict(coords)
    dims = 3 if "z_coord" in coords.columns else 2
    null = np.zeros((0, dims), dtype=np.int32)

    def rasterize(im, c):
        if radius < 0:
            return c
        # 3D volumes rasterize spheres with the z column
        # (topaz/utils/data/coordinates.py:26-35 dispatches on ndim)
        if np.ndim(im) == 3 and c.shape[1] >= 3:
            return as_mask(im.shape, radius, c[:, 0], c[:, 1],
                           z_coord=c[:, 2])
        return as_mask(im.shape, radius, c[:, 0], c[:, 1])

    matched = {}
    items = images.items()
    if nested:
        for source, group in items:
            matched[source] = {}
            cd = coords_dict.get(source, {})
            for name, im in group.items():
                c = cd.get(name, null)
                matched[source][name] = (im, rasterize(im, c))
    else:
        for name, im in items:
            c = coords_dict.get(name, null)
            matched[name] = (im, rasterize(im, c))
    return matched


def scale_coordinates_file(input_file: str, scale: float,
                           output_file: Optional[str] = None) -> None:
    """Scale pick coordinates for resized images
    (topaz/utils/picks.py:53-68)."""
    df = pd.read_csv(input_file, sep="\t")
    if "diameter" in df:
        df["diameter"] = np.ceil(df.diameter * scale).astype(np.int32)
    df["x_coord"] = np.round(df.x_coord * scale).astype(np.int32)
    df["y_coord"] = np.round(df.y_coord * scale).astype(np.int32)
    out = sys.stdout if output_file is None else open(output_file, "w")
    try:
        df.to_csv(out, sep="\t", header=True, index=False)
    finally:
        if output_file is not None:
            out.close()


def create_particle_stack(input_file: str, output_file: str, threshold: float,
                          size: int, resize: int, image_root: str,
                          image_ext: str, metadata_file: Optional[str]) -> None:
    """Crop particle boxes into an .mrcs stack + .star metadata
    (topaz/utils/picks.py:71-197)."""
    from topaz_tpu.io import mrc, star
    from topaz_tpu.ops.fourier import downsample

    particles = pd.read_csv(input_file, sep="\t")
    print("#", "Loaded", len(particles), "particles", file=sys.stderr)
    if "score" in particles:
        particles = particles.loc[particles["score"] >= threshold]
        print("#", "Thresholding at", threshold, file=sys.stderr)
    print("#", "Extracting", len(particles), "particles", file=sys.stderr)

    N = len(particles)
    if resize < 0:
        resize = size

    wrote_header = False
    metadata = []
    mz = 1
    import os

    with open(output_file, "wb") as f:
        for image_name, coords in particles.groupby("image_name"):
            print("#", image_name, len(coords), "particles", file=sys.stderr)
            image_name = str(image_name) + image_ext
            micrograph, header, _ = mrc.read(os.path.join(image_root, image_name))
            if micrograph.ndim < 3:
                micrograph = micrograph[np.newaxis]

            if not wrote_header:
                mz = micrograph.shape[0]
                dtype = micrograph.dtype
                stack_header = mrc.default_header(
                    (N * mz, resize, resize),
                    dtype=dtype,
                    cella=(header.xlen, header.ylen, header.zlen),
                    cellb=(header.alpha, header.beta, header.gamma),
                    mz=mz,
                )
                f.write(stack_header.tobytes())
                wrote_header = True

            _, n, m = micrograph.shape
            scores = coords["score"].values if "score" in coords else None
            for j, (x, y) in enumerate(zip(coords["x_coord"].values,
                                           coords["y_coord"].values)):
                if scores is not None:
                    metadata.append((image_name, x, y, scores[j]))
                else:
                    metadata.append((image_name, x, y))
                left, upper = x - size // 2, y - size // 2
                right, lower = left + size, upper + size
                c = micrograph[:, max(0, upper):min(n, lower),
                               max(0, left):min(m, right)]
                c = (c - c.mean()) / c.std()
                stack = np.zeros((mz, size, size), dtype=dtype)
                stack[:, max(0, -upper):min(size + n - lower, size),
                      max(0, -left):min(size + m - right, size)] = c
                if resize != size:
                    restack = np.asarray(downsample(stack.astype(np.float32),
                                                    shape=(resize, resize)))
                    restack = (restack - restack.mean()) / restack.std()
                    f.write(restack.astype(dtype).tobytes())
                else:
                    f.write(stack.tobytes())

    stack_name = os.path.basename(output_file)
    star_path = os.path.splitext(output_file)[0] + ".star"
    columns = ["MicrographName", star.X_COLUMN_NAME, star.Y_COLUMN_NAME]
    if "score" in particles:
        columns.append(star.SCORE_COLUMN_NAME)
    metadata = pd.DataFrame(metadata, columns=columns)
    metadata["ImageName"] = [f"{i + 1}@{stack_name}" for i in range(len(metadata))]
    if mz > 1:
        metadata["NrOfFrames"] = mz

    if metadata_file is not None:
        with open(metadata_file) as f:
            micrograph_metadata = star.parse(f)
        metadata = pd.merge(metadata, micrograph_metadata, on="MicrographName",
                            how="left")
    if resize != size and "DetectorPixelSize" in metadata:
        pix = metadata["DetectorPixelSize"].values.astype(float)
        metadata["DetectorPixelSize"] = pix * (size / resize)

    with open(star_path, "w") as f:
        star.write(metadata, f)
