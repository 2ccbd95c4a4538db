"""Host-side training data pipeline: memory-mapped random crop sampling.

Vectorized equivalent of the reference's per-item torch Dataset
(topaz/utils/data/memory_mapped_data.py:129-233): per step it gathers one
whole batch of over-sized raw crops from memory-mapped MRC files; rotation/
flip augmentation happens on device (train/augment.py).

Sampling semantics preserved:
  * positives are uniform over *expanded* per-pixel positive coordinates
    (particle centers dilated to the radius sphere, training.py:447-476)
  * unlabeled ('pu' split) crops center on any pixel; negative ('pn' split)
    crops center on any pixel that is not a labeled positive
    (memory_mapped_data.py:79-100)
  * crops are zero-padded at image edges (memory_mapped_data.py:45-70)

Batch composition matches the reference's per-item Bernoulli
``positive_balance`` draw (memory_mapped_data.py:210-216): the caller
passes a Binomial(batch, balance) positive count per batch (training.py)
and the labels vector travels with the crops into the jitted objectives
(train/methods.py masked reductions — shapes stay static). A fixed
round(batch * balance) count was tried first and retired: its
lower-variance GE-binomial gradients overtrained at the published
protocol (PARITY.md divergence 8).
"""

from __future__ import annotations

import glob
import math
import os
from typing import List, Tuple

import numpy as np
import pandas as pd

from topaz_tpu.io.mrc import MrcMemmap
from topaz_tpu.utils.printing import report


def sphere_offsets(radius: float, dims: int = 2) -> np.ndarray:
    """Integer offsets within ``radius`` of the origin
    (training.py:449-466)."""
    R = int(math.floor(radius))
    grid = np.arange(-R, R + 1)
    if dims == 2:
        d2 = grid[:, None] ** 2 + grid[None, :] ** 2
        ys, xs = np.nonzero(d2 <= radius**2)
        return np.stack([grid[xs], grid[ys]], axis=1)  # (n, [dx, dy])
    d2 = (grid[:, None, None] ** 2 + grid[None, :, None] ** 2
          + grid[None, None, :] ** 2)
    zs, ys, xs = np.nonzero(d2 <= radius**2)
    return np.stack([grid[xs], grid[ys], grid[zs]], axis=1)  # (n, [dx, dy, dz])


def expand_target_points(targets: pd.DataFrame, radius: float,
                         dims: int = 2) -> Tuple[pd.DataFrame, int]:
    """Expand particle centers to all in-radius pixel coordinates
    (training.py:447-476). Returns (expanded table, pixels per particle)."""
    offs = sphere_offsets(radius, dims)
    n = len(targets)
    k = len(offs)
    out = {
        "image_name": np.repeat(targets["image_name"].values, k),
        "x_coord": np.repeat(targets["x_coord"].values, k) + np.tile(offs[:, 0], n),
        "y_coord": np.repeat(targets["y_coord"].values, k) + np.tile(offs[:, 1], n),
    }
    if dims == 3:
        out["z_coord"] = np.repeat(targets["z_coord"].values, k) + np.tile(offs[:, 2], n)
    return pd.DataFrame(out), k


def find_image_paths(images_path: str, image_ext: str = "") -> pd.DataFrame:
    """Resolve an image directory or list file into a (image_name, path[,
    source]) table (training.py:69-91)."""
    if os.path.isdir(images_path):
        pattern = os.path.join(images_path, "*" + (image_ext or ".mrc"))
        paths = sorted(glob.glob(pattern))
        names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        return pd.DataFrame({"image_name": names, "path": paths})
    # documented divergence: the reference whitespace-splits list files
    # (topaz/training.py:69-91 via pandas sep='\s+'), so paths containing
    # spaces silently break. List files are TSV by provenance (our
    # train_test_split and the reference's both write sep='\t'), so try the
    # tab read first — space-containing paths survive — and fall back to
    # whitespace splitting for hand-written bare lists.
    # the tab parse must be rejected not just when the 'path' column is
    # absent but also when it parsed to garbage: a tab-separated header
    # over space-separated rows yields path=NaN everywhere, and ragged tab
    # counts raise ParserError — both must fall back to whitespace
    try:
        df = pd.read_csv(images_path, sep="\t")
        tab_ok = "path" in df.columns and not df["path"].isna().any()
    except pd.errors.ParserError:
        tab_ok = False
    if not tab_ok:
        df = pd.read_csv(images_path, sep=r"\s+")
    return df


class CropSampler:
    """Batched random-crop sampler over memory-mapped micrographs."""

    def __init__(
        self,
        image_paths: List[str],
        targets: pd.DataFrame,
        crop_size: int,
        radius: float = 3,
        split: str = "pn",
        rotate: bool = True,
        seed: int = 0,
        dims: int = 2,
    ):
        self.crop_size = crop_size
        # over-crop so rotation never clips corners (training.py:172-173)
        size = int(np.ceil(crop_size * np.sqrt(2))) if rotate else crop_size
        if size % 2 == 0:
            size += 1
        self.raw_size = size
        # 3D rotation happens about the z-axis only (train/augment.py
        # augment_crops_3d), so the z window never needs the sqrt(2)
        # oversize — a cubic oversized gather would cost 41% more host IO
        self.raw_size_z = crop_size if (rotate and dims == 3) else size
        self.augment = rotate and dims == 2
        self.split = split
        self.dims = dims
        self.rng = np.random.default_rng(seed)

        self.images: List[MrcMemmap] = []
        self.names: List[str] = []
        name_to_idx = {}
        for path in image_paths:
            name = os.path.splitext(os.path.basename(path))[0]
            mm = MrcMemmap(path)
            name_to_idx[name] = len(self.images)
            self.images.append(mm)
            self.names.append(name)

        expanded, self.mask_size = expand_target_points(targets, radius, dims)
        keep = expanded["image_name"].isin(name_to_idx)
        missing = expanded.loc[~keep, "image_name"].unique().tolist()
        if missing:
            report(f"WARNING: {len(missing)} micrographs listed in the "
                   f"coordinates file are missing from the images: {missing}")
        expanded = expanded.loc[keep]

        img_idx = expanded["image_name"].map(name_to_idx).values.astype(np.int64)
        xs = np.round(expanded["x_coord"].values).astype(np.int64)
        ys = np.round(expanded["y_coord"].values).astype(np.int64)
        zs = (np.round(expanded["z_coord"].values).astype(np.int64)
              if dims == 3 else np.zeros(len(expanded), dtype=np.int64))

        # drop out-of-bounds expanded pixels (memory_mapped_data.py:102-114)
        shapes = np.array([im.shape[-2:] for im in self.images])
        in_bounds = (
            (xs >= 0) & (ys >= 0)
            & (xs < shapes[img_idx, 1]) & (ys < shapes[img_idx, 0])
        )
        if dims == 3:
            depths = np.array([im.shape[0] for im in self.images])
            in_bounds &= (zs >= 0) & (zs < depths[img_idx])
        n_oob = int(len(in_bounds) - in_bounds.sum())
        if n_oob:
            # the usual cause is unscaled coordinates against downsampled
            # micrographs (reference warning: memory_mapped_data.py:110-113)
            report(f"WARNING: ~{n_oob} positive pixels are out of bounds "
                   f"for their images. Did you scale the micrographs and "
                   f"particle coordinates correctly?")
        self.pos_img = img_idx[in_bounds]
        self.pos_x = xs[in_bounds]
        self.pos_y = ys[in_bounds]
        self.pos_z = zs[in_bounds]
        self.num_pixels = len(self.pos_img)
        self.num_images = len(self.images)

        # packed-int positive-pixel keys for negative rejection sampling —
        # kept as a SORTED int64 array (8 bytes/entry + searchsorted probes)
        # instead of a set of boxed Python ints (~100 bytes/entry and a
        # multi-second init for large particle sets)
        packed = ((self.pos_img << 48) | (self.pos_z << 34)
                  | (self.pos_y << 17) | self.pos_x)
        self.positive_sorted = np.sort(packed) if split == "pn" else None

    @staticmethod
    def _pack(k, z, y, x):
        # numpy int64 arithmetic on BOTH the key array and this probe: for
        # coordinates beyond the packed field widths (k >= 2^15, z >= 2^14,
        # y/x >= 2^17) the shifts wrap identically on both sides, so
        # membership still matches (a wraparound collision at worst rejects
        # a valid negative — harmless and astronomically rare)
        return (np.int64(k) << np.int64(48)) | (np.int64(z) << np.int64(34)) \
            | (np.int64(y) << np.int64(17)) | np.int64(x)

    def _is_positive(self, k, z, y, x) -> bool:
        key = self._pack(k, z, y, x)
        a = self.positive_sorted
        i = int(np.searchsorted(a, key))
        return i < len(a) and a[i] == key

    def _gather_crops_3d(self, img_idx, zs, ys, xs) -> np.ndarray:
        """Zero-padded 3D windows centered at (z, y, x)
        (memory_mapped_data.py:52-60)."""
        s = self.raw_size
        sz = self.raw_size_z
        half, halfz = s // 2, sz // 2
        out = np.zeros((len(img_idx), sz, s, s), dtype=np.float32)
        for i, (k, z, y, x) in enumerate(zip(img_idx, zs, ys, xs)):
            vol = self.images[k]._mm
            D, H, W = vol.shape
            z0, y0, x0 = int(z) - halfz, int(y) - half, int(x) - half
            rz = slice(max(0, z0), min(D, z0 + sz))
            ry = slice(max(0, y0), min(H, y0 + s))
            rx = slice(max(0, x0), min(W, x0 + s))
            out[i, rz.start - z0 : rz.stop - z0, ry.start - y0 : ry.stop - y0,
                rx.start - x0 : rx.stop - x0] = vol[rz, ry, rx]
        return out

    @staticmethod
    def _group_by_image(img_idx):
        """Yield (image index, stable-order selection) per distinct image."""
        order = np.argsort(img_idx, kind="stable")
        pos = 0
        while pos < len(order):
            k = img_idx[order[pos]]
            end = pos
            while end < len(order) and img_idx[order[end]] == k:
                end += 1
            yield k, order[pos:end]
            pos = end

    def _gather_crops(self, img_idx, ys, xs) -> np.ndarray:
        s = self.raw_size
        half = s // 2
        out = np.empty((len(img_idx), s, s), dtype=np.float32)

        # native batched gather per image (topaz_tpu/native); numpy fallback
        from topaz_tpu.native import gather_crops as native_gather

        done = np.zeros(len(img_idx), dtype=bool)
        for k, sel in self._group_by_image(img_idx):
            crops = native_gather(
                np.asarray(self.images[k]._mm), ys[sel] - half, xs[sel] - half, s
            )
            if crops is not None:
                out[sel] = crops
                done[sel] = True

        for i in np.flatnonzero(~done):
            out[i] = self.images[img_idx[i]].crop(
                int(ys[i]) - half, int(xs[i]) - half, s, s
            )
        return out

    def _augmented_crops(self, img_idx, ys, xs) -> np.ndarray:
        """Fused rotate+flip+crop at the final crop size (2D training path).

        Native C fast path; numpy fallback applies the identical transform.
        Equivalent to the reference's oversized-crop -> rotate -> center-crop
        -> flip chain (memory_mapped_data.py:216-231) except that output
        pixels whose rotated source falls inside the image read the true
        pixel instead of the oversized crop's zero fill (a strict-superset
        of information at the corners)."""
        from topaz_tpu.native import gather_rotated_crops as native_rot

        B = len(img_idx)
        size = self.crop_size
        angles = self.rng.uniform(0, 2 * np.pi, B)
        hflip = self.rng.random(B) < 0.5
        vflip = self.rng.random(B) < 0.5
        out = np.empty((B, size, size), dtype=np.float32)
        half = (size - 1) / 2.0

        for k, sel in self._group_by_image(img_idx):
            img = np.asarray(self.images[k]._mm)
            crops = native_rot(img, ys[sel], xs[sel], angles[sel],
                               hflip[sel], vflip[sel], size)
            if crops is None:
                # numpy fallback: same transform, vectorized per crop
                H, W = img.shape
                vv, uu = np.mgrid[0:size, 0:size].astype(np.float64) - half
                crops = np.empty((len(sel), size, size), dtype=np.float32)
                for j, i in enumerate(sel):
                    v = -vv if vflip[i] else vv
                    u = -uu if hflip[i] else uu
                    c, s = np.cos(angles[i]), np.sin(angles[i])
                    sy = np.rint(c * v + s * u + ys[i]).astype(np.int64)
                    sx = np.rint(-s * v + c * u + xs[i]).astype(np.int64)
                    valid = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
                    crops[j] = np.where(
                        valid, img[np.clip(sy, 0, H - 1), np.clip(sx, 0, W - 1)], 0
                    )
            out[sel] = crops
        return out

    def sample_batch(self, batch_size: int, n_pos: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return (crops, labels (B,)) — first n_pos positive. For the 2D
        augmented path crops come back rotated/flipped at the final crop
        size; otherwise raw windows: (B, raw_size, raw_size) in 2D,
        (B, raw_size_z, raw_size, raw_size) in 3D (z stays un-oversized
        when augmenting — rotation is about z, train/augment.py)."""
        n_neg = batch_size - n_pos
        # positives: uniform over expanded positive pixels
        if n_pos > 0:
            sel = self.rng.integers(0, self.num_pixels, size=n_pos)
            p_img, p_y, p_x = self.pos_img[sel], self.pos_y[sel], self.pos_x[sel]
            p_z = self.pos_z[sel]
        else:
            p_img = p_y = p_x = p_z = np.zeros(0, dtype=np.int64)

        # unlabeled / negative: random image, random pixel (rejecting exact
        # positives for the pn split)
        n_img = self.rng.integers(0, self.num_images, size=n_neg)
        n_y = np.empty(n_neg, dtype=np.int64)
        n_x = np.empty(n_neg, dtype=np.int64)
        n_z = np.zeros(n_neg, dtype=np.int64)
        for i, k in enumerate(n_img):
            H, W = self.images[k].shape[-2:]
            D = self.images[k].shape[0] if self.dims == 3 else 1
            while True:
                y = self.rng.integers(0, H)
                x = self.rng.integers(0, W)
                z = self.rng.integers(0, D) if self.dims == 3 else 0
                if self.positive_sorted is None or \
                        not self._is_positive(k, z, y, x):
                    break
            n_y[i], n_x[i] = y, x
            n_z[i] = z

        img_idx = np.concatenate([p_img, n_img])
        ys = np.concatenate([p_y, n_y])
        xs = np.concatenate([p_x, n_x])
        if self.dims == 3:
            zs = np.concatenate([p_z, n_z])
            crops = self._gather_crops_3d(img_idx, zs, ys, xs)
        elif self.augment:
            crops = self._augmented_crops(img_idx, ys, xs)
        else:
            crops = self._gather_crops(img_idx, ys, xs)
        labels = np.zeros(batch_size, dtype=np.float32)
        labels[:n_pos] = 1.0
        return crops, labels
