"""Particle coordinate file I/O and format conversion.

Canonical in-memory form: a pandas DataFrame with columns
``image_name, x_coord, y_coord[, z_coord][, score]``.

Covers the reference's format surface (topaz/utils/files.py,
topaz/utils/conversions.py): tab-separated coordinate tables, RELION STAR,
EMAN .box, EMAN2 info.json, and VIA CSV; y-axis mirroring; per-micrograph
splitting.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from typing import IO, List, Optional

import numpy as np
import pandas as pd

from topaz_tpu.io import star

PARTICLE_FORMAT_MAP = {
    ".star": "star",
    ".box": "box",
    ".json": "json",
    ".csv": "csv",
    ".txt": "coord",
    ".tab": "coord",
}

IMAGE_FORMATS = (".mrc", ".tiff", ".tif", ".png", ".jpg", ".jpeg")

# canonical <-> star column names (topaz/utils/files.py:173-181)
_STAR_TO_CANONICAL = {
    star.SCORE_COLUMN_NAME: "score",
    "MicrographName": "image_name",
    star.X_COLUMN_NAME: "x_coord",
    star.Y_COLUMN_NAME: "y_coord",
    star.VOLTAGE: "voltage",
    star.DETECTOR_PIXEL_SIZE: "detector_pixel_size",
    star.MAGNIFICATION: "magnification",
    star.AMPLITUDE_CONTRAST: "amplitude_contrast",
}
_CANONICAL_TO_STAR = {v: k for k, v in _STAR_TO_CANONICAL.items()}


class UnknownFormatError(Exception):
    """Unrecognized coordinate-file extension (topaz/utils/files.py:32-36)."""
    def __init__(self, ext):
        super().__init__(f"unrecognized coordinate file extension: {ext!r}")
        self.ext = ext


def detect_format(path: str) -> str:
    """Map a file extension to its coordinate format name (files.py:16-36)."""
    ext = os.path.splitext(path)[1]
    if ext not in PARTICLE_FORMAT_MAP:
        raise UnknownFormatError(ext)
    return PARTICLE_FORMAT_MAP[ext]


def strip_ext(name: str) -> str:
    """Drop one trailing file extension from a name."""
    return os.path.splitext(name)[0]


def strip_image_ext(filename: str) -> str:
    """Strip known image extensions from a micrograph name (files.py:39-62)."""
    name, ext = os.path.splitext(filename)
    return name if ext in IMAGE_FORMATS else filename


def _strip_malformed_image_names(particles: pd.DataFrame) -> pd.DataFrame:
    if "image_name" in particles.columns and len(particles):
        particles = particles.copy()
        particles["image_name"] = particles["image_name"].apply(strip_image_ext)
    return particles


def mirror_y_axis(coords: pd.DataFrame, n: int) -> pd.DataFrame:
    """Flip y coordinates on an n-row image (conversions.py:16-19)."""
    out = coords.copy()
    out["y_coord"] = n - 1 - out["y_coord"]
    return out


# ---------------------------------------------------------------------------
# box format
# ---------------------------------------------------------------------------

def read_box(path: str) -> np.ndarray:
    """EMAN .box rows: x_lower_left, y_lower_left, width, height."""
    rows = []
    with open(path) as f:
        for line in f:
            tokens = line.split()
            if tokens:
                rows.append([int(t) for t in tokens[:4]])
    return np.array(rows, dtype=int) if rows else np.zeros((0, 4), dtype=int)


def boxes_to_coordinates(boxes: np.ndarray, shape=None, invert_y: bool = False,
                         image_name: Optional[str] = None):
    """Box corners+sizes -> center coordinates
    (topaz/utils/conversions.py:22-52)."""
    if len(boxes) < 1:
        columns = ["x_coord", "y_coord"]
        if image_name is not None:
            columns.append("image_name")
        return pd.DataFrame(columns=columns)
    x_lo, y_lo, width, height = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x_coord = x_lo + width // 2
    y_coord = y_lo + height // 2
    if invert_y:
        y_coord = (shape[0] - 1 - y_lo) - height // 2
    coords = np.stack([x_coord, y_coord], axis=1)
    if image_name is not None:
        table = pd.DataFrame(coords, columns=["x_coord", "y_coord"])
        table.insert(0, "image_name", [image_name] * len(table))
        return table
    return coords


def coordinates_to_boxes(coords: np.ndarray, box_width: int, box_height: int,
                         shape=None, invert_y: bool = False) -> np.ndarray:
    """Center coordinates -> box corners+sizes
    (topaz/utils/conversions.py:83-97)."""
    x = np.asarray(coords[:, 0])
    y = np.asarray(coords[:, 1])
    if invert_y:
        y = shape[0] - 1 - y
    w = np.full(len(x), box_width, dtype=np.int32)
    h = np.full(len(x), box_height, dtype=np.int32)
    return np.stack([x - w // 2, y - h // 2, w, h], axis=1)


def coordinates_to_eman2_json(coords: np.ndarray, shape=None,
                              invert_y: bool = False, tag: str = "manual"):
    """Center coordinates -> EMAN2 box-manager JSON dict (conversions.py:131-139)."""
    x = np.asarray(coords[:, 0])
    y = np.asarray(coords[:, 1])
    if invert_y:
        y = shape[0] - 1 - y
    return [[int(xi), int(yi), tag] for xi, yi in zip(x, y)]


# ---------------------------------------------------------------------------
# VIA CSV (topaz/utils/files.py:65-144)
# ---------------------------------------------------------------------------

def read_via_csv(path) -> pd.DataFrame:
    """Read a VIA (VGG annotator) CSV of picks (files.py:65-107)."""
    table = pd.read_csv(path)
    table["image_name"] = table["filename"].apply(strip_ext)
    table = table.drop("filename", axis=1)
    table = table.loc[table["region_count"] > 0]

    regions = [json.loads(r) for r in table["region_shape_attributes"]]
    x_coord = np.array([r["cx"] for r in regions], dtype=int)
    y_coord = np.array([r["cy"] for r in regions], dtype=int)

    scores = None
    if len(table) > 0:
        atts = [json.loads(a) for a in table["region_attributes"]]
        if "score" in atts[0]:
            scores = np.array(
                [float(a.get("score", -np.inf)) for a in atts], dtype=np.float32
            )

    table = table.drop(
        ["file_size", "file_attributes", "region_count", "region_id",
         "region_shape_attributes", "region_attributes"],
        axis=1,
    )
    table["x_coord"] = x_coord
    table["y_coord"] = y_coord
    if scores is not None:
        table["score"] = scores
    return table


def write_via_csv(path, table: pd.DataFrame) -> None:
    """Write picks as a VIA CSV (files.py:110-144)."""
    filename = table["image_name"].apply(lambda x: x + ".png")
    via = pd.DataFrame({"filename": filename})
    via["file_size"] = -1
    via["file_attributes"] = "{}"
    via["region_count"] = 0
    via["region_id"] = 0
    for im, group in table.groupby("image_name"):
        where = via["filename"] == im + ".png"
        via.loc[where, "region_count"] = len(group)
        via.loc[where, "region_id"] = np.arange(len(group))
    via["region_shape_attributes"] = [
        f'{{"name":"point","cx":{x},"cy":{y}}}'
        for x, y in zip(table["x_coord"], table["y_coord"])
    ]
    if "score" in table.columns:
        via["region_attributes"] = [f'{{"score":"{s}"}}' for s in table["score"]]
    else:
        via["region_attributes"] = "{}"
    via.to_csv(path, index=False)


# ---------------------------------------------------------------------------
# canonical read / write
# ---------------------------------------------------------------------------

def coordinates_to_star_table(table: pd.DataFrame, image_ext: str = "") -> pd.DataFrame:
    """Rename canonical pick columns to rln STAR names (conversions.py:173-195)."""
    out = table.copy()
    for k, v in _CANONICAL_TO_STAR.items():
        if k in out.columns:
            out[v] = out[k]
            out = out.drop(k, axis=1)
    out["MicrographName"] = out["MicrographName"].apply(lambda x: x + image_ext)
    return out


def read_coordinates(path: str, format: str = "auto") -> pd.DataFrame:
    """Read any supported particle file into the canonical table
    (topaz/utils/files.py:164-205)."""
    if format == "auto":
        format = detect_format(path)

    if format == "star":
        with open(path) as f:
            table = star.parse(f)
        for k, v in _STAR_TO_CANONICAL.items():
            if k in table.columns:
                table[v] = table[k]
                table = table.drop(k, axis=1)
        table["image_name"] = table["image_name"].apply(strip_ext)
        particles = table
    elif format == "box":
        box = read_box(path)
        image_name = os.path.basename(os.path.splitext(path)[0])
        particles = boxes_to_coordinates(box, image_name=image_name)
    elif format == "csv":
        particles = read_via_csv(path)
    else:
        particles = pd.read_csv(path, sep="\t", dtype={"image_name": str})

    return _strip_malformed_image_names(particles)


def _coord_columns(table: pd.DataFrame) -> List[str]:
    columns = ["image_name", "x_coord", "y_coord"]
    if "z_coord" in table.columns:
        columns.append("z_coord")
    if "score" in table.columns:
        columns.append("score")
    return columns


def write_coordinates(path: str, table: pd.DataFrame, format: str = "auto",
                      boxsize: int = 0, image_ext: str = ".mrc",
                      suffix: str = "") -> None:
    """Write the canonical table in the requested format
    (topaz/utils/files.py:208-239). box/json write one file per image into
    the directory ``path``."""
    if format == "box" or format == "json":
        for image_name, group in table.groupby("image_name"):
            if format == "box":
                this_path = os.path.join(path, image_name + suffix + ".box")
                xy = group[["x_coord", "y_coord"]].values.astype(np.int32)
                boxes = pd.DataFrame(coordinates_to_boxes(xy, boxsize, boxsize))
                boxes.to_csv(this_path, sep="\t", header=False, index=False)
            else:
                this_path = os.path.join(path, image_name + suffix + "_info.json")
                xy = group[["x_coord", "y_coord"]].values.astype(int)
                with open(this_path, "w") as f:
                    json.dump({"boxes": coordinates_to_eman2_json(xy)}, f, indent=0)
    elif format == "star":
        out = coordinates_to_star_table(table, image_ext=image_ext)
        with open(path, "w") as f:
            star.write(out, f)
    elif format == "csv":
        write_via_csv(path, table)
    else:
        table[_coord_columns(table)].to_csv(path, sep="\t", index=False)


def write_table(f: IO[str], table: pd.DataFrame, format: str = "auto",
                boxsize: int = 0, image_ext: str = "") -> None:
    """Write one already-open stream (topaz/utils/files.py:242-268)."""
    if format == "box":
        xy = table[["x_coord", "y_coord"]].values.astype(np.int32)
        boxes = pd.DataFrame(coordinates_to_boxes(xy, boxsize, boxsize))
        boxes.to_csv(f, sep="\t", header=False, index=False)
    elif format == "json":
        xy = table[["x_coord", "y_coord"]].values.astype(int)
        json.dump({"boxes": coordinates_to_eman2_json(xy)}, f, indent=0)
    elif format == "star":
        star.write(coordinates_to_star_table(table, image_ext=image_ext), f)
    elif format == "csv":
        write_via_csv(f, table)
    else:
        table[_coord_columns(table)].to_csv(f, sep="\t", index=False)


def get_image_path(image_name: str, root: str, ext: str) -> Optional[str]:
    """Find the image file for a coordinate row (topaz/utils/files.py:271-294)."""
    pattern = os.path.join(root, image_name + "." + ext)
    paths = glob.glob(pattern)
    if not paths:
        print(f'WARNING: no micrograph found matching image name "{image_name}". '
              f"Skipping it.", file=sys.stderr)
        return None
    if len(paths) > 1:
        print(f"WARNING: multiple images detected matching to image_name={image_name}",
              file=sys.stderr)
        for preferred in (".tiff", ".mrc", ".png"):
            for p in paths:
                if p.endswith(preferred):
                    return os.path.abspath(p)
    return os.path.abspath(paths[0])


def train_test_split_micrographs(seed: int, n: int, path: str, format: str,
                                 image_dir: str, file_ext: str):
    """Random micrograph-level train/test split; writes *_train.txt,
    *_test.txt and image list files
    (topaz/utils/data/train_test_split_micrographs.py:11-90)."""
    random = np.random.RandomState(seed)
    coords = read_coordinates(path, format=format)

    image_names, groups = [], []
    for name, group in coords.groupby("image_name"):
        image_names.append(name)
        groups.append(group)

    print(f"# splitting {len(image_names)} micrographs with {len(coords)} "
          f"labeled particles into {len(image_names) - n} train and {n} test "
          f"micrographs", file=sys.stderr)

    order = random.permutation(len(image_names))
    test_idx = order[:n]
    train_idx = order[n:]

    image_names_test = [image_names[j] for j in test_idx]
    image_names_train = [image_names[j] for j in train_idx]
    targets_test = pd.concat([groups[j] for j in test_idx], axis=0)
    targets_train = pd.concat([groups[j] for j in train_idx], axis=0)

    def image_list(names):
        paths = []
        kept = []
        for name in names:
            p = get_image_path(name, image_dir, file_ext)
            if p is not None:
                paths.append(p)
                kept.append(name)
        return pd.DataFrame({"image_name": kept, "path": paths})

    image_list_train = image_list(image_names_train)
    image_list_test = image_list(image_names_test)

    root = os.path.dirname(path) or "."
    basename = os.path.splitext(path)[0]
    for out_path, table in [
        (basename + "_train.txt", targets_train),
        (basename + "_test.txt", targets_test),
        (os.path.join(root, "image_list_train.txt"), image_list_train),
        (os.path.join(root, "image_list_test.txt"), image_list_test),
    ]:
        print("# writing:", out_path, file=sys.stderr)
        table.to_csv(out_path, sep="\t", index=False)

    return image_list_train, image_list_test, targets_train, targets_test


def split_particle_file(input_file: str, format: str, suffix: str,
                        threshold: float, output_dir: str) -> None:
    """Split a combined particle file into per-micrograph files
    (topaz/utils/files.py:297-329)."""
    output_dir = output_dir.rstrip("/")
    if format == "auto":
        format = detect_format(input_file)
    ext = os.path.splitext(input_file)[1]

    if format == "star":
        with open(input_file) as f:
            table = star.parse(f)
        if star.SCORE_COLUMN_NAME in table.columns:
            table = table.loc[table[star.SCORE_COLUMN_NAME] >= threshold]
        for image_name, group in table.groupby("MicrographName"):
            # RELION MicrographName is conventionally a relative path
            # (MotionCorr/job002/mic.mrc); the reference joins it verbatim
            # and crashes on the missing subdirectories (files.py:313-316)
            image_name = os.path.splitext(os.path.basename(image_name))[0]
            with open(os.path.join(output_dir, image_name + suffix + ext), "w") as f:
                star.write(group, f)
    else:
        table = pd.read_csv(input_file, sep="\t")
        if "score" in table.columns:
            table = table.loc[table["score"] >= threshold]
        for image_name, group in table.groupby("image_name"):
            group.to_csv(os.path.join(output_dir, image_name + suffix + ext),
                         sep="\t", index=False)
