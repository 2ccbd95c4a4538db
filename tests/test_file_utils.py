"""File-utility coverage: VIA CSV, box/json writers, particle stacks,
normalize metadata, y-axis inversion."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def _table():
    return pd.DataFrame({
        "image_name": ["a", "a", "b"],
        "x_coord": [10, 20, 30],
        "y_coord": [15, 25, 35],
        "score": [1.5, -0.5, 2.0],
    })


def test_via_csv_roundtrip(tmp_path):
    from topaz_tpu.io.coordinates import read_via_csv, write_via_csv

    path = str(tmp_path / "picks.csv")
    write_via_csv(path, _table())
    back = read_via_csv(path)
    assert list(back.x_coord) == [10, 20, 30]
    assert list(back.y_coord) == [15, 25, 35]
    np.testing.assert_allclose(back.score.astype(float), [1.5, -0.5, 2.0])


def test_box_and_json_writers(tmp_path):
    from topaz_tpu.io.coordinates import (boxes_to_coordinates,
                                          read_box, write_coordinates)

    write_coordinates(str(tmp_path), _table(), format="box", boxsize=20)
    box = read_box(str(tmp_path / "a.box"))
    assert box.shape == (2, 4)
    coords = boxes_to_coordinates(box)
    np.testing.assert_array_equal(coords, [[10, 15], [20, 25]])

    write_coordinates(str(tmp_path), _table(), format="json")
    with open(tmp_path / "b_info.json") as f:
        data = json.load(f)
    assert data["boxes"] == [[30, 35, "manual"]]


def test_particle_stack(tmp_path, rng):
    from topaz_tpu.io import mrc, star
    from topaz_tpu.ops.masks import create_particle_stack

    img = rng.normal(size=(64, 64)).astype(np.float32)
    mrc.write(str(tmp_path / "a.mrc"), img)
    mrc.write(str(tmp_path / "b.mrc"), img * 2)
    parts = str(tmp_path / "parts.txt")
    _table().to_csv(parts, sep="\t", index=False)

    out = str(tmp_path / "stack.mrcs")
    create_particle_stack(parts, out, threshold=-np.inf, size=16, resize=-1,
                          image_root=str(tmp_path), image_ext=".mrc",
                          metadata_file=None)
    stack, header, _ = mrc.read(out)
    assert stack.shape == (3, 16, 16)
    # per-particle standardization
    assert abs(float(stack[0].mean())) < 1e-4

    with open(str(tmp_path / "stack.star")) as f:
        table = star.parse(f)
    assert len(table) == 3
    assert "ImageName" in table.columns
    assert list(table[star.X_COLUMN_NAME]) == [10, 20, 30]


def test_normalize_metadata_json(tmp_path, rng):
    from topaz_tpu.io import mrc
    from topaz_tpu.preprocess import normalize_file

    x = rng.normal(2.0, 1.0, (64, 64)).astype(np.float32)
    mrc.write(str(tmp_path / "m.mrc"), x)
    out = tmp_path / "out"
    os.makedirs(out)
    normalize_file(str(tmp_path / "m.mrc"), str(out), affine=True,
                   metadata=True)
    with open(out / "m.metadata.json") as f:
        md = json.load(f)
    assert abs(md["mu"] - 2.0) < 0.1
    assert md["pi"] == 1


def test_convert_invert_y(tmp_path, rng):
    import subprocess
    import sys

    from topaz_tpu.io import mrc

    mrc.write(str(tmp_path / "a.mrc"),
              rng.normal(size=(50, 40)).astype(np.float32))
    mrc.write(str(tmp_path / "b.mrc"),
              rng.normal(size=(50, 40)).astype(np.float32))
    src = tmp_path / "parts.txt"
    _table().to_csv(src, sep="\t", index=False)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo  # repo only: keep the axon sitecustomize (TPU) out of CPU subprocess tests
    r = subprocess.run(
        [sys.executable, "-m", "topaz_tpu", "convert", "--invert-y",
         "--imagedir", str(tmp_path), "--image-ext", "mrc",
         "-o", str(tmp_path / "flipped.txt"), str(src)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    flipped = pd.read_csv(tmp_path / "flipped.txt", sep="\t")
    # y' = H - 1 - y with H = 50
    assert sorted(flipped.y_coord) == sorted([49 - 15, 49 - 25, 49 - 35])


def test_denoise_stack(tmp_path, rng):
    """denoise --stack path: every frame of an MRC stack is denoised."""
    from topaz_tpu.denoise import Denoise, denoise_stack
    from topaz_tpu.io import mrc

    stack = rng.normal(size=(3, 64, 64)).astype(np.float32)
    mrc.write(str(tmp_path / "stack.mrcs"), stack)
    model = Denoise("fcnn")
    out = denoise_stack(str(tmp_path / "stack.mrcs"),
                        str(tmp_path / "out.mrcs"), [model], patch_size=-1)
    saved, header, _ = mrc.read(str(tmp_path / "out.mrcs"))
    assert saved.shape == (3, 64, 64)
    assert np.isfinite(saved).all()
    assert not np.allclose(saved, stack)


def test_relion_wrapper_star_reading(tmp_path):
    """The RELION wrappers' star-table reader handles micrographs star."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_topaz_pick",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "relion_run_topaz", "run_topaz_pick.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    star_path = tmp_path / "micrographs.star"
    star_path.write_text(
        "data_micrographs\n\nloop_\n_rlnMicrographName #1\n"
        "MotionCorr/job002/mic1.mrc\nMotionCorr/job002/mic2.mrc\n")
    paths = mod.read_micrograph_paths(str(star_path))
    assert paths == ["MotionCorr/job002/mic1.mrc", "MotionCorr/job002/mic2.mrc"]


def test_scripts_train_test_split(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    images = tmp_path / "images.txt"
    pd.DataFrame({"image_name": [f"m{i}" for i in range(5)],
                  "path": [f"/d/m{i}.mrc" for i in range(5)]}).to_csv(
        images, sep="\t", index=False)
    targets = tmp_path / "targets.txt"
    pd.DataFrame({"image_name": ["m0", "m1", "m2", "m3", "m4"],
                  "x_coord": range(5), "y_coord": range(5)}).to_csv(
        targets, sep="\t", index=False)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_test_split.py"),
         "--images", str(images), "--targets", str(targets), "-n", "2"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    test_imgs = pd.read_csv(tmp_path / "images_test.txt", sep="\t")
    train_imgs = pd.read_csv(tmp_path / "images_train.txt", sep="\t")
    assert len(test_imgs) == 2 and len(train_imgs) == 3
    train_t = pd.read_csv(tmp_path / "targets_train.txt", sep="\t")
    assert set(train_t.image_name) == set(train_imgs.image_name)


def test_relion_pick_wrapper_end_to_end(tmp_path, rng):
    """relion_run_topaz/run_topaz_pick.py drives the real CLI end-to-end:
    star-listed micrographs -> preprocess -> extract -> convert -> RELION
    output nodes + per-micrograph pick star files."""
    import subprocess
    import sys

    import numpy as np

    from topaz_tpu.io import mrc, star

    mic_dir = tmp_path / "Micrographs"
    mic_dir.mkdir()
    yy, xx = np.mgrid[0:256, 0:256]
    paths = []
    for i in range(2):
        img = rng.normal(0, 1, (256, 256)).astype(np.float32)
        for cy, cx in rng.integers(40, 216, size=(4, 2)):
            img -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 32.0)
        p = mic_dir / f"mic{i}.mrc"
        mrc.write(str(p), img)
        paths.append(str(p))

    star_path = tmp_path / "micrographs.star"
    with open(star_path, "w") as f:
        f.write("data_\n\nloop_\n_rlnMicrographName #1\n")
        for p in paths:
            f.write(p + "\n")

    out = tmp_path / "External" / "job001"
    out.mkdir(parents=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "relion_run_topaz",
                                      "run_topaz_pick.py"),
         "-i", str(star_path), "-o", str(out), "-m", "resnet8_u32",
         "-scale", "4", "-r", "3", "--pickthreshold", "0"],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out / "RELION_JOB_EXIT_SUCCESS").exists()
    assert (out / "RELION_OUTPUT_NODES.star").exists()

    n_picks = 0
    for i in range(2):
        pick_star = out / "Micrographs" / f"mic{i}_topazpicks.star"
        assert pick_star.exists(), list(out.rglob("*"))
        with open(pick_star) as f:
            table = star.parse(f)
        assert {"CoordinateX", "CoordinateY"} <= set(table.columns)
        # coordinates were upscaled back to the raw pixel grid
        assert (table["CoordinateX"].astype(float) <= 256).all()
        n_picks += len(table)
    assert n_picks >= 4


def test_match_coordinates_to_images_3d_mask(rng):
    """3D volumes rasterize spheres using the z column (regression:
    z_coord was dropped and (y, x) indexed the (z, y) axes)."""
    import pandas as pd

    from topaz_tpu.ops.masks import as_mask, match_coordinates_to_images

    vol = rng.normal(size=(12, 16, 20)).astype(np.float32)
    coords = pd.DataFrame({
        "image_name": ["v", "v"],
        "x_coord": [5, 17],
        "y_coord": [9, 2],
        "z_coord": [3, 10],
    })
    matched = match_coordinates_to_images(coords, {"v": vol}, radius=2)
    im, mask = matched["v"]
    expect = as_mask(vol.shape, 2, coords.x_coord.values,
                     coords.y_coord.values, z_coord=coords.z_coord.values)
    np.testing.assert_array_equal(mask, expect)
    assert mask.shape == vol.shape
    assert mask[3, 9, 5] == 1 and mask[10, 2, 17] == 1


def test_convert_invert_y_dotted_default_ext(tmp_path, rng):
    """--invert-y works with the DEFAULT --image-ext '.mrc' (regression:
    'name' + '.' + '.mrc' built 'name..mrc', matched nothing, and crashed
    — the reference has the same bug, topaz/commands/convert.py:206-208)."""
    import subprocess
    import sys

    from topaz_tpu.io import mrc

    mrc.write(str(tmp_path / "a.mrc"),
              rng.normal(size=(30, 20)).astype(np.float32))
    src = tmp_path / "parts.txt"
    pd.DataFrame({"image_name": ["a"], "x_coord": [3],
                  "y_coord": [4]}).to_csv(src, sep="\t", index=False)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo  # repo only: keep the axon sitecustomize (TPU) out of CPU subprocess tests
    r = subprocess.run(
        [sys.executable, "-m", "topaz_tpu", "convert", "--invert-y",
         "--imagedir", str(tmp_path),
         "-o", str(tmp_path / "flipped.txt"), str(src)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr
    flipped = pd.read_csv(tmp_path / "flipped.txt", sep="\t")
    assert flipped.y_coord.tolist() == [30 - 1 - 4]


def test_star_rows_starting_with_data(tmp_path):
    """Body rows whose first token starts with 'data' are particles, not
    block terminators (regression: micrographs named data*.mrc or paths
    under data/ silently dropped ALL rows — the reference parser has the
    same bug)."""
    from topaz_tpu.io import star

    content = (
        "data_\n\nloop_\n_rlnMicrographName #1\n_rlnCoordinateX #2\n"
        "_rlnCoordinateY #3\n"
        "data001.mrc 10 20\n"
        "data/job01/m2.mrc 30 40\n"
        "data_block2\n"  # a real new block DOES terminate
        "ignored 1 2\n"
    )
    p = tmp_path / "p.star"
    p.write_text(content)
    with open(p) as f:
        table = star.parse(f)
    assert len(table) == 2
    assert table["MicrographName"].tolist() == ["data001.mrc",
                                                "data/job01/m2.mrc"]


def test_split_particle_file_relative_micrograph_names(tmp_path):
    """RELION MicrographName entries are relative paths; splitting writes
    per-micrograph files under output_dir by basename instead of crashing
    on missing subdirectories (reference bug, files.py:313-316)."""
    from topaz_tpu.io.coordinates import split_particle_file

    content = (
        "data_\n\nloop_\n_rlnMicrographName #1\n_rlnCoordinateX #2\n"
        "_rlnCoordinateY #3\n"
        "MotionCorr/job002/mic_001.mrc 10 20\n"
        "MotionCorr/job002/mic_002.mrc 30 40\n"
    )
    src = tmp_path / "parts.star"
    src.write_text(content)
    out = tmp_path / "out"
    out.mkdir()
    split_particle_file(str(src), "star", "_picks", -1e9, str(out))
    assert sorted(p.name for p in out.iterdir()) == [
        "mic_001_picks.star", "mic_002_picks.star"]


def test_conda_recipe_lints():
    """conda-build/meta.yaml parses as YAML once the jinja is rendered
    (packaging parity with the reference's conda-build/meta.yaml)."""
    import os
    import re

    import yaml

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "conda-build", "meta.yaml")
    text = open(path).read()
    text = re.sub(r"\{%.*?%\}", "", text)
    text = re.sub(r"\{\{.*?\}\}", "0.1.0", text)
    meta = yaml.safe_load(text)
    assert meta["package"]["name"] == "topaz-tpu"
    assert any("jax" == r.split()[0] for r in meta["requirements"]["run"])
    assert meta["build"]["entry_points"] == ["topaz = topaz_tpu.cli.main:main"]
