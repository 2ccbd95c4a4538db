"""End-to-end workflow tests that exercise less-traveled paths: 3D
extraction, radius auto-tuning against targets, HDF5 denoise training,
segment output files."""

import os
import types

import numpy as np
import pandas as pd
import pytest


def test_extract_3d_score_map(tmp_path, rng):
    """extract --dims 3 -m none: 3D NMS over a pre-segmented volume."""
    from topaz_tpu.extract import extract_particles
    from topaz_tpu.io import mrc

    vol = rng.normal(-5, 1, size=(24, 30, 36)).astype(np.float32)
    vol[6, 10, 12] = 5.0
    vol[18, 20, 30] = 4.0
    mrc.write(str(tmp_path / "seg.mrc"), vol)

    out = tmp_path / "picks3d.txt"
    extract_particles([str(tmp_path / "seg.mrc")], "none", threshold=2.0,
                      radius=4, output=str(out), dims=3)
    picks = pd.read_csv(out, sep="\t")
    assert len(picks) == 2
    assert set(zip(picks.x_coord, picks.y_coord, picks.z_coord)) == \
        {(12, 10, 6), (30, 20, 18)}


def test_extract_radius_autotune(tmp_path, rng):
    """extract with --targets and no radius grid-searches the radius."""
    from topaz_tpu.extract import extract_particles
    from topaz_tpu.io import mrc

    score = rng.normal(-5, 0.5, size=(80, 80)).astype(np.float32)
    truth = [(20, 20), (50, 30), (30, 60)]
    for x, y in truth:
        score[y, x] = 6.0
    mrc.write(str(tmp_path / "seg.mrc"), score)
    targets = pd.DataFrame({"image_name": ["seg"] * 3,
                            "x_coord": [t[0] for t in truth],
                            "y_coord": [t[1] for t in truth]})
    tpath = tmp_path / "targets.txt"
    targets.to_csv(tpath, sep="\t", index=False)

    out = tmp_path / "picks.txt"
    extract_particles([str(tmp_path / "seg.mrc")], "none", threshold=0.0,
                      radius=None, targets=str(tpath), min_radius=5,
                      max_radius=20, step=5, output=str(out))
    picks = pd.read_csv(out, sep="\t", comment="#")
    assert len(picks) == 3


def test_denoise_hdf5_training(tmp_path, rng):
    """topaz denoise --hdf trains from an HDF5 paired stack."""
    import h5py

    from topaz_tpu.denoise import denoise_main

    base = rng.normal(size=(20, 48, 48)).astype(np.float32)
    stack = np.repeat(base, 2, axis=0)
    stack += rng.normal(0, 0.5, stack.shape).astype(np.float32)
    hpath = str(tmp_path / "pairs.hdf5")
    with h5py.File(hpath, "w") as f:
        f["images"] = stack

    args = types.SimpleNamespace(
        device=0, micrographs=[], output="", suffix="", format_="mrc",
        normalize=False, stack=False, save_prefix=str(tmp_path / "m" / "d"),
        save_interval=5, model=["unet"], dir_a=None, dir_b=None, hdf=hpath,
        preload=False, holdout=0.2, lowpass=1, gaussian=0, inv_gaussian=0,
        deconvolve=False, deconv_patch=1, pixel_cutoff=0, patch_size=-1,
        patch_padding=0, method="noise2noise", arch="fcnet",
        optim="adagrad", lr=0.01, criteria="L1", crop=48, batch_size=4,
        num_epochs=2, num_workers=0, num_threads=0,
    )
    denoise_main(args)
    files = os.listdir(tmp_path / "m")
    assert any(f.startswith("d_epoch") for f in files)


def test_segment_writes_tiff(tmp_path, rng):
    from topaz_tpu.io import mrc
    from topaz_tpu.models.factory import new_picker, save_picker
    from topaz_tpu.segment import segment_images

    spec, params, state = new_picker("resnet8", units=4, seed=0)
    model_path = str(tmp_path / "m.npz")
    save_picker(model_path, spec, params, state)

    img = rng.normal(size=(96, 96)).astype(np.float32)
    mrc.write(str(tmp_path / "img.mrc"), img)
    outdir = tmp_path / "segmented"
    segment_images(model_path, [str(tmp_path / "img.mrc")], str(outdir))

    from PIL import Image

    score = np.array(Image.open(outdir / "img.tiff"))
    assert score.shape == (96, 96)
    assert np.isfinite(score).all()


def test_batched_extract_matches_single(tmp_path, rng):
    """extract --batch-size > 1 routes through the device pipeline and
    produces the same picks as the one-at-a-time path."""
    from topaz_tpu.extract import extract_particles
    from topaz_tpu.io import mrc

    paths = []
    for i in range(3):
        x = rng.normal(0, 1, (128, 128)).astype(np.float32)
        yy, xx = np.mgrid[0:128, 0:128]
        for _ in range(3):
            cy, cx = rng.integers(20, 108, 2)
            x -= 3 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2)).astype(np.float32)
        p = str(tmp_path / f"m{i}.mrc")
        mrc.write(p, x)
        paths.append(p)

    out1 = str(tmp_path / "picks1.txt")
    extract_particles(paths, "resnet8_u32", threshold=1.0, radius=6,
                      output=out1, batch_size=1)
    out2 = str(tmp_path / "picks2.txt")
    extract_particles(paths, "resnet8_u32", threshold=1.0, radius=6,
                      output=out2, batch_size=2)
    cols = ["image_name", "x_coord", "y_coord"]
    a = pd.read_csv(out1, sep="\t").sort_values(cols).reset_index(drop=True)
    b = pd.read_csv(out2, sep="\t").sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert (a[cols] == b[cols]).all().all()
    np.testing.assert_allclose(a.score.values, b.score.values, rtol=1e-4)
