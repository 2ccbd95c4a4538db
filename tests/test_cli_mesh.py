"""Multi-device CLI wiring: the actual commands (argv -> main) on the
8-device virtual CPU mesh produce the same outputs as single-device runs.

Covers the -d flag convention: -2 = ALL devices via the mesh (the
reference's nn.DataParallel mode, topaz/commands/denoise3d.py:62-118),
N >= 0 = single device."""

import os
import sys

import numpy as np
import pandas as pd
import pytest


def run_cli(argv):
    from topaz_tpu.cli import main

    old = sys.argv
    sys.argv = ["topaz"] + [str(a) for a in argv]
    try:
        main.main()
    finally:
        sys.argv = old


def _write_mrc(path, arr):
    from topaz_tpu.io import mrc

    mrc.write(str(path), np.asarray(arr, dtype=np.float32))


def test_extract_batched_mesh_matches_single_device(tmp_path, rng):
    """topaz extract --batch-size 8 -d -2: mesh-sharded batched scoring
    produces picks identical to the unsharded batched path and to the
    per-image exact path."""
    paths = []
    for i in range(6):
        img = rng.normal(0, 1, (128, 128)).astype(np.float32)
        yy, xx = np.mgrid[0:128, 0:128]
        for cy, cx in rng.integers(20, 108, size=(3, 2)):
            img -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        p = tmp_path / f"m{i}.mrc"
        _write_mrc(p, img)
        paths.append(str(p))

    base = ["extract", "-m", "resnet8_u32", "-r", "6", "-t", "0"]
    run_cli(base + ["--batch-size", "8", "-d", "-2",
                    "-o", str(tmp_path / "mesh.txt")] + paths)
    run_cli(base + ["--batch-size", "8", "-d", "0",
                    "-o", str(tmp_path / "nomesh.txt")] + paths)
    run_cli(base + ["-o", str(tmp_path / "single.txt")] + paths)

    mesh_t = pd.read_csv(tmp_path / "mesh.txt", sep="\t")
    nomesh_t = pd.read_csv(tmp_path / "nomesh.txt", sep="\t")
    single_t = pd.read_csv(tmp_path / "single.txt", sep="\t")

    key = ["image_name", "x_coord", "y_coord"]
    for t in (mesh_t, nomesh_t, single_t):
        t.sort_values(key, inplace=True, ignore_index=True)

    # sharded == unsharded batched program, and both == per-image exact path
    pd.testing.assert_frame_equal(mesh_t[key], nomesh_t[key])
    np.testing.assert_allclose(mesh_t.score, nomesh_t.score, rtol=1e-4)
    pd.testing.assert_frame_equal(mesh_t[key], single_t[key])
    np.testing.assert_allclose(mesh_t.score, single_t.score, rtol=1e-3,
                               atol=1e-4)


def test_denoise3d_mesh_matches_single_device(tmp_path, rng):
    """topaz denoise3d -d -2: patch batches sharded over the data axis give
    the same tomogram as -d 0 (per-patch statistics make it exact)."""
    from topaz_tpu.io import mrc
    from topaz_tpu.models.denoise_factory import new_denoiser, save_denoiser

    meta, params = new_denoiser("unet", nf=4, base_width=7, dims=3, seed=0)
    model_path = tmp_path / "tiny3d.npz"
    save_denoiser(str(model_path), meta, params)

    vol = rng.normal(0, 1, (48, 48, 48)).astype(np.float32)
    _write_mrc(tmp_path / "vol.mrc", vol)

    for d, outdir in ((0, "out0"), (-2, "out2")):
        os.makedirs(tmp_path / outdir, exist_ok=True)
        run_cli(["denoise3d", "-m", str(model_path), "-s", "24", "-p", "8",
                 "-d", d, "-o", str(tmp_path / outdir),
                 str(tmp_path / "vol.mrc")])

    y0, _, _ = mrc.read(str(tmp_path / "out0" / "vol.mrc"))
    y2, _, _ = mrc.read(str(tmp_path / "out2" / "vol.mrc"))
    assert y0.shape == vol.shape
    np.testing.assert_allclose(y2, y0, rtol=1e-4, atol=1e-5)


def test_denoise2d_mesh_halo_matches_single_device(tmp_path, rng):
    """topaz denoise -d -2: whole-micrograph halo-sharded denoising tracks
    the single-device whole-image result (exact away from shard seams for
    the pool-free fcnn)."""
    from topaz_tpu.io import mrc

    img = rng.normal(1.5, 2.0, (256, 128)).astype(np.float32)
    _write_mrc(tmp_path / "im.mrc", img)

    for d, outdir in ((0, "out0"), (-2, "out2")):
        os.makedirs(tmp_path / outdir, exist_ok=True)
        run_cli(["denoise", "-m", "fcnn", "-s", "-1", "-d", d,
                 "-o", str(tmp_path / outdir), str(tmp_path / "im.mrc")])

    y0, _, _ = mrc.read(str(tmp_path / "out0" / "im.mrc"))
    y2, _, _ = mrc.read(str(tmp_path / "out2" / "im.mrc"))
    assert y2.shape == y0.shape
    assert np.corrcoef(y0.ravel(), y2.ravel())[0, 1] > 0.99
    # interior rows (away from the fcnn receptive field of shard seams)
    np.testing.assert_allclose(y2[32:-32], y0[32:-32], rtol=1e-3, atol=1e-3)


def test_train_dp_mesh(tmp_path, rng, capsys):
    """topaz train -d -2: data-parallel training over the mesh runs and
    emits the TSV contract with finite losses."""
    import types

    from test_training import _make_synthetic_dataset

    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    args = types.SimpleNamespace(
        describe=False, device=-2, num_workers=0, num_threads=0,
        train_images=img_dir, train_targets=targets_path,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="PN",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=16, minibatch_balance=0.25,
        epoch_size=2, num_epochs=1,
        pretrained=False, model="resnet8", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=str(tmp_path / "model"), output=str(tmp_path / "log.tsv"),
        test_batch_size=1, seed=0, dims=2,
    )
    train_from_args(args)

    log = pd.read_csv(tmp_path / "log.tsv", sep="\t")
    train_rows = log[log.split == "train"]
    assert len(train_rows) == 2
    assert np.isfinite(train_rows.loss.astype(float)).all()


def test_segment_mesh_matches_single_device(tmp_path, rng):
    """topaz segment -d -2: halo-sharded whole-image score maps equal the
    single-device ones (zero row padding to the shard multiple matches the
    picker's SAME-conv zero edge, so it is exact)."""
    from PIL import Image

    img = rng.normal(0, 1, (130, 96)).astype(np.float32)  # 130 % 8 != 0
    _write_mrc(tmp_path / "s.mrc", img)

    for d, outdir in ((0, "seg0"), (-2, "seg2")):
        run_cli(["segment", "-m", "resnet8_u32", "-d", d,
                 "-o", str(tmp_path / outdir), str(tmp_path / "s.mrc")])

    a = np.asarray(Image.open(tmp_path / "seg0" / "s.tiff"))
    b = np.asarray(Image.open(tmp_path / "seg2" / "s.tiff"))
    assert a.shape == b.shape == (130, 96)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_denoise3d_whole_volume_halo(tmp_path, rng):
    """topaz denoise3d -s -1 -d -2: whole-volume denoising z-sharded over
    the mesh tracks the single-device whole-volume result."""
    from topaz_tpu.io import mrc
    from topaz_tpu.models.denoise_factory import new_denoiser, save_denoiser

    meta, params = new_denoiser("unet", nf=4, base_width=7, dims=3, seed=3)
    model_path = tmp_path / "tiny3d.npz"
    save_denoiser(str(model_path), meta, params)
    vol = rng.normal(0, 1, (64, 48, 48)).astype(np.float32)
    _write_mrc(tmp_path / "vol.mrc", vol)

    for d, outdir in ((0, "w0"), (-2, "w2")):
        os.makedirs(tmp_path / outdir, exist_ok=True)
        run_cli(["denoise3d", "-m", str(model_path), "-s", "-1",
                 "-d", d, "-o", str(tmp_path / outdir),
                 str(tmp_path / "vol.mrc")])
    y0, _, _ = mrc.read(str(tmp_path / "w0" / "vol.mrc"))
    y2, _, _ = mrc.read(str(tmp_path / "w2" / "vol.mrc"))
    assert y2.shape == y0.shape
    assert np.corrcoef(y0.ravel(), y2.ravel())[0, 1] > 0.95


def test_extract_batched_per_micrograph_star(tmp_path, rng):
    """Batched mesh extraction with --per-micrograph --format star writes
    one star file per micrograph with the same picks as the single path."""
    paths = []
    for i in range(3):
        img = rng.normal(0, 1, (96, 96)).astype(np.float32)
        yy, xx = np.mgrid[0:96, 0:96]
        for cy, cx in rng.integers(20, 76, size=(2, 2)):
            img -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        p = tmp_path / f"pm{i}.mrc"
        _write_mrc(p, img)
        paths.append(str(p))

    outdir = tmp_path / "coords"
    os.makedirs(outdir, exist_ok=True)
    run_cli(["extract", "-m", "resnet8_u32", "-r", "6", "-t", "0",
             "--batch-size", "4", "-d", "-2", "--per-micrograph",
             "--format", "star", "-o", str(outdir)] + paths)
    from topaz_tpu.io.star import parse

    total = 0
    for i in range(3):
        with open(outdir / f"pm{i}.star") as f:
            table = parse(f)
        assert {"CoordinateX", "CoordinateY"} <= set(table.columns)
        total += len(table)
    assert total >= 3


def test_denoise3d_training_mesh(tmp_path, rng):
    """topaz denoise3d training with -d -2 shards noise2noise batches over
    the data axis and produces a usable model (DataParallel-train analog,
    topaz/commands/denoise3d.py:103)."""
    import types

    from topaz_tpu.denoise import denoise3d_main
    from topaz_tpu.io import mrc

    base = rng.normal(size=(96, 96, 96)).astype(np.float32)
    mrc.write(str(tmp_path / "even.mrc"),
              base + rng.normal(0, 0.5, base.shape).astype(np.float32))
    mrc.write(str(tmp_path / "odd.mrc"),
              base + rng.normal(0, 0.5, base.shape).astype(np.float32))

    args = types.SimpleNamespace(
        volumes=[], output="", suffix="", model="none",
        even_train_path=str(tmp_path / "even.mrc"),
        odd_train_path=str(tmp_path / "odd.mrc"),
        N_train=16, N_test=8, crop=32, base_kernel_width=7,
        optim="adagrad", lr=0.01, criteria="L2", momentum=0.8,
        batch_size=8, num_epochs=2, weight_decay=0,
        save_interval=2, save_prefix=str(tmp_path / "md"),
        num_workers=1, num_threads=0, gaussian=0,
        patch_size=96, patch_padding=48, device=-2,
    )
    denoise3d_main(args)
    import glob

    ckpts = glob.glob(str(tmp_path / "md_epoch*.npz"))
    assert ckpts, "no denoiser checkpoints written"
    from topaz_tpu.models.denoise_factory import load_denoiser

    meta, params = load_denoiser(ckpts[0])
    assert meta["dims"] == 3


def test_normalize_batched_mesh_matches_single_device(tmp_path, rng):
    """topaz normalize -d -2 (mesh-sharded batched GMM fits over shape
    buckets) writes the same normalized images and metadata as the
    per-image path at sample=1, across mixed geometries."""
    import json

    from topaz_tpu.io import mrc

    paths = []
    for i, shape in enumerate([(96, 128), (96, 128), (100, 120), (64, 64),
                               (96, 128)]):
        img = rng.normal(2.0, 3.0, shape).astype(np.float32)
        img[20:40, 20:40] -= 6.0  # particle-ish dark blob for a real GMM
        p = tmp_path / f"m{i}.mrc"
        _write_mrc(p, img)
        paths.append(str(p))

    mesh_dir = tmp_path / "mesh_out"
    single_dir = tmp_path / "single_out"
    run_cli(["normalize", "-d", "-2", "--metadata", "--sample", "1",
             "-o", str(mesh_dir)] + paths)
    run_cli(["normalize", "--metadata", "--sample", "1",
             "-o", str(single_dir)] + paths)

    for i in range(len(paths)):
        a, _, _ = mrc.read(str(mesh_dir / f"m{i}.mrc"))
        b, _, _ = mrc.read(str(single_dir / f"m{i}.mrc"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        with open(mesh_dir / f"m{i}.metadata.json") as fh:
            ma = json.load(fh)
        with open(single_dir / f"m{i}.metadata.json") as fh:
            mb = json.load(fh)
        np.testing.assert_allclose(ma["mu"], mb["mu"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ma["std"], mb["std"], rtol=1e-4,
                                   atol=1e-5)

    # affine + downsample variant through the batched path
    run_cli(["normalize", "-d", "-2", "--affine", "-s", "2",
             "-o", str(tmp_path / "mesh_aff")] + paths)
    run_cli(["normalize", "--affine", "-s", "2",
             "-o", str(tmp_path / "single_aff")] + paths)
    for i in range(len(paths)):
        a, _, _ = mrc.read(str(tmp_path / "mesh_aff" / f"m{i}.mrc"))
        b, _, _ = mrc.read(str(tmp_path / "single_aff" / f"m{i}.mrc"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_normalize_mesh_non_divisible_batch(tmp_path, rng):
    """normalize -d -2 with a --batch-size that does not divide the device
    count shrinks the mesh to a divisor instead of crashing in the sharded
    device_put (regression: mesh was built over ALL devices)."""
    import json

    from topaz_tpu.io import mrc

    paths = []
    for i in range(6):
        img = rng.normal(1.0, 2.0, (64, 64)).astype(np.float32)
        p = tmp_path / f"m{i}.mrc"
        _write_mrc(p, img)
        paths.append(str(p))

    # 6 % 8 != 0 on the virtual 8-device mesh
    run_cli(["normalize", "-d", "-2", "--batch-size", "6", "--metadata",
             "-o", str(tmp_path / "mesh")] + paths)
    run_cli(["normalize", "--sample", "1", "--metadata",
             "-o", str(tmp_path / "single")] + paths)
    for i in range(6):
        a, _, _ = mrc.read(str(tmp_path / "mesh" / f"m{i}.mrc"))
        b, _, _ = mrc.read(str(tmp_path / "single" / f"m{i}.mrc"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        with open(tmp_path / "mesh" / f"m{i}.metadata.json") as fh:
            ma = json.load(fh)
        with open(tmp_path / "single" / f"m{i}.metadata.json") as fh:
            mb = json.load(fh)
        np.testing.assert_allclose(ma["mu"], mb["mu"], rtol=1e-4, atol=1e-5)


def test_extract_mesh_fallback_warns(tmp_path, rng, capsys):
    """extract -d -2 outside the batched fast path (here: explicit patch
    scoring) falls back to single-device scoring WITH a warning
    (regression: silent degrade)."""
    from topaz_tpu.io import mrc

    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    p = tmp_path / "mic.mrc"
    mrc.write(str(p), img)
    out = tmp_path / "picks.txt"
    run_cli(["extract", "-m", "resnet8_u32", "-r", "14", "-t", "-6",
             "-d", "-2", "-p", "96", "-o", str(out), str(p)])
    err = capsys.readouterr().err
    assert "falling back to single-device scoring" in err
    assert out.exists()


def test_denoise2d_mesh_halo_bf16(tmp_path, rng):
    """-d -2 with --precision bf16 runs the halo-sharded path (regression:
    bf16 silently dropped to one whole-image device program) and stays
    close to the f32 halo result."""
    from topaz_tpu.denoise import Denoise

    devices = _all_devices()
    img = rng.normal(0, 2, (256, 128)).astype(np.float32)

    d32 = Denoise("fcnn", devices=devices)
    dbf = Denoise("fcnn", devices=devices, dtype="bf16")
    y32 = d32._apply(img)
    # the halo path must actually engage for bf16 (not decline to the
    # single-device whole-image fallback, which would also pass below)
    assert dbf._apply_halo(img) is not None
    ybf = dbf._apply(img)
    assert any(k[0] == "halo" for k in dbf._jit_cache)
    assert ybf.dtype == np.float32
    # bf16 mantissa ~8 bits: expect ~1% agreement
    err = np.abs(ybf - y32) / (np.abs(y32).mean() + 1e-6)
    assert float(err.mean()) < 2e-2


def _all_devices():
    import jax

    return jax.devices()
