"""End-to-end 3D path through the actual CLI: train a 3D picker on a
synthetic tomogram with planted particles (topaz train --dims 3), extract
with topaz extract --dims 3, and assert the AP against the planted ground
truth clears a floor — the 3D mirror of tutorial/run_synthetic_demo.py.
(Reference anchor: topaz/model/classifier.py:69-103 3D classification;
its CLI never exposed 3D training.)"""

import glob
import os
import sys

import numpy as np
import pandas as pd


def run_cli(argv):
    from topaz_tpu.cli import main

    old = sys.argv
    sys.argv = ["topaz"] + [str(a) for a in argv]
    try:
        main.main()
    finally:
        sys.argv = old


def _make_tomograms(tmp_path, rng, n_tomo=2, shape=(48, 64, 64), n_part=12):
    from topaz_tpu.io import mrc

    tomo_dir = tmp_path / "tomos"
    tomo_dir.mkdir()
    rows = []
    zz, yy, xx = np.mgrid[-6:7, -6:7, -6:7].astype(np.float32)
    blob = 3.5 * np.exp(-(zz**2 + yy**2 + xx**2) / (2 * 2.5**2))
    for i in range(n_tomo):
        vol = rng.normal(0, 1, shape).astype(np.float32)
        for _ in range(n_part):
            z = rng.integers(8, shape[0] - 8)
            y = rng.integers(8, shape[1] - 8)
            x = rng.integers(8, shape[2] - 8)
            vol[z - 6 : z + 7, y - 6 : y + 7, x - 6 : x + 7] -= blob
            rows.append({"image_name": f"tomo{i}", "x_coord": x,
                         "y_coord": y, "z_coord": z})
        mrc.write(str(tomo_dir / f"tomo{i}.mrc"), vol)
    targets = tmp_path / "particles3d.txt"
    pd.DataFrame(rows).to_csv(targets, sep="\t", index=False)
    return str(tomo_dir), str(targets)


def test_3d_train_extract_ap(tmp_path, rng):
    tomo_dir, targets = _make_tomograms(tmp_path, rng)

    run_cli([
        "train", "--dims", "3", "--model", "conv31", "--units", "4",
        "--radius", "2", "--method", "PN", "--pi", "0.02",
        "--minibatch-size", "16", "--minibatch-balance", "0.25",
        "--epoch-size", "20", "--num-epochs", "3", "--learning-rate", "0.002",
        "--train-images", tomo_dir, "--train-targets", targets,
        "--save-prefix", str(tmp_path / "model3d"),
        "-o", str(tmp_path / "train3d.tsv"),
    ])

    ckpts = sorted(glob.glob(str(tmp_path / "model3d_epoch*.npz")))
    assert ckpts, "no 3D checkpoints written"

    run_cli([
        "extract", "--dims", "3", "-m", ckpts[-1], "-r", "4", "-t", "0",
        "-o", str(tmp_path / "picks3d.txt"),
    ] + sorted(glob.glob(os.path.join(tomo_dir, "*.mrc"))))

    picks = pd.read_csv(tmp_path / "picks3d.txt", sep="\t")
    assert {"image_name", "x_coord", "y_coord", "z_coord",
            "score"} <= set(picks.columns)
    assert len(picks) > 0

    # AP against the planted ground truth (Hungarian matching per tomogram)
    from topaz_tpu.ops.metrics import average_precision, match_coordinates

    gt = pd.read_csv(targets, sep="\t")
    hits, scores, n_total = [], [], 0
    for name, g in gt.groupby("image_name"):
        p = picks[picks.image_name == name].sort_values(
            "score", ascending=False)
        target = g[["x_coord", "y_coord", "z_coord"]].values
        pred = p[["x_coord", "y_coord", "z_coord"]].values
        assignment, _ = match_coordinates(target, pred, 4)
        hits.append(assignment)
        scores.append(p["score"].values)
        n_total += len(target)
    ap = average_precision(np.concatenate(hits), np.concatenate(scores),
                           N=n_total)
    assert ap > 0.5, f"3D end-to-end AP too low: {ap}"
