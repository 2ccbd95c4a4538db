#!/usr/bin/env python
"""End-to-end demo on synthetic data: generate micrographs with known
particles, preprocess, train a picker, extract, evaluate, and denoise —
the full quickstart protocol (docs/quickstart.md) without EMPIAR downloads.

Usage: python tutorial/run_synthetic_demo.py [workdir]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import pandas as pd


def make_dataset(root, n_micrographs=6, size=1024, n_particles=40, seed=0):
    from topaz_tpu.io import mrc

    rng = np.random.default_rng(seed)
    raw_dir = os.path.join(root, "rawdata")
    os.makedirs(raw_dir, exist_ok=True)
    rows = []
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n_micrographs):
        x = rng.normal(0, 2.0, (size, size)).astype(np.float32)
        for _ in range(n_particles):
            cy, cx = rng.integers(60, size - 60, 2)
            # ring-like particle
            r2 = (yy - cy) ** 2 + (xx - cx) ** 2
            x -= 3.0 * np.exp(-r2 / (2 * 16.0**2)).astype(np.float32)
            x += 1.5 * np.exp(-r2 / (2 * 8.0**2)).astype(np.float32)
            rows.append({"image_name": f"mic{i:02d}", "x_coord": cx,
                         "y_coord": cy})
        mrc.write(os.path.join(raw_dir, f"mic{i:02d}.mrc"), x)
    parts = os.path.join(root, "particles_raw.txt")
    pd.DataFrame(rows).to_csv(parts, sep="\t", index=False)
    return raw_dir, parts


def run(args):
    cmd = [sys.executable, "-m", "topaz_tpu"] + args
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "demo_workdir"
    os.makedirs(root, exist_ok=True)
    raw_dir, parts_raw = make_dataset(root)
    import glob

    proc = os.path.join(root, "processed")
    parts = os.path.join(root, "particles.txt")
    scale = 4

    run(["preprocess", "-s", str(scale), "-o", proc]
        + sorted(glob.glob(os.path.join(raw_dir, "*.mrc"))))
    run(["convert", "-s", str(scale), "-o", parts, parts_raw])

    run(["train", "-n", "40", "--train-images", proc, "--train-targets", parts,
         "--radius", "2", "--model", "resnet8", "--units", "16", "--bn", "off",
         "--no-pretrained", "--learning-rate", "0.001",
         "--num-epochs", "5", "--epoch-size", "100",
         "--minibatch-size", "64", "--save-prefix", os.path.join(root, "saved", "model"),
         "-o", os.path.join(root, "train_log.txt")])

    picks = os.path.join(root, "predicted_particles.txt")
    run(["extract", "-m", os.path.join(root, "saved", "model_epoch5.npz"),
         "-r", "4", "-t", "-3", "-x", str(scale), "-o", picks]
        + sorted(glob.glob(os.path.join(proc, "*.mrc"))))

    run(["precision_recall_curve", "-r", "16", "--predicted", picks,
         "--targets", parts_raw])

    run(["denoise", "-m", "unet", "-o", os.path.join(root, "denoised")]
        + sorted(glob.glob(os.path.join(raw_dir, "*.mrc")))[:2])

    print("\nDemo complete. Outputs under", root)


if __name__ == "__main__":
    main()
