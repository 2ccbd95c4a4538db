#!/usr/bin/env python
"""Re-measure OUR stack's AUPRC on the plain-Gaussian demo fixture
(PARITY.md "Training-quality comparison" table) — needed in round 4
because the pi bookkeeping became reference-exact (the (2r+1)x factor),
which changes the GE-binomial prior this table was measured under.

Protocol matches tutorial/run_synthetic_demo.py + the historical table:
6 synthetic 1024^2 micrographs, 40 particles each, 4x downsample,
resnet8 u16 bn=off, GE-binomial n=40 r=2, lr 1e-3, 5x100 steps,
batch 64; AUPRC vs planted truth at r=16 raw scale (r=4 downsampled).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/gaussian_demo_quality.py [--seeds 3]
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time
import types

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tutorial"))
sys.path.insert(0, os.path.join(REPO, "tools"))

SCALE = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    opts = ap.parse_args()

    from run_synthetic_demo import make_dataset
    from quality_compare import eval_ap
    from topaz_tpu.io import mrc
    from topaz_tpu.io.image import load_image
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import normalize
    from topaz_tpu.training import train_from_args
    from topaz_tpu.models.factory import load_picker

    results = []
    with tempfile.TemporaryDirectory(prefix="topaz_gdemo_") as tmp:
        raw_dir, parts_raw = make_dataset(tmp, seed=0)
        # preprocess + scale coordinates (the demo's CLI steps, inline)
        proc = os.path.join(tmp, "processed")
        os.makedirs(proc)
        for p in sorted(glob.glob(os.path.join(raw_dir, "*.mrc"))):
            x = np.asarray(load_image(p), np.float32)
            small = np.asarray(downsample(x, SCALE))
            norm, _ = normalize(small)
            mrc.write(os.path.join(proc, os.path.basename(p)), norm)
        t_raw = pd.read_csv(parts_raw, sep="\t")
        t = t_raw.copy()
        t[["x_coord", "y_coord"]] = t[["x_coord", "y_coord"]] // SCALE
        parts = os.path.join(tmp, "particles.txt")
        t.to_csv(parts, sep="\t", index=False)

        for seed in range(opts.seeds):
            args = types.SimpleNamespace(
                describe=False, device=0, num_workers=0, num_threads=0,
                train_images=proc, train_targets=parts,
                test_images=None, test_targets=None,
                format_="auto", image_ext="",
                k_fold=0, fold=0, cross_validation_seed=42,
                num_particles=40, pi=None, radius=2,
                method="GE-binomial",
                slack=-1, autoencoder=0, l2=0.0, learning_rate=1e-3,
                natural=False, minibatch_size=64, minibatch_balance=0.0625,
                epoch_size=100, num_epochs=5,
                pretrained=False, model="resnet8", units=16, dropout=0.0,
                bn="off", pooling=None, unit_scaling=2, ngf=32,
                patch_size=96, patch_padding=48,
                save_prefix=os.path.join(tmp, f"m{seed}"),
                output=os.path.join(tmp, f"m{seed}.tsv"),
                test_batch_size=1, seed=seed, dims=2,
            )
            t0 = time.time()
            train_from_args(args)
            wall = time.time() - t0
            ckpt = max(
                glob.glob(os.path.join(tmp, f"m{seed}_epoch*.npz")),
                key=lambda p: int(p.rsplit("epoch", 1)[1].split(".")[0]))
            spec, params, state = load_picker(ckpt)

            from quality_compare import picks_ours
            import quality_compare as qc
            qc.RADIUS_DS = 4  # eval r=16 raw -> 4 at 4x downsample
            picks = picks_ours(spec, params, state, proc)
            # demo evaluates on the training micrographs (historical table)
            auprc = eval_ap(picks, parts, 4)
            results.append({"seed": seed, "auprc": round(float(auprc), 4),
                            "train_sec": round(wall, 1)})
            print(f"# seed {seed}: AUPRC={auprc:.4f} ({wall:.0f}s)",
                  file=sys.stderr, flush=True)
    print(json.dumps({"ours_bugcompat_pi": results}))


if __name__ == "__main__":
    main()
