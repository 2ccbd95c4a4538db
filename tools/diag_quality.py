#!/usr/bin/env python
"""Diagnostics for the published-protocol quality gap (round 4).

Trains OUR stack once on the quality_compare fixture for a given seed and
reports the test-AP trajectory across the per-epoch checkpoints, to
separate "the model never gets there" from "it gets there and overfits
past it".  Variants:

  --precision-highest   jax_default_matmul_precision=highest (TPU convs on
                        f32 inputs default to bf16 multiplies with f32
                        accumulation; torch-CPU is full f32 — this isolates
                        that numeric divergence)
  --train-seed K        decouple training stochasticity from the dataset
                        seed (variance probe on a fixed fixture)

Usage: PYTHONPATH=/root/repo python tools/diag_quality.py --seed 0
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0, help="dataset seed")
    ap.add_argument("--train-seed", type=int, default=None,
                    help="training seed (default: same as --seed)")
    ap.add_argument("--precision-highest", action="store_true")
    opts = ap.parse_args()

    if opts.precision_highest:
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")

    import quality_compare as qc
    import types
    import numpy as np

    train_seed = opts.seed if opts.train_seed is None else opts.train_seed
    with tempfile.TemporaryDirectory(prefix="topaz_diag_") as tmp:
        train_dir, t_train, test_dir, t_test = qc.make_dataset(
            tmp, opts.seed)

        from topaz_tpu.training import train_from_args
        args = types.SimpleNamespace(
            describe=False, device=0, num_workers=0, num_threads=0,
            train_images=train_dir, train_targets=t_train,
            test_images=None, test_targets=None,
            format_="auto", image_ext="",
            k_fold=0, fold=0, cross_validation_seed=42,
            num_particles=qc.N_PART, pi=None, radius=qc.TRAIN_RADIUS,
            method="GE-binomial",
            slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
            natural=False, minibatch_size=qc.MINIBATCH,
            minibatch_balance=0.0625,
            epoch_size=qc.EPOCH_SIZE, num_epochs=qc.EPOCHS,
            pretrained=False, model="resnet8", units=qc.UNITS,
            dropout=0.0, bn=qc.BN,
            pooling=None, unit_scaling=2, ngf=32, patch_size=96,
            patch_padding=48,
            save_prefix=os.path.join(tmp, "diag"),
            output=os.path.join(tmp, "diag.tsv"),
            test_batch_size=1, seed=train_seed, dims=2,
        )
        t0 = time.time()
        train_from_args(args)
        wall = time.time() - t0

        from topaz_tpu.models.factory import load_picker
        traj = []
        for ckpt in sorted(glob.glob(os.path.join(tmp, "diag_epoch*.npz"))):
            spec, params, state = load_picker(ckpt)
            picks = qc.picks_ours(spec, params, state, test_dir)
            ap_e = qc.eval_ap(picks, t_test, qc.RADIUS_DS)
            epoch = int(os.path.basename(ckpt).split("epoch")[1].split(".")[0])
            traj.append({"epoch": epoch, "ap": round(float(ap_e), 4)})
            print(f"# epoch {epoch}: AP={ap_e:.4f}", file=sys.stderr,
                  flush=True)
        print(json.dumps({
            "seed": opts.seed, "train_seed": train_seed,
            "precision_highest": bool(opts.precision_highest),
            "train_sec": round(wall, 1), "trajectory": traj,
        }))


if __name__ == "__main__":
    main()
