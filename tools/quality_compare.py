#!/usr/bin/env python
"""Training-quality comparison on the CTF-modulated realistic fixture
(VERDICT r2 item 6; hardened per VERDICT r3 item 1): train a picker from
scratch with BOTH stacks on the same synthetic CTF micrographs + labels,
then evaluate AP against the planted ground truth with the same metric
code. Writes one JSON line; the results are recorded in PARITY.md's
quality table.

Defaults are the reference's PUBLISHED protocol
(/root/reference/topaz/commands/train.py:62-96: resnet8 units=32 bn=on,
GE-binomial, minibatch 256, balance 0.0625, lr 2e-4, radius 3, 10
epochs) on a NON-SATURATING fixture: lower SNR (--signal), per-micrograph
defocus spread, particle crowding (--min-sep), and more micrographs than
the round-3 fixture both stacks aced. --epoch-size scales the budget to
the host (the published 1000 steps/epoch is hours on a 1-core torch-CPU
host; the default here keeps each reference seed ~tens of minutes —
identical for both stacks either way).

The reference stack runs torch-CPU with torchvision's rotate/flips stubbed
by scipy equivalents (torchvision is not installed in this image; the stub
reproduces the same augmentation semantics the reference requests).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_compare.py
       [--seeds 3] [--skip-reference] [--easy]
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

RADIUS_DS = 14      # extraction radius at the downsampled scale
SCALE = 8
N_TRAIN = 8
N_TEST = 4
N_PART = 20
EPOCHS = 10
EPOCH_SIZE = 100
MINIBATCH = 256
UNITS = 32
BN = "on"
TRAIN_RADIUS = 3

# hardened-fixture difficulty (see topaz_tpu/utils/synthetic.py knobs).
# SIGNAL calibrated by tools/tune_fixture.py --calibrate (round 4):
# short-budget (3x50 step) reference training lands at AP 0.28 / 0.49 /
# 0.71 / 0.97 for signal 0.5 / 0.75 / 1.0 / 1.5 — and 1.0 even at
# signal 2.0 — so 0.8 puts the full published protocol mid-range
# (discriminating, not saturated). tests/test_quality_fixture.py pins
# the fixture statistics this choice produces.
SIGNAL = 0.8
MIN_SEP = 1.6
DEFOCUS_RANGE = (10000.0, 30000.0)


def make_dataset(tmp, seed, signal=None, min_sep=None):
    """CTF-fixture micrographs at the tutorial geometry, pre-downsampled
    and GMM-normalized (both stacks consume the same processed images).
    Per-micrograph defocus is drawn from DEFOCUS_RANGE (defocus spread,
    as in a real dataset).

    With --data-dir, datasets persist across invocations so a later
    reference-side run (hours on torch-CPU) consumes the IDENTICAL files
    an earlier ours-side run trained on — the seed pairing of the parity
    statistic depends on byte-identical inputs, not just the same rng
    seed (GMM normalization float details can differ across backends)."""
    from topaz_tpu.utils.synthetic import make_ctf_micrograph

    from topaz_tpu.io import mrc
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import normalize

    signal = SIGNAL if signal is None else signal
    min_sep = MIN_SEP if min_sep is None else min_sep
    rng = np.random.default_rng(seed)
    proc = os.path.join(tmp, f"proc{seed}")
    train_dir = os.path.join(proc, "train")
    test_dir = os.path.join(proc, "test")
    t_train = os.path.join(proc, "train.txt")
    t_test = os.path.join(proc, "test.txt")
    if all(os.path.exists(p) for p in (train_dir, test_dir, t_train,
                                       t_test)):
        print(f"# reusing dataset {proc}", file=sys.stderr, flush=True)
        return train_dir, t_train, test_dir, t_test
    os.makedirs(proc, exist_ok=True)
    rows_train, rows_test = [], []
    os.makedirs(train_dir), os.makedirs(test_dir)
    for i in range(N_TRAIN + N_TEST):
        defocus = rng.uniform(*DEFOCUS_RANGE)
        x, centers = make_ctf_micrograph(
            rng, n_particles=N_PART, signal=signal, min_sep=min_sep,
            defocus_A=defocus)
        small = np.asarray(downsample(x, SCALE))
        norm, _ = normalize(small)
        split_dir, rows = ((train_dir, rows_train) if i < N_TRAIN
                           else (test_dir, rows_test))
        name = f"mic{i}"
        mrc.write(os.path.join(split_dir, name + ".mrc"), norm)
        for cy, cx in centers:
            rows.append({"image_name": name, "x_coord": cx // SCALE,
                         "y_coord": cy // SCALE})
    t_train = os.path.join(proc, "train.txt")
    t_test = os.path.join(proc, "test.txt")
    pd.DataFrame(rows_train).to_csv(t_train, sep="\t", index=False)
    pd.DataFrame(rows_test).to_csv(t_test, sep="\t", index=False)
    return train_dir, t_train, test_dir, t_test


def eval_ap(picks: pd.DataFrame, targets_path: str, radius: int) -> float:
    from topaz_tpu.ops.metrics import average_precision, match_coordinates

    gt = pd.read_csv(targets_path, sep="\t")
    hits, scores, n_total = [], [], 0
    for name, g in gt.groupby("image_name"):
        p = picks[picks.image_name == name].sort_values(
            "score", ascending=False)
        assignment, _ = match_coordinates(
            g[["x_coord", "y_coord"]].values,
            p[["x_coord", "y_coord"]].values, radius)
        hits.append(assignment)
        scores.append(p["score"].values)
        n_total += len(g)
    return float(average_precision(np.concatenate(hits),
                                   np.concatenate(scores), N=n_total))


def run_ours(tmp, seed, train_dir, t_train):
    import types

    from topaz_tpu.training import train_from_args

    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=train_dir, train_targets=t_train,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=N_PART, pi=None, radius=TRAIN_RADIUS,
        method="GE-binomial",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=MINIBATCH, minibatch_balance=0.0625,
        epoch_size=EPOCH_SIZE, num_epochs=EPOCHS,
        pretrained=False, model="resnet8", units=UNITS, dropout=0.0, bn=BN,
        pooling=None, unit_scaling=2, ngf=32, patch_size=96,
        patch_padding=48,
        save_prefix=os.path.join(tmp, f"ours{seed}"),
        output=os.path.join(tmp, f"ours{seed}.tsv"),
        test_batch_size=1, seed=seed, dims=2,
    )
    t0 = time.time()
    train_from_args(args)
    wall = time.time() - t0
    # numeric epoch sort — lexically, epoch9 > epoch10 and the final
    # model would be the epoch-9 checkpoint
    ckpt = max(glob.glob(os.path.join(tmp, f"ours{seed}_epoch*.npz")),
               key=lambda p: int(p.rsplit("epoch", 1)[1].split(".")[0]))

    # extract picks from the test micrographs
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.nms import non_maximum_suppression
    from topaz_tpu.io.image import load_image

    spec, params, state = load_picker(ckpt)
    return spec, params, state, wall, ckpt


def picks_ours(spec, params, state, test_dir):
    from topaz_tpu.io.image import load_image
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.nms import non_maximum_suppression

    rows = []
    for p in sorted(glob.glob(os.path.join(test_dir, "*.mrc"))):
        img = np.asarray(load_image(p), np.float32)
        score, _ = apply_picker(spec, params, img[None], state=state,
                                dense=True)
        s, c = non_maximum_suppression(np.asarray(score)[0], RADIUS_DS,
                                       threshold=-6.0)
        name = os.path.splitext(os.path.basename(p))[0]
        for si, (xi, yi) in zip(s, c):
            rows.append({"image_name": name, "x_coord": xi, "y_coord": yi,
                         "score": si})
    return pd.DataFrame(rows)


def _stub_torchvision():
    """Minimal torchvision stand-in for the reference's augmentation calls
    (rotate/hflip/vflip on CHW tensors)."""
    import types

    import torch
    from scipy import ndimage

    def rotate(img, angle):
        # order=0: torchvision.transforms.functional.rotate defaults to
        # InterpolationMode.NEAREST — a bilinear stub would hand the
        # reference smoother (denoised) augmented crops than it really
        # trains on
        arr = img.numpy()
        out = ndimage.rotate(arr, angle, axes=(-1, -2), reshape=False,
                             order=0, mode="constant")
        return torch.from_numpy(np.ascontiguousarray(out))

    def hflip(img):
        return torch.from_numpy(np.ascontiguousarray(
            img.numpy()[..., ::-1]))

    def vflip(img):
        return torch.from_numpy(np.ascontiguousarray(
            img.numpy()[..., ::-1, :]))

    functional = types.SimpleNamespace(rotate=rotate, hflip=hflip,
                                       vflip=vflip)
    transforms = types.SimpleNamespace(functional=functional)
    tv = types.ModuleType("torchvision")
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms  # type: ignore
    sys.modules["torchvision.transforms.functional"] = functional  # type: ignore


def run_reference(tmp, seed, train_dir, t_train, test_dir):
    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 1)
    from topaz import training as ref_training
    from topaz.model.factory import get_feature_extractor
    from topaz.model.classifier import LinearClassifier

    feat = get_feature_extractor("resnet8", units=UNITS, dropout=0.0,
                                 bn=BN)
    model = LinearClassifier(feat)

    import types

    t0 = time.time()
    model = ref_training.train_model(
        model, train_dir, t_train, None, None,
        use_cuda=False, save_prefix=None,
        output=open(os.path.join(tmp, f"ref{seed}.tsv"), "w"),
        args=types.SimpleNamespace(
            describe=False, num_workers=0,
            format_="auto", image_ext="",
            k_fold=0, fold=0, cross_validation_seed=42,
            num_particles=N_PART, pi=None, radius=TRAIN_RADIUS,
            method="GE-binomial", slack=-1, autoencoder=0,
            l2=0.0, learning_rate=2e-4, natural=False,
            minibatch_size=MINIBATCH, minibatch_balance=0.0625,
            epoch_size=EPOCH_SIZE, num_epochs=EPOCHS,
            pretrained=False, model="resnet8", units=UNITS, dropout=0.0,
            bn=BN, pooling=None, unit_scaling=2, ngf=32,
            test_batch_size=1, dims=2,
        ),
        dims=2,
    )
    wall = time.time() - t0

    from topaz.algorithms import non_maximum_suppression as ref_nms

    model.eval()
    model.fill()
    rows = []
    from topaz.utils.data.loader import load_image as ref_load

    for p in sorted(glob.glob(os.path.join(test_dir, "*.mrc"))):
        img = np.asarray(ref_load(p, make_image=False, return_header=False),
                         dtype=np.float32)
        with torch.no_grad():
            score = model(torch.from_numpy(img)[None, None]).numpy()[0, 0]
        s, c = ref_nms(score, RADIUS_DS, threshold=-6.0)
        name = os.path.splitext(os.path.basename(p))[0]
        for si, (xi, yi) in zip(s, c):
            rows.append({"image_name": name, "x_coord": xi, "y_coord": yi,
                         "score": si})
    return pd.DataFrame(rows), wall


def main():
    global EPOCHS, EPOCH_SIZE, MINIBATCH, UNITS, BN, SIGNAL, MIN_SEP
    global N_TRAIN, N_TEST, N_PART
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=EPOCHS,
                    help="training epochs (published protocol: 10)")
    ap.add_argument("--epoch-size", type=int, default=EPOCH_SIZE,
                    help="steps per epoch (published default is 1000; "
                         "scaled down so a torch-CPU seed stays ~tens of "
                         "minutes on this host — identical both stacks)")
    ap.add_argument("--signal", type=float, default=SIGNAL,
                    help="fixture CTF-signal amplitude (lower = harder; "
                         "tools/tune_fixture.py calibrates this)")
    ap.add_argument("--min-sep", type=float, default=MIN_SEP,
                    help="fixture center exclusion in particle radii "
                         "(lower = more crowding)")
    ap.add_argument("--easy", action="store_true",
                    help="the round-3 saturating configuration (signal "
                         "10, no crowding/defocus spread, u16 batch 64) "
                         "for the historical record")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--skip-ours", action="store_true",
                    help="reference side only (extend the seed table "
                         "without re-running ours)")
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (seeds run [seed-start, "
                         "seed-start+--seeds)); per-seed datasets are "
                         "deterministic so tables extend consistently")
    ap.add_argument("--data-dir", default=None,
                    help="persistent dataset directory (created on first "
                         "use, reused byte-identical afterwards) so "
                         "ours/reference runs hours apart stay seed-PAIRED "
                         "on the same files")
    ap.add_argument("--keep-checkpoint", default=None, metavar="DIR",
                    help="copy each ours-side final checkpoint here "
                         "(fixture-trained pickers for bench_fast_quality)")
    ap.add_argument("--jax-cpu", action="store_true",
                    help="pin JAX to CPU (dataset prep / metrics) so a "
                         "reference-only run does not hold the exclusive "
                         "TPU grant for hours")
    opts = ap.parse_args()
    if opts.jax_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    EPOCHS = opts.epochs
    EPOCH_SIZE = opts.epoch_size
    SIGNAL, MIN_SEP = opts.signal, opts.min_sep
    if opts.easy:
        SIGNAL, MIN_SEP = 10.0, 2.2
        globals()["DEFOCUS_RANGE"] = (15000.0, 15000.0)
        MINIBATCH, UNITS, BN = 64, 16, "off"
        N_TRAIN, N_TEST, N_PART = 4, 2, 10

    results = {"ours": [], "reference": [], "fixture":
               f"CTF-modulated, signal={SIGNAL} min_sep={MIN_SEP} "
               f"defocus={globals()['DEFOCUS_RANGE']} "
               "(topaz_tpu/utils/synthetic.make_ctf_micrograph)",
               "protocol": f"{N_TRAIN} train + {N_TEST} test micrographs, "
               f"{N_PART} particles each, 8x downsample, GE-binomial, "
               f"resnet8 u{UNITS} bn={BN}, batch {MINIBATCH} "
               f"balance 0.0625 lr 2e-4 r={TRAIN_RADIUS}, "
               f"{EPOCHS}x{EPOCH_SIZE} steps, eval r={RADIUS_DS}"}
    import contextlib
    import shutil

    if opts.data_dir:
        os.makedirs(opts.data_dir, exist_ok=True)
        tmp_ctx = contextlib.nullcontext(opts.data_dir)
    else:
        tmp_ctx = tempfile.TemporaryDirectory(prefix="topaz_quality_")
    with tmp_ctx as tmp:
        for seed in range(opts.seed_start, opts.seed_start + opts.seeds):
            train_dir, t_train, test_dir, t_test = make_dataset(tmp, seed)
            if not opts.skip_ours:
                spec, params, state, wall, ckpt = run_ours(
                    tmp, seed, train_dir, t_train)
                if opts.keep_checkpoint:
                    os.makedirs(opts.keep_checkpoint, exist_ok=True)
                    shutil.copy(ckpt, os.path.join(
                        opts.keep_checkpoint,
                        f"fixture_resnet8_seed{seed}.npz"))
                picks = picks_ours(spec, params, state, test_dir)
                ap_ours = eval_ap(picks, t_test, RADIUS_DS)
                results["ours"].append(
                    {"seed": seed, "ap": round(ap_ours, 4),
                     "train_sec": round(wall, 1)})
                print(f"# ours seed {seed}: AP={ap_ours:.4f} ({wall:.0f}s)",
                      file=sys.stderr, flush=True)
            if not opts.skip_reference:
                ref_picks, ref_wall = run_reference(tmp, seed, train_dir,
                                                    t_train, test_dir)
                ap_ref = eval_ap(ref_picks, t_test, RADIUS_DS)
                results["reference"].append(
                    {"seed": seed, "ap": round(ap_ref, 4),
                     "train_sec": round(ref_wall, 1)})
                print(f"# reference seed {seed}: AP={ap_ref:.4f} "
                      f"({ref_wall:.0f}s)", file=sys.stderr, flush=True)
    if results["ours"] and results["reference"]:
        results["summary"] = paired_summary(results["ours"],
                                            results["reference"])
    print(json.dumps(results))


def paired_summary(ours, reference):
    """Seed-paired delta: both stacks train on the identical per-seed
    dataset, so the parity statistic is the mean per-seed difference with
    its paired SE — ~2.5x sharper than the unpaired mean±sigma rounds 2-4
    quoted (VERDICT r4 weak #5)."""
    ref_by_seed = {r["seed"]: r["ap"] for r in reference}
    pairs = [(o["ap"], ref_by_seed[o["seed"]]) for o in ours
             if o["seed"] in ref_by_seed]
    out = {
        "ours_mean_ap": round(float(np.mean([o["ap"] for o in ours])), 4),
        "ours_std_ap": round(float(np.std([o["ap"] for o in ours],
                                          ddof=1)), 4),
        "reference_mean_ap": round(
            float(np.mean([r["ap"] for r in reference])), 4),
        "reference_std_ap": round(
            float(np.std([r["ap"] for r in reference], ddof=1)), 4),
    }
    if len(pairs) >= 2:
        deltas = np.array([a - b for a, b in pairs])
        out["paired_delta_ap"] = round(float(deltas.mean()), 4)
        out["paired_delta_se"] = round(
            float(deltas.std(ddof=1) / np.sqrt(len(deltas))), 4)
        out["paired_deltas"] = [round(float(d), 4) for d in deltas]
        out["n_pairs"] = len(pairs)
    return out


if __name__ == "__main__":
    main()
