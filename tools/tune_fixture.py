#!/usr/bin/env python
"""Calibrate the hardened CTF fixture's difficulty (VERDICT r3 item 1).

Two facilities:

1. ``fixture_stats(signal, min_sep)`` — deterministic contrast/crowding
   statistics of the generated fixture. tests/test_quality_fixture.py
   pins these so the AP table recorded in PARITY.md cannot silently
   drift from the fixture that produced it (regenerating the fixture
   with different statistics fails the band test).

   (A pretrained-model AP proxy was tried first and rejected: the
   bundled resnet8_u32 — trained on real EMPIAR data — scores the
   synthetic solid-sphere fixture poorly (AP ~0.1) even where
   from-scratch training reaches 1.0, so its AP says nothing about
   trainable difficulty.)

2. ``--calibrate`` — short published-protocol reference training runs
   (torch CPU) at each ``--signals`` value, reporting the reference's
   from-scratch AP per difficulty. The expensive ground truth, used
   once to choose ``quality_compare.SIGNAL`` such that the reference
   lands at AP 0.6-0.9 (discriminating, not saturated).

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/tune_fixture.py
  python tools/tune_fixture.py --calibrate --signals 2.0,3.0 \
      --epochs 3 --epoch-size 50
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALE = 8
RADIUS = 14


def fixture_stats(signal: float, min_sep: float, n_part: int = 20,
                  defocus_A: float = 20000.0, seed: int = 0) -> dict:
    """Deterministic difficulty statistics of one fixture micrograph.

    The same rng path is replayed three times with component amplitudes
    zeroed (the generator draws centers and all noise fields in a fixed
    order), isolating signal and noise exactly.
    """
    from topaz_tpu.utils.synthetic import make_ctf_micrograph

    kw = dict(n_particles=n_part, min_sep=min_sep, defocus_A=defocus_A)
    full, centers = make_ctf_micrograph(
        np.random.default_rng(seed), signal=signal, **kw)
    sig_only, _ = make_ctf_micrograph(
        np.random.default_rng(seed), signal=signal, white=0.0, pink=0.0,
        **kw)
    noise_only, _ = make_ctf_micrograph(
        np.random.default_rng(seed), signal=0.0, **kw)
    c = np.asarray(centers, np.float64)
    d = np.sqrt(((c[:, None] - c[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    nn = d.min(axis=1)
    return {
        "snr": float(sig_only.std() / max(noise_only.std(), 1e-12)),
        "n_particles": len(centers),
        "nn_dist_over_radius": float(nn.mean() / 112.0),
        "image_std": float(full.std()),
    }


def calibrate(signals, seeds, opts):
    """Short reference-training run per signal (torch CPU, published
    protocol at a reduced budget); prints reference AP per difficulty."""
    import tempfile

    import quality_compare as qc

    qc.EPOCHS = opts.epochs
    qc.EPOCH_SIZE = opts.epoch_size
    out = {}
    for sig in signals:
        qc.SIGNAL = sig
        aps = []
        with tempfile.TemporaryDirectory(prefix="topaz_tune_") as tmp:
            for seed in range(seeds):
                train_dir, t_train, test_dir, t_test = qc.make_dataset(
                    tmp, seed, signal=sig, min_sep=opts.min_sep)
                picks, wall = qc.run_reference(tmp, seed, train_dir,
                                               t_train, test_dir)
                ap_val = qc.eval_ap(picks, t_test, qc.RADIUS_DS)
                aps.append(round(ap_val, 4))
                print(f"# signal {sig:g} seed {seed}: reference AP "
                      f"{ap_val:.4f} ({wall:.0f}s)", file=sys.stderr,
                      flush=True)
        out[f"signal_{sig:g}"] = aps
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--signals", default="2.0,2.5,3.0,4.0")
    ap.add_argument("--min-sep", type=float, default=1.6)
    ap.add_argument("--particles", type=int, default=20)
    ap.add_argument("--calibrate", action="store_true",
                    help="run short reference-training probes per signal "
                         "(torch CPU, expensive) instead of just stats")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--epoch-size", type=int, default=50)
    opts = ap.parse_args()

    signals = [float(s) for s in opts.signals.split(",")]
    stats = {}
    for sig in signals:
        st = fixture_stats(sig, opts.min_sep, opts.particles)
        stats[f"signal_{sig:g}"] = {k: round(v, 4) if isinstance(v, float)
                                    else v for k, v in st.items()}
        print(f"# signal {sig:g}: {st}", file=sys.stderr, flush=True)
    result = {"min_sep": opts.min_sep, "particles": opts.particles,
              "stats": stats}
    if opts.calibrate:
        result["reference_ap"] = calibrate(signals, opts.seeds, opts)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
