"""Checkpoint/resume: continue training from a saved .npz checkpoint
(reference resumes from .sav via --model, training.py:301-304)."""

import os
import types

import numpy as np
import pandas as pd


def _args(tmp_path, img_dir, targets_path, **over):
    base = dict(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=img_dir, train_targets=targets_path,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="PN",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=8, minibatch_balance=0.25,
        epoch_size=2, num_epochs=1,
        pretrained=False, model="resnet8", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=str(tmp_path / "ckpt" / "m"), output=None,
        test_batch_size=1, seed=0, dims=2,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def test_resume_from_checkpoint(tmp_path, rng, capsys):
    from test_training import _make_synthetic_dataset
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    train_from_args(_args(tmp_path, img_dir, targets_path))
    ckpt = str(tmp_path / "ckpt" / "m_epoch1.npz")
    assert os.path.exists(ckpt)
    _, params1, _ = load_picker(ckpt)

    # resume: --model <checkpoint>; params must differ after more steps
    train_from_args(_args(tmp_path, img_dir, targets_path, model=ckpt,
                          save_prefix=str(tmp_path / "ckpt2" / "m")))
    ckpt2 = str(tmp_path / "ckpt2" / "m_epoch1.npz")
    _, params2, _ = load_picker(ckpt2)
    w1 = params1["features"]["0"]["conv_w"]
    w2 = params2["features"]["0"]["conv_w"]
    assert w1.shape == w2.shape
    assert not np.allclose(w1, w2)
