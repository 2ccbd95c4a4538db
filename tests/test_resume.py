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


def _leaves(state):
    import jax

    return jax.tree_util.tree_leaves(state)


def test_full_state_resume_bit_exact(tmp_path, rng):
    """--resume restores the FULL training state (optimizer, method state,
    jax rng, sampler stream): 1 epoch + resume for epoch 2 reproduces an
    uninterrupted 2-epoch run bit-exactly (extension; the reference's
    resume is weights-only, topaz/training.py:301-304)."""
    from test_training import _make_synthetic_dataset
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    # uninterrupted 2-epoch run
    _, s_straight = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=2, epoch_size=3,
              save_prefix=str(tmp_path / "a" / "m")))

    # 1 epoch, then resume for the second
    _, s1 = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=1, epoch_size=3,
              save_prefix=str(tmp_path / "b" / "m")))
    state_file = str(tmp_path / "b" / "m_train_state.npz")
    assert os.path.exists(state_file)
    _, s_resumed = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=2, epoch_size=3,
              save_prefix=str(tmp_path / "b" / "m"), resume=state_file))

    for a, b in zip(_leaves(s_straight), _leaves(s_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mid_epoch_resume_after_crash(tmp_path, rng, monkeypatch):
    """--save-interval-steps checkpoints mid-epoch; after a simulated crash
    the resumed run consumes the exact remaining batches and matches an
    uninterrupted run bit-exactly."""
    import pytest

    import topaz_tpu.training as training_mod
    from test_training import _make_synthetic_dataset
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    # uninterrupted single epoch of 4 steps
    _, s_straight = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=1, epoch_size=4,
              save_prefix=str(tmp_path / "c" / "m")))

    # crashing run: the sampler dies on its 3rd batch; a step-2 state file
    # survives (save_interval_steps=2)
    real_sampler = training_mod.CropSampler

    class CrashingSampler(real_sampler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._calls = 0

        def sample_batch(self, *a, **k):
            self._calls += 1
            if self._calls > 2:
                raise RuntimeError("simulated crash")
            return super().sample_batch(*a, **k)

    monkeypatch.setattr(training_mod, "CropSampler", CrashingSampler)
    with pytest.raises(RuntimeError, match="simulated crash"):
        train_from_args(
            _args(tmp_path, img_dir, targets_path, num_epochs=1,
                  epoch_size=4, save_interval_steps=2,
                  save_prefix=str(tmp_path / "d" / "m")))
    monkeypatch.setattr(training_mod, "CropSampler", real_sampler)

    state_file = str(tmp_path / "d" / "m_train_state.npz")
    assert os.path.exists(state_file)
    _, s_resumed = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=1, epoch_size=4,
              save_prefix=str(tmp_path / "d" / "m"), resume=state_file))

    for a, b in zip(_leaves(s_straight), _leaves(s_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_elastic_resume_across_mesh_sizes(tmp_path, rng):
    """Elastic resume: a full-state checkpoint written by an 8-device
    data-parallel run (-d -2) resumes on a SINGLE device, and vice versa.
    Checkpoints store replicated numpy leaves, so the state is
    mesh-shape-agnostic by construction; this proves it end-to-end. The
    resumed run must match an uninterrupted single-device run to float
    tolerance (the only divergence is the gradient-reduction order of the
    mesh epoch). Extension over the reference, which has no distributed
    training at all (SURVEY section 5, elastic/fault tolerance)."""
    import jax
    from test_training import _make_synthetic_dataset
    from topaz_tpu.training import train_from_args

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    # uninterrupted 2-epoch single-device baseline
    _, s_straight = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=2, epoch_size=3,
              save_prefix=str(tmp_path / "base" / "m")))

    # mesh epoch 1 (-d -2, batch 8 over 8 devices) -> resume epoch 2 on one
    _, _ = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=1, epoch_size=3,
              device=-2, save_prefix=str(tmp_path / "mesh" / "m")))
    state_file = str(tmp_path / "mesh" / "m_train_state.npz")
    assert os.path.exists(state_file)
    _, s_shrunk = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=2, epoch_size=3,
              device=0, save_prefix=str(tmp_path / "mesh" / "m"),
              resume=state_file))

    # single-device epoch 1 -> resume epoch 2 on the mesh
    _, _ = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=1, epoch_size=3,
              save_prefix=str(tmp_path / "grow" / "m")))
    _, s_grown = train_from_args(
        _args(tmp_path, img_dir, targets_path, num_epochs=2, epoch_size=3,
              device=-2, save_prefix=str(tmp_path / "grow" / "m"),
              resume=str(tmp_path / "grow" / "m_train_state.npz")))

    for s_other in (s_shrunk, s_grown):
        for a, b in zip(_leaves(s_straight), _leaves(s_other)):
            np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                       np.asarray(b, dtype=np.float64),
                                       rtol=2e-4, atol=1e-6)


def test_train_cli_resume_flags_parse():
    from topaz_tpu.cli.commands import train as train_cmd

    p = train_cmd.add_arguments()
    a = p.parse_args(["--train-images", "x", "--train-targets", "y",
                      "--resume", "m_train_state.npz",
                      "--save-interval-steps", "50"])
    assert a.resume == "m_train_state.npz"
    assert a.save_interval_steps == 50
