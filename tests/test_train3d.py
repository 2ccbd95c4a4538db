"""3D picker training path: sampler, strided 3D forward, one train step.
(The reference supports 3D picker training through its library API,
topaz/training.py dims=3; its CLI is 2D-only.)"""

import numpy as np
import pandas as pd
import pytest


def test_3d_sampler_and_train_step(tmp_path, rng):
    import jax.numpy as jnp

    from topaz_tpu.io import mrc
    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.train.data import CropSampler
    from topaz_tpu.train.methods import make_loss_fn
    from topaz_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    # small synthetic tomogram with labeled points
    vol = rng.normal(0, 1, (48, 64, 64)).astype(np.float32)
    rows = []
    for _ in range(10):
        z, y, x = rng.integers(10, 38), rng.integers(10, 54), rng.integers(10, 54)
        vol[z, y, x] -= 4
        rows.append({"image_name": "tomo", "x_coord": x, "y_coord": y,
                     "z_coord": z})
    mrc.write(str(tmp_path / "tomo.mrc"), vol)
    targets = pd.DataFrame(rows)

    spec, params, state = new_picker("conv31", units=4, dims=3, seed=0)
    sampler = CropSampler([str(tmp_path / "tomo.mrc")], targets,
                          crop_size=spec.width, radius=2, split="pn",
                          rotate=False, dims=3)
    crops, labels = sampler.sample_batch(8, 2)
    assert crops.shape == (8, spec.width, spec.width, spec.width)
    assert np.isfinite(crops).all()

    loss_fn, header, split = make_loss_fn("PN", 0.05)
    opt = make_optimizer(1e-3)
    tstate = init_train_state(spec, params, state, opt, 0.05, seed=0)
    step = make_train_step(spec, loss_fn, opt)
    tstate, metrics = step(tstate, jnp.asarray(crops), jnp.asarray(labels))
    assert np.isfinite(float(metrics["loss"]))

    # positives expand to a radius-2 sphere, so the planted dark pixel lies
    # within 2 of each positive crop center
    half = spec.width // 2
    for c in crops[:2]:
        nb = c[half - 2 : half + 3, half - 2 : half + 3, half - 2 : half + 3]
        assert nb.min() < -3


def test_augment_crops_3d_unit(rng):
    """augment_crops_3d: exact center crop with augmentation off; shape,
    finiteness, and center-voxel preservation with it on (rotation is
    about each slice's center and all crop sizes are odd here, so flips
    and rotation both fix the center voxel)."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.train.augment import augment_crops_3d

    crops = jnp.asarray(rng.normal(size=(4, 9, 13, 13)).astype(np.float32))

    out = augment_crops_3d(crops, jax.random.PRNGKey(0), 9,
                           rotate=False, flip=False)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(crops[:, :, 2:11, 2:11]))

    out = augment_crops_3d(crops, jax.random.PRNGKey(1), 9,
                           rotate=True, flip=True)
    assert out.shape == (4, 9, 9, 9)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[:, 4, 4, 4],
                               np.asarray(crops)[:, 4, 6, 6], rtol=1e-6)


def test_3d_augmented_sampler_and_train_step(tmp_path, rng):
    """rotate=True + dims=3: the sampler gathers xy-oversized (z-exact)
    windows and the train step augments them on device to finite loss."""
    import jax.numpy as jnp

    from topaz_tpu.io import mrc
    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.train.data import CropSampler
    from topaz_tpu.train.methods import make_loss_fn
    from topaz_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    vol = rng.normal(0, 1, (48, 64, 64)).astype(np.float32)
    rows = []
    for _ in range(10):
        z, y, x = rng.integers(10, 38), rng.integers(10, 54), rng.integers(10, 54)
        vol[z, y, x] -= 4
        rows.append({"image_name": "tomo", "x_coord": x, "y_coord": y,
                     "z_coord": z})
    mrc.write(str(tmp_path / "tomo.mrc"), vol)
    targets = pd.DataFrame(rows)

    spec, params, state = new_picker("conv31", units=2, dims=3, seed=0)
    sampler = CropSampler([str(tmp_path / "tomo.mrc")], targets,
                          crop_size=spec.width, radius=2, split="pn",
                          rotate=True, dims=3)
    over = int(np.ceil(spec.width * np.sqrt(2)))
    over += over % 2 == 0
    crops, labels = sampler.sample_batch(8, 2)
    assert crops.shape == (8, spec.width, over, over)
    assert np.isfinite(crops).all()

    loss_fn, header, split = make_loss_fn("PN", 0.05)
    opt = make_optimizer(1e-3)
    tstate = init_train_state(spec, params, state, opt, 0.05, seed=0)
    step = make_train_step(spec, loss_fn, opt)
    tstate, metrics = step(tstate, jnp.asarray(crops), jnp.asarray(labels))
    assert np.isfinite(float(metrics["loss"]))


def test_3d_train_from_args_with_augmentation(tmp_path, rng):
    """--augment-3d wiring: train_from_args(dims=3, augment3d=True) runs
    the oversized-gather + on-device-augment path end to end, writing
    finite losses and a loadable checkpoint."""
    import glob
    import types

    import pandas as pd

    from topaz_tpu.io import mrc
    from topaz_tpu.training import train_from_args

    tomo_dir = tmp_path / "tomos"
    tomo_dir.mkdir()
    rows = []
    vol = rng.normal(0, 1, (40, 56, 56)).astype(np.float32)
    for _ in range(8):
        z, y, x = rng.integers(8, 32), rng.integers(8, 48), rng.integers(8, 48)
        vol[z - 1 : z + 2, y - 1 : y + 2, x - 1 : x + 2] -= 3
        rows.append({"image_name": "tomo0", "x_coord": x, "y_coord": y,
                     "z_coord": z})
    mrc.write(str(tomo_dir / "tomo0.mrc"), vol)
    targets = tmp_path / "p3d.txt"
    pd.DataFrame(rows).to_csv(targets, sep="\t", index=False)

    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=str(tomo_dir), train_targets=str(targets),
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=-1, pi=0.02, radius=2, method="PN",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=1e-3,
        natural=False, minibatch_size=8, minibatch_balance=0.25,
        epoch_size=3, num_epochs=1,
        pretrained=False, model="conv31", units=2, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=str(tmp_path / "model3d"), output=str(tmp_path / "log3d.tsv"),
        test_batch_size=1, seed=0, dims=3, augment3d=True,
    )
    train_from_args(args)

    log = pd.read_csv(tmp_path / "log3d.tsv", sep="\t")
    assert np.isfinite(log["loss"].values).all()
    assert glob.glob(str(tmp_path / "model3d_epoch*.npz"))
