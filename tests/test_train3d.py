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
    step = make_train_step(spec, loss_fn, opt, n_pos=2)
    tstate, metrics = step(tstate, jnp.asarray(crops))
    assert np.isfinite(float(metrics["loss"]))

    # positives expand to a radius-2 sphere, so the planted dark pixel lies
    # within 2 of each positive crop center
    half = spec.width // 2
    for c in crops[:2]:
        nb = c[half - 2 : half + 3, half - 2 : half + 3, half - 2 : half + 3]
        assert nb.min() < -3
