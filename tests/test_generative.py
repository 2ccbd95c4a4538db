import numpy as np
import pytest
import types

from reference_oracle import ref_module, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_conv_generator_parity(rng):
    """Our transposed-conv decoder matches torch ConvGenerator in train mode
    (batch-stat BN) with converted weights."""
    import torch

    ref_gen = ref_module("topaz.model.generative")
    from topaz_tpu.models.convert import _to_hwio
    from topaz_tpu.models.generative import (apply_generator, generator_width,
                                             init_generator, layer_spec_for)

    torch.manual_seed(0)
    nin, units, depth = 12, 4, 2
    m = ref_gen.ConvGenerator(nin, units=units, depth=depth)
    m.train()
    assert m.width == generator_width(depth)

    # map torch Sequential keys (layers.{0,3,6,...} convT, layers.{1,4,...} bn)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {}
    conv_i = 0
    for tidx in range(0, 3 * (depth + 1) + 1, 3):
        params[str(conv_i)] = {"w": _to_hwio(sd[f"layers.{tidx}.weight"])}
        if f"layers.{tidx + 1}.weight" in sd:
            params[f"bn{conv_i}"] = {
                "scale": sd[f"layers.{tidx + 1}.weight"],
                "bias": sd[f"layers.{tidx + 1}.bias"],
            }
        conv_i += 1

    z = rng.normal(size=(3, nin)).astype(np.float32)
    with torch.no_grad():
        theirs = m(torch.from_numpy(z)).numpy()[:, 0]

    import jax.numpy as jnp

    ours = np.asarray(apply_generator(params, jnp.asarray(z), train=True,
                                      precision="highest",
                                      layer_spec=layer_spec_for(depth)))[..., 0]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_training_with_autoencoder(tmp_path, rng):
    """GE-binomial + autoencoder regularizer trains; recon_error column in
    the TSV output."""
    import pandas as pd

    from test_training import _make_synthetic_dataset
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)
    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=img_dir, train_targets=targets_path,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="GE-binomial",
        slack=-1, autoencoder=0.1, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=8, minibatch_balance=0.25,
        epoch_size=2, num_epochs=1,
        pretrained=False, model="resnet8", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=4, patch_size=96, patch_padding=48,
        save_prefix=None, output=str(tmp_path / "log.tsv"),
        test_batch_size=1, seed=0, dims=2,
    )
    train_from_args(args)
    log = pd.read_csv(tmp_path / "log.tsv", sep="\t")
    assert "recon_error" in log.columns
    assert np.isfinite(log.recon_error.astype(float)).all()
    assert np.isfinite(log.loss.astype(float)).all()


def test_conv_transpose_init_scale():
    """ConvTranspose init bound uses fan_in = cout*k*k (torch semantics:
    weight.size(1) is the OUTPUT channel axis for transposed convs)."""
    import jax

    from topaz_tpu.models.generative import init_generator

    params, _ = init_generator(16, jax.random.PRNGKey(0), units=8, depth=2)
    w0 = np.asarray(params["0"]["w"])  # (k, k, cout, cin) = (4, 4, 32, 16)
    k, _, cout, cin = w0.shape[0], w0.shape[1], w0.shape[2], w0.shape[3]
    bound = 1.0 / np.sqrt(cout * k * k)
    assert np.abs(w0).max() <= bound + 1e-7
    # and it actually fills the range (not the tighter cin-based bound when
    # cin > cout, nor a degenerate all-small init)
    assert np.abs(w0).max() > 0.5 * bound
