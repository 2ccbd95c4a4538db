"""Parity of the extra architecture families vs torch with random weights.
(These are dead code in the reference — unreachable from its factory — so
random-weight forward parity is the only available oracle.)"""

import numpy as np
import pytest

from reference_oracle import ref_module, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


def _convert(model):
    from topaz_tpu.models.extras import extras_params_from_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return extras_params_from_state_dict(sd)


def _compare(ref_model, apply_fn, x, **kw):
    import torch
    import jax.numpy as jnp

    ref_model.eval()
    with torch.no_grad():
        theirs = ref_model(torch.from_numpy(x)[None, None]).numpy()[0]
    params = _convert(ref_model)
    ours = np.asarray(apply_fn(params, jnp.asarray(x)[None, :, :, None],
                               precision="highest", **kw))
    # ours NHWC -> compare against torch NCHW
    ours = np.moveaxis(ours[0], -1, 0)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_multiscale_densenet(rng):
    import torch

    ref = ref_module("topaz.model.features.densenet")
    from topaz_tpu.models.extras import apply_multiscale_densenet

    torch.manual_seed(0)
    m = ref.MultiscaleDenseNet(base_units=8, ng=6, num_blocks=2)
    x = rng.normal(size=(80, 84)).astype(np.float32)
    _compare(m, lambda p, x, **kw: apply_multiscale_densenet(p, x, num_blocks=2, **kw), x)


def test_densenet(rng):
    import torch

    ref = ref_module("topaz.model.features.densenet")
    from topaz_tpu.models.extras import apply_densenet, densenet_width

    torch.manual_seed(1)
    m = ref.DenseNet(init_units=8, ng=4, bn_size=2, fc_units=16, num_layers=3,
                     bn=False)
    assert m.width == densenet_width(3)
    w = m.width
    x = rng.normal(size=(w + 6, w + 10)).astype(np.float32)
    _compare(m, lambda p, x, **kw: apply_densenet(p, x, num_layers=3, **kw), x)


@pytest.mark.parametrize("arch,builder", [
    ("rmsnet7", lambda ref: ref.RMSNet7(units=[8, 8, 12, 12, 16])),
    ("rmsnet10", lambda ref: ref.RMSNet10(units=[8, 8, 12, 12, 16])),
])
def test_rmsnets(rng, arch, builder):
    import torch

    ref = ref_module("topaz.model.features.msnet")
    from topaz_tpu.models.extras import apply_rmsnet

    torch.manual_seed(2)
    m = builder(ref)
    x = rng.normal(size=(m.width + 8, m.width + 4)).astype(np.float32)
    _compare(m, lambda p, x, **kw: apply_rmsnet(p, x, arch, **kw), x)


def test_pyramidnet(rng):
    import torch

    ref = ref_module("topaz.model.features.msnet")
    from topaz_tpu.models.extras import apply_pyramidnet, pyramidnet_width

    torch.manual_seed(3)
    m = ref.PyramidNet(base_units=8, scales=[2, 4, 8])
    assert m.width == pyramidnet_width((2, 4, 8))
    x = rng.normal(size=(m.width + 12, m.width + 6)).astype(np.float32)
    _compare(m, lambda p, x, **kw: apply_pyramidnet(p, x, scales=(2, 4, 8), **kw), x)
