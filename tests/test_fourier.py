import numpy as np
import pytest

from topaz_tpu.ops.fourier import downsample, downsample_3d, lowpass

from reference_oracle import ref_module, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("shape,factor", [((64, 64), 2), ((100, 120), 4), ((101, 67), 3)])
def test_downsample_matches_reference(rng, shape, factor):
    ref_image = ref_module("topaz.utils.image")
    x = rng.normal(size=shape).astype(np.float32)
    ours = np.asarray(downsample(x, factor))
    theirs = ref_image.downsample(x, factor)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_downsample_batched(rng):
    x = rng.normal(size=(3, 64, 64)).astype(np.float32)
    batched = np.asarray(downsample(x, 2))
    for i in range(3):
        single = np.asarray(downsample(x[i], 2))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_downsample_identity(rng):
    x = rng.normal(size=(32, 32)).astype(np.float32)
    y = np.asarray(downsample(x, 1))
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5)


def test_downsample_3d_constant():
    x = np.full((16, 16, 16), 3.25, dtype=np.float32)
    y = np.asarray(downsample_3d(x, 2))
    assert y.shape == (8, 8, 8)
    np.testing.assert_allclose(y, 3.25, rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_lowpass_matches_reference(rng):
    ref_denoise = ref_module("topaz.denoise")
    x = rng.normal(size=(48, 56)).astype(np.float32)
    ours = np.asarray(lowpass(x, 2))
    theirs = ref_denoise.lowpass(x, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_downsample_numpy_matches_device(rng):
    """Host prefetch-thread downsample is the same arithmetic as the
    device op (pipeline host_downsample mode)."""
    from topaz_tpu.ops.fourier import downsample, downsample_numpy

    for shape, factor in [((128, 96), 4), ((100, 100), 3), ((64, 64), 1)]:
        x = rng.normal(0, 1, shape).astype(np.float32)
        a = np.asarray(downsample(x, factor))
        b = downsample_numpy(x, factor)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
