import numpy as np
import pytest

from reference_oracle import ref_module, reference_available


def _synthetic_scaled_images(rng, n_images=4):
    """Images drawn from a 2-component mixture with per-image scales."""
    true_scales = np.array([0.8, 1.0, 1.2, 1.5])[:n_images]
    X = []
    for s in true_scales:
        comp = rng.random((48, 48)) < 0.3
        x = np.where(comp, rng.normal(4.0, 0.3, (48, 48)),
                     rng.normal(1.0, 0.3, (48, 48)))
        X.append((x * s).astype(np.float32))
    return X, true_scales


def test_scaled_gmm_recovers_scales(rng):
    from topaz_tpu.transform import ScaledGaussianMixture

    X, true_scales = _synthetic_scaled_images(rng)
    sgm = ScaledGaussianMixture(ncomponents=2)
    scales, probas = sgm.fit(X, niters=50, random=np.random.RandomState(0))
    # relative scales recovered up to a global factor
    ratio = scales / true_scales
    assert np.std(ratio / ratio.mean()) < 0.05
    # components separated
    assert abs(sgm.means.max() - sgm.means.min()) > 1.0


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_scaled_gmm_matches_reference(rng):
    ref_mod = ref_module("topaz.transform.scaled_gaussian_mixture")
    from topaz_tpu.transform import ScaledGaussianMixture

    X, _ = _synthetic_scaled_images(rng)
    ours = ScaledGaussianMixture(ncomponents=2)
    s1, _ = ours.fit(X, niters=20, random=np.random.RandomState(1))
    theirs = ref_mod.ScaledGaussianMixture(ncomponents=2)
    s2, _ = theirs.fit(X, niters=20, random=np.random.RandomState(1))
    np.testing.assert_allclose(s1, s2, rtol=1e-3)
    np.testing.assert_allclose(np.sort(ours.means), np.sort(theirs.means),
                               rtol=1e-3)


def test_predict_helpers(rng):
    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.predict import batches, score

    xs = [rng.normal(size=(80, 80)).astype(np.float32) for _ in range(3)]
    stacked = list(batches(xs, batch_size=2))
    assert [b.shape[0] for b in stacked] == [2, 1]

    spec, params, state = new_picker("resnet8", units=4, seed=0)
    maps = score(spec, params, state, xs, batch_size=2)
    assert len(maps) == 3
    assert maps[0].shape == (80, 80)
