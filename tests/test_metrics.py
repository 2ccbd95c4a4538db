import numpy as np
import pytest

from topaz_tpu.ops.metrics import (average_precision, match_coordinates,
                                   precision_recall_curve)

from reference_oracle import ref_module, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_average_precision_matches_reference(rng):
    ref = ref_module("topaz.metrics")
    for trial in range(3):
        n = 200
        target = (rng.random(n) < 0.3).astype(np.float32)
        pred = rng.normal(size=n).astype(np.float32)
        # inject score ties to exercise the bucketing
        pred[::7] = pred[0]
        assert np.isclose(average_precision(target, pred),
                          ref.average_precision(target.copy(), pred.copy()))
        assert np.isclose(average_precision(target, pred, N=80),
                          ref.average_precision(target.copy(), pred.copy(), N=80))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_prc_matches_reference(rng):
    ref = ref_module("topaz.metrics")
    n = 150
    target = (rng.random(n) < 0.4).astype(np.float32)
    pred = rng.normal(size=n).astype(np.float32)
    pr, re, th, ap = precision_recall_curve(target, pred)
    rpr, rre, rth, rap = ref.precision_recall_curve(target.copy(), pred.copy())
    np.testing.assert_allclose(pr, rpr)
    np.testing.assert_allclose(re, rre)
    np.testing.assert_allclose(th, rth)
    assert np.isclose(ap, rap)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_match_coordinates_matches_reference(rng):
    ref = ref_module("topaz.algorithms")
    targets = rng.uniform(0, 100, (20, 2))
    preds = rng.uniform(0, 100, (30, 2))
    a1, d1 = match_coordinates(targets, preds, 8.0)
    a2, d2 = ref.match_coordinates(targets, preds, 8.0)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(d1, d2)


def test_profiling_stage():
    from topaz_tpu.utils import profiling

    profiling.reset()
    with profiling.stage("unit"):
        pass
    t = profiling.timings()
    assert t["unit"]["count"] == 1
