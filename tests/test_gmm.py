import numpy as np
import pytest

from topaz_tpu.ops.gmm import gmm_fit, norm_fit, normalize

from reference_oracle import ref_module, reference_available


def synthetic_mixture(rng, n=20000, pi=0.3, mu0=0.0, mu1=2.0, std=0.7):
    k = rng.random(n) < pi
    x = np.where(k, rng.normal(mu1, std, n), rng.normal(mu0, std, n))
    return x.astype(np.float32)


def test_gmm_fit_recovers_mixture(rng):
    x = synthetic_mixture(rng)
    import jax.numpy as jnp

    split = np.quantile(x, 1 - 0.3)
    logp, mu0, var0, mu1, var1, pi = gmm_fit(jnp.asarray(x), 0.3, split,
                                             alpha=900, beta=1)
    assert abs(float(mu0) - 0.0) < 0.1
    assert abs(float(mu1) - 2.0) < 0.1
    assert abs(float(np.sqrt(var1)) - 0.7) < 0.1


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_norm_fit_matches_reference(rng):
    ref_stats = ref_module("topaz.stats")
    x = synthetic_mixture(rng, n=8000)
    import jax.numpy as jnp

    mu, std, pi, logp, mus, stds, pis, logps = norm_fit(jnp.asarray(x))
    rmu, rstd, rpi, rlogp, rmus, rstds, rpis, rlogps = ref_stats.norm_fit(
        x, alpha=900, beta=1
    )
    assert abs(float(mu) - rmu) < 5e-3 * max(1.0, abs(rmu))
    assert abs(float(std) - rstd) < 5e-3 * rstd
    assert abs(float(pi) - rpi) < 5e-3
    # per-init parameters should agree too
    np.testing.assert_allclose(np.asarray(mus), rmus, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(stds), rstds, rtol=2e-2, atol=2e-2)


def test_normalize_affine(rng):
    x = rng.normal(3.0, 2.0, size=(64, 64)).astype(np.float32)
    y, md = normalize(x, method="affine")
    assert abs(y.mean()) < 1e-5
    assert abs(y.std() - 1) < 1e-5
    assert md["pi"] == 1


def test_normalize_gmm_output_stats(rng):
    x = synthetic_mixture(rng, n=16384).reshape(128, 128)
    y, md = normalize(x, method="gmm")
    assert y.dtype == np.float32
    assert md["std"] > 0
    assert 0 < md["pi"] <= 1


def test_norm_fit_hist_matches_exact(rng):
    """Histogram EM over all pixels tracks the exact fit to within the
    bin quantization."""
    import jax.numpy as jnp

    from topaz_tpu.ops.gmm import norm_fit, norm_fit_hist

    x = np.concatenate([rng.normal(0, 1, 30000),
                        rng.normal(4, 0.6, 70000)]).astype(np.float32)
    rng.shuffle(x)
    mu_e, std_e, pi_e, *_ = (float(v) for v in norm_fit(jnp.asarray(x))[:3])
    mu_h, std_h, pi_h, *_ = (float(v) for v in
                             norm_fit_hist(jnp.asarray(x))[:3])
    assert abs(mu_h - mu_e) / std_e < 2e-3
    assert abs(std_h - std_e) / std_e < 2e-3
    assert abs(pi_h - pi_e) < 5e-3


def test_normalize_bins_path(rng):
    """normalize(bins=...) output matches the exact GMM normalization."""
    from topaz_tpu.ops.gmm import normalize

    x = np.concatenate([rng.normal(0, 1, 2000),
                        rng.normal(4, 0.6, 14000)]).astype(np.float32)
    rng.shuffle(x)
    x = x.reshape(128, 125)
    exact, md_e = normalize(x)
    binned, md_b = normalize(x, bins=65536)
    assert md_b["bins"] == 65536
    np.testing.assert_allclose(binned, exact, rtol=5e-3, atol=5e-3)


def test_beta_logpdf_boundary_finite():
    """beta_logpdf matches scipy at the pi=1 boundary with beta=1 (the
    default prior): the naive 0*log(0) NaN would poison an EM lane whose
    MAP pi collapses to 1.0, and a NaN logp wins argmax, NaN-ing the
    whole normalized image."""
    import numpy as np

    from topaz_tpu.ops.gmm import beta_logpdf

    v = float(beta_logpdf(1.0, 900.0, 1.0))
    assert np.isfinite(v)
    np.testing.assert_allclose(v, np.log(900.0), rtol=1e-6)
    assert np.isfinite(float(beta_logpdf(0.0, 1.0, 5.0)))
    # beta > 1 at pi = 1 is a genuine zero-density: -inf, not NaN
    assert float(beta_logpdf(1.0, 2.0, 2.0)) == -np.inf


def test_norm_fit_near_unimodal_finite(rng):
    """norm_fit stays finite on near-unimodal images that collapse some
    EM lanes toward pi=1 (regression: the winning lane was NaN)."""
    import numpy as np

    from topaz_tpu.ops.gmm import norm_fit

    x = rng.normal(5.0, 0.01, 20000).astype(np.float32)
    mu, std, *_ = norm_fit(x)
    assert np.isfinite(float(mu)) and np.isfinite(float(std))
    assert float(std) > 0


def test_gmm_fit_w_without_n(rng):
    """gmm_fit derives n from w when n is omitted (regression: divided
    by None at trace time)."""
    import numpy as np

    from topaz_tpu.ops.gmm import gmm_fit

    x = rng.normal(0, 1, 4096).astype(np.float32)
    w = (rng.random(4096) > 0.25).astype(np.float32)
    out = gmm_fit(x, 0.5, float(np.median(x)), w=w)
    assert np.isfinite(float(out[0]))
