"""Multi-image Gaussian mixture with per-image intensity scale factors.

Same model as topaz/transform/scaled_gaussian_mixture.py:5-179 (EM where
each image i contributes x_i / scale_i to shared mixture components, and
the scale is re-estimated in closed form each iteration). Exported by the
reference's transform package but referenced by no command — provided for
API completeness.
"""

from __future__ import annotations

from typing import List

import numpy as np


class ScaledGaussianMixture:
    def __init__(self, ncomponents: int = 2, scale_prior: float = 0.5,
                 tol: float = 1e-6):
        self.ncomponents = ncomponents
        self.weights = np.ones(ncomponents) / ncomponents
        self.means = np.zeros(ncomponents)
        self.variances = np.ones(ncomponents)
        self.scale_prior = scale_prior
        self.tol = tol

    def fit(self, X: List[np.ndarray], niters: int = 100,
            random=np.random, verbose: bool = False):
        """EM fit. Returns (per-image scales, per-image posteriors)."""
        X = [np.asarray(x).ravel() for x in X]
        K = self.ncomponents

        mus = np.array([x.mean() for x in X])
        scale = mus / mus.mean()

        # random hard initialization of responsibilities
        probas = []
        for x in X:
            comp = random.randint(0, K, size=x.shape)
            p = np.zeros((len(x), K), dtype=np.float32)
            p[np.arange(len(x)), comp] = 1.0
            probas.append(p)

        logp = -np.inf
        for it in range(niters):
            # --- M step: weighted mean/variance over scaled pixels (the
            # reference accumulates these Welford-style across images,
            # training.py equivalent result) --------------------------------
            n = np.zeros(K)
            sx = np.zeros(K)
            sxx = np.zeros(K)
            for i, (x, p) in enumerate(zip(X, probas)):
                xs = x / scale[i]
                n += p.sum(axis=0)
                sx += (p * xs[:, None]).sum(axis=0)
                sxx += (p * xs[:, None] ** 2).sum(axis=0)
            means = sx / n
            variances = (sxx - n * means**2) / n
            weights = (n + 1) / (n.sum() + K)

            # --- E step: scales (closed form) + responsibilities ----------
            cur_logp = logp
            logp = 0.0
            for i, x in enumerate(X):
                p = probas[i]
                a = np.sum(p * x[:, None] ** 2 / variances)
                b = np.sum(p * x[:, None] * means / variances)
                scale[i] = 2 * a / (b + np.sqrt(b**2 + 4 * a * len(x)))

                log_post = (
                    -((x[:, None] / scale[i] - means) ** 2) / 2 / variances
                    - 0.5 * np.log(2 * np.pi)
                    - 0.5 * np.log(variances)
                    + np.log(weights)
                )
                ma = log_post.max(axis=-1, keepdims=True)
                log_post -= ma
                logp += np.sum(np.log(np.sum(np.exp(log_post), axis=-1))) + ma.sum()
                post = np.exp(log_post)
                post /= post.sum(axis=-1, keepdims=True)
                probas[i] = post

            if verbose:
                print(f"# [{it}] logp={logp}")
            if logp - cur_logp < self.tol:
                break

        self.weights = weights
        self.means = means
        self.variances = variances
        return scale, probas

    def transform(self, X: List[np.ndarray], niters: int = 5):
        """Estimate per-image scales under the fitted mixture with a prior
        on not scaling (reference transform, scaled_gaussian_mixture.py:
        126-179). Returns (scales, last posteriors)."""
        X = [np.asarray(x) for x in X]
        means, variances, weights = self.means, self.variances, self.weights

        mus = np.array([x.mean() for x in X], dtype=np.float32)
        scale = mus.mean() / mus

        def assign(x, s):
            p = np.exp(-((x[..., None] / s - means) ** 2) / 2 / variances)
            p = p / np.sqrt(2 * np.pi * variances) * weights
            return p.argmax(axis=-1)

        components = [assign(x, scale[i]) for i, x in enumerate(X)]

        proba = None
        for _ in range(niters):
            for i, x in enumerate(X):
                comp = components[i]
                mu = means[comp]
                var = variances[comp]
                a = np.sum(x**2 / var)
                b = np.sum(x * mu / var)
                scale[i] = a / b

                unscaled_logp = np.log(1 - self.scale_prior) - np.sum(
                    (x - mu) ** 2 / 2 / var)
                scaled_logp = np.log(self.scale_prior) - np.sum(
                    (x / scale[i] - mu) ** 2 / 2 / var)
                if unscaled_logp >= scaled_logp:
                    scale[i] = 1.0

                proba = np.exp(-((x[..., None] / scale[i] - means) ** 2)
                               / 2 / variances)
                proba = proba / np.sqrt(2 * np.pi * variances) * weights
                components[i] = proba.argmax(axis=-1)

        return scale, proba
