"""Stratified k-fold partitioning of labeled micrographs
(topaz/utils/data/partition.py:11-41): stratify by image source and
particle-count quantile, then deal images round-robin into k folds."""

from __future__ import annotations

import numpy as np
import pandas as pd


def stratify(labels: pd.DataFrame, nbins: int = 5):
    strata = []
    for _, group in labels.groupby("source"):
        counts = group["count"].rank(method="first")
        buckets = pd.qcut(counts, nbins, labels=False)
        for ident in buckets.unique():
            strata.append(group.loc[buckets == ident])
    return strata


def kfold(k: int, labels: pd.DataFrame, nbins: int = 5, random=np.random):
    """Yield (train, test) row partitions of ``labels`` (columns: source,
    image_name, count)."""
    strata = stratify(labels, nbins=nbins)
    strata = [g.iloc[random.permutation(len(g))] for g in strata]
    strata = pd.concat(strata, axis=0)

    folds = [strata.iloc[i:].iloc[::k] for i in range(k)]
    for i in range(k):
        test = folds[i]
        train = pd.concat([folds[j] for j in range(k) if j != i], axis=0)
        yield train, test
