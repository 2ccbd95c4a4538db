"""Evaluation metrics: average precision, PR curves, coordinate matching.

Matches topaz/metrics.py:10-89 semantics: predictions with *identical*
scores are pooled into one bucket before computing precision/recall (so AP
is invariant to tie ordering), and AP = sum_buckets precision * recall_mass
normalized by N (which may exceed the number of matched targets).

``match_coordinates`` is a deliberate host-side op (Hungarian assignment,
eval-only; SURVEY 7.3 item 7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _bucketed_counts(target: np.ndarray, pred: np.ndarray):
    """Sort by descending score, pool ties, return per-bucket cumulative
    (predicted positives, true positives)."""
    order = np.argsort(pred, kind="stable")[::-1]
    scores = pred[order]
    hits = target[order]
    # bucket ends: last index of each distinct score
    is_end = np.ones(len(scores), dtype=bool)
    is_end[:-1] = scores[:-1] != scores[1:]
    pp = np.flatnonzero(is_end) + 1            # cumulative predictions
    tp = np.cumsum(hits)[is_end]               # cumulative true positives
    return scores[is_end], pp, tp


def precision_recall_curve(target, pred, N: Optional[int] = None):
    """(precision, recall, threshold, average_precision) per score bucket
    (topaz/metrics.py:10-50)."""
    target = np.asarray(target, dtype=np.float32)
    pred = np.asarray(pred, dtype=np.float32)
    n = target.sum() if N is None else N
    thresholds, pp, tp = _bucketed_counts(target, pred)
    r = np.diff(np.concatenate([[0], tp]))
    pr = tp / pp
    pr[np.isnan(pr)] = 1
    avpr = np.sum(pr * r) / n
    re = tp / n
    return pr, re, thresholds, avpr


def average_precision(target, pred, N: Optional[int] = None) -> float:
    """Tie-bucketed average precision (topaz/metrics.py:53-89)."""
    target = np.asarray(target, dtype=np.float32)
    pred = np.asarray(pred, dtype=np.float32)
    n = target.sum() if N is None else N
    _, pp, tp = _bucketed_counts(target, pred)
    r = np.diff(np.concatenate([[0], tp]))
    pr = tp / pp
    return float(np.sum(pr * r) / n)


def particle_prc(targets_path: str, predicted_path: str, match_radius: int,
                 images: str = "target") -> None:
    """File-level precision-recall with Hungarian per-image matching;
    prints the table to stdout (topaz/metrics.py:92-152)."""
    import pandas as pd
    import sys

    targets = pd.read_csv(targets_path, sep="\t")
    predicts = pd.read_csv(predicted_path, sep="\t", comment="#")

    if images == "union":
        image_list = set(targets.image_name.unique()) | set(predicts.image_name.unique())
    elif images == "target":
        image_list = set(targets.image_name.unique())
    elif images == "predicted":
        image_list = set(predicts.image_name.unique())
    else:
        raise ValueError("Unknown image argument: " + images)

    N = len(targets)
    matches, scores = [], []
    count, mae = 0, 0.0
    for name in image_list:
        target = targets.loc[targets.image_name == name]
        predict = predicts.loc[predicts.image_name == name]
        match, dist = match_coordinates(
            target[["x_coord", "y_coord"]].values,
            predict[["x_coord", "y_coord"]].values,
            match_radius,
        )
        this_mae = np.sum(dist[match == 1])
        count += np.sum(match)
        if count > 0:
            mae += (this_mae - np.sum(match) * mae) / count
        matches.append(match)
        scores.append(predict.score.values.astype(np.float32))

    matches = np.concatenate(matches, 0)
    scores = np.concatenate(scores, 0)
    precision, recall, threshold, auprc = precision_recall_curve(matches, scores, N=N)
    print(f"# auprc={auprc}, mae={np.sqrt(mae)}")

    mask = (precision + recall) == 0
    f1 = 2 * precision * recall
    f1[mask] = 0
    f1[~mask] /= (precision + recall)[~mask]
    table = pd.DataFrame({"threshold": threshold, "precision": precision,
                          "recall": recall, "f1": f1})
    table.to_csv(sys.stdout, sep="\t", index=False)


def match_coordinates(targets: np.ndarray, preds: np.ndarray,
                      radius: float) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal 1:1 matching of predictions to targets within ``radius``
    (Hungarian assignment on radius-capped squared distance,
    topaz/algorithms.py:7-22). Returns (assignment in {0,1} per pred,
    distance to the matched target per pred)."""
    from scipy.optimize import linear_sum_assignment

    targets = np.asarray(targets, dtype=np.float64)
    preds = np.asarray(preds, dtype=np.float64)
    if len(preds) == 0 or len(targets) == 0:
        return np.zeros(len(preds), dtype=np.float32), np.zeros(len(preds))

    d2 = np.sum((preds[:, None] - targets[None]) ** 2, axis=2)
    cost = np.minimum(d2 - radius * radius, 0)

    pred_index, target_index = linear_sum_assignment(cost)
    matched_cost = cost[pred_index, target_index]

    dist = np.zeros(len(preds))
    dist[pred_index] = np.sqrt(d2[pred_index, target_index])

    assignment = np.zeros(len(preds), dtype=np.float32)
    assignment[pred_index[matched_cost < 0]] = 1
    return assignment, dist
