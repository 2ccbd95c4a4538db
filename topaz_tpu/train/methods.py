"""Positive-unlabeled learning objectives as pure, differentiable functions.

Reimplements topaz/methods.py:25-323 (PN, GE-binomial, GE-KL, PU) for jit:
  * batch composition is carried by a labels vector ``y`` exactly as the
    reference's ``step(X, Y)`` selects by ``Y`` — positives/unlabeled are
    masked reductions, so the composition may vary per batch (Bernoulli
    draws, the reference's ``positive_balance`` semantics) while every
    shape stays static under jit. The GE-binomial count vector spans
    k = 0..B with entries above the (traced) unlabeled count masked out
    of the softmax; the binomial log-pmf is computed with jnp.gammaln on
    device, eliminating the reference's per-step scipy CPU round trip
    (methods.py:124-127).
  * the NNPU clipping branch (methods.py:288-298) becomes a jnp.where with
    the same gradient semantics.
  * GE-KL's running expectation (methods.py:210-212) is explicit state
    threaded through the step.

Each objective maps (scores, labels, state) -> (loss, new state, metrics).
``y`` may also be a static int for convenience (first-n-positive batches).
Metric contract matches the reference's TSV columns.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln


def bce_with_logits(score: jnp.ndarray, target) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    return jnp.maximum(score, 0) - score * target + jnp.log1p(jnp.exp(-jnp.abs(score)))


def _safe_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x) if x.size > 0 else jnp.zeros((), x.dtype)


def _as_labels(y, n: int) -> jnp.ndarray:
    """Accept a labels vector, or a static int meaning 'first y entries
    are positive' (the pre-round-4 positional convention)."""
    if isinstance(y, (int, np.integer)):
        return (jnp.arange(n) < y).astype(jnp.float32)
    return jnp.asarray(y, jnp.float32)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean(x[mask]) with static shapes; 0 when the mask is empty (the
    reference's empty-selection mean is NaN only in pathological batches
    the Bernoulli draw makes measure-zero)."""
    n = jnp.sum(mask)
    return jnp.sum(x * mask) / jnp.maximum(n, 1.0)


def _classifier_metrics(score: jnp.ndarray, y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    p_hat = jax.nn.sigmoid(score)
    precision = jnp.sum(p_hat * y) / jnp.sum(p_hat)
    tpr = _masked_mean(p_hat, y)
    fpr = _masked_mean(p_hat, 1.0 - y)
    return {"precision": precision, "tpr": tpr, "fpr": fpr}


class MethodState(NamedTuple):
    """Objective-specific running state (GE-KL's expectation)."""

    running_expectation: jnp.ndarray


def init_method_state(pi: Optional[float]) -> MethodState:
    """Fresh per-method running state (GE-KL running expectation = pi)."""
    return MethodState(running_expectation=jnp.asarray(pi if pi else 0.0, jnp.float32))


HEADERS = {
    "PN": ["loss", "precision", "adjusted_precision", "tpr", "fpr"],
    "GE-binomial": ["loss", "ge_penalty", "precision", "adjusted_precision", "tpr", "fpr"],
    "GE-KL": ["loss", "ge_penalty", "precision", "adjusted_precision", "tpr", "fpr"],
    "PU": ["loss", "precision", "adjusted_precision", "tpr", "fpr"],
}


def pn_loss(score: jnp.ndarray, y, pi: Optional[float],
            state: MethodState) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """Positive-negative with pi-weighted class means (methods.py:39-74)."""
    y = _as_labels(y, score.shape[0])
    if pi is not None:
        loss_one = _masked_mean(bce_with_logits(score, 1.0), y)
        loss_zero = _masked_mean(bce_with_logits(score, 0.0), 1.0 - y)
        loss = loss_one * pi + loss_zero * (1 - pi)
    else:
        loss = jnp.mean(bce_with_logits(score, y))
    metrics = {"loss": loss, **_classifier_metrics(score, y)}
    return loss, state, metrics


def ge_binomial_loss(score: jnp.ndarray, y, pi: float,
                     state: MethodState, slack: float = 1.0,
                     entropy_penalty: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """GE-binomial (methods.py:98-165): Normal approximation to the
    classifier's positive-count distribution over unlabeled data, penalized
    by KL against Binomial(N, pi). The unlabeled count N is traced (it
    varies with the batch's Bernoulli composition): the count vector spans
    k = 0..B and entries k > N are masked out of the softmax, which equals
    the reference's k = 0..N vector exactly."""
    y = _as_labels(y, score.shape[0])
    u = 1.0 - y
    classifier_loss = _masked_mean(bce_with_logits(score, 1.0), y)

    n_u = jnp.sum(u)
    p_hat = jax.nn.sigmoid(score) * u
    q_mu = jnp.sum(p_hat)
    q_var = jnp.sum(p_hat * (1 - p_hat))

    k = jnp.arange(0, score.shape[0] + 1, dtype=jnp.float32)
    valid = k <= n_u
    q_logits = jnp.where(valid, -0.5 * (q_mu - k) ** 2 / (q_var + 1e-10),
                         -jnp.inf)
    q_discrete = jax.nn.softmax(q_logits)
    nk = jnp.where(valid, n_u - k, 0.0)  # gammaln(neg) would NaN the mask
    log_binom = (gammaln(n_u + 1.0) - gammaln(k + 1.0) - gammaln(nk + 1.0)
                 + k * jnp.log(pi) + nk * jnp.log1p(-pi))
    ge_penalty = -jnp.sum(jnp.where(valid, log_binom, 0.0) * q_discrete)

    if entropy_penalty > 0:
        q_entropy = 0.5 * (jnp.log(q_var) + jnp.log(2 * jnp.pi) + 1)
        ge_penalty = ge_penalty + q_entropy * entropy_penalty

    loss = classifier_loss + slack * ge_penalty
    metrics = {"loss": classifier_loss, "ge_penalty": ge_penalty,
               **_classifier_metrics(score, y)}
    return loss, state, metrics


def ge_kl_loss(score: jnp.ndarray, y, pi: float, state: MethodState,
               slack: float = 10.0, momentum: float = 1.0,
               entropy_penalty: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """GE-KL (methods.py:185-255): KL between pi and the classifier's mean
    positive probability over unlabeled data, with optional running-average
    momentum."""
    y = _as_labels(y, score.shape[0])
    u = 1.0 - y
    classifier_loss = _masked_mean(bce_with_logits(score, 1.0), y)
    p_hat = _masked_mean(jax.nn.sigmoid(score), u)

    new_state = state
    if momentum < 1:
        p_hat = momentum * p_hat + (1 - momentum) * state.running_expectation
        new_state = MethodState(running_expectation=jax.lax.stop_gradient(p_hat))

    entropy = pi * jnp.log(pi) + (1 - pi) * jnp.log1p(-pi)
    ge_penalty = -jnp.log(p_hat) * pi - jnp.log1p(-p_hat) * (1 - pi) + entropy
    ge_penalty = ge_penalty * slack / momentum

    entropy_loss = 0.0
    if entropy_penalty > 0:
        abs_score = jnp.abs(score)
        ent = abs_score * jax.nn.sigmoid(-abs_score) - jax.nn.log_sigmoid(abs_score)
        entropy_loss = entropy_penalty * _masked_mean(ent, u)

    loss = classifier_loss + ge_penalty + entropy_loss
    metrics = {"loss": classifier_loss, "ge_penalty": ge_penalty,
               **_classifier_metrics(score, y)}
    return loss, new_state, metrics


def pu_loss(score: jnp.ndarray, y, pi: float, state: MethodState,
            beta: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """Non-negative PU (methods.py:274-322, arXiv:1703.00593): when the
    estimated negative-data loss drops below -beta, step along its negated
    gradient instead."""
    y = _as_labels(y, score.shape[0])
    loss_pp = _masked_mean(bce_with_logits(score, 1.0), y)
    loss_pn = _masked_mean(bce_with_logits(score, 0.0), y)
    loss_un = _masked_mean(bce_with_logits(score, 0.0), 1.0 - y)

    loss_u = loss_un - loss_pn * pi
    clip = loss_u < -beta
    backprop_loss = jnp.where(clip, -loss_u, loss_pp * pi + loss_u)
    reported = jnp.where(clip, loss_pp * pi - beta, loss_pp * pi + loss_u)
    metrics = {"loss": reported, **_classifier_metrics(score, y)}
    return backprop_loss, state, metrics


def make_loss_fn(method: str, pi: Optional[float], slack: float = -1.0,
                 entropy_penalty: float = 0.0, momentum: float = 1.0,
                 beta: float = 0.0):
    """Map a method name + hyperparameters to (loss_fn, header, split).

    Applies the reference's slack defaults (training.py:380-390): 10 for
    GE-KL, 1 for GE-binomial. ``entropy_penalty`` (GE methods,
    methods.py:80,171), ``momentum`` (GE-KL running expectation,
    methods.py:170,210-212) and ``beta`` (nnPU clipping threshold,
    methods.py:260-261) default to the reference's hardcoded values; the
    CLI surfaces them as flags.
    """
    if method == "PN":
        return (lambda s, y, st: pn_loss(s, y, pi, st)), HEADERS["PN"], "pn"
    if method == "GE-binomial":
        sl = 1.0 if slack < 0 else slack
        return (
            lambda s, y, st: ge_binomial_loss(
                s, y, pi, st, slack=sl, entropy_penalty=entropy_penalty)
        ), HEADERS["GE-binomial"], "pn"
    if method == "GE-KL":
        sl = 10.0 if slack < 0 else slack
        return (
            lambda s, y, st: ge_kl_loss(
                s, y, pi, st, slack=sl, momentum=momentum,
                entropy_penalty=entropy_penalty)
        ), HEADERS["GE-KL"], "pn"
    if method == "PU":
        return (lambda s, y, st: pu_loss(s, y, pi, st, beta=beta)), \
            HEADERS["PU"], "pu"
    raise ValueError("Invalid method: " + method)
