"""Positive-unlabeled learning objectives as pure, differentiable functions.

Reimplements topaz/methods.py:25-323 (PN, GE-binomial, GE-KL, PU) for jit:
  * batches have a *static* composition — the first ``n_pos`` entries are
    labeled positives, the rest unlabeled/negative — so the GE-binomial
    count vector has a static length and the binomial log-pmf is computed
    with jnp.gammaln on device, eliminating the reference's per-step
    scipy CPU round trip (methods.py:124-127).
  * the NNPU clipping branch (methods.py:288-298) becomes a jnp.where with
    the same gradient semantics.
  * GE-KL's running expectation (methods.py:210-212) is explicit state
    threaded through the step.

Each objective maps (scores, aux state) -> (loss, new state, metrics dict).
Metric contract matches the reference's TSV columns.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def bce_with_logits(score: jnp.ndarray, target) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    return jnp.maximum(score, 0) - score * target + jnp.log1p(jnp.exp(-jnp.abs(score)))


def _safe_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x) if x.size > 0 else jnp.zeros((), x.dtype)


def _classifier_metrics(score: jnp.ndarray, n_pos: int) -> Dict[str, jnp.ndarray]:
    p_hat = jax.nn.sigmoid(score)
    precision = jnp.sum(p_hat[:n_pos]) / jnp.sum(p_hat)
    tpr = _safe_mean(p_hat[:n_pos])
    fpr = _safe_mean(p_hat[n_pos:])
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


def pn_loss(score: jnp.ndarray, n_pos: int, pi: Optional[float],
            state: MethodState) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """Positive-negative with pi-weighted class means (methods.py:39-74)."""
    if pi is not None:
        loss_one = _safe_mean(bce_with_logits(score[:n_pos], 1.0))
        loss_zero = _safe_mean(bce_with_logits(score[n_pos:], 0.0))
        loss = loss_one * pi + loss_zero * (1 - pi)
    else:
        y = jnp.concatenate([jnp.ones(n_pos), jnp.zeros(score.shape[0] - n_pos)])
        loss = jnp.mean(bce_with_logits(score, y))
    metrics = {"loss": loss, **_classifier_metrics(score, n_pos)}
    return loss, state, metrics


def _binom_logpmf(k: jnp.ndarray, n: int, pi: float) -> jnp.ndarray:
    return (
        gammaln(n + 1.0)
        - gammaln(k + 1.0)
        - gammaln(n - k + 1.0)
        + k * jnp.log(pi)
        + (n - k) * jnp.log1p(-pi)
    )


def ge_binomial_loss(score: jnp.ndarray, n_pos: int, pi: float,
                     state: MethodState, slack: float = 1.0,
                     entropy_penalty: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """GE-binomial (methods.py:98-165): Normal approximation to the
    classifier's positive-count distribution over unlabeled data, penalized
    by KL against Binomial(N, pi)."""
    classifier_loss = _safe_mean(bce_with_logits(score[:n_pos], 1.0))

    s_u = score[n_pos:]
    N = s_u.shape[0]
    p_hat = jax.nn.sigmoid(s_u)
    q_mu = jnp.sum(p_hat)
    q_var = jnp.sum(p_hat * (1 - p_hat))

    k = jnp.arange(0, N + 1, dtype=jnp.float32)
    q_discrete = jax.nn.softmax(-0.5 * (q_mu - k) ** 2 / (q_var + 1e-10))
    log_binom = _binom_logpmf(k, N, pi)
    ge_penalty = -jnp.sum(log_binom * q_discrete)

    if entropy_penalty > 0:
        q_entropy = 0.5 * (jnp.log(q_var) + jnp.log(2 * jnp.pi) + 1)
        ge_penalty = ge_penalty + q_entropy * entropy_penalty

    loss = classifier_loss + slack * ge_penalty
    metrics = {"loss": classifier_loss, "ge_penalty": ge_penalty,
               **_classifier_metrics(score, n_pos)}
    return loss, state, metrics


def ge_kl_loss(score: jnp.ndarray, n_pos: int, pi: float, state: MethodState,
               slack: float = 10.0, momentum: float = 1.0,
               entropy_penalty: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """GE-KL (methods.py:185-255): KL between pi and the classifier's mean
    positive probability over unlabeled data, with optional running-average
    momentum."""
    classifier_loss = _safe_mean(bce_with_logits(score[:n_pos], 1.0))
    s_u = score[n_pos:]
    p_hat = jnp.mean(jax.nn.sigmoid(s_u))

    new_state = state
    if momentum < 1:
        p_hat = momentum * p_hat + (1 - momentum) * state.running_expectation
        new_state = MethodState(running_expectation=jax.lax.stop_gradient(p_hat))

    entropy = pi * jnp.log(pi) + (1 - pi) * jnp.log1p(-pi)
    ge_penalty = -jnp.log(p_hat) * pi - jnp.log1p(-p_hat) * (1 - pi) + entropy
    ge_penalty = ge_penalty * slack / momentum

    entropy_loss = 0.0
    if entropy_penalty > 0:
        abs_score = jnp.abs(s_u)
        ent = abs_score * jax.nn.sigmoid(-abs_score) - jax.nn.log_sigmoid(abs_score)
        entropy_loss = entropy_penalty * jnp.mean(ent)

    loss = classifier_loss + ge_penalty + entropy_loss
    metrics = {"loss": classifier_loss, "ge_penalty": ge_penalty,
               **_classifier_metrics(score, n_pos)}
    return loss, new_state, metrics


def pu_loss(score: jnp.ndarray, n_pos: int, pi: float, state: MethodState,
            beta: float = 0.0) -> Tuple[jnp.ndarray, MethodState, Dict]:
    """Non-negative PU (methods.py:274-322, arXiv:1703.00593): when the
    estimated negative-data loss drops below -beta, step along its negated
    gradient instead."""
    s_p = score[:n_pos]
    loss_pp = _safe_mean(bce_with_logits(s_p, 1.0))
    loss_pn = _safe_mean(bce_with_logits(s_p, 0.0))
    loss_un = _safe_mean(bce_with_logits(score[n_pos:], 0.0))

    loss_u = loss_un - loss_pn * pi
    clip = loss_u < -beta
    backprop_loss = jnp.where(clip, -loss_u, loss_pp * pi + loss_u)
    reported = jnp.where(clip, loss_pp * pi - beta, loss_pp * pi + loss_u)
    metrics = {"loss": reported, **_classifier_metrics(score, n_pos)}
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
        return (lambda s, n_pos, st: pn_loss(s, n_pos, pi, st)), HEADERS["PN"], "pn"
    if method == "GE-binomial":
        sl = 1.0 if slack < 0 else slack
        return (
            lambda s, n_pos, st: ge_binomial_loss(
                s, n_pos, pi, st, slack=sl, entropy_penalty=entropy_penalty)
        ), HEADERS["GE-binomial"], "pn"
    if method == "GE-KL":
        sl = 10.0 if slack < 0 else slack
        return (
            lambda s, n_pos, st: ge_kl_loss(
                s, n_pos, pi, st, slack=sl, momentum=momentum,
                entropy_penalty=entropy_penalty)
        ), HEADERS["GE-KL"], "pn"
    if method == "PU":
        return (lambda s, n_pos, st: pu_loss(s, n_pos, pi, st, beta=beta)), \
            HEADERS["PU"], "pu"
    raise ValueError("Invalid method: " + method)
