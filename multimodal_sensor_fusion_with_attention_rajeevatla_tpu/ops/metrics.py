"""Classification + calibration metrics.

Re-implements the reference's metric semantics without sklearn/torch on the
hot path (reference: ``src/eval.py:103-118``, ``src/uncertainty.py:84-192``):

- ``accuracy``/``cross_entropy_loss`` are jit-safe jax functions,
- ``macro_f1`` reproduces ``sklearn.metrics.f1_score(average='macro',
  zero_division=0)`` including its label-set convention (classes present in
  y_true OR y_pred),
- ``expected_calibration_error`` / ``maximum_calibration_error`` use
  equal-width bins with a right-closed final bin, identical to the
  reference's binning loops — but vectorised.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

ArrayLike = Union[np.ndarray, jax.Array]


def _np(x: ArrayLike) -> np.ndarray:
    return np.asarray(x)


def accuracy(predictions: ArrayLike, labels: ArrayLike) -> float:
    return float(np.mean(_np(predictions) == _np(labels)))


def macro_f1(labels: ArrayLike, predictions: ArrayLike) -> float:
    """Macro-averaged F1 with sklearn's default label set and zero_division=0."""
    y_true = _np(labels).astype(np.int64).ravel()
    y_pred = _np(predictions).astype(np.int64).ravel()
    classes = np.union1d(np.unique(y_true), np.unique(y_pred))
    if classes.size == 0:
        return 0.0
    f1s = []
    for cls in classes:
        tp = np.sum((y_pred == cls) & (y_true == cls))
        fp = np.sum((y_pred == cls) & (y_true != cls))
        fn = np.sum((y_pred != cls) & (y_true == cls))
        denom = 2 * tp + fp + fn
        f1s.append(0.0 if denom == 0 else 2.0 * tp / denom)
    return float(np.mean(f1s))


def _bin_stats(
    confidences: np.ndarray,
    predictions: np.ndarray,
    labels: np.ndarray,
    num_bins: int,
):
    confidences = _np(confidences).astype(np.float64).ravel()
    predictions = _np(predictions).ravel()
    labels = _np(labels).ravel()
    # Equal-width bins; the final bin is right-closed (conf == 1.0 included),
    # matching the reference's explicit `upper == 1.0` special case.
    bin_ids = np.clip(
        np.floor(confidences * num_bins).astype(np.int64), 0, num_bins - 1
    )
    correct = (predictions == labels).astype(np.float64)
    counts = np.bincount(bin_ids, minlength=num_bins).astype(np.float64)
    conf_sums = np.bincount(bin_ids, weights=confidences, minlength=num_bins)
    acc_sums = np.bincount(bin_ids, weights=correct, minlength=num_bins)
    nonzero = counts > 0
    avg_conf = np.zeros(num_bins)
    avg_acc = np.zeros(num_bins)
    avg_conf[nonzero] = conf_sums[nonzero] / counts[nonzero]
    avg_acc[nonzero] = acc_sums[nonzero] / counts[nonzero]
    return counts, avg_conf, avg_acc, nonzero


def expected_calibration_error(
    confidences: ArrayLike,
    predictions: ArrayLike,
    labels: ArrayLike,
    num_bins: int = 15,
) -> float:
    counts, avg_conf, avg_acc, nonzero = _bin_stats(
        _np(confidences), _np(predictions), _np(labels), num_bins
    )
    total = counts.sum()
    if total == 0:
        return 0.0
    return float(
        np.sum((counts[nonzero] / total) * np.abs(avg_acc[nonzero] - avg_conf[nonzero]))
    )


def maximum_calibration_error(
    confidences: ArrayLike,
    predictions: ArrayLike,
    labels: ArrayLike,
    num_bins: int = 15,
) -> float:
    counts, avg_conf, avg_acc, nonzero = _bin_stats(
        _np(confidences), _np(predictions), _np(labels), num_bins
    )
    if not np.any(nonzero):
        return 0.0
    return float(np.max(np.abs(avg_acc[nonzero] - avg_conf[nonzero])))


def negative_log_likelihood(logits: ArrayLike, labels: ArrayLike) -> float:
    """Mean cross-entropy of raw logits vs integer labels."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return float(jnp.mean(nll))


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
    sample_weight: jax.Array | None = None,
) -> jax.Array:
    """Label-smoothed CE matching ``torch.nn.CrossEntropyLoss`` semantics.

    With smoothing ``s`` and ``C`` classes the target distribution is
    ``(1 - s)`` on the true class and ``s / C`` on every class (torch adds the
    uniform mass on top of the true class, i.e. true gets ``1 - s + s/C``).
    ``sample_weight`` supports padded batches (0 for pad rows).
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    true_logp = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = label_smoothing
        mean_logp = jnp.mean(logp, axis=-1)
        loss = -(1.0 - smooth) * true_logp - smooth * mean_logp
        _ = num_classes  # uniform term folds the true class back in, as torch does
    else:
        loss = -true_logp
    if sample_weight is not None:
        weight = sample_weight.astype(loss.dtype)
        return jnp.sum(loss * weight) / jnp.clip(jnp.sum(weight), 1.0, None)
    return jnp.mean(loss)
