"""Metric semantics: ECE/MCE binning, macro-F1 vs sklearn, smoothed CE."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.metrics import (
    cross_entropy_loss,
    expected_calibration_error,
    macro_f1,
    maximum_calibration_error,
    negative_log_likelihood,
)


def _reference_ece(confidences, predictions, labels, num_bins=15):
    """Naive loop with [lower, upper) bins and right-closed final bin —
    the reference's exact algorithm (src/uncertainty.py:84-131)."""
    bounds = np.linspace(0, 1, num_bins + 1)
    total = len(confidences)
    ece = 0.0
    for lower, upper in zip(bounds[:-1], bounds[1:]):
        if upper == 1.0:
            in_bin = (confidences >= lower) & (confidences <= upper)
        else:
            in_bin = (confidences >= lower) & (confidences < upper)
        if in_bin.sum() == 0:
            continue
        conf = confidences[in_bin].mean()
        acc = (predictions[in_bin] == labels[in_bin]).mean()
        ece += (in_bin.sum() / total) * abs(acc - conf)
    return ece


def test_ece_matches_reference_binning():
    rng = np.random.default_rng(0)
    conf = rng.random(500)
    conf[:10] = 1.0  # exercise the right-closed final bin
    preds = rng.integers(0, 5, 500)
    labels = rng.integers(0, 5, 500)
    ours = expected_calibration_error(conf, preds, labels, 15)
    ref = _reference_ece(conf, preds, labels, 15)
    assert ours == pytest.approx(ref, abs=1e-6)


def test_ece_perfect_and_bounds():
    conf = np.full(100, 0.75)
    labels = np.zeros(100, dtype=int)
    preds = np.zeros(100, dtype=int)
    preds[75:] = 1  # 75% accuracy at 75% confidence -> perfectly calibrated
    assert expected_calibration_error(conf, preds, labels) == pytest.approx(0.0, abs=1e-6)
    assert maximum_calibration_error(conf, preds, labels) == pytest.approx(0.0, abs=1e-6)
    assert expected_calibration_error(np.ones(10), np.zeros(10), np.ones(10)) == pytest.approx(1.0)


def test_mce_at_least_ece():
    rng = np.random.default_rng(1)
    conf = rng.random(200)
    preds = rng.integers(0, 3, 200)
    labels = rng.integers(0, 3, 200)
    ece = expected_calibration_error(conf, preds, labels)
    mce = maximum_calibration_error(conf, preds, labels)
    assert 0.0 <= ece <= mce <= 1.0


def test_macro_f1_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 6, 300)
    preds = rng.integers(0, 8, 300)  # predicted classes outside label set
    ours = macro_f1(labels, preds)
    ref = sklearn.f1_score(labels, preds, average="macro", zero_division=0)
    assert ours == pytest.approx(float(ref), abs=1e-9)


def test_macro_f1_zero_division():
    labels = np.array([0, 0, 0])
    preds = np.array([1, 1, 1])
    assert macro_f1(labels, preds) == 0.0


def test_nll_is_mean_cross_entropy():
    logits = np.array([[2.0, 0.0], [0.0, 3.0]])
    labels = np.array([0, 1])
    expected = float(
        -np.mean(
            [
                logits[0, 0] - np.log(np.exp(logits[0]).sum()),
                logits[1, 1] - np.log(np.exp(logits[1]).sum()),
            ]
        )
    )
    assert negative_log_likelihood(logits, labels) == pytest.approx(expected, abs=1e-6)


def test_label_smoothing_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((16, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 16)
    for smoothing in (0.0, 0.05, 0.2):
        ours = float(
            cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), smoothing)
        )
        ref = float(
            torch.nn.functional.cross_entropy(
                torch.tensor(logits), torch.tensor(labels), label_smoothing=smoothing
            )
        )
        assert ours == pytest.approx(ref, abs=1e-5)


def test_weighted_ce_ignores_padded_rows():
    logits = jnp.asarray(np.random.default_rng(4).standard_normal((8, 4)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3])
    weight = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    full = cross_entropy_loss(logits[:4], labels[:4])
    weighted = cross_entropy_loss(logits, labels, sample_weight=weight)
    assert float(weighted) == pytest.approx(float(full), abs=1e-6)


class TestProfilingUtils:
    def test_timer_and_throughput(self):
        import jax.numpy as jnp

        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.profiling import (
            Timer,
            fence,
            throughput,
        )

        timer = Timer()
        with timer.lap():
            pass
        assert timer.best >= 0
        assert timer.median >= 0

        import jax

        f = jax.jit(lambda x: x * 2)
        stats = throughput(f, jnp.ones((8, 8)), items_per_call=8, iters=3, warmup=1)
        assert stats["items_per_sec"] > 0
        assert fence(f(jnp.ones((2, 2)))) == pytest.approx(8.0)
