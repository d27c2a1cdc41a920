"""Analysis plots: file side-effects from fixture JSONs, key aliasing."""

import json

import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.analysis import (
    _get_metric,
    generate_all_plots,
    plot_attention_weights,
    plot_calibration_diagram,
    plot_fusion_comparison,
    plot_missing_modality_robustness,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
    aggregate_fusion_comparison,
)

FUSION_FIXTURE = {
    "results": {
        "early": {
            "test_accuracy": 0.78, "test_f1_macro": 0.74, "ece": 0.12,
            "inference_ms_mean": 4.5,
        },
        "late": {
            "accuracy": 0.76, "f1_macro": 0.72, "ece": 0.08, "latency_ms": 5.0,
        },
        "hybrid": {
            "test_accuracy": 0.82, "test_f1_macro": 0.80, "ece": 0.05,
            "inference_ms": 6.0,
        },
    }
}

MISSING_FIXTURE = {
    "full_modalities": {"accuracy": 0.82, "f1_macro": 0.8},
    "single_modalities": {
        "imu_hand": {"accuracy": 0.6, "f1_macro": 0.55},
        "heart_rate": {"accuracy": 0.4, "f1_macro": 0.35},
    },
    "all_combinations": {
        "imu_hand": {"accuracy": 0.6, "f1_macro": 0.55},
        "heart_rate": {"accuracy": 0.4, "f1_macro": 0.35},
        "imu_hand+heart_rate": {"accuracy": 0.82, "f1_macro": 0.8},
    },
    "modality_importance": {"imu_hand": 0.7, "heart_rate": 0.3},
}


def test_get_metric_aliasing():
    assert _get_metric({"accuracy": 0.5}, ["accuracy", "test_accuracy"]) == 0.5
    assert _get_metric({"test_accuracy": 0.7}, ["accuracy", "test_accuracy"]) == 0.7
    assert _get_metric({}, ["accuracy"], default=0.1) == 0.1


def test_plot_fusion_comparison(tmp_path):
    out = tmp_path / "cmp.png"
    plot_fusion_comparison(FUSION_FIXTURE, save_path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_plot_missing_modality(tmp_path):
    out = tmp_path / "missing.png"
    plot_missing_modality_robustness(MISSING_FIXTURE, save_path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_plot_attention_weights_reduces_rank(tmp_path):
    out = tmp_path / "attn.png"
    weights = np.random.default_rng(0).random((4, 2, 3, 3))  # extra dims averaged
    plot_attention_weights(weights, ["a", "b", "c"], save_path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_plot_calibration_diagram(tmp_path):
    out = tmp_path / "cal.png"
    rng = np.random.default_rng(0)
    conf = rng.random(100)
    preds = rng.integers(0, 3, 100)
    labels = rng.integers(0, 3, 100)
    plot_calibration_diagram(conf, preds, labels, save_path=out)
    assert out.exists() and out.stat().st_size > 1000


def test_generate_all_plots_walks_dirs(tmp_path):
    exp = tmp_path / "experiments"
    (exp / "hybrid").mkdir(parents=True)
    (exp / "hybrid" / "missing_modality.json").write_text(json.dumps(MISSING_FIXTURE))
    fusion_file = exp / "fusion_comparison.json"
    fusion_file.write_text(json.dumps(FUSION_FIXTURE))
    out = tmp_path / "analysis"
    generate_all_plots(exp, out, fusion_file=fusion_file)
    assert (out / "hybrid_missing_modality.png").exists()
    assert (out / "fusion_comparison.png").exists()


def test_generate_all_plots_empty_fusion(tmp_path, capsys):
    fusion_file = tmp_path / "fusion_comparison.json"
    fusion_file.write_text(json.dumps({"results": {}}))
    generate_all_plots(tmp_path / "none", tmp_path / "out", fusion_file=fusion_file)
    assert "skipping comparison plot" in capsys.readouterr().out


def test_aggregate_fusion_comparison(tmp_path):
    exp = tmp_path / "experiments"
    for name, payload in FUSION_FIXTURE["results"].items():
        (exp / name).mkdir(parents=True)
        (exp / name / "evaluation_results.json").write_text(json.dumps(payload))
    result = aggregate_fusion_comparison(exp)
    assert set(result["results"]) == {"early", "late", "hybrid"}
    on_disk = json.loads((exp / "fusion_comparison.json").read_text())
    assert on_disk == result
    assert result["results"]["hybrid"]["test_accuracy"] == pytest.approx(0.82)
