"""Pins for scripts/make_report.py — the artifact-aggregation contract.

The report generator is the local equivalent of the reference's CI merge job
(reference .github/workflows/parallel_run.yml:285-312): it aggregates the
per-experiment JSONs into report/report.md. These tests pin the sections the
round-3 verdict asked for (seed-robust headline, like-for-like fusion margin,
full-length LSTM parity) plus the bench-row filtering (cpu-fallback / error
rows must never enter the on-chip throughput table).
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "make_report", REPO_ROOT / "scripts" / "make_report.py"
)
make_report = importlib.util.module_from_spec(spec)
sys.modules["make_report"] = make_report
spec.loader.exec_module(make_report)


def _write_experiment(exp_dir: Path, name: str, test_accuracy: float, **extra):
    d = exp_dir / name
    d.mkdir(parents=True)
    payload = {"test_accuracy": test_accuracy, "test_f1_macro": 0.5, **extra}
    (d / "evaluation_results.json").write_text(json.dumps(payload))


def _run(tmp_path: Path, bench_lines=None) -> str:
    exp = tmp_path / "experiments"
    out = tmp_path / "report.md"
    argv = ["--experiments", str(exp), "--out", str(out)]
    if bench_lines is not None:
        bench = tmp_path / "bench.jsonl"
        bench.write_text("\n".join(json.dumps(b) for b in bench_lines) + "\n")
        argv += ["--bench", str(bench)]
    make_report.main(argv)
    return out.read_text()


def test_seed_headline_mean_std(tmp_path):
    exp = tmp_path / "experiments"
    _write_experiment(exp, "hybrid_transformer", 0.83)
    _write_experiment(exp, "hybrid_transformer_s43", 0.80)
    _write_experiment(exp, "hybrid_transformer_s44", 0.86)
    text = _run(tmp_path)
    assert "Headline accuracy" in text
    assert "0.830 ± 0.030" in text
    assert "over 3 seeds" in text


def test_no_headline_from_a_single_seed(tmp_path):
    exp = tmp_path / "experiments"
    _write_experiment(exp, "hybrid_transformer", 0.83)
    text = _run(tmp_path)
    assert "Headline accuracy" not in text


def test_fusion_margin_like_for_like(tmp_path):
    exp = tmp_path / "experiments"
    _write_experiment(exp, "hybrid_transformer", 0.80)
    _write_experiment(exp, "hybrid_transformer_s43", 0.80)
    _write_experiment(exp, "single_full_imu_hand", 0.64)
    _write_experiment(exp, "single_full_heart_rate", 0.40)
    text = _run(tmp_path)
    # margin = (0.80 - 0.64) / 0.64 = +25.0%, against the BEST single stream
    assert "Fusion margin at the operating point" in text
    assert "`imu_hand` 0.640" in text
    assert "+25.0%" in text


def test_lstm_parity_row(tmp_path):
    exp = tmp_path / "experiments"
    _write_experiment(exp, "hybrid_transformer", 0.80)
    _write_experiment(exp, "hybrid_transformer_s43", 0.82)
    _write_experiment(exp, "encoder_lstm_full", 0.71)
    text = _run(tmp_path)
    assert "Reference-parity LSTM encoders at the same full length: 0.710" in text


def test_bench_fallback_rows_never_enter_throughput_table(tmp_path):
    tpu_row = {
        "metric": "PAMAP2 windows/sec/chip (preprocess+fwd)",
        "value": 10000.0,
        "unit": "windows/s",
        "model": "hybrid-transformer-flash",
        "chunk_size": 512,
        "vs_baseline": 500.0,
        "baseline_cpu_windows_per_sec": 20.0,
        "p50_latency_ms_per_window": 0.5,
        "batch": 64,
    }
    fallback_row = {**tpu_row, "value": 8.45, "vs_baseline": 0.56, "backend": "cpu-fallback"}
    error_row = {**tpu_row, "value": None}
    text = _run(tmp_path, bench_lines=[tpu_row, fallback_row, error_row])
    assert "10000 windows/s" in text
    assert "8.45" not in text
    # value=None must not crash the ":.0f" format nor appear as a number
    assert "None windows/s" not in text


def test_non_throughput_metric_rows_never_enter_throughput_table(tmp_path):
    """Kernel A/B probes (other metric names, e.g. latency in ms/batch) must
    render in their own micro-bench section, never in the windows/s table —
    the committed round-4 report had a bogus `| hybrid-head-only (?) | 0 |`
    row from exactly this leak (round-4 advisor medium finding)."""
    tpu_row = {
        "metric": "PAMAP2 windows/sec/chip (preprocess+fwd)",
        "value": 10000.0,
        "unit": "windows/s",
        "model": "hybrid-transformer-flash",
        "chunk_size": 512,
        "vs_baseline": 500.0,
        "baseline_cpu_windows_per_sec": 20.0,
        "p50_latency_ms_per_window": 0.5,
        "batch": 64,
    }
    second_row = {**tpu_row, "chunk_size": 1024, "value": 7000.0}
    latency_row = {
        "metric": "hybrid head-only latency A/B",
        "value": 0.057,
        "unit": "ms/batch",
        "model": "hybrid-head-only",
        "vs_baseline": 1.13,
        "batch": 64,
    }
    text = _run(tmp_path, bench_lines=[tpu_row, second_row, latency_row])
    assert "hybrid-head-only (?)" not in text
    # the A/B data still surfaces, in its own section with its own unit
    assert "Kernel / serving micro-benchmarks" in text
    assert "ms/batch" in text
    assert "1.13×" in text


def test_latency_row_never_becomes_lead_throughput(tmp_path):
    """Even with NO throughput history, a latency-only probe must not become
    the lead windows/s figure."""
    latency_row = {
        "metric": "hybrid head-only latency A/B",
        "value": 0.057,
        "unit": "ms/batch",
        "model": "hybrid-head-only",
        "vs_baseline": 1.13,
        "batch": 64,
    }
    text = _run(tmp_path, bench_lines=[latency_row])
    assert "windows/s** sustained" not in text
    assert "Kernel / serving micro-benchmarks" in text


def test_seed_labels_derive_from_experiment_names(tmp_path):
    """With seed-43's run missing, seed 44's accuracy must be labelled 44 —
    a positional zip would mislabel it as 43 (round-4 advisor low finding)."""
    exp = tmp_path / "experiments"
    _write_experiment(exp, "hybrid_transformer", 0.80)
    _write_experiment(exp, "hybrid_transformer_s44", 0.86)
    text = _run(tmp_path)
    assert "44=0.860" in text
    assert "43=0.860" not in text
