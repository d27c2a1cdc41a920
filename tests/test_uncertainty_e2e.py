"""fusion_type: uncertainty end-to-end through the real CLIs.

The reference declares the option (``config/base.yaml:27`` "Options: ...
uncertainty") but its factory rejects it; here it is a real head
(per-modality classifiers + learned log-variance inverse-variance weighting).
This pins the full path: preset config -> train CLI -> checkpoint -> eval CLI.
"""

import json
from pathlib import Path

import pytest


@pytest.mark.slow
def test_uncertainty_fusion_train_eval_cli(tmp_path, monkeypatch):
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "base.yaml").write_text(
        f"""
dataset:
  name: synthetic
  data_dir: ./data
  modalities: [s1, s2]
  num_classes: 4
  num_samples: 96
  sequence_length: 8
  batch_size: 16
model:
  fusion_type: hybrid
  hidden_dim: 16
  output_dim: 8
  num_heads: 2
  dropout: 0.1
  layer_norm: false
  encoders:
    s1: {{type: sequence, encoder_type: cnn, num_layers: 1}}
    s2: {{type: sequence, encoder_type: cnn, num_layers: 1}}
training:
  max_epochs: 2
  learning_rate: 1e-3
  optimizer: adam
  scheduler: none
experiment:
  name: unc_exp
  save_dir: {tmp_path}/runs
evaluation:
  num_calibration_bins: 10
seed: 11
"""
    )
    # mirrors config/fusion_strategies.yaml:27-35 (uncertainty_fusion preset)
    (cfg_dir / "strategies.yaml").write_text(
        """
defaults:
  - base

uncertainty_fusion:
  model:
    fusion_type: uncertainty
"""
    )
    monkeypatch.chdir(tmp_path)
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
        eval_main,
        train_main,
    )

    results = train_main(
        ["--config-path", str(cfg_dir), "--config-name", "strategies",
         "preset=uncertainty_fusion"]
    )
    assert Path(results["best_model_path"]).exists()
    on_disk = json.loads((tmp_path / "runs" / "unc_exp" / "results.json").read_text())
    assert on_disk["config"]["model"]["fusion_type"] == "uncertainty"

    eval_main(
        [
            "--checkpoint", results["best_model_path"],
            "--output_dir", str(tmp_path / "experiments" / "unc"),
            "--analysis_dir", str(tmp_path / "analysis"),
            "--missing_modality_test",
        ]
    )
    eval_json = json.loads(
        (tmp_path / "experiments" / "unc" / "evaluation_results.json").read_text()
    )
    assert eval_json["fusion_type"] == "uncertainty"
    assert 0.0 <= eval_json["test_accuracy"] <= 1.0
    mm = json.loads(
        (tmp_path / "experiments" / "unc" / "missing_modality.json").read_text()
    )
    assert set(mm["single_modalities"]) == {"s1", "s2"}
