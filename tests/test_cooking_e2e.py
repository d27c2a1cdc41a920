"""MPI-Cooking-style video+audio end-to-end: npy layout -> train CLI -> eval CLI.

Covers the third declared dataset family (reference
``config/datasets.yaml:21-38``): FrameEncoder (attention pooling) over video
features fused with a CNN SequenceEncoder over audio features.
"""

import json
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "scripts"))


@pytest.mark.slow
def test_cooking_pipeline_end_to_end(tmp_path, monkeypatch):
    from make_synthetic_cooking import make_split

    data_root = tmp_path / "cooking"
    make_split(data_root / "train", 150, num_classes=4, video_dim=12, audio_dim=8, seed=0)
    make_split(data_root / "val", 40, num_classes=4, video_dim=12, audio_dim=8, seed=1)
    make_split(data_root / "test", 40, num_classes=4, video_dim=12, audio_dim=8, seed=2)

    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "cooking.yaml").write_text(
        f"""
dataset:
  name: cooking
  data_dir: {data_root}
  modalities: [video, audio]
  num_classes: 4
  batch_size: 32
model:
  fusion_type: hybrid
  hidden_dim: 32
  output_dim: 16
  num_heads: 4
  dropout: 0.1
  layer_norm: true
  encoders:
    video:
      type: frame
      input_dim: 12
      temporal_pooling: attention
    audio:
      type: sequence
      input_dim: 8
      encoder_type: cnn
      num_layers: 2
training:
  max_epochs: 6
  learning_rate: 3e-3
  optimizer: adamw
  scheduler: cosine
  label_smoothing: 0.0
experiment:
  name: cooking_e2e
  save_dir: {tmp_path}/runs
evaluation:
  num_calibration_bins: 10
seed: 5
"""
    )
    monkeypatch.chdir(tmp_path)
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
        eval_main,
        train_main,
    )

    results = train_main(["--config-path", str(cfg_dir), "--config-name", "cooking"])
    # class-conditional synthetic signals: the video+audio model must learn
    assert results["test_acc"] > 0.5

    eval_main(
        [
            "--checkpoint", results["best_model_path"],
            "--output_dir", str(tmp_path / "experiments" / "cooking"),
            "--analysis_dir", str(tmp_path / "analysis"),
        ]
    )
    eval_json = json.loads(
        (tmp_path / "experiments" / "cooking" / "evaluation_results.json").read_text()
    )
    assert eval_json["dataset"] == "cooking"
    assert eval_json["test_accuracy"] > 0.5
