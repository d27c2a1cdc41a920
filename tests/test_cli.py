"""CLI plumbing: arg parsing, dataset kwargs, train entry end-to-end."""

import json
from pathlib import Path

import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
    _dataset_kwargs,
    _resolve_config_arg,
    train_main,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
)


class TestResolveConfigArg:
    def test_defaults(self):
        path, overrides = _resolve_config_arg([])
        assert path.name == "base.yaml"
        assert overrides == []

    def test_overrides_and_config_name(self):
        path, overrides = _resolve_config_arg(
            ["--config-name", "custom", "model.fusion_type=early", "a.b=[1,2]"]
        )
        assert path.name == "custom.yaml"
        assert overrides == ["model.fusion_type=early", "a.b=[1,2]"]

    def test_config_path_equals_form(self):
        path, _ = _resolve_config_arg(["--config-path=/tmp/cfgs", "--config-name=x"])
        assert str(path) == "/tmp/cfgs/x.yaml"


class TestDatasetKwargs:
    def test_synthetic_kwargs(self):
        cfg = ConfigNode(
            {
                "dataset": {
                    "name": "synthetic",
                    "data_dir": "d",
                    "modalities": ["a"],
                    "num_samples": 7,
                    "num_classes": 3,
                    "sequence_length": 5,
                },
                "seed": 1,
            }
        )
        kwargs = _dataset_kwargs(cfg)
        assert kwargs["dataset_name"] == "synthetic"
        assert kwargs["num_samples"] == 7
        assert kwargs["sequence_length"] == 5

    def test_real_kwargs_include_normalize_and_stride(self):
        cfg = ConfigNode(
            {
                "dataset": {
                    "name": "pamap2",
                    "data_dir": "d",
                    "modalities": ["imu_hand"],
                    "chunk_size": 64,
                    "window_stride": 16,
                    "normalize": "instance",
                }
            }
        )
        kwargs = _dataset_kwargs(cfg)
        assert kwargs["normalize"] == "instance"
        assert kwargs["window_stride"] == 16


@pytest.mark.slow
def test_train_main_end_to_end(tmp_path, monkeypatch):
    """The hydra-style CLI trains synthetic data and writes results.json."""
    monkeypatch.chdir(tmp_path)
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    # minimal config written on the fly; CLI resolves --config-path
    (cfg_dir / "mini.yaml").write_text(
        """
dataset:
  name: synthetic
  data_dir: ./data
  modalities: [s1, s2]
  num_classes: 4
  num_samples: 48
  sequence_length: 8
  batch_size: 16
model:
  fusion_type: early
  hidden_dim: 16
  output_dim: 8
  dropout: 0.1
  layer_norm: false
  encoders:
    s1: {type: sequence, encoder_type: cnn, num_layers: 1}
    s2: {type: sequence, encoder_type: cnn, num_layers: 1}
training:
  max_epochs: 1
  learning_rate: 1e-3
  optimizer: adam
  scheduler: none
experiment:
  name: mini_exp
  save_dir: ./runs
seed: 7
"""
    )
    results = train_main(
        ["--config-path", str(cfg_dir), "--config-name", "mini",
         "training.max_epochs=1"]
    )
    assert Path(results["best_model_path"]).exists()
    on_disk = json.loads((tmp_path / "runs" / "mini_exp" / "results.json").read_text())
    assert on_disk["config"]["experiment"]["name"] == "mini_exp"


@pytest.mark.slow
def test_train_ensemble_script(tmp_path, monkeypatch):
    import sys
    from pathlib import Path as P

    sys.path.insert(0, str(P(__file__).resolve().parent.parent / "scripts"))
    import train_ensemble

    monkeypatch.chdir(tmp_path)
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "ens.yaml").write_text(
        """
dataset:
  name: synthetic
  data_dir: ./data
  modalities: [s1, s2]
  num_classes: 4
  num_samples: 48
  sequence_length: 8
  batch_size: 16
model:
  fusion_type: early
  hidden_dim: 16
  output_dim: 8
  dropout: 0.1
  layer_norm: false
  encoders:
    s1: {type: sequence, encoder_type: cnn, num_layers: 1}
    s2: {type: sequence, encoder_type: cnn, num_layers: 1}
training:
  max_epochs: 1
  learning_rate: 1e-3
  optimizer: adam
  scheduler: none
experiment:
  name: ens
  save_dir: ./runs
seed: 7
"""
    )
    import json

    train_ensemble.main(
        ["--num-models", "2", "--epochs", "1",
         "--config-name", str(cfg_dir / "ens"),
         "--output_dir", str(tmp_path / "experiments" / "ensemble")]
    )
    results = json.loads(
        (tmp_path / "experiments" / "ensemble" / "ensemble_results.json").read_text()
    )
    assert results["num_models"] == 2
    assert 0 <= results["ensemble"]["accuracy"] <= 1
    assert len(results["members"]) == 2
