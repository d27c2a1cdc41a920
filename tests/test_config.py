"""Config tree: YAML load, dotted overrides, interpolation."""

import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
    load_config,
    parse_overrides,
)


@pytest.fixture
def cfg_file(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        """
model:
  fusion_type: hybrid
  hidden_dim: 256
dataset:
  name: pamap2
  modalities: [a, b]
training:
  learning_rate: 1e-3
experiment:
  name: a2_${model.fusion_type}_${dataset.name}
"""
    )
    return path


def test_load_and_access(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.model.fusion_type == "hybrid"
    assert cfg["model"]["hidden_dim"] == 256
    assert cfg.dataset.modalities == ["a", "b"]
    assert isinstance(cfg.training.learning_rate, float)
    assert cfg.model.get("missing", 7) == 7


def test_interpolation(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.experiment.name == "a2_hybrid_pamap2"
    cfg.set_dotted("model.fusion_type", "early")
    assert cfg.experiment.name == "a2_early_pamap2"


def test_dotted_overrides(cfg_file):
    cfg = load_config(
        cfg_file,
        ["model.fusion_type=late", "dataset.modalities=[x,y,z]", "training.max_epochs=5"],
    )
    assert cfg.model.fusion_type == "late"
    assert cfg.dataset.modalities == ["x", "y", "z"]
    assert cfg.training.max_epochs == 5


def test_parse_overrides_types():
    parsed = parse_overrides(["a.b=1e-3", "c=true", "d=[1,2]", "e=text", "+f.g=3"])
    assert parsed["a.b"] == pytest.approx(1e-3)
    assert parsed["c"] is True
    assert parsed["d"] == [1, 2]
    assert parsed["e"] == "text"
    assert parsed["f.g"] == 3


def test_malformed_override():
    with pytest.raises(ValueError, match="Malformed override"):
        parse_overrides(["noequalsign"])


def test_to_container_and_merge(cfg_file):
    cfg = load_config(cfg_file)
    cfg.merge({"model": {"hidden_dim": 128, "new_key": 1}})
    container = cfg.to_container(resolve=True)
    assert container["model"]["hidden_dim"] == 128
    assert container["model"]["new_key"] == 1
    assert container["model"]["fusion_type"] == "hybrid"
    assert container["experiment"]["name"] == "a2_hybrid_pamap2"


def test_missing_key_raises():
    cfg = ConfigNode({"a": 1})
    with pytest.raises(KeyError, match="Missing config key"):
        _ = cfg["zzz"]
    with pytest.raises(AttributeError):
        _ = cfg.zzz


class TestPresetConfigs:
    @pytest.fixture
    def preset_dir(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "model:\n  fusion_type: hybrid\n  hidden_dim: 256\n"
            "dataset:\n  name: pamap2\n"
        )
        (tmp_path / "strategies.yaml").write_text(
            "defaults:\n  - base\n\n"
            "uncertainty_fusion:\n  model:\n    fusion_type: uncertainty\n"
            "early_fusion:\n  model:\n    fusion_type: early\n"
        )
        return tmp_path

    def test_defaults_only(self, preset_dir):
        cfg = load_config(preset_dir / "strategies.yaml")
        assert cfg.model.fusion_type == "hybrid"  # base wins without preset
        assert cfg.model.hidden_dim == 256

    def test_preset_merges_over_base(self, preset_dir):
        cfg = load_config(
            preset_dir / "strategies.yaml", ["preset=uncertainty_fusion"]
        )
        assert cfg.model.fusion_type == "uncertainty"
        assert cfg.model.hidden_dim == 256  # untouched base key survives
        assert cfg.dataset.name == "pamap2"

    def test_unknown_preset_raises(self, preset_dir):
        with pytest.raises(ValueError, match="Unknown preset 'bogus'"):
            load_config(preset_dir / "strategies.yaml", ["preset=bogus"])

    def test_preset_without_defaults_raises(self, cfg_file):
        with pytest.raises(ValueError, match="no 'defaults:'"):
            load_config(cfg_file, ["preset=anything"])

    def test_repo_fusion_strategies_uncertainty(self):
        from pathlib import Path

        repo_cfg = Path(__file__).resolve().parent.parent / "config"
        cfg = load_config(
            repo_cfg / "fusion_strategies.yaml", ["preset=uncertainty_fusion"]
        )
        assert cfg.model.fusion_type == "uncertainty"
        assert cfg.uncertainty.num_mc_samples == 10
        assert "uncertainty" in cfg.experiment.name
