"""Evaluation: metrics, vmapped missing-modality sweep equivalence, CLI JSONs."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
    SyntheticMultimodalDataset,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.device import (
    device_put_split,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.evaluate import (
    _compute_modality_importance,
    _subset_masks,
    evaluate_missing_modalities,
    evaluate_model,
    forward_all,
    measure_inference_latency,
    generate_attention_visualization,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
    MultimodalFusionModel,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def fitted(tiny_model_cfg, tmp_path_factory):
    trainer = Trainer(tiny_model_cfg)
    dims = {"sensor1": 8, "sensor2": 8}
    mk = lambda s, n: SyntheticMultimodalDataset(  # noqa: E731
        num_samples=n, num_classes=5, modality_dims=dims, sequence_length=12, split=s
    ).windows
    train_w, val_w, test_w = mk("train", 32), mk("val", 16), mk("test", 20)
    trainer.fit(train_w, val_w, save_dir=tmp_path_factory.mktemp("fit"), log_fn=None)
    variables = trainer.variables(trainer._final_state)
    return trainer.model, variables, test_w


class TestEvaluateModel:
    def test_metrics_schema(self, fitted):
        model, variables, test_w = fitted
        metrics = evaluate_model(model, variables, test_w, batch_size=8)
        assert set(metrics) == {"accuracy", "f1_macro", "loss", "num_samples"}
        assert metrics["num_samples"] == 20
        assert 0 <= metrics["accuracy"] <= 1

    def test_return_predictions(self, fitted):
        model, variables, test_w = fitted
        metrics, (preds, labels, conf, logits) = evaluate_model(
            model, variables, test_w, batch_size=8,
            return_predictions=True, include_logits=True,
        )
        assert preds.shape == labels.shape == conf.shape == (20,)
        assert logits.shape == (20, 5)
        assert metrics["accuracy"] == pytest.approx(float((preds == labels).mean()))
        # confidences are max softmax probabilities
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        np.testing.assert_allclose(conf, probs.max(-1), rtol=1e-6)

    def test_batch_padding_does_not_change_logits(self, fitted):
        """Padded final batches must not corrupt per-window logits."""
        model, variables, test_w = fitted
        data = device_put_split(test_w)
        l1 = forward_all(model, variables, data, batch_size=7)  # 20 % 7 != 0
        l2 = forward_all(model, variables, data, batch_size=20)
        np.testing.assert_allclose(l1, l2, rtol=2e-3, atol=2e-5)


class TestSubsetMasks:
    def test_all_nonempty_subsets(self):
        masks, combos = _subset_masks(3)
        assert masks.shape == (7, 3)
        assert combos[0] == (0,)
        assert combos[-1] == (0, 1, 2)
        assert {tuple(int(v) for v in m) for m in masks} == {
            (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)
        }


class TestMissingModalitySweep:
    def test_results_schema(self, fitted):
        model, variables, test_w = fitted
        results = evaluate_missing_modalities(
            model, variables, test_w, ["sensor1", "sensor2"], batch_size=8
        )
        assert set(results) == {
            "full_modalities", "single_modalities", "all_combinations",
            "modality_importance",
        }
        assert set(results["all_combinations"]) == {
            "sensor1", "sensor2", "sensor1+sensor2"
        }
        assert set(results["single_modalities"]) == {"sensor1", "sensor2"}
        total = sum(abs(v) for v in results["modality_importance"].values())
        assert total == pytest.approx(1.0) or total == 0.0

    def test_vmapped_sweep_equals_explicit_zeroing(self, fitted):
        """The vmapped subset sweep must match the reference's approach of
        zeroing dropped features and re-running the model per subset."""
        model, variables, test_w = fitted
        results = evaluate_missing_modalities(
            model, variables, test_w, ["sensor1", "sensor2"], batch_size=20
        )
        data = device_put_split(test_w)
        labels = np.asarray(data.labels)
        idx = jnp.arange(20, dtype=jnp.int32)
        features, _, lengths = data.gather(idx)
        for combo, name in [((0,), "sensor1"), ((1,), "sensor2"), ((0, 1), "sensor1+sensor2")]:
            mask_row = np.zeros(2, np.float32)
            mask_row[list(combo)] = 1
            feats = {
                m: (features[m] if i in combo else jnp.zeros_like(features[m]))
                for i, m in enumerate(["sensor1", "sensor2"])
            }
            logits = model.apply(
                variables, feats, jnp.tile(mask_row, (20, 1)), lengths, train=False
            )
            acc = float((np.asarray(logits).argmax(-1) == labels).mean())
            assert results["all_combinations"][name]["accuracy"] == pytest.approx(
                acc, abs=1e-6
            )

    def test_importance_normalisation(self):
        results = {
            "all_combinations": {
                "a": {"accuracy": 0.9},
                "b": {"accuracy": 0.1},
                "a+b": {"accuracy": 0.95},
            }
        }
        imp = _compute_modality_importance(results, ["a", "b"])
        assert sum(abs(v) for v in imp.values()) == pytest.approx(1.0)
        assert imp["a"] > 0  # a-containing combos outperform


class TestLatency:
    def test_latency_positive(self, fitted):
        model, variables, test_w = fitted
        mean_ms, std_ms = measure_inference_latency(
            model, variables, test_w, batch_size=8, max_batches=3, warmup=1
        )
        assert mean_ms > 0
        assert std_ms >= 0

    def test_amortized_latency(self, fitted):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.evaluate import (
            measure_amortized_latency,
        )

        model, variables, test_w = fitted
        ms = measure_amortized_latency(
            model, variables, device_put_split(test_w), batch_size=8, repeats=2
        )
        assert ms > 0

    def test_malformed_batches_skipped_with_warning(self, fitted, capsys):
        """Best-effort parse + skip-with-warning (reference eval.py:185-221)."""
        model, variables, test_w = fitted
        data = device_put_split(test_w)
        idx = jnp.arange(4, dtype=jnp.int32)
        feats, labels, lengths = data.gather(idx)
        mask = jnp.ones((4, 2), jnp.float32)
        good = (dict(feats), labels, mask, lengths)
        batches = [
            42,                      # unparseable
            ("not-a-mapping",),      # unparseable
            ({}, labels),            # empty features
            ({"sensor1": "junk"}, labels),  # non-tensor feature
            good,
        ]
        mean_ms, std_ms = measure_inference_latency(model, variables, batches)
        out = capsys.readouterr().out
        assert mean_ms > 0
        assert out.count("Warning:") >= 4

    def test_all_malformed_returns_zero(self, fitted):
        model, variables, _ = fitted
        mean_ms, std_ms = measure_inference_latency(model, variables, [1, 2, None])
        assert (mean_ms, std_ms) == (0.0, 0.0)


class TestAttentionViz:
    def test_writes_png_for_hybrid(self, fitted, tmp_path):
        model, variables, test_w = fitted
        path = generate_attention_visualization(
            model, variables, test_w, ["sensor1", "sensor2"],
            tmp_path / "attn.png", batch_size=8,
        )
        assert path is not None and path.exists() and path.stat().st_size > 0

    def test_returns_none_for_non_hybrid(self, tiny_model_cfg, tmp_path):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("model.fusion_type", "early")
        model = MultimodalFusionModel.from_config(cfg)
        assert (
            generate_attention_visualization(
                model, {}, None, ["sensor1"], tmp_path / "x.png"
            )
            is None
        )


class TestEvalCLI:
    def test_run_evaluation_writes_jsons(self, tiny_model_cfg, tmp_path, monkeypatch):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.evaluate import (
            run_evaluation,
        )

        trainer = Trainer(tiny_model_cfg)
        dims = {"sensor1": 8, "sensor2": 8}
        mk = lambda s, n: SyntheticMultimodalDataset(  # noqa: E731
            num_samples=n, num_classes=5, modality_dims=dims,
            sequence_length=12, split=s,
        ).windows
        results = trainer.fit(
            mk("train", 32), mk("val", 16), save_dir=tmp_path / "run", log_fn=None
        )
        ckpt = results["best_model_path"]
        monkeypatch.chdir(tmp_path)
        # config bundled in ckpt drives dataset rebuild; synthetic => hermetic
        out = run_evaluation(
            checkpoint=ckpt,
            output_dir=str(tmp_path / "experiments" / "hybrid"),
            analysis_dir=str(tmp_path / "analysis"),
            missing_modality_test=True,
        )
        exp_dir = tmp_path / "experiments" / "hybrid"
        eval_json = json.loads((exp_dir / "evaluation_results.json").read_text())
        assert set(eval_json) >= {
            "dataset", "fusion_type", "test_accuracy", "test_f1_macro",
            "test_loss", "ece", "mce", "nll", "inference_ms_mean",
            "inference_ms_std",
        }
        assert eval_json["fusion_type"] == "hybrid"
        unc = json.loads((exp_dir / "uncertainty.json").read_text())
        assert set(unc) >= {"ece", "mce", "nll", "num_bins", "calibration_plot"}
        assert unc["temperature"] >= 1e-3
        assert "ece_after_temperature_scaling" in unc
        assert unc["mc_dropout"]["num_samples"] == 4
        assert unc["mc_dropout"]["mean_uncertainty"] >= 0
        missing = json.loads((exp_dir / "missing_modality.json").read_text())
        assert "modality_importance" in missing
        assert (tmp_path / "analysis" / "hybrid" / "calibration.png").exists()
        assert out["test_accuracy"] == eval_json["test_accuracy"]
