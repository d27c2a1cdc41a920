"""AOT serving bundles (serving.export_serving_bundle / load_serving_bundle).

The bundle must reproduce the live model's logits bit-for-bit through the
deserialized StableHLO executable, with no model code in the loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
    MultimodalFusionModel,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.serving import (
    export_serving_bundle,
    load_serving_bundle,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
)

DIMS = {"imu_hand": 9, "heart_rate": 1}
BATCH, CHUNK = 4, 12


def _build():
    config = ConfigNode(
        {
            "dataset": {
                "name": "pamap2",
                "modalities": list(DIMS),
                "num_classes": 7,
                "batch_size": BATCH,
            },
            "model": {
                "fusion_type": "hybrid",
                "hidden_dim": 16,
                "output_dim": 8,
                "num_heads": 2,
                "dropout": 0.1,
                "flash_attention": False,
                "fused_mlp": False,
                "pallas_rnn": False,
                "encoders": {
                    m: {
                        "type": "sequence",
                        "input_dim": d,
                        "encoder_type": "transformer",
                        "num_layers": 1,
                    }
                    for m, d in DIMS.items()
                },
            },
        }
    )
    model = MultimodalFusionModel.from_config(config)
    rng = jax.random.PRNGKey(0)
    feats = {
        m: jnp.zeros((BATCH, CHUNK, d), jnp.float32) for m, d in DIMS.items()
    }
    mask = jnp.ones((BATCH, len(DIMS)), jnp.float32)
    lengths = jnp.full((BATCH,), CHUNK, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, feats, mask, lengths)
    return model, variables


class TestServingBundle:
    def test_roundtrip_matches_live_model(self, tmp_path):
        model, variables = _build()
        out = export_serving_bundle(
            model, variables, tmp_path / "bundle",
            batch_size=BATCH, chunk_size=CHUNK, feature_dims=DIMS,
        )
        assert (out / "serving.stablehlo").exists()
        assert (out / "params.npz").exists()
        assert (out / "bundle.json").exists()

        fn, meta = load_serving_bundle(out)
        assert meta["modalities"] == list(DIMS)
        rng = np.random.default_rng(0)
        feats = {
            m: rng.standard_normal((BATCH, CHUNK, d)).astype(np.float32)
            for m, d in DIMS.items()
        }
        mask = jnp.ones((BATCH, len(DIMS)), jnp.float32)
        lengths = jnp.full((BATCH,), CHUNK, jnp.int32)
        got = fn(feats, mask, lengths)
        want = model.apply(
            variables,
            {m: jnp.asarray(v) for m, v in feats.items()},
            mask,
            lengths,
            train=False,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_default_mask_and_lengths(self, tmp_path):
        model, variables = _build()
        out = export_serving_bundle(
            model, variables, tmp_path / "bundle",
            batch_size=BATCH, chunk_size=CHUNK, feature_dims=DIMS,
        )
        fn, _ = load_serving_bundle(out)
        feats = {
            m: np.zeros((BATCH, CHUNK, d), np.float32) for m, d in DIMS.items()
        }
        logits = fn(feats)
        assert np.asarray(logits).shape == (BATCH, 7)

    def test_shape_mismatch_rejected(self, tmp_path):
        model, variables = _build()
        out = export_serving_bundle(
            model, variables, tmp_path / "bundle",
            batch_size=BATCH, chunk_size=CHUNK, feature_dims=DIMS,
        )
        fn, _ = load_serving_bundle(out)
        bad = {
            m: np.zeros((BATCH + 1, CHUNK, d), np.float32)
            for m, d in DIMS.items()
        }
        with pytest.raises(Exception):
            fn(bad)

    def test_cli_script(self, tmp_path, monkeypatch):
        """checkpoint -> scripts/export_serving.py -> loadable bundle."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
            CheckpointManager,
        )

        model, variables = _build()
        config = ConfigNode(
            {
                "dataset": {
                    "name": "pamap2",
                    "modalities": list(DIMS),
                    "num_classes": 7,
                    "batch_size": BATCH,
                    "chunk_size": CHUNK,
                },
                "model": {
                    "fusion_type": "hybrid",
                    "hidden_dim": 16,
                    "output_dim": 8,
                    "num_heads": 2,
                    "dropout": 0.1,
                    "encoders": {
                        m: {
                            "type": "sequence",
                            "input_dim": d,
                            "encoder_type": "transformer",
                            "num_layers": 1,
                        }
                        for m, d in DIMS.items()
                    },
                },
                "experiment": {"name": "exp", "save_dir": str(tmp_path / "runs")},
            }
        )
        mgr = CheckpointManager(
            tmp_path / "runs" / "exp" / "checkpoints", config=config
        )
        mgr.save(variables, epoch=0, score=1.0)
        ckpt = mgr.best_model_path
        assert ckpt

        import importlib

        mod = importlib.import_module("scripts.export_serving")
        mod.main(
            [
                "--checkpoint", str(ckpt),
                "--output_dir", str(tmp_path / "bundle"),
                "--batch_size", str(BATCH),
            ]
        )
        fn, meta = load_serving_bundle(tmp_path / "bundle")
        assert meta["batch_size"] == BATCH
        feats = {
            m: np.zeros((BATCH, CHUNK, d), np.float32) for m, d in DIMS.items()
        }
        assert np.asarray(fn(feats)).shape == (BATCH, 7)
