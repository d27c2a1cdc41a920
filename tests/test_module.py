"""Flagship module: config construction, mixed-rate modalities, aux contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
    MultimodalFusionModel,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
)


def _mhad_config():
    """MHAD-style mixed-rate config: video frames + IMU sequence."""
    return ConfigNode(
        {
            "dataset": {
                "name": "mhad",
                "modalities": ["video", "imu"],
                "num_classes": 11,
            },
            "model": {
                "fusion_type": "hybrid",
                "hidden_dim": 32,
                "output_dim": 16,
                "num_heads": 4,
                "dropout": 0.1,
                "layer_norm": True,
                "encoders": {
                    "video": {"type": "frame", "input_dim": 24, "temporal_pooling": "attention"},
                    "imu": {"type": "sequence", "input_dim": 12, "encoder_type": "gru", "num_layers": 1},
                },
            },
        }
    )


class TestMixedRateModalities:
    def test_mhad_video_plus_imu(self):
        """Video at 30 steps + IMU at 50 steps in the same window."""
        model = MultimodalFusionModel.from_config(_mhad_config())
        rng = jax.random.PRNGKey(0)
        feats = {
            "video": jnp.asarray(
                np.random.default_rng(0).standard_normal((4, 30, 24)), jnp.float32
            ),
            "imu": jnp.asarray(
                np.random.default_rng(1).standard_normal((4, 50, 12)), jnp.float32
            ),
        }
        mask = jnp.ones((4, 2))
        lengths = jnp.array([30, 15, 30, 30])  # in the FIRST modality's axis
        variables = model.init({"params": rng, "dropout": rng}, feats, mask, lengths)
        logits = model.apply(variables, feats, mask, lengths, train=False)
        assert logits.shape == (4, 11)
        assert bool(jnp.isfinite(logits).all())

    def test_length_scaling_masks_proportionally(self):
        """A half-length window must mask the back half of BOTH rates."""
        model = MultimodalFusionModel.from_config(_mhad_config())
        rng = jax.random.PRNGKey(0)
        feats = {
            "video": jnp.asarray(
                np.random.default_rng(0).standard_normal((2, 30, 24)), jnp.float32
            ),
            "imu": jnp.asarray(
                np.random.default_rng(1).standard_normal((2, 50, 12)), jnp.float32
            ),
        }
        lengths = jnp.array([15, 30])
        variables = model.init({"params": rng, "dropout": rng}, feats, None, lengths)
        base = model.apply(variables, feats, None, lengths, train=False)
        # garbage in the masked tail of both modalities: video beyond 15,
        # imu beyond ceil(15 * 50/30) = 25
        garbled = {
            "video": feats["video"].at[0, 15:, :].set(1e3),
            "imu": feats["imu"].at[0, 25:, :].set(1e3),
        }
        out = model.apply(variables, garbled, None, lengths, train=False)
        np.testing.assert_allclose(
            np.asarray(base[0]), np.asarray(out[0]), rtol=1e-4
        )


class TestFromConfig:
    def test_builds_all_fusion_types(self, tiny_model_cfg):
        for fusion in ("early", "late", "hybrid"):
            cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
            cfg.set_dotted("model.fusion_type", fusion)
            model = MultimodalFusionModel.from_config(cfg)
            assert model.fusion_type == fusion
            assert model.modalities == ("sensor1", "sensor2")

    def test_backend_flag_strings_parse_as_bools(self, tiny_model_cfg):
        """CLI/env strings: "false"/"0" must DISABLE kernels (bool("0") is
        True — the naive coercion silently enabled them); bad values raise."""
        import pytest as _pytest

        for raw, expect in [("false", False), ("0", False), ("true", True),
                            ("on", True), ("", False)]:
            cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
            cfg.set_dotted("model.pallas_rnn", raw)
            cfg.set_dotted("model.flash_attention", raw)
            model = MultimodalFusionModel.from_config(cfg)
            assert model.pallas_rnn is expect, (raw, model.pallas_rnn)

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("model.pallas_rnn", "bogus")
        with _pytest.raises(ValueError, match="Unknown pallas_rnn"):
            MultimodalFusionModel.from_config(cfg)

    def test_dropout_rng_config(self, tiny_model_cfg):
        """training.dropout_rng: validated at build, threaded into every
        transformer encoder config; bogus values raise."""
        import pytest as _pytest

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.dropout_rng", "kernel")
        cfg.set_dotted(
            "model.encoders.sensor1",
            {"type": "sequence", "encoder_type": "transformer", "num_layers": 1},
        )
        model = MultimodalFusionModel.from_config(cfg)
        enc_cfg = dict(dict(model.encoder_configs)["sensor1"])
        assert enc_cfg["dropout_rng"] == "kernel"

        # default is auto (kernel on TPU, xla elsewhere — resolved in-layer)
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "model.encoders.sensor1",
            {"type": "sequence", "encoder_type": "transformer", "num_layers": 1},
        )
        model = MultimodalFusionModel.from_config(cfg)
        assert dict(dict(model.encoder_configs)["sensor1"])["dropout_rng"] == "auto"

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.dropout_rng", "bogus")
        with _pytest.raises(ValueError, match="Unknown training.dropout_rng"):
            MultimodalFusionModel.from_config(cfg)

    def test_return_attention_non_hybrid_raises(self, tiny_model_cfg):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("model.fusion_type", "early")
        model = MultimodalFusionModel.from_config(cfg)
        feats = {"sensor1": jnp.ones((2, 6, 8)), "sensor2": jnp.ones((2, 6, 8))}
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, feats)
        with pytest.raises(
            ValueError, match="Attention information is only available for HybridFusion."
        ):
            model.apply(variables, feats, return_attention=True)

    def test_late_fusion_tuple_normalised(self, tiny_model_cfg):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("model.fusion_type", "late")
        model = MultimodalFusionModel.from_config(cfg)
        feats = {"sensor1": jnp.ones((2, 6, 8)), "sensor2": jnp.ones((2, 6, 8))}
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, feats)
        logits = model.apply(variables, feats)
        assert logits.shape == (2, 5)  # tuple collapsed to fused logits

    def test_mixed_precision_bf16_end_to_end(self, tiny_model_cfg):
        """mixed_precision=true: bf16 activations end-to-end, f32 params,
        f32 logits, outputs within bf16 tolerance of the f32 model — across
        every fusion type and encoder path (transformer/cnn/lstm)."""
        import numpy as np

        rng = jax.random.PRNGKey(0)
        x = np.random.default_rng(0).standard_normal((4, 6, 8)).astype("float32")
        feats = {"sensor1": jnp.asarray(x), "sensor2": jnp.asarray(x[:, :, :8])}
        for fusion in ("early", "late", "hybrid", "uncertainty"):
            cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
            cfg.set_dotted("model.fusion_type", fusion)
            cfg.set_dotted(
                "model.encoders",
                {
                    "sensor1": {"type": "sequence", "encoder_type": "transformer",
                                "num_layers": 1},
                    "sensor2": {"type": "sequence", "encoder_type": "cnn",
                                "num_layers": 1},
                },
            )
            f32_model = MultimodalFusionModel.from_config(cfg)
            cfg.set_dotted("mixed_precision", True)
            bf16_model = MultimodalFusionModel.from_config(cfg)
            assert bf16_model.compute_dtype == jnp.bfloat16
            variables = f32_model.init({"params": rng, "dropout": rng}, feats)
            # params are stored f32 regardless of compute dtype
            bf16_vars = bf16_model.init({"params": rng, "dropout": rng}, feats)
            for leaf in jax.tree_util.tree_leaves(bf16_vars["params"]):
                assert leaf.dtype == jnp.float32
            want = f32_model.apply(variables, feats)
            got = bf16_model.apply(variables, feats)
            assert got.dtype == jnp.float32  # logits upcast for losses
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05,
                err_msg=f"fusion={fusion}",
            )

    def test_layer_norm_toggle(self, tiny_model_cfg):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("model.layer_norm", False)
        model = MultimodalFusionModel.from_config(cfg)
        feats = {"sensor1": jnp.ones((2, 6, 8)), "sensor2": jnp.ones((2, 6, 8))}
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, feats)
        assert not any(k.startswith("ln_") for k in variables["params"])
