"""Serving path: fused-head inference equals the standard model apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
    MultimodalFusionModel,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.serving import (
    make_serving_fn,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
)


@pytest.fixture(scope="module")
def hybrid_model():
    cfg = ConfigNode(
        {
            "dataset": {
                "name": "pamap2",
                "modalities": ["imu_hand", "heart_rate"],
                "num_classes": 25,
            },
            "model": {
                "fusion_type": "hybrid",
                "hidden_dim": 32,
                "output_dim": 16,
                "num_heads": 4,
                "dropout": 0.1,
                "layer_norm": True,
                "encoders": {
                    "imu_hand": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
                    "heart_rate": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
                },
            },
        }
    )
    model = MultimodalFusionModel.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    feats = {
        "imu_hand": jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 8, 17)), jnp.float32
        ),
        "heart_rate": jnp.asarray(
            np.random.default_rng(1).standard_normal((4, 8, 1)), jnp.float32
        ),
    }
    mask = jnp.asarray([[1, 1], [1, 0], [0, 1], [1, 1]], jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, feats, mask)
    return model, variables, feats, mask


def test_serving_xla_path(hybrid_model):
    model, variables, feats, mask = hybrid_model
    serve = make_serving_fn(model, variables, use_pallas_head=False)
    logits = serve(feats, mask)
    expected = model.apply(variables, feats, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(expected), rtol=1e-4, atol=1e-6
    )


def test_serving_pallas_head_matches(hybrid_model):
    model, variables, feats, mask = hybrid_model
    serve = make_serving_fn(model, variables, use_pallas_head=True, interpret=True)
    logits = serve(feats, mask)
    expected = model.apply(variables, feats, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_serving_default_mask(hybrid_model):
    model, variables, feats, _ = hybrid_model
    serve = make_serving_fn(model, variables, use_pallas_head=True, interpret=True)
    logits = serve(feats)
    expected = model.apply(variables, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(expected), rtol=2e-4, atol=2e-5
    )
