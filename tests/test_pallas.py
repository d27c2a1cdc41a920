"""Fused Pallas hybrid head vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.fusion import (
    HybridFusion,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_fusion import (
    hybrid_fused_inference,
)

NAMES = ("imu_hand", "imu_chest", "imu_ankle", "heart_rate")
B, H, C = 16, 32, 25


@pytest.fixture(scope="module")
def hybrid_setup():
    model = HybridFusion(
        modality_names=NAMES, hidden_dim=H, num_classes=C, num_heads=4, dropout=0.1
    )
    rng = np.random.default_rng(0)
    encoded = {
        n: jnp.asarray(rng.standard_normal((B, H)), jnp.float32) for n in NAMES
    }
    variables = model.init(jax.random.PRNGKey(0), encoded)
    return model, variables, encoded


@pytest.mark.parametrize(
    "mask_pattern",
    [
        np.ones((B, 4)),
        np.tile([1, 0, 1, 0], (B, 1)),
        np.tile([0, 0, 0, 1], (B, 1)),
        np.zeros((B, 4)),
    ],
    ids=["all", "half", "single", "none"],
)
def test_fused_head_matches_xla(hybrid_setup, mask_pattern):
    model, variables, encoded = hybrid_setup
    mask = jnp.asarray(mask_pattern, jnp.float32)
    expected = model.apply(variables, encoded, mask, train=False)
    got = hybrid_fused_inference(
        variables, encoded, mask, NAMES, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_fused_head_mixed_mask_rows(hybrid_setup):
    model, variables, encoded = hybrid_setup
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.integers(0, 2, (B, 4)), jnp.float32)
    expected = model.apply(variables, encoded, mask, train=False)
    got = hybrid_fused_inference(variables, encoded, mask, NAMES, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_fused_head_nondivisible_batch(hybrid_setup):
    """Batch not divisible by the kernel block: padding must not leak."""
    model, variables, encoded = hybrid_setup
    small = {n: v[:5] for n, v in encoded.items()}
    mask = jnp.ones((5, 4))
    expected = model.apply(variables, small, mask, train=False)
    got = hybrid_fused_inference(variables, small, mask, NAMES, interpret=True)
    assert got.shape == (5, C)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5
    )
