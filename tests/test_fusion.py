"""Fusion head contracts: fallback math, masking, errors, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.fusion import (
    EarlyFusion,
    HybridFusion,
    LateFusion,
    UncertaintyFusion,
    build_fusion_model,
)

B, C, H = 4, 11, 32
DIMS = {"video": 12, "imu": 8}


def _feats(batch=B):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.standard_normal((batch, 12)), jnp.float32),
        "imu": jnp.asarray(rng.standard_normal((batch, 8)), jnp.float32),
    }


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestBuildFusionModel:
    def test_types(self):
        assert isinstance(build_fusion_model("early", DIMS, C), EarlyFusion)
        assert isinstance(build_fusion_model("late", DIMS, C), LateFusion)
        assert isinstance(build_fusion_model("hybrid", DIMS, C), HybridFusion)

    def test_unknown_type(self):
        with pytest.raises(ValueError, match="Unknown fusion type: bogus"):
            build_fusion_model("bogus", DIMS, C)

    def test_uncertainty_type_routed(self):
        """fusion_type: uncertainty is a real, buildable head (the reference
        declares it in config/base.yaml:27 but its factory rejects it)."""
        model = build_fusion_model("uncertainty", DIMS, C, num_heads=8, hidden_dim=H)
        assert isinstance(model, UncertaintyFusion)

    def test_num_heads_stripped_for_non_hybrid(self):
        model = build_fusion_model("early", DIMS, C, num_heads=8, hidden_dim=H)
        assert isinstance(model, EarlyFusion)
        hybrid = build_fusion_model("hybrid", DIMS, C, num_heads=8, hidden_dim=H)
        assert hybrid.num_heads == 8


class TestEarlyFusion:
    def test_forward(self, rng):
        model = EarlyFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        logits = model.apply(variables, feats)
        assert logits.shape == (B, C)

    def test_mask_zeroes_features(self, rng):
        model = EarlyFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        mask = jnp.array([[1, 0]] * B, jnp.float32)
        out_masked = model.apply(variables, feats, mask)
        zeroed = {"video": feats["video"], "imu": jnp.zeros_like(feats["imu"])}
        out_zeroed = model.apply(variables, zeroed, mask)
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_zeroed), rtol=1e-6
        )

    def test_missing_modality_error(self, rng):
        model = EarlyFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        with pytest.raises(KeyError, match="Missing features for modality 'imu'"):
            model.apply(variables, {"video": feats["video"]})

    def test_non_2d_error(self, rng):
        model = EarlyFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        bad = {"video": jnp.ones((B, 3, 4)), "imu": jnp.ones((B, 8))}
        with pytest.raises(ValueError, match="Expected 2D tensor for modality 'video'"):
            model.init(rng, bad)

    def test_no_modalities_error(self, rng):
        model = EarlyFusion(modality_names=(), hidden_dim=H, num_classes=C)
        with pytest.raises(ValueError, match="No modalities configured for EarlyFusion."):
            model.init(rng, {})


class TestUncertaintyFusion:
    def test_returns_tuple(self, rng):
        model = UncertaintyFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C
        )
        feats = _feats()
        variables = model.init(rng, feats)
        fused, per_mod = model.apply(variables, feats)
        assert fused.shape == (B, C)
        assert set(per_mod.keys()) == set(DIMS)
        assert all(v.shape == (B, C) for v in per_mod.values())

    def test_weights_are_inverse_variance(self, rng):
        """Fused logits are a convex combination of per-modality logits with
        weights proportional to mask * exp(-log_var)."""
        model = UncertaintyFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C
        )
        feats = _feats()
        variables = model.init(rng, feats)
        mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        fused, per_mod = model.apply(variables, feats, mask)
        stacked = np.stack([np.asarray(per_mod[m]) for m in DIMS], axis=1)
        fused = np.asarray(fused)
        # each fused row lies in the convex hull of its unmasked logits
        for b in range(B):
            active = np.asarray(mask)[b] > 0
            lo = stacked[b][active].min(axis=0) - 1e-5
            hi = stacked[b][active].max(axis=0) + 1e-5
            assert ((fused[b] >= lo) & (fused[b] <= hi)).all()
        # single-modality rows equal that modality's logits exactly
        np.testing.assert_allclose(fused[1], stacked[1, 0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(fused[2], stacked[2, 1], rtol=1e-5, atol=1e-6)

    def test_all_masked_falls_back_uniform(self, rng):
        model = UncertaintyFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C
        )
        feats = _feats()
        variables = model.init(rng, feats)
        mask = jnp.zeros((B, 2))
        fused, _ = model.apply(variables, feats, mask)
        zero_feats = {m: jnp.zeros_like(v) for m, v in feats.items()}
        _, per_mod_zero = model.apply(variables, zero_feats, mask)
        expected = (per_mod_zero["video"] + per_mod_zero["imu"]) / 2.0
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(expected), rtol=1e-5, atol=1e-6
        )

    def test_missing_modality_error(self, rng):
        model = UncertaintyFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C
        )
        feats = _feats()
        variables = model.init(rng, feats)
        with pytest.raises(KeyError, match="Missing features for modality 'video'"):
            model.apply(variables, {"imu": feats["imu"]})

    def test_gradients_flow_to_uncertainty_heads(self, rng):
        model = UncertaintyFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C
        )
        feats = _feats()
        variables = model.init(rng, feats)

        def loss(params):
            fused, _ = model.apply({"params": params}, feats)
            return jnp.sum(fused**2)

        grads = jax.grad(loss)(variables["params"])
        for m in DIMS:
            g = grads[f"unc_{m}_head"]["kernel"]
            assert float(jnp.abs(g).max()) > 0


class TestLateFusion:
    def test_returns_tuple(self, rng):
        model = LateFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        fused, per_mod = model.apply(variables, feats)
        assert fused.shape == (B, C)
        assert set(per_mod.keys()) == set(DIMS)
        assert all(v.shape == (B, C) for v in per_mod.values())

    def test_uniform_fallback_when_all_masked(self, rng):
        """All-masked rows average per-modality logits uniformly
        (reference src/fusion.py:237-240)."""
        model = LateFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        mask = jnp.zeros((B, 2))
        fused, per_mod = model.apply(variables, feats, mask)
        zero_feats = {m: jnp.zeros_like(v) for m, v in feats.items()}
        _, per_mod_zero = model.apply(variables, zero_feats, mask)
        expected = (per_mod_zero["video"] + per_mod_zero["imu"]) / 2.0
        np.testing.assert_allclose(np.asarray(fused), np.asarray(expected), rtol=1e-5)

    def test_single_available_modality_dominates(self, rng):
        model = LateFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        mask = jnp.array([[1.0, 0.0]] * B)
        fused, _ = model.apply(variables, feats, mask)
        only_video = {"video": feats["video"], "imu": jnp.zeros_like(feats["imu"])}
        _, per_mod = model.apply(variables, only_video, mask)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(per_mod["video"]), rtol=1e-5
        )

    def test_missing_modality_error(self, rng):
        model = LateFusion(modality_names=tuple(DIMS), hidden_dim=H, num_classes=C)
        feats = _feats()
        variables = model.init(rng, feats)
        with pytest.raises(KeyError, match="Missing features for modality 'imu'"):
            model.apply(variables, {"video": feats["video"]})


class TestHybridFusion:
    def _model(self):
        return HybridFusion(
            modality_names=tuple(DIMS), hidden_dim=H, num_classes=C, num_heads=4
        )

    def test_forward(self, rng):
        model = self._model()
        feats = _feats()
        variables = model.init(rng, feats)
        logits = model.apply(variables, feats)
        assert logits.shape == (B, C)

    def test_return_attention(self, rng):
        model = self._model()
        feats = _feats()
        variables = model.init(rng, feats)
        logits, info = model.apply(variables, feats, return_attention=True)
        assert logits.shape == (B, C)
        assert set(info["attention_maps"].keys()) == {"video_to_imu", "imu_to_video"}
        assert info["fusion_weights"].shape == (B, 2)

    def test_adaptive_weights_respect_mask(self, rng):
        """Masked modality gets exactly zero weight; available modality gets
        1.0 (reference src/fusion.py:464-479 exact-value contract)."""
        model = self._model()
        feats = _feats(batch=3)
        variables = model.init(rng, feats)
        mask = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        _, info = model.apply(variables, feats, mask, return_attention=True)
        w = np.asarray(info["fusion_weights"])
        np.testing.assert_allclose(w[0], [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(w[1], [0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(w[2].sum(), 1.0, atol=1e-6)

    def test_all_masked_uniform_fallback(self, rng):
        model = self._model()
        feats = _feats(batch=2)
        variables = model.init(rng, feats)
        mask = jnp.zeros((2, 2))
        _, info = model.apply(variables, feats, mask, return_attention=True)
        w = np.asarray(info["fusion_weights"])
        np.testing.assert_allclose(w, 0.5 * np.ones((2, 2)), atol=1e-6)

    def test_logits_finite_under_any_mask(self, rng):
        model = self._model()
        feats = _feats()
        variables = model.init(rng, feats)
        for mask in ([1, 1], [1, 0], [0, 1], [0, 0]):
            logits = model.apply(
                variables, feats, jnp.array([mask] * B, jnp.float32)
            )
            assert bool(jnp.isfinite(logits).all())

    def test_gradients_flow_to_all_params(self, rng):
        model = self._model()
        feats = _feats()
        variables = model.init(rng, feats)

        def loss(params):
            return jnp.sum(model.apply({"params": params}, feats) ** 2)

        grads = jax.grad(loss)(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        assert all(bool(jnp.isfinite(g).all()) for _, g in flat)
        # With pooled (length-1) key sequences, softmax over one key is the
        # constant 1, so the pair query/key projections receive zero gradient
        # by construction — true of the reference architecture as well.
        for path, g in flat:
            name = jax.tree_util.keystr(path)
            if "query" in name or "key" in name:
                continue
            assert float(jnp.abs(g).max()) > 0, f"zero grad at {name}"

    def test_missing_modality_error(self, rng):
        model = self._model()
        feats = _feats()
        variables = model.init(rng, feats)
        with pytest.raises(KeyError, match="Missing features for modality"):
            model.apply(variables, {"video": feats["video"]})


class TestSingleModalityHybrid:
    def test_single_modality_hybrid_works(self, rng):
        """M=1: zero cross-modal pairs; the head degenerates to gated self
        (the reference builds zero attention modules, src/fusion.py:300-314)."""
        model = HybridFusion(
            modality_names=("only",), hidden_dim=H, num_classes=C, num_heads=4
        )
        feats = {"only": jnp.asarray(np.random.default_rng(0).standard_normal((B, 8)), jnp.float32)}
        variables = model.init(rng, feats)
        logits = model.apply(variables, feats)
        assert logits.shape == (B, C)
        assert bool(jnp.isfinite(logits).all())
        logits2, info = model.apply(variables, feats, return_attention=True)
        assert info["attention_maps"] == {}
        np.testing.assert_allclose(np.asarray(info["fusion_weights"]), 1.0)
