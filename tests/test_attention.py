"""Attention contracts: masked-softmax zeroing, shapes, pairwise semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.attention import (
    CrossModalAttention,
    PairwiseModalityAttention,
    TemporalAttention,
    ordered_pairs,
    visualize_attention,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.masked import (
    masked_softmax,
)

B, H = 4, 16


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestMaskedSoftmax:
    def test_unmasked_is_softmax(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 5)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(masked_softmax(x)),
            np.asarray(jax.nn.softmax(x, axis=-1)),
            rtol=1e-6,
        )

    def test_masked_positions_zero(self):
        x = jnp.zeros((2, 4))
        mask = jnp.array([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)
        w = np.asarray(masked_softmax(x, mask))
        np.testing.assert_allclose(w[0], [0.5, 0.5, 0, 0], atol=1e-6)
        np.testing.assert_allclose(w[1], [1, 0, 0, 0], atol=1e-6)

    def test_all_masked_is_exact_zero(self):
        x = jnp.ones((2, 4)) * 5
        mask = jnp.zeros((2, 4))
        w = np.asarray(masked_softmax(x, mask))
        assert (w == 0).all()


class TestCrossModalAttention:
    def test_2d_shapes(self, rng):
        attn = CrossModalAttention(hidden_dim=H, num_heads=4)
        q = jnp.ones((B, 12))
        k = jnp.ones((B, 6))
        variables = attn.init(rng, q, k, k)
        out, weights = attn.apply(variables, q, k, k)
        assert out.shape == (B, H)
        assert weights.shape == (B, 4, 1, 1)

    def test_3d_shapes(self, rng):
        attn = CrossModalAttention(hidden_dim=H, num_heads=4)
        q = jnp.ones((B, 3, 12))
        k = jnp.ones((B, 5, 6))
        variables = attn.init(rng, q, k, k)
        out, weights = attn.apply(variables, q, k, k)
        assert out.shape == (B, 3, H)
        assert weights.shape == (B, 4, 3, 5)

    def test_masked_keys_give_zero_weights(self, rng):
        attn = CrossModalAttention(hidden_dim=H, num_heads=2)
        q = jnp.ones((2, 8))
        k = jnp.ones((2, 8))
        mask = jnp.array([1.0, 0.0])
        variables = attn.init(rng, q, k, k, mask)
        out, weights = attn.apply(variables, q, k, k, mask)
        w = np.asarray(weights)
        np.testing.assert_allclose(w[0].ravel(), 1.0, atol=1e-6)  # single key
        np.testing.assert_allclose(w[1].ravel(), 0.0, atol=1e-6)  # masked out

    def test_bad_head_split(self, rng):
        attn = CrossModalAttention(hidden_dim=10, num_heads=3)
        with pytest.raises(AssertionError, match="must be divisible"):
            attn.init(rng, jnp.ones((B, 4)), jnp.ones((B, 4)), jnp.ones((B, 4)))

    def test_gradients_flow(self, rng):
        attn = CrossModalAttention(hidden_dim=H, num_heads=2)
        q = jnp.asarray(np.random.default_rng(0).standard_normal((B, 8)), jnp.float32)
        variables = attn.init(rng, q, q, q)

        def loss(params):
            out, _ = attn.apply({"params": params}, q, q, q)
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(variables["params"])
        assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree_util.tree_leaves(grads))


class TestTemporalAttention:
    def test_shapes(self, rng):
        attn = TemporalAttention(hidden_dim=H, num_heads=4)
        seq = jnp.asarray(np.random.default_rng(1).standard_normal((B, 7, 6)), jnp.float32)
        variables = attn.init(rng, seq)
        out, weights = attn.apply(variables, seq)
        assert out.shape == (B, 7, H)
        assert weights.shape == (B, 4, 7, 7)

    def test_masked_timesteps_zeroed(self, rng):
        attn = TemporalAttention(hidden_dim=H, num_heads=2)
        seq = jnp.ones((B, 6, 4))
        mask = jnp.concatenate([jnp.ones((B, 3)), jnp.zeros((B, 3))], axis=1)
        variables = attn.init(rng, seq, mask)
        out, _ = attn.apply(variables, seq, mask)
        assert float(jnp.abs(out[:, 3:]).max()) == 0.0

    def test_pool_sequence(self, rng):
        attn = TemporalAttention(hidden_dim=H, num_heads=2)
        seq = jnp.asarray(np.random.default_rng(2).standard_normal((B, 5, 4)), jnp.float32)
        variables = attn.init(rng, seq)
        out, weights = attn.apply(variables, seq)
        pooled = TemporalAttention.pool_sequence(out, weights)
        assert pooled.shape == (B, H)

    def test_pool_sequence_rank_check(self):
        with pytest.raises(ValueError, match="Expected attention weights with 4 dims"):
            TemporalAttention.pool_sequence(jnp.ones((B, 5, H)), jnp.ones((B, 5, 5)))


class TestPairwiseModalityAttention:
    def test_outputs_and_maps(self, rng):
        names = ("va", "vb", "vc")
        pma = PairwiseModalityAttention(modality_names=names, hidden_dim=H, num_heads=2)
        feats = {n: jnp.ones((B, 6)) for n in names}
        variables = pma.init(rng, feats)
        attended, maps = pma.apply(variables, feats)
        assert set(attended.keys()) == set(names)
        assert all(v.shape == (B, H) for v in attended.values())
        assert len(maps) == 6  # M(M-1) ordered pairs
        assert "va_to_vb" in maps and "vb_to_va" in maps

    def test_masked_modality_output_zeroed(self, rng):
        names = ("x", "y")
        pma = PairwiseModalityAttention(modality_names=names, hidden_dim=H, num_heads=2)
        feats = {n: jnp.ones((2, 4)) for n in names}
        mask = jnp.array([[1.0, 0.0], [1.0, 1.0]])
        variables = pma.init(rng, feats, mask)
        attended, maps = pma.apply(variables, feats, mask)
        # modality y is unavailable for sample 0 -> its output row is zero
        assert float(jnp.abs(attended["y"][0]).max()) == 0.0
        assert float(jnp.abs(attended["y"][1]).max()) > 0.0
        # attention TO y is also masked out for sample 0
        assert float(np.asarray(maps["x_to_y"])[0].max()) == 0.0

    def test_empty_modalities_raises(self):
        pma = PairwiseModalityAttention(modality_names=(), hidden_dim=H)
        with pytest.raises(ValueError, match="No modalities provided"):
            pma.init(jax.random.PRNGKey(0), {})


def test_ordered_pairs():
    assert ordered_pairs(["a", "b", "c"]) == [
        (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)
    ]


def test_visualize_attention_writes_file(tmp_path):
    weights = np.random.default_rng(0).random((2, 4, 3, 3))
    path = tmp_path / "sub" / "attn.png"
    visualize_attention(weights, ["m1", "m2", "m3"], save_path=path)
    assert path.exists() and path.stat().st_size > 0
