"""Packed threefry Bernoulli masks (ops/prng.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.prng import (
    PackedDropout,
    bernoulli_packed,
    realized_keep_prob,
)


class TestBernoulliPacked:
    def test_deterministic(self):
        key = jax.random.PRNGKey(7)
        a = bernoulli_packed(key, 0.9, (64, 33))
        b = bernoulli_packed(key, 0.9, (64, 33))
        assert a.dtype == jnp.bool_
        np.testing.assert_array_equal(a, b)

    def test_different_keys_differ(self):
        a = bernoulli_packed(jax.random.PRNGKey(0), 0.5, (1024,))
        b = bernoulli_packed(jax.random.PRNGKey(1), 0.5, (1024,))
        assert not bool(jnp.array_equal(a, b))

    def test_mean_matches_realized_keep(self):
        keep = 0.9
        mask = bernoulli_packed(jax.random.PRNGKey(3), keep, (1 << 20,))
        got = float(jnp.mean(mask))
        want = realized_keep_prob(keep)  # 230/256
        assert abs(got - want) < 3e-3
        assert want == 230 / 256

    def test_lanes_are_unbiased(self):
        """Each of the 4 byte lanes of a word must hit the same rate — a
        packing bug (e.g. reusing a lane) would show up as lane skew."""
        n = 1 << 20
        mask = np.asarray(bernoulli_packed(jax.random.PRNGKey(4), 0.5, (n,)))
        lanes = mask.reshape(-1, 4)
        rates = lanes.mean(axis=0)
        assert np.all(np.abs(rates - 0.5) < 5e-3), rates

    def test_shape_not_multiple_of_four(self):
        mask = bernoulli_packed(jax.random.PRNGKey(5), 0.7, (3, 5, 7))
        assert mask.shape == (3, 5, 7)

    def test_degenerate_probs(self):
        assert bool(jnp.all(bernoulli_packed(jax.random.PRNGKey(0), 1.0, (100,))))
        assert not bool(jnp.any(bernoulli_packed(jax.random.PRNGKey(0), 0.0, (100,))))
        assert realized_keep_prob(1.0) == 1.0
        assert realized_keep_prob(0.0) == 0.0

    def test_rejects_bad_prob(self):
        with pytest.raises(ValueError, match="keep_prob"):
            bernoulli_packed(jax.random.PRNGKey(0), 1.5, (8,))

    def test_jittable(self):
        fn = jax.jit(lambda k: bernoulli_packed(k, 0.8, (256,)))
        out = fn(jax.random.PRNGKey(9))
        assert out.shape == (256,)


class TestPackedDropout:
    def test_deterministic_mode_is_identity(self):
        x = jnp.ones((4, 8))
        mod = PackedDropout(0.5)
        out = mod.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(out, x)

    def test_unbiased_expectation(self):
        """E[dropout(x)] == x under the REALISED keep prob scaling."""
        x = jnp.ones((1 << 18,))
        mod = PackedDropout(0.1)
        out = mod.apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        assert abs(float(jnp.mean(out)) - 1.0) < 5e-3
        kept = float(jnp.mean(out > 0))
        assert abs(kept - realized_keep_prob(0.9)) < 5e-3

    def test_zero_rate_never_draws_rng(self):
        x = jnp.ones((4, 4))
        # no 'dropout' rng provided: would raise if the module drew one
        out = PackedDropout(0.0).apply({}, x, deterministic=False)
        np.testing.assert_array_equal(out, x)

    def test_full_rate_zeroes(self):
        x = jnp.ones((4, 4))
        out = PackedDropout(1.0).apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        np.testing.assert_array_equal(out, jnp.zeros_like(x))
