"""Encoder behavioral contracts: shapes, pooling semantics, routing, errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
    FrameEncoder,
    SequenceEncoder,
    SimpleMLPEncoder,
    build_encoder,
)

B, T, D, OUT = 4, 10, 6, 8


def _init_apply(module, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = module.init({"params": rng, "dropout": rng}, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


@pytest.fixture(scope="module")
def seq():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, D)), jnp.float32
    )


class TestSequenceEncoder:
    @pytest.mark.parametrize("enc_type", ["lstm", "gru", "cnn", "transformer"])
    def test_output_shape(self, seq, enc_type):
        enc = SequenceEncoder(
            hidden_dim=16, output_dim=OUT, num_layers=2, encoder_type=enc_type
        )
        _, out = _init_apply(enc, seq)
        assert out.shape == (B, OUT)
        assert bool(jnp.isfinite(out).all())

    def test_bad_rank_raises(self):
        enc = SequenceEncoder(hidden_dim=16, output_dim=OUT)
        with pytest.raises(ValueError, match="Expected 3D input sequence"):
            enc.init(jax.random.PRNGKey(0), jnp.ones((B, D)))

    def test_unknown_type_raises(self, seq):
        enc = SequenceEncoder(hidden_dim=16, output_dim=OUT, encoder_type="wavelet")
        with pytest.raises(ValueError, match="Unknown encoder type: wavelet"):
            enc.init(jax.random.PRNGKey(0), seq)

    def test_lengths_freeze_rnn_state(self, seq):
        """Final RNN state must equal the state at each row's last valid step
        (pack_padded_sequence semantics, reference src/encoders.py:141-155)."""
        enc = SequenceEncoder(
            hidden_dim=16, output_dim=OUT, num_layers=1, encoder_type="lstm"
        )
        rng = jax.random.PRNGKey(0)
        variables = enc.init(rng, seq)
        lengths = jnp.array([T, 5, 3, T])
        out_masked = enc.apply(variables, seq, lengths)
        # row 1 truncated input should produce identical embedding
        truncated = seq.at[1, 5:, :].set(123.0)  # garbage past the length
        out_garbage = enc.apply(variables, truncated, lengths)
        np.testing.assert_allclose(
            np.asarray(out_masked[1]), np.asarray(out_garbage[1]), rtol=1e-5
        )

    def test_cnn_pool_is_masked_temporal_mean(self, seq):
        """CNN path pools by (masked) temporal mean of conv features."""
        enc = SequenceEncoder(
            hidden_dim=16, output_dim=OUT, num_layers=1, encoder_type="cnn"
        )
        rng = jax.random.PRNGKey(0)
        variables = enc.init(rng, seq)
        full = enc.apply(variables, seq)
        assert full.shape == (B, OUT)
        # with lengths=T the masked mean equals the plain mean
        same = enc.apply(variables, seq, jnp.full((B,), T))
        np.testing.assert_allclose(np.asarray(full), np.asarray(same), rtol=1e-5)

    def test_transformer_masked_mean_pool(self, seq):
        """Padded steps must not contribute to the pooled embedding."""
        enc = SequenceEncoder(
            hidden_dim=16, output_dim=OUT, num_layers=1, encoder_type="transformer"
        )
        rng = jax.random.PRNGKey(0)
        variables = enc.init(rng, seq)
        lengths = jnp.array([T, 4, 4, T])
        out = enc.apply(variables, seq, lengths)
        garbage = seq.at[1, 4:, :].set(99.0)
        out_garbage = enc.apply(variables, garbage, lengths)
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(out_garbage[1]), rtol=1e-4
        )

    def test_gradients_flow(self, seq):
        enc = SequenceEncoder(hidden_dim=8, output_dim=OUT, num_layers=1,
                              encoder_type="lstm")
        rng = jax.random.PRNGKey(0)
        variables = enc.init(rng, seq)

        def loss(params, x):
            return jnp.sum(enc.apply({"params": params}, x) ** 2)

        grads = jax.grad(loss)(variables["params"], seq)
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
        din = jax.grad(lambda x: loss(variables["params"], x))(seq)
        assert float(jnp.abs(din).max()) > 0


class TestFrameEncoder:
    @pytest.mark.parametrize("pooling", ["attention", "average", "max"])
    def test_output_shape(self, seq, pooling):
        enc = FrameEncoder(hidden_dim=16, output_dim=OUT, temporal_pooling=pooling)
        _, out = _init_apply(enc, seq)
        assert out.shape == (B, OUT)

    def test_unknown_pooling(self, seq):
        enc = FrameEncoder(hidden_dim=16, output_dim=OUT, temporal_pooling="median")
        with pytest.raises(ValueError, match="Unknown pooling: median"):
            enc.init(jax.random.PRNGKey(0), seq)

    def test_bad_rank(self):
        enc = FrameEncoder(hidden_dim=16, output_dim=OUT)
        with pytest.raises(ValueError, match="Expected 3D frame tensor"):
            enc.init(jax.random.PRNGKey(0), jnp.ones((B, D)))

    @pytest.mark.parametrize("pooling", ["attention", "average", "max"])
    def test_fully_masked_is_finite(self, seq, pooling):
        """All-invalid frame masks must not produce NaN (nan_to_num contract)."""
        enc = FrameEncoder(hidden_dim=16, output_dim=OUT, temporal_pooling=pooling)
        rng = jax.random.PRNGKey(0)
        mask = jnp.zeros((B, T))
        variables = enc.init(rng, seq, mask)
        out = enc.apply(variables, seq, mask)
        assert bool(jnp.isfinite(out).all())

    def test_mask_excludes_frames(self, seq):
        enc = FrameEncoder(hidden_dim=16, output_dim=OUT, temporal_pooling="average")
        rng = jax.random.PRNGKey(0)
        mask = jnp.concatenate([jnp.ones((B, 5)), jnp.zeros((B, T - 5))], axis=1)
        variables = enc.init(rng, seq, mask)
        out = enc.apply(variables, seq, mask)
        garbage = seq.at[:, 5:, :].set(1e3)
        out_garbage = enc.apply(variables, garbage, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_garbage), rtol=1e-5)


class TestSimpleMLPEncoder:
    def test_output_shape(self):
        enc = SimpleMLPEncoder(hidden_dim=16, output_dim=OUT, num_layers=2)
        x = jnp.ones((B, D))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (B, OUT)
        assert "batch_stats" in variables

    def test_no_batch_norm(self):
        enc = SimpleMLPEncoder(hidden_dim=16, output_dim=OUT, batch_norm=False)
        x = jnp.ones((B, D))
        variables = enc.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" not in variables

    def test_rejects_3d(self):
        enc = SimpleMLPEncoder(output_dim=OUT)
        with pytest.raises(ValueError, match="Expected 2D feature tensor"):
            enc.init(jax.random.PRNGKey(0), jnp.ones((B, T, D)))


class TestBuildEncoder:
    def test_type_overrides(self):
        assert isinstance(
            build_encoder("anything", 4, OUT, {"type": "frame"}), FrameEncoder
        )
        assert isinstance(
            build_encoder("anything", 4, OUT, {"type": "sequence"}), SequenceEncoder
        )
        assert isinstance(
            build_encoder("anything", 4, OUT, {"type": "mlp"}), SimpleMLPEncoder
        )

    def test_name_routing(self):
        assert isinstance(build_encoder("video", 4, OUT), FrameEncoder)
        assert isinstance(build_encoder("frames", 4, OUT), FrameEncoder)
        for name in ("imu", "audio", "mocap", "accelerometer", "imu_hand"):
            assert isinstance(build_encoder(name, 4, OUT), SequenceEncoder)
        assert isinstance(build_encoder("mystery", 4, OUT), SimpleMLPEncoder)

    def test_invalid_sequence_type_raises_at_build(self):
        with pytest.raises(ValueError, match="Unknown encoder type"):
            build_encoder("imu", 4, OUT, {"type": "sequence", "encoder_type": "bogus"})

    def test_config_plumbs_through(self):
        enc = build_encoder(
            "imu", 4, OUT,
            {"type": "sequence", "encoder_type": "gru", "num_layers": 3,
             "hidden_dim": 12, "input_dim": 4},
        )
        assert enc.encoder_type == "gru"
        assert enc.num_layers == 3
        assert enc.hidden_dim == 12


class TestMaskedBatchNormCNN:
    def test_padding_cannot_pollute_cnn_stats(self):
        """CNN batch statistics weight only valid timesteps: mutating the
        padded tail must not change train-mode outputs for valid rows."""
        import jax

        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
            SequenceEncoder,
        )

        enc = SequenceEncoder(
            hidden_dim=16, output_dim=8, encoder_type="cnn", dropout=0.0,
        )
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (4, 20, 6))
        lengths = jnp.asarray([20, 9, 5, 14], jnp.int32)
        variables = enc.init({"params": rng, "dropout": rng}, x, lengths)

        def run(xx):
            out, _ = enc.apply(
                variables, xx, lengths, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return np.asarray(out)

        base = run(x)
        # poison the padded tails; valid-region outputs must be identical
        poisoned = x.at[1, 9:].set(1e3).at[2, 5:].set(-1e3)
        np.testing.assert_allclose(run(poisoned), base, rtol=1e-5, atol=1e-5)


def test_transformer_hermetic_without_kernel_flags(monkeypatch):
    """With every Pallas flag pinned off, tracing the transformer encoder must
    never consult ``jax.default_backend()`` — calling it INITIALISES the
    default backend, which on hermetic CPU-mesh paths (dryrun_multichip,
    forced-CPU training) can be a broken tunneled TPU (CLAUDE.md contract;
    round-2 review regression)."""
    enc = SequenceEncoder(
        hidden_dim=16, output_dim=8, num_layers=1, encoder_type="transformer",
        dropout=0.1, flash_attention=False, fused_mlp=False, fused_mlp_ln=False,
    )
    x = jnp.ones((2, 6, 4), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)

    def _boom():
        raise AssertionError(
            "jax.default_backend() consulted on the kernel-free path"
        )

    monkeypatch.setattr(jax, "default_backend", _boom)
    out = enc.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (2, 8)
