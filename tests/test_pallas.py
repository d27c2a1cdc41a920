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


@pytest.fixture(autouse=True)
def _pin_block_size_routing(monkeypatch):
    """The single-block flash specializations engage by default up to
    T=2048 (round-5 measured flip), which would reroute every small-T
    kernel test away from the multi-block kernels they were written to
    cover. Pin the shape-routing thresholds back to pure block-size
    routing here; TestFlashRoutingEnvKnobs sets its own values on top."""
    monkeypatch.setenv("MSFA_FLASH_SINGLE_K_MAX", "0")
    monkeypatch.setenv("MSFA_FLASH_FUSED_BWD_MAX", "0")


def test_default_routing_thresholds(monkeypatch):
    """The shipped defaults engage the single-block kernels through
    T=2048 fwd / T=1024 bwd (on-chip A/B + numerics probe, round 5)."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops import (
        pallas_attention as pa,
    )

    monkeypatch.delenv("MSFA_FLASH_SINGLE_K_MAX", raising=False)
    monkeypatch.delenv("MSFA_FLASH_FUSED_BWD_MAX", raising=False)
    assert pa._single_k_max() == 2048
    assert pa._fused_bwd_max() == 1024


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


class TestGroupedLSTMKernel:
    def _make(self, G=2, B=8, T=24, H=16):
        import numpy as np

        rng = np.random.default_rng(0)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 4 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 4 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 4 * H)) * 0.1, jnp.float32)
        return x_proj, w_hh, b_hh

    @staticmethod
    def _scan_oracle(x_proj, w_hh, b_hh, lengths):
        G, B, H = w_hh.shape[0], x_proj.shape[2], w_hh.shape[1]

        def step(carry, xs):
            xp, t = xs
            h, c = carry
            z = xp + jnp.einsum("gbh,ghk->gbk", h, w_hh) + b_hh[:, None, :]
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            keep = (t < lengths).astype(jnp.float32)[None, :, None]
            return (keep * h_new + (1 - keep) * h, keep * c_new + (1 - keep) * c), None

        init = (jnp.zeros((G, B, H)), jnp.zeros((G, B, H)))
        (h, _), _ = jax.lax.scan(step, init, (x_proj, jnp.arange(x_proj.shape[0])))
        return h

    def test_full_length_matches_scan(self):
        x_proj, w_hh, b_hh = self._make()
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn import (
            grouped_lstm_forward,
        )

        lengths = jnp.full((8,), 24, jnp.int32)
        want = self._scan_oracle(x_proj, w_hh, b_hh, lengths)
        got = grouped_lstm_forward(x_proj, w_hh, b_hh, lengths, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_per_row_lengths_freeze_carry(self):
        x_proj, w_hh, b_hh = self._make()
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn import (
            grouped_lstm_forward,
        )

        lengths = jnp.asarray([24, 13, 1, 24, 7, 24, 24, 18], jnp.int32)
        want = self._scan_oracle(x_proj, w_hh, b_hh, lengths)
        got = grouped_lstm_forward(x_proj, w_hh, b_hh, lengths, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_nondivisible_block(self):
        x_proj, w_hh, b_hh = self._make(T=22)
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn import (
            grouped_lstm_forward,
        )

        lengths = jnp.full((8,), 22, jnp.int32)
        want = self._scan_oracle(x_proj, w_hh, b_hh, lengths)
        got = grouped_lstm_forward(x_proj, w_hh, b_hh, lengths, block_t=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_module_pallas_flag_matches_scan_path(self, tiny_model_cfg):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
            MultimodalFusionModel,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "model.encoders",
            {
                "sensor1": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
                "sensor2": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
            },
        )
        feats = {
            "sensor1": jnp.asarray(
                np.random.default_rng(0).standard_normal((4, 12, 8)), jnp.float32
            ),
            "sensor2": jnp.asarray(
                np.random.default_rng(1).standard_normal((4, 12, 8)), jnp.float32
            ),
        }
        lengths = jnp.asarray([12, 6, 12, 3], jnp.int32)
        rng = jax.random.PRNGKey(0)
        scan_model = MultimodalFusionModel.from_config(cfg)
        variables = scan_model.init({"params": rng, "dropout": rng}, feats, None, lengths)
        cfg.set_dotted("model.pallas_rnn", True)
        pallas_model = MultimodalFusionModel.from_config(cfg)
        want = scan_model.apply(variables, feats, None, lengths, train=False)
        got = pallas_model.apply(variables, feats, None, lengths, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


class TestFlashAttention:
    @staticmethod
    def _xla_attention(q, k, v, lengths=None):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.masked import (
            masked_softmax,
        )

        d = q.shape[-1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * d**-0.5
        mask = None
        if lengths is not None:
            T = q.shape[2]
            mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
            mask = mask[:, None, None, :]
        w = masked_softmax(scores, mask)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    def _rand(self, B=2, H=2, T=64, d=16, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)  # noqa: E731
        return mk(), mk(), mk()

    def test_matches_xla_full(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand()
        got = flash_self_attention(q, k, v, block_q=32, block_k=32, interpret=True)
        want = self._xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def test_matches_xla_with_lengths(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(seed=1)
        lengths = jnp.asarray([40, 64], jnp.int32)
        got = flash_self_attention(
            q, k, v, lengths, block_q=32, block_k=32, interpret=True
        )
        want = self._xla_attention(q, k, v, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def test_zero_length_rows_give_zero_output(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(seed=2)
        lengths = jnp.asarray([0, 32], jnp.int32)
        got = flash_self_attention(
            q, k, v, lengths, block_q=32, block_k=32, interpret=True
        )
        assert float(jnp.abs(got[0]).max()) == 0.0
        assert float(jnp.abs(got[1, :, :32]).max()) > 0.0

    def test_nondivisible_seq_len(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(T=50, seed=3)
        got = flash_self_attention(q, k, v, block_q=32, block_k=32, interpret=True)
        want = self._xla_attention(q, k, v)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def test_gradients_match_xla(self):
        """Backward kernels (custom VJP) vs jax.grad of the XLA path."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(seed=4)
        lengths = jnp.asarray([48, 64], jnp.int32)
        cotangent = jnp.asarray(
            np.random.default_rng(9).standard_normal(q.shape), jnp.float32
        )

        def loss_flash(q, k, v):
            out = flash_self_attention(
                q, k, v, lengths, block_q=32, block_k=32, interpret=True
            )
            return jnp.sum(out * cotangent)

        def loss_xla(q, k, v):
            return jnp.sum(self._xla_attention(q, k, v, lengths) * cotangent)

        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
                err_msg=f"d{name} mismatch",
            )

    def test_gradients_nondivisible_seq_len(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(T=50, seed=5)

        def loss_flash(q, k, v):
            out = flash_self_attention(q, k, v, block_q=32, block_k=32, interpret=True)
            return jnp.sum(out**2)

        def loss_xla(q, k, v):
            return jnp.sum(self._xla_attention(q, k, v) ** 2)

        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5)

    def test_gradients_fused_single_block_matches_split_path(self):
        """block >= T routes to the fused one-kernel backward; block < T
        routes to the split dkv/dq kernels. Same math, same gradients."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(T=64, seed=11)
        lengths = jnp.asarray([40, 64], jnp.int32)

        def loss(bq, bk):
            def inner(q, k, v):
                out = flash_self_attention(
                    q, k, v, lengths, block_q=bq, block_k=bk, interpret=True
                )
                return jnp.sum(out**2)

            return jax.grad(inner, argnums=(0, 1, 2))(q, k, v)

        fused = loss(64, 64)   # padded_len <= both blocks -> fused kernel
        split = loss(32, 32)   # multi-block -> split dkv/dq kernels
        for g, w in zip(fused, split):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6
            )

    def test_gradients_zero_length_rows_are_zero_not_nan(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand(seed=6)
        lengths = jnp.asarray([0, 32], jnp.int32)

        def loss(q, k, v):
            out = flash_self_attention(
                q, k, v, lengths, block_q=32, block_k=32, interpret=True
            )
            return jnp.sum(out**2)

        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g in (dq, dk, dv):
            assert bool(jnp.isfinite(g).all())
            assert float(jnp.abs(g[0]).max()) == 0.0  # fully-masked batch row


def test_transformer_encoder_flash_matches_xla():
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
        SequenceEncoder,
    )

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 40, 6)), jnp.float32)
    lengths = jnp.asarray([40, 17, 40], jnp.int32)
    plain = SequenceEncoder(hidden_dim=16, output_dim=8, num_layers=1,
                            encoder_type="transformer")
    flash = SequenceEncoder(hidden_dim=16, output_dim=8, num_layers=1,
                            encoder_type="transformer", flash_attention=True)
    variables = plain.init(rng, x, lengths)
    want = plain.apply(variables, x, lengths)
    got = flash.apply(variables, x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_transformer_encoder_flash_training_gradients_match_xla():
    """The shipping default (transformer encoders) TRAINS through the flash
    kernels: parameter gradients equal the XLA attention path's (dropout off —
    the flash path doesn't apply attention-prob dropout by design)."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
        SequenceEncoder,
    )

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 40, 6)), jnp.float32)
    lengths = jnp.asarray([40, 17, 40], jnp.int32)
    plain = SequenceEncoder(hidden_dim=16, output_dim=8, num_layers=1,
                            encoder_type="transformer", dropout=0.0)
    flash = SequenceEncoder(hidden_dim=16, output_dim=8, num_layers=1,
                            encoder_type="transformer", dropout=0.0,
                            flash_attention=True)
    variables = plain.init(rng, x, lengths)

    def loss(params, model):
        out = model.apply({"params": params}, x, lengths, train=True,
                          rngs={"dropout": rng})
        return jnp.sum(out**2)

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_flash = jax.grad(loss)(variables["params"], flash)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten(g_flash)
    for p, f in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p), rtol=5e-4, atol=5e-5)


class TestTrainableGRUKernel:
    @staticmethod
    def _scan_oracle(x_proj, w_hh, b_hh, lengths):
        G, B, H = w_hh.shape[0], x_proj.shape[2], w_hh.shape[1]

        def step(h, xs):
            xp, t = xs
            hp = jnp.einsum("gbh,ghk->gbk", h, w_hh) + b_hh[:, None, :]
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            keep = (t < lengths).astype(jnp.float32)[None, :, None]
            return keep * h_new + (1 - keep) * h, None

        h, _ = jax.lax.scan(
            step, jnp.zeros((G, B, H)), (x_proj, jnp.arange(x_proj.shape[0]))
        )
        return h

    def test_forward_matches_scan(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn_train import (
            grouped_gru_trainable,
        )

        G, B, T, H = 2, 8, 24, 16
        rng = np.random.default_rng(1)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 3 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 3 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([24, 13, 1, 24, 7, 24, 24, 18], jnp.int32)
        got = grouped_gru_trainable(x_proj, w_hh, b_hh, lengths)
        want = self._scan_oracle(x_proj, w_hh, b_hh, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def test_gradients_match_scan(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn_train import (
            grouped_gru_trainable,
        )

        G, B, T, H = 2, 8, 24, 16
        rng = np.random.default_rng(2)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 3 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 3 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([24, 13, 1, 24, 7, 24, 24, 18], jnp.int32)
        cot = jnp.asarray(rng.standard_normal((G, B, H)), jnp.float32)

        def loss_pallas(xp, w, b):
            return jnp.sum(grouped_gru_trainable(xp, w, b, lengths) * cot)

        def loss_ref(xp, w, b):
            return jnp.sum(self._scan_oracle(xp, w, b, lengths) * cot)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_gradients_nondivisible_seq_len(self):
        """T=23 pads to a block multiple; padded steps are frozen no-ops."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn_train import (
            grouped_gru_trainable,
        )

        G, B, T, H = 2, 4, 23, 16
        rng = np.random.default_rng(7)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 3 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 3 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([23, 13, 1, 19], jnp.int32)
        cot = jnp.asarray(rng.standard_normal((G, B, H)), jnp.float32)

        def loss_pallas(xp, w, b):
            return jnp.sum(grouped_gru_trainable(xp, w, b, lengths) * cot)

        def loss_ref(xp, w, b):
            return jnp.sum(self._scan_oracle(xp, w, b, lengths) * cot)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_grouped_encoder_gru_training_gradients(self, rng):
        """GroupedRNNEncoder(train=True, use_pallas) == XLA-scan gradients."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.grouped import (
            GroupedRNNEncoder,
        )

        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 4, 12, 6)), jnp.float32
        )
        lengths = jnp.asarray([12, 5, 12, 9], jnp.int32)
        plain = GroupedRNNEncoder(
            num_groups=2, hidden_dim=16, output_dim=8, num_layers=1,
            cell_type="gru", dropout=0.0, use_pallas=False,
        )
        pallas = GroupedRNNEncoder(
            num_groups=2, hidden_dim=16, output_dim=8, num_layers=1,
            cell_type="gru", dropout=0.0, use_pallas=True,
        )
        variables = plain.init(rng, x, lengths)

        def loss(params, model):
            out = model.apply(
                {"params": params}, x, lengths, train=True, rngs={"dropout": rng}
            )
            return jnp.sum(out**2)

        g_plain = jax.grad(loss)(variables["params"], plain)
        g_pallas = jax.grad(loss)(variables["params"], pallas)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_pallas), jax.tree_util.tree_leaves(g_plain)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
            )


class TestTrainableLSTMKernel:
    @staticmethod
    def _scan_oracle(x_proj, w_hh, b_hh, lengths):
        G, B, H = w_hh.shape[0], x_proj.shape[2], w_hh.shape[1]

        def step(carry, xs):
            xp, t = xs
            h, c = carry
            z = xp + jnp.einsum("gbh,ghk->gbk", h, w_hh) + b_hh[:, None, :]
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            keep = (t < lengths).astype(jnp.float32)[None, :, None]
            return (keep * h_new + (1 - keep) * h, keep * c_new + (1 - keep) * c), None

        init = (jnp.zeros((G, B, H)), jnp.zeros((G, B, H)))
        (h, _), _ = jax.lax.scan(step, init, (x_proj, jnp.arange(x_proj.shape[0])))
        return h

    def test_gradients_match_scan(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn_train import (
            grouped_lstm_trainable,
        )

        G, B, T, H = 2, 8, 24, 16
        rng = np.random.default_rng(0)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 4 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 4 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 4 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([24, 13, 1, 24, 7, 24, 24, 18], jnp.int32)
        cot = jnp.asarray(rng.standard_normal((G, B, H)), jnp.float32)

        def loss_pallas(xp, w, b):
            return jnp.sum(grouped_lstm_trainable(xp, w, b, lengths) * cot)

        def loss_ref(xp, w, b):
            return jnp.sum(self._scan_oracle(xp, w, b, lengths) * cot)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_gradients_nondivisible_seq_len(self):
        """T=23 pads to a block multiple; padded steps are frozen no-ops."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn_train import (
            grouped_lstm_trainable,
        )

        G, B, T, H = 2, 4, 23, 16
        rng = np.random.default_rng(8)
        x_proj = jnp.asarray(rng.standard_normal((T, G, B, 4 * H)) * 0.3, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 4 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 4 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([23, 13, 1, 19], jnp.int32)
        cot = jnp.asarray(rng.standard_normal((G, B, H)), jnp.float32)

        def loss_pallas(xp, w, b):
            return jnp.sum(grouped_lstm_trainable(xp, w, b, lengths) * cot)

        def loss_ref(xp, w, b):
            return jnp.sum(self._scan_oracle(xp, w, b, lengths) * cot)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x_proj, w_hh, b_hh)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_training_with_pallas_kernels_learns(self, tiny_model_cfg):
        """End-to-end training through the custom-VJP kernels converges."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            SyntheticMultimodalDataset,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "model.encoders",
            {
                "sensor1": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
                "sensor2": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
            },
        )
        cfg.set_dotted("model.pallas_rnn", True)
        cfg.set_dotted("model.dropout", 0.0)
        cfg.set_dotted("training.augmentation.modality_dropout", 0.0)
        cfg.set_dotted("training.augmentation.temporal_jitter", 0.0)
        cfg.set_dotted("training.max_epochs", 10)
        dims = {"sensor1": 8, "sensor2": 8}
        mk = lambda s, n: SyntheticMultimodalDataset(  # noqa: E731
            num_samples=n, num_classes=5, modality_dims=dims,
            sequence_length=12, split=s,
        ).windows
        train_w, val_w = mk("train", 64), mk("val", 16)
        for w in (train_w, val_w):
            signal = w.features["sensor1"].mean(axis=(1, 2))
            w.labels = (signal > np.median(signal)).astype(np.int32)
        results = Trainer(cfg).fit(train_w, val_w, log_fn=None)
        assert results["history"][-1]["train/acc"] > 0.7


class TestGroupedGRUKernel:
    def test_matches_scan_oracle(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_rnn import (
            grouped_gru_fused,
        )

        G, B, T, D, H = 2, 8, 24, 5, 16
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((T, G, B, D)) * 0.5, jnp.float32)
        w_ih = jnp.asarray(rng.standard_normal((G, D, 3 * H)) * 0.2, jnp.float32)
        w_hh = jnp.asarray(rng.standard_normal((G, H, 3 * H)) * 0.2, jnp.float32)
        b_ih = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
        b_hh = jnp.asarray(rng.standard_normal((G, 3 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray([24, 13, 1, 24, 7, 24, 24, 18], jnp.int32)

        def oracle():
            def step(h, xs):
                xt, t = xs
                xp = jnp.einsum("gbd,gdh->gbh", xt, w_ih) + b_ih[:, None, :]
                hp = jnp.einsum("gbh,ghk->gbk", h, w_hh) + b_hh[:, None, :]
                xr, xz, xn = jnp.split(xp, 3, axis=-1)
                hr, hz, hn = jnp.split(hp, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n + z * h
                keep = (t < lengths).astype(jnp.float32)[None, :, None]
                return keep * h_new + (1 - keep) * h, None

            h, _ = jax.lax.scan(step, jnp.zeros((G, B, H)), (x, jnp.arange(T)))
            return h

        got = grouped_gru_fused(x, w_ih, w_hh, b_ih, b_hh, lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle()), rtol=1e-5, atol=1e-6
        )

    def test_module_gru_pallas_flag(self, tiny_model_cfg):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
            MultimodalFusionModel,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "model.encoders",
            {
                "sensor1": {"type": "sequence", "encoder_type": "gru", "num_layers": 1},
                "sensor2": {"type": "sequence", "encoder_type": "gru", "num_layers": 1},
            },
        )
        feats = {
            "sensor1": jnp.asarray(
                np.random.default_rng(0).standard_normal((4, 12, 8)), jnp.float32
            ),
            "sensor2": jnp.asarray(
                np.random.default_rng(1).standard_normal((4, 12, 8)), jnp.float32
            ),
        }
        lengths = jnp.asarray([12, 6, 12, 3], jnp.int32)
        rng = jax.random.PRNGKey(0)
        scan_model = MultimodalFusionModel.from_config(cfg)
        variables = scan_model.init({"params": rng, "dropout": rng}, feats, None, lengths)
        cfg.set_dotted("model.pallas_rnn", True)
        pallas_model = MultimodalFusionModel.from_config(cfg)
        want = scan_model.apply(variables, feats, None, lengths, train=False)
        got = pallas_model.apply(variables, feats, None, lengths, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


class TestFlashRoutingEnvKnobs:
    """The single-block specializations extend past T=512 via env knobs
    (MSFA_FLASH_SINGLE_K_MAX / MSFA_FLASH_FUSED_BWD_MAX); numerics must be
    identical to the default multi-block routing at the same shapes."""

    def _rand(self, B=2, H=2, T=96, d=16, seed=3):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)  # noqa: E731
        return mk(), mk(), mk()

    def test_extended_single_kblock_forward_and_fused_backward(self, monkeypatch):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_self_attention,
        )

        q, k, v = self._rand()
        lengths = jnp.asarray([70, 96], jnp.int32)

        def grads():
            def inner(q, k, v):
                # block 32 < T=96: default routing = multi-block online
                # softmax fwd + split dkv/dq bwd
                out = flash_self_attention(
                    q, k, v, lengths, block_q=32, block_k=32, interpret=True
                )
                return jnp.sum(out**2), out

            (_, out), g = jax.value_and_grad(inner, argnums=(0, 1, 2), has_aux=True)(
                q, k, v
            )
            return out, g

        out_multi, g_multi = grads()
        monkeypatch.setenv("MSFA_FLASH_SINGLE_K_MAX", "4096")
        monkeypatch.setenv("MSFA_FLASH_FUSED_BWD_MAX", "4096")
        monkeypatch.setenv("MSFA_FLASH_SINGLE_K_BQ", "32")
        out_single, g_single = grads()
        np.testing.assert_allclose(
            np.asarray(out_multi), np.asarray(out_single), rtol=1e-5, atol=1e-6
        )
        for gm, gs in zip(g_multi, g_single):
            np.testing.assert_allclose(
                np.asarray(gm), np.asarray(gs), rtol=1e-5, atol=1e-6
            )


class TestPackedFlash:
    """Transpose-free packed-qkv kernels vs the XLA attention oracle."""

    @staticmethod
    def _xla_attention(q, k, v, lengths=None):
        return TestFlashAttention._xla_attention(q, k, v, lengths)

    def _rand_packed(self, B=2, H=2, T=64, d=16, seed=0):
        """Returns ([B,H,T,d] q/k/v for the oracle, packed [B,T,3*H*d])."""
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.float32)  # noqa: E731
        q, k, v = mk(), mk(), mk()
        pack = lambda a: a.transpose(0, 2, 1, 3).reshape(a.shape[0], T, H * d)  # noqa: E731
        qkv = jnp.concatenate([pack(q), pack(k), pack(v)], axis=-1)
        return (q, k, v), qkv

    @staticmethod
    def _unpack(out, H, d):
        B, T, _ = out.shape
        return out.reshape(B, T, H, d).transpose(0, 2, 1, 3)

    def test_matches_xla_full(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_mha_packed,
        )

        (q, k, v), qkv = self._rand_packed()
        got = flash_mha_packed(qkv, num_heads=2, interpret=True)
        want = self._xla_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(self._unpack(got, 2, 16)), np.asarray(want),
            rtol=2e-5, atol=2e-6,
        )

    def test_matches_xla_with_lengths_and_zero_rows(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_mha_packed,
        )

        (q, k, v), qkv = self._rand_packed(B=3, seed=1)
        lengths = jnp.asarray([40, 0, 64], jnp.int32)
        got = flash_mha_packed(qkv, lengths, num_heads=2, interpret=True)
        want = self._xla_attention(q, k, v, lengths)
        np.testing.assert_allclose(
            np.asarray(self._unpack(got, 2, 16)), np.asarray(want),
            rtol=2e-5, atol=2e-6,
        )
        # fully-masked batch row -> exact zeros (masked_softmax contract)
        assert float(jnp.abs(got[1]).max()) == 0.0

    def test_nondivisible_seq_len(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_mha_packed,
        )

        (q, k, v), qkv = self._rand_packed(T=50, seed=3)
        got = flash_mha_packed(qkv, num_heads=2, interpret=True)
        want = self._xla_attention(q, k, v)
        assert got.shape == (2, 50, 32)
        np.testing.assert_allclose(
            np.asarray(self._unpack(got, 2, 16)), np.asarray(want),
            rtol=2e-5, atol=2e-6,
        )

    def test_gradients_match_xla(self):
        """Packed backward (custom VJP, dqkv in one kernel) vs jax.grad of
        the XLA path, including a zero-length row (zero grads, no NaN)."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_attention import (
            flash_mha_packed,
        )

        (q, k, v), qkv = self._rand_packed(B=3, seed=4)
        lengths = jnp.asarray([48, 64, 0], jnp.int32)
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal((3, 64, 32)), jnp.float32
        )

        def loss_packed(qkv):
            out = flash_mha_packed(qkv, lengths, num_heads=2, interpret=True)
            return jnp.sum(out * cot)

        def loss_xla(qkv):
            B, T, HD3 = qkv.shape
            split = lambda i: qkv[..., i * 32 : (i + 1) * 32].reshape(  # noqa: E731
                B, T, 2, 16
            ).transpose(0, 2, 1, 3)
            out = self._xla_attention(split(0), split(1), split(2), lengths)
            return jnp.sum(out.transpose(0, 2, 1, 3).reshape(B, T, 32) * cot)

        got = jax.grad(loss_packed)(qkv)
        want = jax.grad(loss_xla)(qkv)
        assert bool(jnp.all(jnp.isfinite(got)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )
        # zero-length batch row contributes exactly zero gradient
        assert float(jnp.abs(got[2]).max()) == 0.0

    def test_routing_defaults_and_env(self, monkeypatch):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops import (
            pallas_attention as pa,
        )

        monkeypatch.delenv("MSFA_FLASH_PACKED", raising=False)
        monkeypatch.delenv("MSFA_FLASH_PACKED_MAX", raising=False)
        assert pa.packed_route_ok(512, 4, 64)
        assert not pa.packed_route_ok(1024, 4, 64)
        monkeypatch.setenv("MSFA_FLASH_PACKED_MAX", "1024")
        assert pa.packed_route_ok(1024, 4, 64)
        monkeypatch.setenv("MSFA_FLASH_PACKED", "0")
        assert not pa.packed_route_ok(512, 4, 64)

    def test_encoder_packed_matches_transpose_path(self, monkeypatch):
        """End-to-end transformer encoder: the packed routing must be
        numerically identical (f32 interpret) to the transpose path it
        replaces — forward AND parameter gradients."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
            SequenceEncoder,
        )

        enc = SequenceEncoder(
            hidden_dim=32, output_dim=8, num_layers=1,
            encoder_type="transformer", dropout=0.0,
            flash_attention=True, fused_mlp=False, fused_mlp_ln=False,
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 24, 4)), jnp.float32
        )
        variables = enc.init(jax.random.PRNGKey(0), x)

        def run():
            def loss(params):
                out = enc.apply({"params": params}, x, train=False)
                return jnp.sum(out**2), out

            (val, out), g = jax.value_and_grad(loss, has_aux=True)(
                variables["params"]
            )
            return out, g

        monkeypatch.setenv("MSFA_FLASH_PACKED", "1")
        monkeypatch.setenv("MSFA_FLASH_PACKED_MAX", "512")
        out_packed, g_packed = run()
        monkeypatch.setenv("MSFA_FLASH_PACKED", "0")
        out_t, g_t = run()
        np.testing.assert_allclose(
            np.asarray(out_packed), np.asarray(out_t), rtol=1e-5, atol=1e-6
        )
        flat_p = jax.tree_util.tree_leaves(g_packed)
        flat_t = jax.tree_util.tree_leaves(g_t)
        for gp, gt in zip(flat_p, flat_t):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gt), rtol=2e-4, atol=2e-5
            )
