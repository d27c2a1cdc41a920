"""Fused transformer feed-forward kernel (ops/pallas_mlp.py) vs the XLA path.

Mirrors the kernel-vs-XLA strategy of tests/test_pallas.py: exact-ish forward
parity, gradient equivalence through the custom VJP, dropout-mask parity
(both paths consume the same externally drawn mask), and encoder-level
equivalence so ``fused_mlp: auto`` cannot change training semantics.
Reference anchor: the torch layer this replaces is
``/root/reference/src/encoders.py:99-111`` (``nn.TransformerEncoderLayer``
with dim_feedforward=2048).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
    SequenceEncoder,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
    dense_params_init,
    fused_mlp,
    fused_mlp_residual_ln,
    transformer_ffw,
)


def _params(rng, n, d_in, d_ff, d_out):
    return (
        jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32),
        jnp.asarray(rng.standard_normal((d_in, d_ff)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(d_ff) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((d_ff, d_out)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(d_out) * 0.1, jnp.float32),
    )


class TestFusedMLPKernel:
    def test_forward_matches_xla(self):
        rng = np.random.default_rng(0)
        x, w1, b1, w2, b2 = _params(rng, 64, 32, 128, 32)
        ref = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
        got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_forward_rows_not_multiple_of_block(self):
        rng = np.random.default_rng(1)
        x, w1, b1, w2, b2 = _params(rng, 101, 16, 64, 16)
        ref = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
        got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_forward_with_dropout_mask(self):
        rng = np.random.default_rng(2)
        x, w1, b1, w2, b2 = _params(rng, 64, 32, 128, 32)
        mask = jnp.asarray(rng.integers(0, 2, (64, 128)), jnp.uint8)
        keep = 0.9
        ref = (jnp.maximum(x @ w1 + b1, 0.0) * mask / keep) @ w2 + b2
        got = fused_mlp(x, w1, b1, w2, b2, mask, keep, interpret=True)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_gradients_match_xla(self):
        rng = np.random.default_rng(3)
        x, w1, b1, w2, b2 = _params(rng, 72, 24, 96, 24)
        mask = jnp.asarray(rng.integers(0, 2, (72, 96)), jnp.uint8)
        keep = 0.8

        def loss_fused(p):
            x, w1, b1, w2, b2 = p
            return jnp.sum(
                jnp.tanh(fused_mlp(x, w1, b1, w2, b2, mask, keep, interpret=True))
            )

        def loss_ref(p):
            x, w1, b1, w2, b2 = p
            h = jnp.maximum(x @ w1 + b1, 0.0) * mask / keep
            return jnp.sum(jnp.tanh(h @ w2 + b2))

        got = jax.grad(loss_fused)((x, w1, b1, w2, b2))
        ref = jax.grad(loss_ref)((x, w1, b1, w2, b2))
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-4)

    def test_gradients_no_mask(self):
        rng = np.random.default_rng(4)
        x, w1, b1, w2, b2 = _params(rng, 40, 16, 48, 16)

        def loss_fused(p):
            return jnp.sum(fused_mlp(*p, interpret=True) ** 2)

        def loss_ref(p):
            x, w1, b1, w2, b2 = p
            return jnp.sum((jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2) ** 2)

        got = jax.grad(loss_fused)((x, w1, b1, w2, b2))
        ref = jax.grad(loss_ref)((x, w1, b1, w2, b2))
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-4)

    def test_bf16_gradients_dtype(self):
        """mixed_precision path: a bf16 primal must get a bf16 dx cotangent
        (custom_vjp contract — regression: f32 dx crashed bf16 training)."""
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((40, 16)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((16, 48)) * 0.1, jnp.bfloat16)
        b1 = jnp.zeros((48,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((48, 16)) * 0.1, jnp.bfloat16)
        b2 = jnp.zeros((16,), jnp.float32)

        def loss(x):
            out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(x)
        assert g.dtype == jnp.bfloat16
        assert g.shape == x.shape

    def test_bf16_inputs(self):
        rng = np.random.default_rng(5)
        x, w1, b1, w2, b2 = _params(rng, 32, 16, 64, 16)
        got = fused_mlp(
            x.astype(jnp.bfloat16),
            w1.astype(jnp.bfloat16),
            b1,
            w2.astype(jnp.bfloat16),
            b2,
            interpret=True,
        )
        ref = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            got.astype(jnp.float32), ref, atol=0.15, rtol=0.05
        )


class TestFusedMLPResidualLN:
    """FFW + residual dropout + add + LayerNorm in one kernel."""

    def _setup(self, n=100, h=32, f=64, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((h, f)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((f, h)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(h) * 0.2 + 1.0, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
        fmask = jnp.asarray(rng.integers(0, 2, (n, f)), jnp.uint8)
        rmask = jnp.asarray(rng.integers(0, 2, (n, h)), jnp.uint8)
        return x, w1, b1, w2, b2, gamma, beta, fmask, rmask

    @staticmethod
    def _ref(x, w1, b1, w2, b2, gamma, beta, fmask=None, rmask=None, keep=1.0):
        h = jnp.maximum(x @ w1 + b1, 0.0)
        if fmask is not None:
            h = h * fmask / keep
        y = h @ w2 + b2
        if rmask is not None:
            y = y * rmask / keep
        r = x + y
        mu = jnp.mean(r, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(r * r, -1, keepdims=True) - mu * mu, 0.0)
        return (r - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta

    def test_eval_forward(self):
        x, w1, b1, w2, b2, gamma, beta, _, _ = self._setup()
        got = fused_mlp_residual_ln(
            x, w1, b1, w2, b2, gamma, beta, interpret=True
        )
        ref = self._ref(x, w1, b1, w2, b2, gamma, beta)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_train_forward_with_masks(self):
        x, w1, b1, w2, b2, gamma, beta, fmask, rmask = self._setup(seed=1)
        got = fused_mlp_residual_ln(
            x, w1, b1, w2, b2, gamma, beta, fmask, rmask, 0.8, interpret=True
        )
        ref = self._ref(x, w1, b1, w2, b2, gamma, beta, fmask, rmask, 0.8)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_all_seven_gradients(self):
        x, w1, b1, w2, b2, gamma, beta, fmask, rmask = self._setup(seed=2)

        def loss_k(p):
            return jnp.sum(
                jnp.tanh(
                    fused_mlp_residual_ln(
                        *p, fmask, rmask, 0.8, interpret=True
                    )
                )
            )

        def loss_r(p):
            return jnp.sum(jnp.tanh(self._ref(*p, fmask, rmask, 0.8)))

        params = (x, w1, b1, w2, b2, gamma, beta)
        gk = jax.grad(loss_k)(params)
        gr = jax.grad(loss_r)(params)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)

    def test_matches_nn_layernorm(self):
        """The in-kernel LN must match flax nn.LayerNorm (fast variance,
        eps 1e-6) — pinned against the real flax module."""
        from flax import linen as nn

        x, w1, b1, w2, b2, gamma, beta, _, _ = self._setup(seed=3)
        got = fused_mlp_residual_ln(
            x, w1, b1, w2, b2, gamma, beta, interpret=True
        )
        r = x + jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
        ln = nn.LayerNorm()
        want = ln.apply({"params": {"scale": gamma, "bias": beta}}, r)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestFusedProjResidualLN:
    """out-projection + residual dropout + add + norm1 in one kernel."""

    def _setup(self, n=100, h=32, seed=0):
        rng = np.random.default_rng(seed)
        return (
            jnp.asarray(rng.standard_normal((n, h)), jnp.float32),
            jnp.asarray(rng.standard_normal((n, h)), jnp.float32),
            jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(h) * 0.2 + 1.0, jnp.float32),
            jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32),
            jnp.asarray(rng.integers(0, 2, (n, h)), jnp.uint8),
        )

    @staticmethod
    def _ref(p, rmask=None, keep=1.0):
        x, a, wo, bo, g, bt = p
        y = a @ wo + bo
        if rmask is not None:
            y = y * rmask / keep
        r = x + y
        mu = jnp.mean(r, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(r * r, -1, keepdims=True) - mu * mu, 0.0)
        return (r - mu) * jax.lax.rsqrt(var + 1e-6) * g + bt

    def test_forward_and_gradients(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            fused_proj_residual_ln,
        )

        x, a, wo, bo, g, bt, rmask = self._setup()
        p = (x, a, wo, bo, g, bt)
        got = fused_proj_residual_ln(
            x, a, wo, bo, g, bt, rmask, 0.8, interpret=True
        )
        np.testing.assert_allclose(
            got, self._ref(p, rmask, 0.8), atol=1e-5, rtol=1e-5
        )

        def loss_k(p):
            return jnp.sum(
                jnp.tanh(
                    fused_proj_residual_ln(*p, rmask, 0.8, interpret=True)
                )
            )

        def loss_r(p):
            return jnp.sum(jnp.tanh(self._ref(p, rmask, 0.8)))

        gk = jax.grad(loss_k)(p)
        gr = jax.grad(loss_r)(p)
        for A, B in zip(gk, gr):
            np.testing.assert_allclose(A, B, atol=2e-4, rtol=1e-3)

    def test_eval_no_mask(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            fused_proj_residual_ln,
        )

        x, a, wo, bo, g, bt, _ = self._setup(seed=1)
        got = fused_proj_residual_ln(x, a, wo, bo, g, bt, interpret=True)
        np.testing.assert_allclose(
            got, self._ref((x, a, wo, bo, g, bt)), atol=1e-5, rtol=1e-5
        )


class TestTransformerFFW:
    def test_paths_agree_without_dropout(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
        key = jax.random.PRNGKey(0)
        p1 = dense_params_init(16, 64)(key)
        p2 = dense_params_init(64, 16)(jax.random.PRNGKey(1))
        a = transformer_ffw(x, p1, p2, use_fused=False)
        b = transformer_ffw(x, p1, p2, use_fused=True, interpret=True)
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_paths_agree_with_same_mask(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
        p1 = dense_params_init(16, 64)(jax.random.PRNGKey(0))
        p2 = dense_params_init(64, 16)(jax.random.PRNGKey(1))
        mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.9, (2, 10, 64))
        a = transformer_ffw(x, p1, p2, keep_mask=mask, keep_prob=0.9, use_fused=False)
        b = transformer_ffw(
            x, p1, p2, keep_mask=mask, keep_prob=0.9, use_fused=True, interpret=True
        )
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


class TestEncoderLevel:
    """fused_mlp flag must not change SequenceEncoder behavior."""

    def _encoders(self, combined=False):
        common = dict(
            hidden_dim=32,
            output_dim=16,
            num_layers=1,
            encoder_type="transformer",
            dropout=0.25,
        )
        return (
            SequenceEncoder(fused_mlp=False, **common),
            SequenceEncoder(fused_mlp=True, fused_mlp_ln=combined, **common),
        )

    def test_param_tree_identical(self):
        enc_a, enc_b = self._encoders()
        x = jnp.ones((2, 12, 8))
        va = enc_a.init(jax.random.PRNGKey(0), x)
        vb = enc_b.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
        # the feed-forward params keep the exact nn.Dense checkpoint layout
        layer = va["params"]["layer0"]
        assert set(layer["linear1"].keys()) == {"kernel", "bias"}
        assert layer["linear1"]["kernel"].shape == (32, 2048)

    def test_eval_outputs_identical(self):
        enc_a, enc_b = self._encoders()
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((3, 12, 8)), jnp.float32)
        lengths = jnp.array([12, 7, 3])
        va = enc_a.init(jax.random.PRNGKey(0), x)
        out_a = enc_a.apply(va, x, lengths=lengths)
        out_b = enc_b.apply(va, x, lengths=lengths)
        np.testing.assert_allclose(out_a, out_b, atol=1e-5, rtol=1e-5)

    def test_train_step_identical_rng_identical_outputs(self):
        """Same dropout rng => identical stochastic training output on both
        paths (the mask is drawn outside the kernel, on both paths)."""
        enc_a, enc_b = self._encoders()
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((3, 12, 8)), jnp.float32)
        va = enc_a.init(jax.random.PRNGKey(0), x)
        drop = jax.random.PRNGKey(42)
        out_a = enc_a.apply(va, x, train=True, rngs={"dropout": drop})
        out_b = enc_b.apply(va, x, train=True, rngs={"dropout": drop})
        np.testing.assert_allclose(out_a, out_b, atol=1e-5, rtol=1e-5)

    def test_combined_kernel_encoder_paths_agree(self):
        """fused_mlp_ln=True (whole-second-half kernel) must match the
        unfused path for eval AND stochastic train outputs."""
        enc_a, enc_b = self._encoders(combined=True)
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((3, 12, 8)), jnp.float32)
        lengths = jnp.array([12, 7, 3])
        va = enc_a.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            enc_a.apply(va, x, lengths=lengths),
            enc_b.apply(va, x, lengths=lengths),
            atol=1e-5, rtol=1e-5,
        )
        drop = jax.random.PRNGKey(42)
        np.testing.assert_allclose(
            enc_a.apply(va, x, train=True, rngs={"dropout": drop}),
            enc_b.apply(va, x, train=True, rngs={"dropout": drop}),
            atol=1e-5, rtol=1e-5,
        )

    def test_train_gradients_match(self):
        enc_a, enc_b = self._encoders()
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
        va = enc_a.init(jax.random.PRNGKey(0), x)
        drop = jax.random.PRNGKey(7)

        def loss(params, enc):
            out = enc.apply(
                {"params": params}, x, train=True, rngs={"dropout": drop}
            )
            return jnp.sum(out**2)

        from jax.flatten_util import ravel_pytree

        ga = jax.grad(loss)(va["params"], enc_a)
        gb = jax.grad(loss)(va["params"], enc_b)
        flat_a, _ = ravel_pytree(ga)
        flat_b, _ = ravel_pytree(gb)
        np.testing.assert_allclose(flat_a, flat_b, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("raw,expected", [("auto", False), ("1", True), ("off", False)])
def test_fused_mlp_flag_parsing(raw, expected):
    """fused_mlp goes through the same string-safe flag parser as
    flash_attention (CPU default backend => auto resolves False here)."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
        _parse_backend_flag,
    )

    if raw == "off":
        assert _parse_backend_flag(raw, "fused_mlp") is False
    else:
        assert _parse_backend_flag(raw, "fused_mlp") is expected


class TestEdgeCases:
    """Round-2 review regressions: p=1 dropout and mixed-dtype cotangents."""

    def test_dropout_p1_matches_unfused_semantics(self):
        # dropout: 1.0 => keep_prob 0 and an all-drop mask. The kernel must
        # realise torch Dropout(p=1) semantics (hidden zeroed, second bias
        # still passes), not divide by zero.
        rng = np.random.default_rng(20)
        x, w1, b1, w2, b2 = _params(rng, 32, 16, 64, 16)
        mask = jnp.zeros((32, 64), jnp.uint8)
        got = fused_mlp(x, w1, b1, w2, b2, mask, keep_prob=0.0, interpret=True)
        np.testing.assert_allclose(
            got, jnp.broadcast_to(b2, got.shape), atol=1e-6
        )

    def test_proj_ln_dropout_p1_is_layernorm_of_residual(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            fused_proj_residual_ln,
        )

        rng = np.random.default_rng(21)
        n, d = 16, 32
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        bo = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
        gamma = jnp.ones((d,), jnp.float32)
        beta = jnp.zeros((d,), jnp.float32)
        mask = jnp.zeros((n, d), jnp.uint8)
        got = fused_proj_residual_ln(
            x, a, wo, bo, gamma, beta,
            res_mask=mask, keep_prob=0.0, interpret=True,
        )
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        ref = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_bf16_b2_cotangent_dtype(self):
        # custom-VJP cotangents must carry each primal's own dtype: a bf16 b2
        # used to get a db2 in b1's dtype (copy-paste), which jax.grad rejects
        rng = np.random.default_rng(22)
        x, w1, b1, w2, b2 = _params(rng, 16, 8, 32, 8)
        b2 = b2.astype(jnp.bfloat16)

        def loss(b2_):
            return jnp.sum(fused_mlp(x, w1, b1, w2, b2_, interpret=True) ** 2)

        g = jax.grad(loss)(b2)
        assert g.dtype == jnp.bfloat16

    def test_bf16_attended_cotangent_dtype(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            fused_proj_residual_ln,
        )

        rng = np.random.default_rng(23)
        n, d = 16, 32
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        bo = jnp.zeros((d,), jnp.float32)
        gamma = jnp.ones((d,), jnp.float32)
        beta = jnp.zeros((d,), jnp.float32)

        def loss(a_):
            out = fused_proj_residual_ln(
                x, a_, wo, bo, gamma, beta, interpret=True
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(a)
        assert g.dtype == jnp.bfloat16


class TestKernelRngMode:
    """HW-PRNG dropout-mask generator (``training.dropout_rng: kernel``).

    The real PRNG stream only exists on a TPU (interpret mode stubs it to
    zeros), so stream numerics are validated on-chip by
    ``scripts/validate_kernel_rng.py``; these tests pin the PLUMBING — API
    contracts, seed folding, and the documented off-TPU fallback to the XLA
    draws."""

    def test_generator_rejected_in_interpret_mode(self):
        """The interpret-mode TPU PRNG is a zero stub (= every element
        dropped) — silently accepting it would train a dead model."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            dropout_keep_mask,
        )

        seed = jnp.array([1, 2], jnp.int32)
        with pytest.raises(ValueError, match="real TPU"):
            dropout_keep_mask(seed, 16, 32, 0.9, interpret=True)

    def test_bogus_dropout_rng_rejected_at_encoder(self):
        """A typo'd per-encoder dropout_rng must raise, not silently fall
        back to threefry (the layer's membership test would read any
        unknown string as xla)."""
        enc = SequenceEncoder(
            hidden_dim=16, output_dim=8, num_layers=1,
            encoder_type="transformer", dropout_rng="kernle",
        )
        with pytest.raises(ValueError, match="Unknown dropout_rng"):
            enc.init(jax.random.PRNGKey(0), jnp.ones((2, 8, 4)))

    def test_kernel_rng_seed_folds_any_key_to_two_words(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
            kernel_rng_seed,
        )

        typed = kernel_rng_seed(jax.random.key(3))
        legacy = kernel_rng_seed(jax.random.PRNGKey(3))
        rbg = kernel_rng_seed(jax.random.key(3, impl="rbg"))
        for s in (typed, legacy, rbg):
            assert s.shape == (2,) and s.dtype == jnp.int32
        # typed and legacy threefry keys carry the same words
        np.testing.assert_array_equal(typed, legacy)
        # different keys -> different seeds
        assert not np.array_equal(typed, kernel_rng_seed(jax.random.key(4)))

    def test_encoder_dropout_rng_kernel_falls_back_off_tpu(self):
        """On CPU (interpret mode) ``dropout_rng: kernel`` must resolve to
        the XLA draws — identical stochastic outputs to the default mode."""
        common = dict(
            hidden_dim=32, output_dim=16, num_layers=1,
            encoder_type="transformer", dropout=0.25,
            fused_mlp=True, fused_mlp_ln=True,
        )
        enc_xla = SequenceEncoder(dropout_rng="xla", **common)
        enc_krn = SequenceEncoder(dropout_rng="kernel", **common)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((3, 12, 8)), jnp.float32)
        va = enc_xla.init(jax.random.PRNGKey(0), x)
        drop = jax.random.PRNGKey(42)
        out_a = enc_xla.apply(va, x, train=True, rngs={"dropout": drop})
        out_b = enc_krn.apply(va, x, train=True, rngs={"dropout": drop})
        np.testing.assert_allclose(out_a, out_b, atol=1e-6, rtol=1e-6)
