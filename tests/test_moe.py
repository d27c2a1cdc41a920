"""Mixture-of-Experts feed-forward (models/moe.py) + expert parallelism.

The MoE block is a beyond-parity extension (the reference's transformer
encoder has a single dense FFW, ``src/encoders.py:99-111``); these tests pin
its routing math, capacity/drop semantics, padded-token contract, aux-loss
threading through the Trainer, and expert-parallel loss parity on the CPU
mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.moe import (
    MoEFeedForward,
    moe_capacity,
)


def _init_moe(moe, x, valid=None, seed=0):
    return moe.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        x,
        valid,
    )


class TestRoutingMath:
    def test_top1_matches_explicit_per_token_compute(self):
        """With ample capacity and k=1 the MoE output equals running each
        token through its argmax expert (gate renormalises to 1.0)."""
        moe = MoEFeedForward(
            hidden_dim=8, dim_feedforward=16, num_experts=3, top_k=1,
            capacity_factor=8.0, dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
        v = _init_moe(moe, x)
        out = moe.apply(v, x)
        p = v["params"]
        tokens = x.reshape(-1, 8)
        probs = jax.nn.softmax(tokens @ p["router"], axis=-1)
        eidx = jnp.argmax(probs, axis=-1)
        ref = []
        for n in range(tokens.shape[0]):
            e = int(eidx[n])
            h = jax.nn.relu(tokens[n] @ p["moe_w1"][e] + p["moe_b1"][e])
            ref.append(h @ p["moe_w2"][e] + p["moe_b2"][e])
        ref = jnp.stack(ref).reshape(2, 5, 8)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_top2_gates_renormalise(self):
        """k=2 output is the gate-weighted sum of both experts' outputs with
        gates renormalised over the selected pair."""
        moe = MoEFeedForward(
            hidden_dim=4, dim_feedforward=8, num_experts=4, top_k=2,
            capacity_factor=8.0, dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4))
        v = _init_moe(moe, x)
        out = moe.apply(v, x)
        p = v["params"]
        tokens = x.reshape(-1, 4)
        probs = jax.nn.softmax(tokens @ p["router"], axis=-1)
        gates, eidx = jax.lax.top_k(probs, 2)
        gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
        ref = []
        for n in range(tokens.shape[0]):
            acc = jnp.zeros((4,))
            for k in range(2):
                e = int(eidx[n, k])
                h = jax.nn.relu(tokens[n] @ p["moe_w1"][e] + p["moe_b1"][e])
                acc = acc + gates[n, k] * (h @ p["moe_w2"][e] + p["moe_b2"][e])
            ref.append(acc)
        ref = jnp.stack(ref).reshape(1, 3, 4)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_invalid_tokens_output_zero_and_skip_capacity(self):
        """Padded timesteps produce exactly zero output and never displace
        valid tokens from expert capacity."""
        moe = MoEFeedForward(
            hidden_dim=8, dim_feedforward=16, num_experts=2, top_k=1,
            capacity_factor=8.0, dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 8))
        valid = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)
        v = _init_moe(moe, x, valid)
        out = moe.apply(v, x, valid)
        assert bool(jnp.all(out[0, 3:] == 0.0))
        assert bool(jnp.all(jnp.any(out[1] != 0.0, axis=-1)))

    def test_capacity_overflow_drops_to_zero(self):
        """Tokens past an expert's capacity get zero from that slot (the
        residual connection in the encoder layer carries them)."""
        moe = MoEFeedForward(
            hidden_dim=4, dim_feedforward=8, num_experts=2, top_k=1,
            capacity_factor=8.0, dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 4))
        v = _init_moe(moe, x)
        full = moe.apply(v, x)
        # same params, capacity clamped to the floor (8): with 64 tokens on
        # <=2 experts at least one expert overflows
        tight = MoEFeedForward(
            hidden_dim=4, dim_feedforward=8, num_experts=2, top_k=1,
            capacity_factor=1e-6, dropout=0.0,
        )
        out = tight.apply(v, x)
        zeros = jnp.all(out.reshape(-1, 4) == 0.0, axis=-1)
        assert int(jnp.sum(zeros)) >= 64 - 2 * 8
        assert bool(jnp.all(jnp.isfinite(out)))
        # kept tokens match the ample-capacity output
        kept = ~zeros
        np.testing.assert_allclose(
            out.reshape(-1, 4)[kept], full.reshape(-1, 4)[kept],
            rtol=1e-5, atol=1e-5,
        )

    def test_capacity_helper(self):
        assert moe_capacity(64, 4, 1, 1.0) == 16
        assert moe_capacity(64, 4, 2, 1.0) == 32
        # rounds up to a sublane multiple
        assert moe_capacity(10, 4, 1, 1.0) % 8 == 0
        # never exceeds what top_k * tokens could fill (rounded up)
        assert moe_capacity(16, 2, 1, 100.0) <= 16

    def test_bad_top_k_raises(self):
        moe = MoEFeedForward(hidden_dim=4, num_experts=2, top_k=3)
        x = jnp.ones((1, 2, 4))
        with pytest.raises(ValueError, match="moe_top_k"):
            _init_moe(moe, x)


class TestAuxLoss:
    def test_aux_sown_and_near_one_when_balanced(self):
        """Uniform router logits -> every expert has mean prob 1/E, so the
        Switch aux loss E * sum(f_e * P_e) collapses to sum(f_e) = 1."""
        moe = MoEFeedForward(
            hidden_dim=8, dim_feedforward=16, num_experts=4, top_k=2,
            dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 8))
        v = _init_moe(moe, x)
        v = {"params": dict(v["params"])}
        v["params"]["router"] = jnp.zeros_like(v["params"]["router"])
        _, upd = moe.apply(v, x, mutable=["losses"])
        aux = upd["losses"]["moe_aux"]
        assert float(aux) == pytest.approx(1.0, abs=1e-5)

    def test_aux_detects_imbalance(self):
        """A router that always picks expert 0 scores aux > 1."""
        moe = MoEFeedForward(
            hidden_dim=8, dim_feedforward=16, num_experts=4, top_k=1,
            dropout=0.0,
        )
        # all-positive tokens + a column of positive weights: every token's
        # expert-0 logit is strongly positive, so routing collapses onto
        # expert 0 (f ~ [1,0,0,0], P_0 ~ 1) and aux approaches E
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (2, 16, 8))) + 0.5
        v = _init_moe(moe, x)
        v = {"params": dict(v["params"])}
        router = np.zeros((8, 4), np.float32)
        router[:, 0] = 5.0
        v["params"]["router"] = jnp.asarray(router)
        _, upd = moe.apply(v, x, mutable=["losses"])
        assert float(upd["losses"]["moe_aux"]) > 3.0


def _moe_cfg(tiny_model_cfg, tmp, **model_overrides):
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("dataset.batch_size", 8)
    cfg.set_dotted("training.max_epochs", 2)
    cfg.set_dotted("model.encoders", {
        "sensor1": {"type": "sequence", "encoder_type": "transformer",
                    "input_dim": 8, "num_layers": 1},
        "sensor2": {"type": "sequence", "encoder_type": "transformer",
                    "input_dim": 8, "num_layers": 1},
    })
    cfg.set_dotted("model.moe_experts", 2)
    cfg.set_dotted("model.moe_top_k", 1)
    for k, val in model_overrides.items():
        cfg.set_dotted(k, val)
    return cfg


class TestTrainerIntegration:
    def test_fit_with_moe_and_aux_loss(self, tiny_model_cfg, tmp_path):
        """model.moe_experts trains end-to-end: the aux loss is sown, picked
        up by the Trainer (training.moe_aux_weight), and losses stay finite."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            SyntheticMultimodalDataset,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )

        dims = {"sensor1": 8, "sensor2": 8}
        train = SyntheticMultimodalDataset(
            num_samples=16, num_classes=5, modality_dims=dims,
            sequence_length=6, split="train",
        ).windows
        val = SyntheticMultimodalDataset(
            num_samples=8, num_classes=5, modality_dims=dims,
            sequence_length=6, split="val",
        ).windows
        cfg = _moe_cfg(tiny_model_cfg, tmp_path)
        trainer = Trainer(cfg)
        results = trainer.fit(train, val, save_dir=tmp_path, log_fn=None)
        assert trainer._has_losses
        losses = [h["train/loss"] for h in results["history"]]
        assert all(np.isfinite(l) for l in losses)

        # aux weight changes the objective: a zero-weight run diverges from
        # the default-weight run's loss history
        cfg0 = _moe_cfg(tiny_model_cfg, tmp_path)
        cfg0.set_dotted("training.moe_aux_weight", 0.0)
        r0 = Trainer(cfg0).fit(
            train, val, save_dir=tmp_path / "w0", log_fn=None
        )
        assert r0["history"][0]["train/loss"] != pytest.approx(
            results["history"][0]["train/loss"], rel=1e-9
        )

    def test_moe_indivisible_by_model_parallel_raises(self, tiny_model_cfg):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )

        cfg = _moe_cfg(tiny_model_cfg, None, **{
            "model.moe_experts": 3,
            "parallel": {"num_devices": 4, "model_parallel": 2},
        })
        with pytest.raises(ValueError, match="moe_experts"):
            Trainer(cfg)

    def test_fit_expert_parallel_matches_single_device(
        self, tiny_model_cfg, tmp_path
    ):
        """dp x ep: expert weights shard over the "model" axis
        (tp_param_spec moe rules) and training matches 1-device losses."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            SyntheticMultimodalDataset,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            MODEL_AXIS,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        dims = {"sensor1": 8, "sensor2": 8}
        train = SyntheticMultimodalDataset(
            num_samples=16, num_classes=5, modality_dims=dims,
            sequence_length=6, split="train",
        ).windows
        val = SyntheticMultimodalDataset(
            num_samples=8, num_classes=5, modality_dims=dims,
            sequence_length=6, split="val",
        ).windows

        def run(parallel, sub):
            cfg = _moe_cfg(tiny_model_cfg, tmp_path)
            if parallel:
                cfg.set_dotted("parallel", parallel)
            trainer = Trainer(cfg)
            results = trainer.fit(
                train, val, save_dir=tmp_path / sub, log_fn=None
            )
            return trainer, results

        t1, r1 = run(None, "ep1")
        tn, rn = run({"num_devices": 4, "model_parallel": 2}, "ep4")
        assert tn.mesh is not None and tn.mesh.shape[MODEL_AXIS] == 2
        # the expert dim of the MoE weights is actually sharded
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            tp_param_spec,
        )
        assert tp_param_spec(["layer0", "moe", "moe_w1"]) == (
            jax.sharding.PartitionSpec(MODEL_AXIS, None, None)
        )
        for h1, hn in zip(r1["history"], rn["history"]):
            assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
            assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)
