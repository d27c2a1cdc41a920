"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch pipelining
of the transformer encoder layer stack over a "pipe" mesh axis.

The reference has no pipeline parallelism (its scale-out is a CI job matrix);
these tests pin the rebuild's own contracts:

- ``layer_forward`` reproduces ``_TransformerEncoderLayer``'s XLA path
  exactly (same params, same outputs).
- The pipelined schedule (shard_map + ppermute + lax.scan) matches the
  sequential fallback bit-for-bit-ish (fp32 tolerance), forward AND backward.
- ``Trainer.fit`` on a dp x pp mesh matches single-device losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
    PIPE_AXIS,
    activation_mesh,
    make_mesh,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.pipeline import (
    PipelinedTransformerLayers,
    layer_forward,
)


def _stack_params(layer_params_list):
    """Stack per-layer param dicts into the [L, ...] pipe_layers layout."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *layer_params_list
    )


class TestLayerForward:
    @pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
    def test_matches_transformer_encoder_layer(self, dtype):
        """layer_forward == _TransformerEncoderLayer's XLA path, same params
        — in f32 AND under mixed precision (bf16 rounding points must
        line up, incl. the FFW output cast before the residual)."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
            _TransformerEncoderLayer,
        )

        layer = _TransformerEncoderLayer(
            hidden_dim=32, num_heads=4, dim_feedforward=64, dropout=0.0,
            use_flash=False, use_fused_mlp=False, dtype=dtype,
        )
        x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 32), jnp.float32)
        lengths = jnp.array([10, 7, 4])
        mask = jnp.arange(10)[None, :] < lengths[:, None]
        variables = layer.init(jax.random.PRNGKey(0), x, key_padding_mask=mask)
        want = layer.apply(variables, x, key_padding_mask=mask)
        got = layer_forward(
            variables["params"], x, num_heads=4, valid_mask=mask, dtype=dtype
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_init_matches_sequential_distribution(self):
        """stacked_layers_init draws the same per-leaf distributions as the
        sequential layers: lecun-normal kernels (per-layer fan), zero
        biases, LayerNorm ones/zeros."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.pipeline import (
            stacked_layers_init,
        )

        params = stacked_layers_init(4, 64, 128)(jax.random.PRNGKey(0))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj",
                     "linear1", "linear2"):
            assert np.all(np.asarray(params[proj]["bias"]) == 0.0), proj
            k = np.asarray(params[proj]["kernel"])
            fan_in = k.shape[1]
            # lecun-normal: std ~= 1/sqrt(fan_in) per layer slice
            std = k.std(axis=(1, 2))
            np.testing.assert_allclose(std, fan_in**-0.5, rtol=0.25)
        assert np.all(np.asarray(params["norm1"]["scale"]) == 1.0)
        assert np.all(np.asarray(params["norm2"]["bias"]) == 0.0)

    def test_matches_layer_stack_when_stacked(self):
        """A stacked pipe_layers tree fed through the sequential fallback
        equals running the per-layer _TransformerEncoderLayer stack."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
            _TransformerEncoderLayer,
        )

        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32), jnp.float32)
        layers, per_layer_params = [], []
        for idx in range(2):
            layer = _TransformerEncoderLayer(
                hidden_dim=32, num_heads=4, dim_feedforward=64, dropout=0.0,
                use_flash=False, use_fused_mlp=False,
            )
            variables = layer.init(jax.random.PRNGKey(idx), x)
            layers.append((layer, variables))
            per_layer_params.append(variables["params"])
        want = x
        for layer, variables in layers:
            want = layer.apply(variables, want)

        mod = PipelinedTransformerLayers(
            hidden_dim=32, num_heads=4, num_layers=2, dim_feedforward=64,
            dropout=0.0, pipeline_parallel=2,
        )
        stacked = {"params": {"pipe_layers": _stack_params(per_layer_params)}}
        got = mod.apply(stacked, x)  # no mesh -> sequential fallback
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestPipelinedSchedule:
    def _build(self, n_micro=4, dropout=0.0):
        mod = PipelinedTransformerLayers(
            hidden_dim=32, num_heads=4, num_layers=4, dim_feedforward=64,
            dropout=dropout, pipeline_parallel=4, microbatches=n_micro,
        )
        x = jnp.asarray(np.random.RandomState(2).randn(8, 10, 32), jnp.float32)
        lengths = np.random.RandomState(3).randint(3, 11, size=8)
        mask = jnp.asarray(np.arange(10)[None, :] < lengths[:, None])
        params = mod.init(jax.random.PRNGKey(0), x, key_padding_mask=mask)
        return mod, params, x, mask

    @pytest.mark.parametrize("n_micro", [4, 8])
    def test_matches_sequential_fallback(self, n_micro):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mod, params, x, mask = self._build(n_micro=n_micro)
        want = mod.apply(params, x, key_padding_mask=mask)
        mesh = make_mesh(8, pipeline_parallel=4)
        assert mesh.shape[PIPE_AXIS] == 4 and mesh.shape["data"] == 2
        with activation_mesh(mesh):
            got = jax.jit(
                lambda p, x, m: mod.apply(p, x, key_padding_mask=m)
            )(params, x, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_sequential_fallback(self):
        """The GPipe scan is reverse-differentiable and its grads equal the
        sequential stack's (fp32 tolerance)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mod, params, x, mask = self._build()

        def loss(p, xx):
            out = mod.apply(p, xx, key_padding_mask=mask)
            return jnp.mean(out**2)

        want_l, want_g = jax.value_and_grad(loss)(params, x)
        mesh = make_mesh(8, pipeline_parallel=4)
        with activation_mesh(mesh):
            got_l, got_g = jax.jit(jax.value_and_grad(loss))(params, x)
        np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
        flat_w, _ = jax.tree_util.tree_flatten(want_g)
        flat_g, _ = jax.tree_util.tree_flatten(got_g)
        for gw, gg in zip(flat_w, flat_g):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       rtol=5e-4, atol=1e-5)

    def test_train_mode_dropout_runs_pipelined(self):
        """Dropout draws fold (layer, microbatch); the pipelined path just
        has to run and stay finite (draws differ from the fallback by
        design — each stage/microbatch folds its own key)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mod, params, x, mask = self._build(dropout=0.3)
        mesh = make_mesh(8, pipeline_parallel=4)
        with activation_mesh(mesh):
            out = jax.jit(
                lambda p, xx: mod.apply(
                    p, xx, key_padding_mask=mask, train=True,
                    rngs={"dropout": jax.random.PRNGKey(7)},
                )
            )(params, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_batch_not_divisible_raises(self):
        mod = PipelinedTransformerLayers(
            hidden_dim=32, num_heads=4, num_layers=4, dropout=0.0,
            pipeline_parallel=4, microbatches=4,
        )
        x = jnp.zeros((6, 5, 32))
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        params = mod.init(jax.random.PRNGKey(0), x)  # off-mesh init is fine
        mesh = make_mesh(8, pipeline_parallel=4)
        with activation_mesh(mesh):
            with pytest.raises(ValueError, match="microbatches"):
                mod.apply(params, x)

    def test_layers_not_divisible_raises(self):
        mod = PipelinedTransformerLayers(
            hidden_dim=32, num_heads=4, num_layers=3, pipeline_parallel=2,
        )
        with pytest.raises(ValueError, match="divide evenly"):
            mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 32)))


class TestMeshLayout:
    def test_pipe_mesh_shapes(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(8, pipeline_parallel=2)
        assert mesh.shape == {"data": 4, PIPE_AXIS: 2}
        mesh = make_mesh(8, dcn_slices=2, pipeline_parallel=2)
        assert mesh.shape == {"dcn": 2, "data": 2, PIPE_AXIS: 2}

    def test_pipe_with_model_parallel_raises(self):
        with pytest.raises(ValueError, match="cannot be combined"):
            make_mesh(8, model_parallel=2, pipeline_parallel=2)

    def test_pipe_must_divide_devices(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        with pytest.raises(ValueError, match="must divide"):
            make_mesh(8, pipeline_parallel=3)

    def test_state_shardings_shard_pipe_layers(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from jax.sharding import PartitionSpec as P

        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            state_shardings,
        )

        mesh = make_mesh(8, pipeline_parallel=4)
        tree = {
            "pipeline": {"pipe_layers": {"q_proj": {"kernel": jnp.zeros((4, 8, 8))}}},
            "projection": {"kernel": jnp.zeros((8, 5))},
        }
        sh = state_shardings(mesh, tree)
        assert sh["pipeline"]["pipe_layers"]["q_proj"]["kernel"].spec == P(PIPE_AXIS)
        assert sh["projection"]["kernel"].spec == P()


def test_fit_pipeline_parallel_matches_single_device(tiny_model_cfg, tmp_path):
    """dp x pp (parallel.pipeline_parallel=2): the transformer layer stack
    GPipe-pipelines over "pipe" with its stacked params sharded [L] over the
    axis, and training matches the single-device sequential fallback (same
    stacked param tree, dropout off so the per-microbatch rng folding is
    moot)."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        SyntheticMultimodalDataset,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dims = {"sensor1": 8, "sensor2": 8}
    train = SyntheticMultimodalDataset(
        num_samples=16, num_classes=5, modality_dims=dims,
        sequence_length=6, split="train",
    ).windows
    val = SyntheticMultimodalDataset(
        num_samples=8, num_classes=5, modality_dims=dims,
        sequence_length=6, split="val",
    ).windows

    def run(parallel, pipe_in_encoder):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("dataset.batch_size", 8)
        cfg.set_dotted("training.max_epochs", 2)
        # dropout off: pipelined dropout folds (layer, microbatch) while the
        # fallback folds (layer, whole batch) -> draws differ by design
        cfg.set_dotted("model.dropout", 0.0)
        cfg.set_dotted("training.augmentation", {"modality_dropout": 0.0})
        enc = {"type": "sequence", "encoder_type": "transformer",
               "input_dim": 8, "num_layers": 2}
        if pipe_in_encoder:
            # single-device run: same STACKED param tree via the encoder
            # flag, executed on the sequential fallback (no pipe mesh)
            enc = dict(enc, pipeline_parallel=2)
        cfg.set_dotted("model.encoders", {"sensor1": dict(enc), "sensor2": dict(enc)})
        cfg.set_dotted("parallel", parallel)
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"pp{len(parallel)}", log_fn=None
        )
        return trainer, results

    t1, r1 = run({}, pipe_in_encoder=True)
    tn, rn = run({"num_devices": 8, "pipeline_parallel": 2}, pipe_in_encoder=False)
    assert t1.mesh is None
    assert tn.mesh is not None
    assert tn.mesh.shape["data"] == 4 and tn.mesh.shape[PIPE_AXIS] == 2
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)


def test_pipeline_does_not_compose_with_moe():
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
        SequenceEncoder,
    )

    enc = SequenceEncoder(
        hidden_dim=32, output_dim=16, encoder_type="transformer",
        num_layers=2, pipeline_parallel=2, moe_experts=2,
    )
    with pytest.raises(ValueError, match="does not compose"):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 8)))


def test_effective_batch_pads_for_encoder_microbatches(tiny_model_cfg):
    """A per-encoder pipeline_microbatches override imposes its own batch
    divisibility; _effective_batch must pad for the lcm of ALL of them."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("dataset.batch_size", 32)
    cfg.set_dotted(
        "model.encoders",
        {
            "sensor1": {"type": "sequence", "encoder_type": "transformer",
                        "input_dim": 8, "num_layers": 2,
                        "pipeline_microbatches": 3},
            "sensor2": {"type": "sequence", "encoder_type": "lstm",
                        "input_dim": 8, "num_layers": 1},
        },
    )
    cfg.set_dotted(
        "parallel", {"num_devices": 8, "pipeline_parallel": 2}
    )
    trainer = Trainer(cfg)
    trainer._ensure_mesh()
    # lcm(4 data shards, 2 global microbatches, 3 encoder microbatches) = 12
    assert trainer._effective_batch(32) == 36


def test_trainer_rejects_pp_with_tp(tiny_model_cfg):
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted(
        "parallel",
        {"num_devices": 8, "model_parallel": 2, "pipeline_parallel": 2},
    )
    with pytest.raises(ValueError, match="cannot be combined"):
        Trainer(cfg)
