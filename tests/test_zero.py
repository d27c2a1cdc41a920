"""ZeRO-1 optimizer-state sharding (``parallel.zero_optimizer``).

The reference has no distributed optimizer (it is single-device; SURVEY §5).
These tests pin the rebuild's own contracts:

- ``zero_extend_spec`` inserts the "data" axis on the first evenly-divisible
  unsharded dim and composes with existing tp/pp specs.
- ``state_shardings(..., zero_optimizer=True)`` shards ONLY opt_state leaves;
  params stay replicated.
- ``Trainer.fit`` with ``parallel.zero_optimizer: true`` trains to the same
  losses as a single device (sharding the moments changes layout, not math).
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
    make_mesh,
    state_shardings,
    zero_extend_spec,
)


class TestZeroExtendSpec:
    def test_first_divisible_dim(self):
        assert zero_extend_spec(P(), (8, 16), 8) == P("data")
        assert zero_extend_spec(P(), (6, 16), 8) == P(None, "data")
        assert zero_extend_spec(P(), (16,), 8) == P("data")

    def test_no_divisible_dim_stays(self):
        assert zero_extend_spec(P(), (5, 3), 8) == P()
        assert zero_extend_spec(P(), (), 8) == P()
        # a dim equal to a multiple qualifies, smaller does not
        assert zero_extend_spec(P(), (4,), 8) == P()

    def test_composes_with_model_axis(self):
        # Megatron linear1 kernel [H, ffw] already shards ffw over "model";
        # ZeRO adds "data" on the H dim
        assert zero_extend_spec(P(None, "model"), (32, 64), 8) == P("data", "model")
        # already-sharded dims are never touched
        assert zero_extend_spec(P("model"), (32,), 8) == P("model")

    def test_composes_with_pipe_axis(self):
        assert zero_extend_spec(P("pipe"), (4, 32, 32), 4) == P("pipe", "data")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestZeroStateShardings:
    def test_opt_state_sharded_params_replicated(self):
        mesh = make_mesh(8)
        tree = {
            "params": {"dense": {"kernel": jnp.zeros((16, 8))}},
            "opt_state": {"mu": {"dense": {"kernel": jnp.zeros((16, 8))}},
                          "count": jnp.zeros((), jnp.int32)},
        }
        sh = state_shardings(mesh, tree, zero_optimizer=True)
        assert sh["params"]["dense"]["kernel"].spec == P()
        assert sh["opt_state"]["mu"]["dense"]["kernel"].spec == P("data")
        assert sh["opt_state"]["count"].spec == P()

    def test_off_by_default(self):
        mesh = make_mesh(8)
        tree = {"opt_state": {"mu": jnp.zeros((16, 8))}}
        sh = state_shardings(mesh, tree)
        assert sh["opt_state"]["mu"].spec == P()

    def test_composes_with_tensor_parallel(self):
        mesh = make_mesh(8, model_parallel=2)
        tree = {
            "params": {"linear1": {"kernel": jnp.zeros((32, 64))}},
            "opt_state": {"mu": {"linear1": {"kernel": jnp.zeros((32, 64))}}},
        }
        sh = state_shardings(mesh, tree, zero_optimizer=True)
        # params keep the pure Megatron layout; moments add "data" on dim 0
        assert sh["params"]["linear1"]["kernel"].spec == P(None, "model")
        assert sh["opt_state"]["mu"]["linear1"]["kernel"].spec == P("data", "model")

    def test_indivisible_moment_stays_replicated(self):
        mesh = make_mesh(8)
        tree = {"opt_state": {"mu": {"bias": jnp.zeros((5,))}}}
        sh = state_shardings(mesh, tree, zero_optimizer=True)
        assert sh["opt_state"]["mu"]["bias"].spec == P()


def test_zero_requires_num_devices(tiny_model_cfg):
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("parallel", {"zero_optimizer": True})
    with pytest.raises(ValueError, match="zero_optimizer"):
        Trainer(cfg)._ensure_mesh()


def test_fit_zero_optimizer_matches_single_device(tiny_model_cfg, tmp_path):
    """dp8 + ZeRO-1 trains to the same losses as 1-device — sharding the
    Adam moments over "data" changes layout/collectives, never math — and
    the trainer actually installs data-sharded moment specs."""
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
        num_samples=32, num_classes=5, modality_dims=dims,
        sequence_length=6, split="train",
    ).windows
    val = SyntheticMultimodalDataset(
        num_samples=16, num_classes=5, modality_dims=dims,
        sequence_length=6, split="val",
    ).windows

    def run(parallel):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("dataset.batch_size", 16)
        cfg.set_dotted("training.max_epochs", 2)
        cfg.set_dotted("parallel", parallel)
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"z{len(parallel)}", log_fn=None
        )
        return trainer, results

    t1, r1 = run({})
    tn, rn = run({"num_devices": 8, "zero_optimizer": True})
    assert t1.mesh is None and t1._opt_shardings is None
    assert tn.mesh is not None and tn._opt_shardings is not None
    specs = [
        s.spec
        for s in jax.tree_util.tree_leaves(tn._opt_shardings)
    ]
    assert any("data" in str(spec) for spec in specs), specs
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-4)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-4)


def test_fit_zero_composes_with_pipeline(tiny_model_cfg, tmp_path):
    """dp x pp + ZeRO-1 in one fit: the non-pipelined moments shard over
    'data' while the stacked pipe_layers moments keep P('pipe') — adding a
    'data' dim to those crashes XLA's SPMD partitioner next to the
    pipe-manual shard_map (so state_shardings deliberately skips them) —
    and training still matches the 1-device run."""
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
        cfg.set_dotted("model.dropout", 0.0)
        cfg.set_dotted("training.augmentation", {"modality_dropout": 0.0})
        enc = {"type": "sequence", "encoder_type": "transformer",
               "input_dim": 8, "num_layers": 2}
        if pipe_in_encoder:
            enc = dict(enc, pipeline_parallel=2)
        cfg.set_dotted(
            "model.encoders", {"sensor1": dict(enc), "sensor2": dict(enc)}
        )
        cfg.set_dotted("parallel", parallel)
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"zp{len(parallel)}", log_fn=None
        )
        return trainer, results

    t1, r1 = run({}, pipe_in_encoder=True)
    tn, rn = run(
        {"num_devices": 8, "pipeline_parallel": 2, "zero_optimizer": True},
        pipe_in_encoder=False,
    )
    specs = {
        str(s.spec) for s in jax.tree_util.tree_leaves(tn._opt_shardings)
    }
    # dense moments ZeRO-shard over 'data'; pipe_layers moments keep the
    # pure P('pipe') layout (never extended — see state_shardings)
    assert any("'data'" in s for s in specs), specs
    assert any(s == "PartitionSpec('pipe',)" for s in specs), specs
    assert not any("'pipe'" in s and "'data'" in s for s in specs), specs
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)
