"""Sharding: DP mesh training step on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)


def test_make_mesh_sizes():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh4 = make_mesh(4)
    assert mesh4.shape["data"] == 4
    with pytest.raises(ValueError, match="devices"):
        make_mesh(10_000)


def test_shard_batch_places_arrays():
    mesh = make_mesh()
    batch = {"x": jnp.ones((16, 4)), "y": jnp.ones((16,))}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)
    np.testing.assert_allclose(np.asarray(sharded["x"]), 1.0)


def test_psum_loss_matches_single_device():
    """A DP-sharded loss+grad equals the single-device computation."""
    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch = 2 * n_dev
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 8)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, batch), jnp.int32)
    w = jnp.asarray(rng.standard_normal((8, 3)) * 0.1, jnp.float32)

    def loss_fn(w, x, y):
        logits = x @ w
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    base_loss, base_grad = grad_fn(w, x, y)

    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    wr = jax.device_put(w, replicated_sharding(mesh))
    sh_loss, sh_grad = grad_fn(wr, xs, ys)
    assert float(sh_loss) == pytest.approx(float(base_loss), rel=1e-6)
    np.testing.assert_allclose(np.asarray(sh_grad), np.asarray(base_grad), rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as graft

    n = min(8, len(jax.devices()))
    graft.dryrun_multichip(n)


@pytest.mark.slow
def test_dryrun_multichip_hermetic_with_broken_default_backend():
    """The dryrun must go green even when the DEFAULT backend is broken or
    physically down (it was, rounds 1 and 2 — ``MULTICHIP_r0{1,2}.json``).

    Point ``JAX_PLATFORMS`` at a nonexistent plugin so that ANY
    default-backend touch in the calling process raises, strip the
    conftest-provided virtual device pool, and assert both dryrun legs still
    pass: ``dryrun_multichip`` re-execs its payload in a subprocess whose env
    is scrubbed to a CPU mesh before jax imports.
    """
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "no_such_platform"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(4)",
        ],
        env=env,
        cwd=str(repo_root),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"dryrun with broken default backend failed:\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.count("OK") >= 2, proc.stdout  # dp x tp leg + dp x pp leg


def test_entry_forward_jits():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (16, 25)
    assert bool(jnp.isfinite(out).all())


def test_fit_dataparallel_matches_single_device(tiny_model_cfg, tmp_path):
    """``parallel.num_devices=8`` trains to the same losses as 1-device.

    This exercises the REAL user path (``Trainer.fit`` with the ``parallel:``
    config block): mesh construction, replicated state, batch-sharded step
    matrices, sharded eval, and checkpointing of replicated arrays.
    """
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        SyntheticMultimodalDataset,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    n_dev = min(8, len(jax.devices()))
    dims = {"sensor1": 8, "sensor2": 8}
    train = SyntheticMultimodalDataset(
        num_samples=4 * n_dev, num_classes=5, modality_dims=dims,
        sequence_length=6, split="train",
    ).windows
    val = SyntheticMultimodalDataset(
        num_samples=2 * n_dev, num_classes=5, modality_dims=dims,
        sequence_length=6, split="val",
    ).windows

    def run(num_devices):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("dataset.batch_size", 2 * n_dev)
        cfg.set_dotted("training.max_epochs", 2)
        cfg.set_dotted("parallel", {"num_devices": num_devices})
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"dp{num_devices}", log_fn=None
        )
        return trainer, results

    t1, r1 = run(1)
    tn, rn = run(n_dev)
    assert t1.mesh is None
    assert tn.mesh is not None and tn.mesh.shape["data"] == n_dev
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-4)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-4)


def test_fit_tensor_parallel_matches_single_device(tiny_model_cfg, tmp_path):
    """2-D data x model mesh (parallel.model_parallel=2): transformer ffw
    weights Megatron-shard over "model", and training matches 1-device
    losses. Exercises tp_param_spec on params AND Adam moments."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        SyntheticMultimodalDataset,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
        MODEL_AXIS,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
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

    def run(parallel):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("dataset.batch_size", 8)
        cfg.set_dotted("training.max_epochs", 2)
        # transformer encoders so the TP rule actually shards something
        cfg.set_dotted("model.encoders", {
            "sensor1": {"type": "sequence", "encoder_type": "transformer",
                        "input_dim": 8, "num_layers": 1},
            "sensor2": {"type": "sequence", "encoder_type": "transformer",
                        "input_dim": 8, "num_layers": 1},
        })
        cfg.set_dotted("parallel", parallel)
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"tp{parallel}", log_fn=None
        )
        return trainer, results

    t1, r1 = run({})
    tn, rn = run({"num_devices": 4, "model_parallel": 2})
    assert t1.mesh is None
    assert tn.mesh is not None
    assert tn.mesh.shape["data"] == 2 and tn.mesh.shape[MODEL_AXIS] == 2
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)


def test_fit_multislice_matches_single_device(tiny_model_cfg, tmp_path):
    """3-D dcn x data x model mesh (parallel.dcn_slices=2): the leading
    slice axis carries pure data parallelism (batch sharded over
    ('dcn','data'), params replicated across slices) and training matches
    1-device losses."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        SyntheticMultimodalDataset,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
        DCN_AXIS,
        MODEL_AXIS,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 devices")
    dims = {"sensor1": 8, "sensor2": 8}
    train = SyntheticMultimodalDataset(
        num_samples=16, num_classes=5, modality_dims=dims,
        sequence_length=6, split="train",
    ).windows
    val = SyntheticMultimodalDataset(
        num_samples=8, num_classes=5, modality_dims=dims,
        sequence_length=6, split="val",
    ).windows

    def run(parallel):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("dataset.batch_size", 8)
        cfg.set_dotted("training.max_epochs", 2)
        cfg.set_dotted("model.encoders", {
            "sensor1": {"type": "sequence", "encoder_type": "transformer",
                        "input_dim": 8, "num_layers": 1},
            "sensor2": {"type": "sequence", "encoder_type": "transformer",
                        "input_dim": 8, "num_layers": 1},
        })
        cfg.set_dotted("parallel", parallel)
        trainer = Trainer(cfg)
        results = trainer.fit(
            train, val, save_dir=tmp_path / f"ms{len(parallel)}", log_fn=None
        )
        return trainer, results

    t1, r1 = run({})
    tn, rn = run({"num_devices": 8, "dcn_slices": 2, "model_parallel": 2})
    assert tn.mesh is not None
    assert tn.mesh.shape[DCN_AXIS] == 2
    assert tn.mesh.shape["data"] == 2 and tn.mesh.shape[MODEL_AXIS] == 2
    assert tn.n_shards == 4  # dcn x data batch shards
    for h1, hn in zip(r1["history"], rn["history"]):
        assert hn["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
        assert hn["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)


def test_make_mesh_dcn_shapes():
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
        DCN_AXIS,
        batch_sharding,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = make_mesh(8, dcn_slices=2)
    assert mesh.axis_names == (DCN_AXIS, "data")
    assert mesh.shape[DCN_AXIS] == 2 and mesh.shape["data"] == 4
    spec = batch_sharding(mesh).spec
    assert spec == P((DCN_AXIS, "data"))
    with pytest.raises(ValueError, match="divide"):
        make_mesh(8, dcn_slices=3)


def test_tp_param_spec_rule():
    from jax.sharding import PartitionSpec as P

    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
        tp_param_spec,
    )

    assert tp_param_spec(["encoder_sensor1", "layer0", "linear1", "kernel"]) == P(None, "model")
    assert tp_param_spec(["layer0", "linear1", "bias"]) == P("model")
    assert tp_param_spec(["layer0", "linear2", "kernel"]) == P("model", None)
    assert tp_param_spec(["layer0", "linear2", "bias"]) == P()
    assert tp_param_spec(["layer0", "q_proj", "kernel"]) == P()


def test_trainer_epoch_sharded_matches_replicated(tiny_model_cfg):
    """The whole-epoch scan produces the same loss whether the per-step batch
    axis is sharded over the mesh or fully replicated."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        BatchLoader,
        SyntheticMultimodalDataset,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.device import (
        device_put_split,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("dataset.batch_size", 2 * n_dev)
    cfg.set_dotted("training.augmentation.modality_dropout", 0.0)

    windows = SyntheticMultimodalDataset(
        num_samples=4 * n_dev, num_classes=5,
        modality_dims={"sensor1": 8, "sensor2": 8}, sequence_length=6,
    ).windows

    def run(shard: bool):
        trainer = Trainer(cfg)
        boot = next(iter(BatchLoader(windows, 2 * n_dev)))
        state = trainer.init_state(boot, steps_per_epoch=2)
        data = device_put_split(windows)
        epoch_fn = trainer.make_train_epoch_fn()
        idx = jnp.asarray(
            np.arange(2 * 2 * n_dev).reshape(2, 2 * n_dev) % windows.num_windows,
            jnp.int32,
        )
        weight = jnp.ones((2, 2 * n_dev), jnp.float32)
        if shard:
            spec = NamedSharding(mesh, P(None, "data"))
            idx = jax.device_put(idx, spec)
            weight = jax.device_put(weight, spec)
        _, loss, acc = epoch_fn(state, data, idx, weight)
        return float(loss), float(acc)

    loss_rep, acc_rep = run(shard=False)
    loss_sh, acc_sh = run(shard=True)
    assert loss_sh == pytest.approx(loss_rep, rel=1e-4)
    assert acc_sh == pytest.approx(acc_rep, rel=1e-4)


class TestMultihostInit:
    """parallel.coordinator_address wires jax.distributed.initialize before
    the mesh is built (multi-host pods). A real rendezvous needs >1 process;
    these tests pin the config plumbing via injection."""

    def _reset(self, monkeypatch):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel import (
            mesh as mesh_mod,
        )

        monkeypatch.setattr(mesh_mod, "_DISTRIBUTED_INITIALIZED", False)
        calls = []
        monkeypatch.setattr(
            mesh_mod.jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        return mesh_mod, calls

    def test_noop_without_coordinator(self, monkeypatch):
        mesh_mod, calls = self._reset(monkeypatch)
        assert mesh_mod.maybe_initialize_distributed({}) is False
        assert mesh_mod.maybe_initialize_distributed(None) is False
        assert calls == []

    def test_initializes_once_with_args(self, monkeypatch):
        mesh_mod, calls = self._reset(monkeypatch)
        cfg = {"coordinator_address": "10.0.0.1:8476",
               "num_processes": 4, "process_id": 2}
        assert mesh_mod.maybe_initialize_distributed(cfg) is True
        assert mesh_mod.maybe_initialize_distributed(cfg) is True  # idempotent
        assert calls == [{"coordinator_address": "10.0.0.1:8476",
                          "num_processes": 4, "process_id": 2}]

    def test_optional_ranks_omitted(self, monkeypatch):
        mesh_mod, calls = self._reset(monkeypatch)
        assert mesh_mod.maybe_initialize_distributed(
            {"coordinator_address": "c:1"}
        ) is True
        assert calls == [{"coordinator_address": "c:1"}]

    def test_external_init_respected(self, monkeypatch):
        """A launcher that already ran jax.distributed.initialize() itself
        (JAX's documented pattern) must not trigger a double-init crash."""
        mesh_mod, calls = self._reset(monkeypatch)
        monkeypatch.setattr(
            mesh_mod.jax.distributed, "is_initialized", lambda: True
        )
        assert mesh_mod.maybe_initialize_distributed(
            {"coordinator_address": "c:1"}
        ) is True
        assert calls == []

    def test_init_precedes_model_construction(self, monkeypatch, tiny_model_cfg):
        """jax.distributed.initialize refuses to run once the XLA backend is
        up, and model construction initialises the backend (kernel-flag
        "auto" resolution calls jax.default_backend()) — so Trainer must
        wire the runtime BEFORE building the model."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train import (
            trainer as trainer_mod,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        mesh_mod, _ = self._reset(monkeypatch)
        order = []
        monkeypatch.setattr(
            mesh_mod.jax.distributed, "initialize",
            lambda **kw: order.append("init"),
        )
        real_from_config = trainer_mod.MultimodalFusionModel.from_config
        monkeypatch.setattr(
            trainer_mod.MultimodalFusionModel, "from_config",
            classmethod(
                lambda cls, cfg: (order.append("model"), real_from_config(cfg))[1]
            ),
        )
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("parallel", {"coordinator_address": "c:1"})
        trainer_mod.Trainer(cfg)
        assert order == ["init", "model"]

    def test_device_ctx_pins_addressable_device(self, tiny_model_cfg):
        """On a pod mesh spanning remote processes, _device_ctx must pin to
        a device THIS process can address, not blindly devices.flat[0]."""
        import types

        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )

        trainer = Trainer(tiny_model_cfg)
        local = jax.devices()[0]
        remote = types.SimpleNamespace(
            process_index=jax.process_index() + 1, id=999
        )
        trainer.mesh = types.SimpleNamespace(
            devices=np.array([remote, local], dtype=object)
        )
        with trainer._device_ctx():
            committed = jnp.asarray(1.0)
        assert committed.devices() == {local}

    def test_trainer_wires_it(self, monkeypatch, tiny_model_cfg):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        mesh_mod, calls = self._reset(monkeypatch)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "parallel",
            {"num_devices": 8, "coordinator_address": "c:1"},
        )
        Trainer(cfg)._ensure_mesh()
        assert calls == [{"coordinator_address": "c:1"}]


class _FakeDev:
    """Stands in for a TPU device on a multi-slice pod."""

    def __init__(self, dev_id, slice_index):
        self.id = dev_id
        self.slice_index = slice_index

    def __repr__(self):  # np.array(devices) needs a repr for errors
        return f"FakeDev(id={self.id}, slice={self.slice_index})"


class TestSliceGrouping:
    """jax.devices() order is not contractually slice-contiguous: the dcn
    axis must be built from slice-grouped devices or per-step collectives
    silently cross the slow DCN (round-2 review regression)."""

    def test_interleaved_devices_are_regrouped(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            _slice_grouped,
        )

        devs = [_FakeDev(0, 0), _FakeDev(1, 1), _FakeDev(2, 0), _FakeDev(3, 1)]
        out = _slice_grouped(devs, 2)
        assert [(d.slice_index, d.id) for d in out] == [
            (0, 0), (0, 2), (1, 1), (1, 3),
        ]

    def test_mismatched_slice_layout_raises(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            _slice_grouped,
        )

        devs = [_FakeDev(0, 0), _FakeDev(1, 0), _FakeDev(2, 0), _FakeDev(3, 1)]
        with pytest.raises(ValueError, match="slice layout"):
            _slice_grouped(devs, 2)

    def test_virtual_devices_pass_through(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            _slice_grouped,
        )

        devs = jax.devices()  # host CPU devices: no slice_index attribute
        assert _slice_grouped(devs, 2) == list(devs)


class TestSequenceParallel:
    """Megatron sequence parallelism (parallel.sequence_parallel): norm-region
    activations shard on TIME over the tensor-parallel "model" axis via
    region-boundary sharding constraints (parallel/mesh.py helpers, emitted by
    _TransformerEncoderLayer when the Trainer publishes its mesh)."""

    def _encoder(self, sp: bool):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (
            SequenceEncoder,
        )

        return SequenceEncoder(
            hidden_dim=8, output_dim=4, num_layers=1,
            encoder_type="transformer", dropout=0.0, sequence_parallel=sp,
        )

    def test_constraints_are_emitted_in_lowered_hlo(self):
        """With an active tp mesh the sp encoder's lowered program carries
        MORE Sharding custom-calls than the plain one (the region-boundary
        with_sharding_constraints); without a published mesh it lowers to the
        exact same constraint count (the helpers are no-ops)."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            activation_mesh,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        mesh = make_mesh(4, model_parallel=2)
        x = jnp.ones((2, 8, 3))

        def lower(enc, variables):
            fn = jax.jit(lambda v, s: enc.apply(v, s))
            return fn.lower(variables, x).as_text()

        def n_constraints(text):
            # shardy lowering (jax >= 0.7 default) vs legacy GSPMD custom-call
            return text.count("sdy.sharding_constraint") + text.count(
                "@Sharding"
            )

        plain = self._encoder(False)
        sp = self._encoder(True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        with activation_mesh(mesh):
            text_plain = lower(plain, variables)
            text_sp = lower(sp, variables)
            assert n_constraints(text_sp) > n_constraints(text_plain)
        # no published mesh -> the sp flag is inert (single-device eval CLI)
        assert n_constraints(lower(sp, variables)) == n_constraints(text_plain)

    def test_outputs_match_plain_encoder(self):
        """sp resharding must not change the math: same params, same input,
        same output (up to reduction-order noise) on the CPU mesh."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
            activation_mesh,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        mesh = make_mesh(4, model_parallel=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 3))
        plain = self._encoder(False)
        sp = self._encoder(True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        ref = plain.apply(variables, x)
        with activation_mesh(mesh):
            out = jax.jit(lambda v, s: sp.apply(v, s))(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_requires_model_parallel(self, tiny_model_cfg):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted(
            "parallel", {"num_devices": 4, "sequence_parallel": True}
        )
        with pytest.raises(ValueError, match="sequence_parallel requires"):
            Trainer(cfg)

    def test_fit_matches_single_device(self, tiny_model_cfg, tmp_path):
        """dp x tp + sequence parallelism trains to the same losses as one
        device (transformer encoders, kernels pinned off on the CPU mesh)."""
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            SyntheticMultimodalDataset,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
            Trainer,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
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

        def run(parallel):
            cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
            cfg.set_dotted("dataset.batch_size", 8)
            cfg.set_dotted("training.max_epochs", 2)
            cfg.set_dotted("model.encoders", {
                "sensor1": {"type": "sequence", "encoder_type": "transformer",
                            "input_dim": 8, "num_layers": 1},
                "sensor2": {"type": "sequence", "encoder_type": "transformer",
                            "input_dim": 8, "num_layers": 1},
            })
            cfg.set_dotted("parallel", parallel)
            trainer = Trainer(cfg)
            results = trainer.fit(
                train, val, save_dir=tmp_path / f"sp{len(parallel)}",
                log_fn=None,
            )
            return results

        r1 = run({})
        rsp = run({
            "num_devices": 4, "model_parallel": 2, "sequence_parallel": True,
        })
        for h1, hsp in zip(r1["history"], rsp["history"]):
            assert hsp["train/loss"] == pytest.approx(h1["train/loss"], rel=2e-3)
            assert hsp["val/loss"] == pytest.approx(h1["val/loss"], rel=2e-3)
