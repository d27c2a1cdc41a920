"""Trainer: end-to-end fit, results.json schema, checkpoints, schedules."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
    SyntheticMultimodalDataset,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
    CheckpointManager,
    load_checkpoint,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
    Trainer,
    build_optimizer,
    lr_schedule,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
    ConfigNode,
)


def _splits(num=48, seq=8, dim=8, classes=5):
    dims = {"sensor1": dim, "sensor2": dim}
    mk = lambda s, n: SyntheticMultimodalDataset(  # noqa: E731
        num_samples=n, num_classes=classes, modality_dims=dims,
        sequence_length=seq, split=s,
    ).windows
    return mk("train", num), mk("val", 16), mk("test", 16)


@pytest.fixture(scope="module")
def fit_results(tiny_model_cfg, tmp_path_factory):
    """One shared 2-epoch fit used by several assertions (fits are slow)."""
    save_dir = tmp_path_factory.mktemp("fit")
    trainer = Trainer(tiny_model_cfg)
    train_w, val_w, test_w = _splits(dim=8)
    results = trainer.fit(train_w, val_w, test_w, save_dir=save_dir, log_fn=None)
    return trainer, results, save_dir


class TestFit:
    def test_results_schema(self, fit_results):
        _, results, save_dir = fit_results
        assert set(results) >= {"best_model_path", "best_val_loss", "config"}
        assert Path(results["best_model_path"]).exists()
        on_disk = json.loads((save_dir / "results.json").read_text())
        assert on_disk["best_val_loss"] == pytest.approx(results["best_val_loss"])
        assert on_disk["config"]["model"]["fusion_type"] == "hybrid"

    def test_history_and_test_metrics(self, fit_results):
        _, results, _ = fit_results
        assert len(results["history"]) == 2
        assert {"train/loss", "val/loss", "val/acc"} <= set(results["history"][0])
        assert 0.0 <= results["test_acc"] <= 1.0

    def test_checkpoint_roundtrip_reconstructs_model(self, fit_results):
        trainer, results, _ = fit_results
        variables, config, meta = load_checkpoint(results["best_model_path"])
        assert config is not None
        assert meta["val_loss"] == pytest.approx(results["best_val_loss"], abs=1e-5)
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
            MultimodalFusionModel,
        )
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.device import (
            device_put_split,
        )

        model = MultimodalFusionModel.from_config(config)
        _, val_w, _ = _splits()
        data = device_put_split(val_w)
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.evaluate import (
            forward_all,
        )

        logits = forward_all(model, variables, data, batch_size=8)
        assert logits.shape == (16, 5)
        assert np.isfinite(logits).all()

    def test_training_reduces_loss_on_learnable_data(self, tiny_model_cfg):
        """Labels derived from the features must be learnable above chance."""
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.max_epochs", 15)
        cfg.set_dotted("training.augmentation.modality_dropout", 0.0)
        cfg.set_dotted("model.dropout", 0.0)
        train_w, val_w, _ = _splits(num=96)
        # make labels a simple function of sensor1's mean
        for w in (train_w, val_w):
            signal = w.features["sensor1"].mean(axis=(1, 2))
            w.labels = (signal > np.median(signal)).astype(np.int32)
        trainer = Trainer(cfg)
        results = trainer.fit(train_w, val_w, log_fn=None)
        assert results["history"][-1]["train/acc"] > 0.7


class TestSchedules:
    def test_cosine_matches_torch_formula(self):
        lr, epochs = 1e-3, 10
        sched = lr_schedule("cosine", lr, epochs, updates_per_epoch=5)
        eta_min = lr / 100
        for epoch in (0, 3, 10):
            expected = eta_min + 0.5 * (lr - eta_min) * (
                1 + np.cos(np.pi * epoch / epochs)
            )
            got = float(sched(jnp.asarray(epoch * 5)))
            assert got == pytest.approx(expected, rel=1e-6)

    def test_step_schedule(self):
        sched = lr_schedule("step", 1e-2, 100, updates_per_epoch=1)
        assert float(sched(jnp.asarray(0))) == pytest.approx(1e-2)
        assert float(sched(jnp.asarray(30))) == pytest.approx(1e-3)
        assert float(sched(jnp.asarray(60))) == pytest.approx(1e-4)

    def test_unknown_optimizer(self):
        cfg = ConfigNode({"optimizer": "sgd", "learning_rate": 1e-3})
        with pytest.raises(ValueError, match="Unknown optimizer: sgd"):
            build_optimizer(cfg, steps_per_epoch=10)


class TestCheckpointManager:
    def test_top_k_eviction(self, tmp_path):
        mgr = CheckpointManager(tmp_path, save_top_k=2, save_last=True)
        variables = {"params": {"w": np.ones(3)}}
        mgr.save(variables, epoch=0, score=1.0)
        mgr.save(variables, epoch=1, score=0.5)
        mgr.save(variables, epoch=2, score=0.8)  # evicts 1.0
        kept = {p.name for p in tmp_path.iterdir()}
        assert "epoch=1-val_loss=0.5000" in kept
        assert "epoch=2-val_loss=0.8000" in kept
        assert "epoch=0-val_loss=1.0000" not in kept
        assert "last" in kept
        assert mgr.best_model_score == pytest.approx(0.5)
        assert "epoch=1" in mgr.best_model_path

    def test_worse_score_not_saved_when_full(self, tmp_path):
        mgr = CheckpointManager(tmp_path, save_top_k=1, save_last=False)
        variables = {"params": {"w": np.zeros(2)}}
        assert mgr.save(variables, 0, 0.3) is not None
        assert mgr.save(variables, 1, 0.9) is None

    def test_load_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="Checkpoint not found"):
            load_checkpoint(tmp_path / "nope")


class TestEarlyStopping:
    def test_stops_before_max_epochs(self, tiny_model_cfg, tmp_path):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.max_epochs", 30)
        cfg.set_dotted("training.early_stopping_patience", 1)
        cfg.set_dotted("training.learning_rate", 0.0)  # loss can never improve
        trainer = Trainer(cfg)
        train_w, val_w, _ = _splits(num=32)
        results = trainer.fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
        assert len(results["history"]) < 30


class TestResume:
    def test_resume_continues_from_last(self, tiny_model_cfg, tmp_path):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
            ConfigNode,
        )

        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.max_epochs", 2)
        train_w, val_w, _ = _splits(num=32)
        t1 = Trainer(cfg)
        t1.fit(train_w, val_w, save_dir=tmp_path, log_fn=None)

        cfg2 = ConfigNode(cfg.to_container(resolve=False))
        cfg2.set_dotted("training.max_epochs", 4)
        t2 = Trainer(cfg2)
        results = t2.fit(
            train_w, val_w, save_dir=tmp_path, log_fn=None,
            resume_from=tmp_path / "checkpoints" / "last",
        )
        epochs = [h["epoch"] for h in results["history"]]
        assert epochs == [2, 3]  # continued, not restarted


class TestDeterminism:
    def test_same_seed_same_history(self, tiny_model_cfg, tmp_path):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.max_epochs", 2)
        train_w, val_w, _ = _splits(num=32)
        r1 = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path / "a", log_fn=None)
        r2 = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path / "b", log_fn=None)
        for h1, h2 in zip(r1["history"], r2["history"]):
            assert h1["train/loss"] == pytest.approx(h2["train/loss"], rel=1e-6)
            assert h1["val/loss"] == pytest.approx(h2["val/loss"], rel=1e-6)


def test_remat_flag_trains(tiny_model_cfg, tmp_path):
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.remat", True)
    cfg.set_dotted("training.max_epochs", 1)
    train_w, val_w, _ = _splits(num=32)
    results = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
    assert np.isfinite(results["history"][0]["train/loss"])


def test_prng_impl_rbg_trains(tiny_model_cfg, tmp_path):
    """training.prng_impl=rbg (cheap dropout-mask RNG, +34% measured train
    throughput on v5e) trains to finite losses; bad values raise."""
    import jax as _jax

    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.prng_impl", "rbg")
    cfg.set_dotted("training.max_epochs", 1)
    train_w, val_w, _ = _splits(num=32)
    try:
        results = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
        assert np.isfinite(results["history"][0]["train/loss"])
    finally:
        _jax.config.update("jax_default_prng_impl", "threefry2x32")

    bad = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    bad.set_dotted("training.prng_impl", "bogus")
    with pytest.raises(ValueError, match="Unknown training.prng_impl"):
        Trainer(bad)


def test_temporal_jitter_trains(tiny_model_cfg, tmp_path):
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.augmentation.temporal_jitter", 0.2)
    cfg.set_dotted("training.max_epochs", 1)
    train_w, val_w, _ = _splits(num=32)
    results = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
    assert np.isfinite(results["history"][0]["train/loss"])


def test_streaming_fit_matches_resident_losses(tiny_model_cfg, tmp_path):
    """dataset.streaming=true (double-buffered host->device batches, per-batch
    jitted step) trains to the same losses as the HBM-resident whole-epoch
    scan: same shuffle order, same per-step RNG stream."""
    train_w, val_w, _ = _splits(num=32)

    def run(streaming):
        cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
        cfg.set_dotted("training.max_epochs", 2)
        cfg.set_dotted("dataset.streaming", streaming)
        return Trainer(cfg).fit(
            train_w, val_w, save_dir=tmp_path / f"s{streaming}", log_fn=None
        )

    resident = run(False)
    streamed = run(True)
    for h_res, h_str in zip(resident["history"], streamed["history"]):
        assert h_str["train/loss"] == pytest.approx(h_res["train/loss"], rel=2e-4)
        assert h_str["val/loss"] == pytest.approx(h_res["val/loss"], rel=2e-4)


def test_streaming_fit_on_mesh(tiny_model_cfg, tmp_path):
    """Streaming + data-parallel mesh: batches land batch-sharded."""
    import jax

    n_dev = min(8, len(jax.devices()))
    train_w, val_w, _ = _splits(num=4 * n_dev)
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.max_epochs", 1)
    cfg.set_dotted("dataset.streaming", True)
    cfg.set_dotted("dataset.batch_size", 2 * n_dev)
    cfg.set_dotted("parallel", {"num_devices": n_dev})
    results = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
    assert np.isfinite(results["history"][0]["train/loss"])


def test_checkpoint_manager_adopts_existing(tmp_path):
    mgr1 = CheckpointManager(tmp_path, save_top_k=2, save_last=False)
    variables = {"params": {"w": np.ones(2)}}
    mgr1.save(variables, 0, 0.4)
    mgr1.save(variables, 1, 0.9)
    # a fresh manager over the same dir (resume) must know the history
    mgr2 = CheckpointManager(tmp_path, save_top_k=2, save_last=False)
    assert mgr2.best_model_score == pytest.approx(0.4)
    mgr2.save(variables, 2, 0.7)  # evicts the 0.9 one, keeps 0.4
    kept = {p.name for p in tmp_path.iterdir()}
    assert "epoch=0-val_loss=0.4000" in kept
    assert "epoch=2-val_loss=0.7000" in kept
    assert "epoch=1-val_loss=0.9000" not in kept


def test_gradient_accumulation_trains(tiny_model_cfg, tmp_path):
    """optax.MultiSteps path: params update every k micro-steps."""
    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.gradient_accumulation", 2)
    cfg.set_dotted("training.max_epochs", 2)
    train_w, val_w, _ = _splits(num=64)
    results = Trainer(cfg).fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
    assert np.isfinite(results["history"][-1]["train/loss"])
    # loss should still move (updates are happening)
    assert results["history"][-1]["train/loss"] != results["history"][0]["train/loss"]


def test_fresh_fit_does_not_adopt_stale_checkpoints(tmp_path):
    """A fresh (non-resume) manager over a reused dir must NOT let a previous
    run's better checkpoint win best_model_path (round-2 review)."""
    stale = CheckpointManager(tmp_path, save_top_k=2, save_last=False)
    stale.save({"params": {"w": np.ones(2)}}, 0, 0.1)  # a very good old run

    fresh = CheckpointManager(
        tmp_path, save_top_k=2, save_last=False, adopt_existing=False
    )
    assert fresh.best_model_score is None
    fresh.save({"params": {"w": np.zeros(2)}}, 0, 0.8)
    assert fresh.best_model_score == pytest.approx(0.8)


def test_best_model_epoch_parses_checkpoint_name(tmp_path):
    mgr = CheckpointManager(tmp_path, save_top_k=3, save_last=False)
    variables = {"params": {"w": np.ones(2)}}
    mgr.save(variables, 0, 0.9)
    mgr.save(variables, 4, 0.2)
    mgr.save(variables, 7, 0.5)
    assert mgr.best_model_epoch == 4


def test_early_stopping_patience_is_lightning_semantics(
    tiny_model_cfg, tmp_path
):
    """stop once the non-improving count REACHES patience (wait >= patience),
    i.e. patience=1 + lr=0 trains exactly 2 epochs (round-2 review)."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    cfg = ConfigNode(tiny_model_cfg.to_container(resolve=False))
    cfg.set_dotted("training.max_epochs", 30)
    cfg.set_dotted("training.early_stopping_patience", 1)
    cfg.set_dotted("training.learning_rate", 0.0)
    trainer = Trainer(cfg)
    train_w, val_w, _ = _splits(num=32)
    results = trainer.fit(train_w, val_w, save_dir=tmp_path, log_fn=None)
    assert len(results["history"]) == 2
