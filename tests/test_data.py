"""Data layer: manifest parsing contracts, windowing, dropout, synthetic."""

import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
    BatchLoader,
    MultimodalDataset,
    SyntheticMultimodalDataset,
    collate_multimodal,
    create_dataloaders,
    resolve_modality_columns,
    simulate_missing_modalities,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.preprocess import (
    PAMAP2_COLUMNS,
    interpolate_heart_rate,
    stratified_split,
    write_shard,
)

COLUMNS = list(PAMAP2_COLUMNS)


def _make_shard(path, rows=64, activity=3, inject_nan=False, varying_label=False):
    data = np.random.default_rng(0).standard_normal((rows, 54)).astype(np.float32)
    data[:, 1] = activity
    if varying_label:
        data[rows // 2 :, 1] = activity + 1
    if inject_nan:
        data[2, 5] = np.nan
        data[3, 6] = np.inf
    write_shard(path, data, COLUMNS)
    return data


@pytest.fixture
def manifest_dir(tmp_path):
    root = tmp_path / "data"
    shard_dir = root / "processed_tensors" / "subject_1"
    shard_dir.mkdir(parents=True)
    _make_shard(shard_dir / "activity_3.npz", rows=64, activity=3, inject_nan=True)
    _make_shard(shard_dir / "activity_5.npz", rows=40, activity=5)
    splits = root / "splits"
    splits.mkdir()
    for split in ("train", "val", "test"):
        (splits / f"{split}.txt").write_text(
            "processed_tensors/subject_1/activity_3.npz,64\n"
            "processed_tensors/subject_1/activity_5.npz,40\n"
        )
    return root


MODALITIES = ["imu_hand", "imu_chest", "imu_ankle", "heart_rate"]


class TestModalityResolution:
    def test_pamap2_modalities(self):
        mapping = resolve_modality_columns(COLUMNS, MODALITIES)
        assert mapping["heart_rate"] == ["heart_rate_bpm"]
        assert len(mapping["imu_hand"]) == 17
        assert all(c.startswith("hand_") for c in mapping["imu_hand"])
        assert len(mapping["imu_chest"]) == 17
        assert len(mapping["imu_ankle"]) == 17

    def test_suffix_form(self):
        mapping = resolve_modality_columns(COLUMNS, ["hand_imu", "hr"])
        assert len(mapping["hand_imu"]) == 17
        assert mapping["hr"] == ["heart_rate_bpm"]

    def test_unresolvable_modality(self):
        with pytest.raises(ValueError, match="Could not resolve modality 'lidar'"):
            resolve_modality_columns(COLUMNS, ["lidar"])


class TestManifestDataset:
    def test_windowing_and_shapes(self, manifest_dir):
        ds = MultimodalDataset(manifest_dir, MODALITIES, "train", chunk_size=32)
        w = ds.windows
        # 64 rows -> 2 windows; 40 rows -> 2 windows (32 + 8 padded)
        assert w.num_windows == 4
        assert w.features["imu_hand"].shape == (4, 32, 17)
        assert w.features["heart_rate"].shape == (4, 32, 1)
        assert w.lengths.tolist() == [32, 32, 32, 8]
        assert w.labels.tolist() == [3, 3, 5, 5]

    def test_nan_scrubbed(self, manifest_dir):
        ds = MultimodalDataset(manifest_dir, MODALITIES, "train", chunk_size=32)
        for m in MODALITIES:
            assert np.isfinite(ds.windows.features[m]).all()

    def test_malformed_manifest(self, manifest_dir):
        (manifest_dir / "splits" / "train.txt").write_text("no-comma-line\n")
        with pytest.raises(ValueError, match="Malformed manifest entry"):
            MultimodalDataset(manifest_dir, MODALITIES, "train")

    def test_empty_manifest(self, manifest_dir):
        (manifest_dir / "splits" / "train.txt").write_text("\n")
        with pytest.raises(ValueError, match="No shards found in manifest"):
            MultimodalDataset(manifest_dir, MODALITIES, "train")

    def test_zero_row_entries_skipped_then_empty(self, manifest_dir):
        (manifest_dir / "splits" / "train.txt").write_text(
            "processed_tensors/subject_1/activity_3.npz,0\n"
        )
        with pytest.raises(ValueError, match="No shards found in manifest"):
            MultimodalDataset(manifest_dir, MODALITIES, "train")

    def test_missing_shard(self, manifest_dir):
        (manifest_dir / "splits" / "train.txt").write_text("missing/shard.npz,10\n")
        with pytest.raises(FileNotFoundError, match="Shard referenced in manifest not found"):
            MultimodalDataset(manifest_dir, MODALITIES, "train")

    def test_varying_label_raises(self, manifest_dir):
        shard = manifest_dir / "processed_tensors" / "subject_1" / "activity_3.npz"
        _make_shard(shard, rows=64, activity=3, varying_label=True)
        with pytest.raises(ValueError, match="Activity id varies within shard chunk."):
            MultimodalDataset(manifest_dir, MODALITIES, "train", chunk_size=64)

    def test_chunk_cache_roundtrip(self, manifest_dir, tmp_path):
        cache = tmp_path / "cache"
        ds1 = MultimodalDataset(
            manifest_dir, MODALITIES, "train", chunk_size=32, chunk_cache_dir=cache
        )
        assert any(cache.iterdir())
        ds2 = MultimodalDataset(
            manifest_dir, MODALITIES, "train", chunk_size=32, chunk_cache_dir=cache
        )
        assert ds2.windows.num_windows == ds1.windows.num_windows
        assert np.array_equal(ds1.windows.labels, ds2.windows.labels)

    def test_getitem(self, manifest_dir):
        ds = MultimodalDataset(manifest_dir, MODALITIES, "train", chunk_size=32)
        features, label, mask = ds[0]
        assert features["imu_hand"].shape == (32, 17)
        assert label == 3
        assert mask.tolist() == [1, 1, 1, 1]


class TestNumpySplit:
    def _write_split(self, root, split, n=20, seq=8, dim=4):
        d = root / split
        d.mkdir(parents=True)
        np.save(d / "mod1.npy", np.random.randn(n, seq, dim).astype(np.float32))
        np.save(d / "labels.npy", np.random.randint(0, 3, n))

    def test_loads(self, tmp_path):
        self._write_split(tmp_path, "train")
        ds = MultimodalDataset(tmp_path, ["mod1"], "train")
        assert ds.windows.features["mod1"].shape == (20, 8, 4)
        assert not ds.use_manifest

    def test_missing_modality_file(self, tmp_path):
        self._write_split(tmp_path, "train")
        with pytest.raises(FileNotFoundError, match="Modality file not found"):
            MultimodalDataset(tmp_path, ["nonexistent"], "train")

    def test_missing_labels(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        np.save(d / "mod1.npy", np.zeros((4, 2, 2), np.float32))
        with pytest.raises(FileNotFoundError, match="Labels file not found"):
            MultimodalDataset(tmp_path, ["mod1"], "train")


class TestSynthetic:
    def test_split_seeds_differ(self):
        a = SyntheticMultimodalDataset(num_samples=10, split="train")
        b = SyntheticMultimodalDataset(num_samples=10, split="val")
        c = SyntheticMultimodalDataset(num_samples=10, split="train")
        assert not np.array_equal(a.windows.features["sensor1"], b.windows.features["sensor1"])
        assert np.array_equal(a.windows.features["sensor1"], c.windows.features["sensor1"])

    def test_shapes(self):
        ds = SyntheticMultimodalDataset(
            num_samples=6, modality_dims={"a": 3, "b": 5}, sequence_length=7
        )
        assert ds.windows.features["a"].shape == (6, 7, 3)
        assert ds.windows.features["b"].shape == (6, 7, 5)
        features, label, mask = ds[0]
        assert features["a"].shape == (7, 3)
        assert 0 <= label < 5


class TestLoaders:
    def test_batching_pads_final_batch(self):
        ds = SyntheticMultimodalDataset(num_samples=10, sequence_length=4)
        loader = BatchLoader(ds.windows, batch_size=4)
        batches = list(loader)
        assert len(batches) == 3
        f, l, m, ln, w = batches[-1]
        assert f["sensor1"].shape == (4, 4, 32)
        assert w.tolist() == [1.0, 1.0, 0.0, 0.0]

    def test_shuffle_changes_with_epoch(self):
        ds = SyntheticMultimodalDataset(num_samples=32, sequence_length=2)
        loader = BatchLoader(ds.windows, batch_size=32, shuffle=True, seed=1)
        loader.set_epoch(0)
        idx0, _ = next(loader.batch_indices())
        loader.set_epoch(1)
        idx1, _ = next(loader.batch_indices())
        assert not np.array_equal(idx0, idx1)
        assert sorted(idx0.tolist()) == sorted(idx1.tolist())

    def test_modality_dropout_never_all_zero(self):
        ds = SyntheticMultimodalDataset(num_samples=64, sequence_length=2)
        loader = BatchLoader(ds.windows, batch_size=64, modality_dropout=0.95, seed=3)
        _, _, mask, _, _ = next(iter(loader))
        assert (mask.sum(axis=1) > 0).all()

    def test_create_dataloaders_synthetic(self):
        tr, va, te = create_dataloaders(
            "synthetic", "", ["s1", "s2"], batch_size=8, num_samples=40,
            sequence_length=4, num_workers=4, pin_memory=True,
        )
        f, l, m, ln, w = next(iter(tr))
        assert f["s1"].shape == (8, 4, 32)
        assert m.shape == (8, 2)


def test_collate_multimodal():
    samples = [
        ({"a": np.ones((4, 2)), "b": np.zeros(3)}, 1, np.ones(2)) for _ in range(5)
    ]
    feats, labels, masks = collate_multimodal(samples)
    assert feats["a"].shape == (5, 4, 2)
    assert feats["b"].shape == (5, 3)
    assert labels.shape == (5,)
    assert masks.shape == (5, 2)


def test_simulate_missing_modalities():
    features = {"a": np.ones((2, 3)), "b": np.ones((2, 3))}
    mask = np.ones(2)
    out, new_mask = simulate_missing_modalities(features, mask, missing_pattern=[1])
    assert new_mask.tolist() == [0, 1]
    assert (out["a"] == 0).all()
    assert (out["b"] == 1).all()


def test_interpolate_heart_rate():
    data = np.zeros((10, 54), np.float32)
    data[:, 2] = np.nan
    data[3, 2] = 60.0
    data[7, 2] = 80.0
    out = interpolate_heart_rate(data)
    assert np.isfinite(out[:, 2]).all()
    assert out[0, 2] == 60.0  # backward fill of leading NaNs


def test_stratified_split_covers_activities():
    shards = []
    for activity in (1, 2, 3):
        for i in range(8):
            shards.append((f"s{activity}_{i}", 100 + 10 * i, activity))
    assignments = stratified_split(shards)
    for split in ("train", "val", "test"):
        acts = {int(rel.split("_")[0][1:]) for rel, _ in assignments[split]}
        assert acts == {1, 2, 3}
    total_train = sum(r for _, r in assignments["train"])
    total = sum(r for _, r, _ in shards)
    assert 0.55 < total_train / total < 0.85


def test_streaming_device_loader_yields_all_batches():
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        BatchLoader,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.device import (
        StreamingDeviceLoader,
    )

    ds = SyntheticMultimodalDataset(num_samples=10, sequence_length=4)
    loader = BatchLoader(ds.windows, batch_size=4)
    streaming = StreamingDeviceLoader(loader)
    batches = list(streaming)
    assert len(batches) == len(loader) == 3
    f, l, m, ln, w = batches[-1]
    assert f["sensor1"].shape == (4, 4, 32)
    assert w.tolist() == [1.0, 1.0, 0.0, 0.0]
    # device arrays, not numpy
    import jax

    assert isinstance(l, jax.Array)


class TestPaddedIndexMatrix:
    """Shared [S, B] batch-plan contract (round-2 review: was 3 copies)."""

    def test_wraparound_padding_and_weights(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            padded_index_matrix,
        )

        idx, w = padded_index_matrix(10, 4)
        assert idx.shape == (3, 4) and w.shape == (3, 4)
        # real slots in order, tail wraps around the epoch order (NOT all
        # window 0 — BatchNorm running stats must not see one window 3x)
        np.testing.assert_array_equal(idx.ravel()[:10], np.arange(10))
        np.testing.assert_array_equal(idx.ravel()[10:], [0, 1])
        np.testing.assert_array_equal(w.ravel(), [1] * 10 + [0, 0])

    def test_shuffle_is_a_seeded_permutation(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            padded_index_matrix,
        )

        idx1, w1 = padded_index_matrix(8, 4, shuffle=True, seed=3)
        idx2, _ = padded_index_matrix(8, 4, shuffle=True, seed=3)
        np.testing.assert_array_equal(idx1, idx2)
        assert sorted(idx1.ravel()) == list(range(8))
        np.testing.assert_array_equal(w1, np.ones((2, 4), np.float32))

    def test_batch_larger_than_split_wraps_cyclically(self):
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
            padded_index_matrix,
        )

        idx, w = padded_index_matrix(3, 8)
        assert idx.shape == (1, 8)
        np.testing.assert_array_equal(idx.ravel(), [0, 1, 2, 0, 1, 2, 0, 1])
        np.testing.assert_array_equal(w.ravel()[:3], [1, 1, 1])
        assert w.ravel()[3:].sum() == 0
