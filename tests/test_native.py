"""Native ETL core: parser + windowing vs numpy oracles (skips if no build)."""

import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.native import (
    native_available,
    parse_dat,
    window_gather,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no compiler)"
)


@pytest.fixture
def dat_file(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((500, 54)).astype(np.float32)
    data[7, 3] = np.nan
    data[100, 0] = np.inf  # written as 'inf'
    lines = []
    for row in data:
        lines.append(
            " ".join("NaN" if np.isnan(v) else f"{v:.6f}" for v in row)
        )
    path = tmp_path / "subject101.dat"
    path.write_text("\n".join(lines) + "\n")
    return path, data


def test_parse_matches_numpy(dat_file):
    path, data = dat_file
    parsed = parse_dat(path, 54)
    assert parsed.shape == data.shape
    finite = np.isfinite(data)
    np.testing.assert_allclose(parsed[finite], data[finite], atol=2e-6)
    assert np.isnan(parsed[7, 3])


def test_parse_missing_file():
    assert parse_dat("/nonexistent/file.dat", 54) is None


def test_parse_short_rows_padded_with_nan(tmp_path):
    path = tmp_path / "short.dat"
    path.write_text("1.0 2.0 3.0\n4.0 5.0\n")
    parsed = parse_dat(path, 4)
    assert parsed.shape == (2, 4)
    np.testing.assert_allclose(parsed[0, :3], [1, 2, 3])
    assert np.isnan(parsed[0, 3])
    assert np.isnan(parsed[1, 2]) and np.isnan(parsed[1, 3])


def test_parse_strict_raises_on_row_width(tmp_path):
    path = tmp_path / "bad.dat"
    path.write_text("1.0 2.0 3.0\n4.0 5.0\n")
    with pytest.raises(ValueError, match="Row width mismatch"):
        parse_dat(path, 3, strict=True)


def test_window_gather_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((300, 10)).astype(np.float32)
    data[5, 2] = np.nan
    starts = [0, 50, 280]
    ends = [40, 114, 300]
    cols = [2, 4, 9]
    window = 64
    out = window_gather(data, starts, ends, window, cols)
    assert out.shape == (3, window, 3)
    for i, (s, e) in enumerate(zip(starts, ends)):
        expected = np.nan_to_num(data[s:e][:, cols], posinf=0.0, neginf=0.0)
        np.testing.assert_allclose(out[i, : e - s], expected)
        assert (out[i, e - s :] == 0).all()


def test_dataset_native_path_equals_fallback(tmp_path, monkeypatch):
    """The manifest dataset must produce identical windows with and without
    the native gather."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data import dataset as ds_mod
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.preprocess import (
        PAMAP2_COLUMNS,
        write_shard,
    )

    root = tmp_path / "data"
    shard_dir = root / "processed_tensors" / "subject_1"
    shard_dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    data = rng.standard_normal((100, 54)).astype(np.float32)
    data[:, 1] = 7
    data[3, 10] = np.nan
    write_shard(shard_dir / "activity_7.npz", data, list(PAMAP2_COLUMNS))
    (root / "splits").mkdir()
    (root / "splits" / "train.txt").write_text(
        "processed_tensors/subject_1/activity_7.npz,100\n"
    )

    mods = ["imu_hand", "heart_rate"]
    native = ds_mod.MultimodalDataset(root, mods, "train", chunk_size=32).windows
    monkeypatch.setattr(
        "multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.native._load_library",
        lambda: None,
    )
    fallback = ds_mod.MultimodalDataset(root, mods, "train", chunk_size=32).windows
    for m in mods:
        np.testing.assert_allclose(native.features[m], fallback.features[m])
    np.testing.assert_array_equal(native.labels, fallback.labels)


def test_unterminated_final_line(tmp_path):
    """A final line with no trailing newline — even a single character — is
    parsed as a row (count off-by-one regression) and parsing an
    unterminated numeric tail never scans past the mapping."""
    path = tmp_path / "tail.dat"
    path.write_text("1.0 2.0\n3.0 4.0\n5")  # last row: one char, no newline
    rows = parse_dat(path, n_cols=2)
    assert rows.shape == (3, 2)
    np.testing.assert_allclose(rows[0], [1.0, 2.0])
    np.testing.assert_allclose(rows[1], [3.0, 4.0])
    assert rows[2, 0] == 5.0 and np.isnan(rows[2, 1])
