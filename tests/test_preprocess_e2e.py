"""Raw PAMAP2 ETL end-to-end: .dat files -> merge_raw_files -> dataset loads.

Regression: manifests written by the raw ETL must resolve from the output
root it wrote them under (a hard-coded ``data/`` prefix only resolved when
the output root was literally named ``data``).
"""

import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
    MultimodalDataset,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.preprocess import (
    PAMAP2_COLUMNS,
    merge_raw_files,
)

N_COLS = len(PAMAP2_COLUMNS)


def _write_subject(path, subject_seed, activities=(1, 2, 3), rows_per=120):
    rng = np.random.default_rng(subject_seed)
    lines = []
    t = 0.0
    for act in activities:
        for _ in range(rows_per):
            row = rng.standard_normal(N_COLS).astype(np.float32)
            row[0] = t
            row[1] = act
            row[2] = 60 + 40 * rng.random()  # heart rate
            t += 0.01
            lines.append(" ".join(f"{v:.5f}" for v in row))
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.slow
def test_raw_etl_to_dataset_roundtrip(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_subject(raw / "subject101.dat", 0)
    _write_subject(raw / "subject102.dat", 1)

    out_root = tmp_path / "pamap2"  # NOT named "data"
    merge_raw_files(raw, out_root, write_csv=False)

    for split in ("train", "val", "test"):
        assert (out_root / "splits" / f"{split}.txt").exists()

    ds = MultimodalDataset(
        out_root,
        ["imu_hand", "heart_rate"],
        "train",
        chunk_size=32,
    )
    w = ds.windows
    assert w.num_windows > 0
    assert w.features["imu_hand"].shape[1:] == (32, 17)
    assert w.features["heart_rate"].shape[1:] == (32, 1)
    assert np.all(np.isfinite(w.features["imu_hand"]))
    # activity ids used as labels survive the pipeline
    assert set(np.unique(w.labels)).issubset({1, 2, 3})
