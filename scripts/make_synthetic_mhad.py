#!/usr/bin/env python
"""Generate a synthetic MHAD-layout dataset (video features + IMU at mixed rates).

MHAD pairs 30 fps video features with 50 Hz IMU (reference
``config/datasets.yaml:4-22``). Real MHAD isn't redistributable, so this
writes the same on-disk layout (``<split>/<modality>.npy`` + ``labels.npy``)
with class-conditional synthetic signals, so the full train/eval CLI runs the
mixed-rate FrameEncoder + SequenceEncoder path end to end:

    python scripts/make_synthetic_mhad.py --out data/mhad
    python src/train.py --config-name base dataset.name=mhad dataset.data_dir=data/mhad \
        'dataset.modalities=[video,imu]' dataset.num_classes=11 dataset.normalize=false
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def make_split(
    out_dir: Path,
    num_samples: int,
    num_classes: int = 11,
    video_len: int = 30,
    imu_len: int = 50,
    video_dim: int = 64,
    imu_dim: int = 12,
    seed: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples).astype(np.int64)
    # class prototypes come from a FIXED seed so train/val/test share the
    # same class-conditional distribution (only the noise differs per split)
    video_proto = np.random.default_rng(12345).standard_normal(
        (num_classes, video_dim)
    ).astype(np.float32)
    imu_freq = (1 + labels[:, None]).astype(np.float32)  # class-dependent frequency
    t = np.linspace(0, 2 * np.pi, imu_len, dtype=np.float32)[None, :, None]

    video = (
        video_proto[labels][:, None, :]
        + 0.5 * rng.standard_normal((num_samples, video_len, video_dim)).astype(np.float32)
    )
    imu = np.sin(imu_freq[:, :, None] * t) + 0.3 * rng.standard_normal(
        (num_samples, imu_len, imu_dim)
    ).astype(np.float32)

    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "video.npy", video.astype(np.float32))
    np.save(out_dir / "imu.npy", imu.astype(np.float32))
    np.save(out_dir / "labels.npy", labels)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="data/mhad")
    parser.add_argument("--train", type=int, default=400)
    parser.add_argument("--eval", type=int, default=80)
    parser.add_argument("--num-classes", type=int, default=11)
    args = parser.parse_args(argv)
    root = Path(args.out)
    make_split(root / "train", args.train, args.num_classes, seed=0)
    make_split(root / "val", args.eval, args.num_classes, seed=1)
    make_split(root / "test", args.eval, args.num_classes, seed=2)
    print(f"synthetic MHAD written to {root}")


if __name__ == "__main__":
    main()
