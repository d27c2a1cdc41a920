#!/usr/bin/env python
"""Generate a synthetic MPI-Cooking-layout dataset (video + audio features).

MPI Cooking 2 pairs 30 fps video features with audio features (reference
``config/datasets.yaml:21-38``: video input_dim 1024, FrameEncoder with
attention pooling; audio input_dim 128, CNN SequenceEncoder). The real
dataset isn't redistributable, so this writes the same on-disk layout
(``<split>/<modality>.npy`` + ``labels.npy``) with class-conditional
synthetic signals, exercising the video+audio FrameEncoder + CNN
SequenceEncoder path end to end:

    python scripts/make_synthetic_cooking.py --out data/cooking
    python src/train.py --config-name base dataset.name=cooking \
        dataset.data_dir=data/cooking 'dataset.modalities=[video,audio]' \
        dataset.num_classes=13 dataset.normalize=false
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def make_split(
    out_dir: Path,
    num_samples: int,
    num_classes: int = 13,
    video_len: int = 30,
    audio_len: int = 100,
    video_dim: int = 64,
    audio_dim: int = 32,
    seed: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples).astype(np.int64)
    # class prototypes come from FIXED seeds so train/val/test share the
    # same class-conditional distribution (only the noise differs per split)
    video_proto = np.random.default_rng(54321).standard_normal(
        (num_classes, video_dim)
    ).astype(np.float32)
    # audio: class-dependent spectral envelope over the feature (mel) axis,
    # amplitude-modulated over time — shaped like log-mel frames
    mel_axis = np.linspace(0, 1, audio_dim, dtype=np.float32)[None, None, :]
    centers = ((labels % num_classes) + 0.5) / num_classes  # class-dep peak
    envelope = np.exp(-((mel_axis - centers[:, None, None]) ** 2) / 0.02)
    t = np.linspace(0, 2 * np.pi, audio_len, dtype=np.float32)[None, :, None]
    am = 1.0 + 0.5 * np.sin((1 + labels[:, None, None] % 5).astype(np.float32) * t)

    video = (
        video_proto[labels][:, None, :]
        + 0.5 * rng.standard_normal((num_samples, video_len, video_dim)).astype(np.float32)
    )
    audio = envelope * am + 0.3 * rng.standard_normal(
        (num_samples, audio_len, audio_dim)
    ).astype(np.float32)

    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "video.npy", video.astype(np.float32))
    np.save(out_dir / "audio.npy", audio.astype(np.float32))
    np.save(out_dir / "labels.npy", labels)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="data/cooking")
    parser.add_argument("--train", type=int, default=400)
    parser.add_argument("--eval", type=int, default=80)
    parser.add_argument("--num-classes", type=int, default=13)
    args = parser.parse_args(argv)
    root = Path(args.out)
    make_split(root / "train", args.train, args.num_classes, seed=0)
    make_split(root / "val", args.eval, args.num_classes, seed=1)
    make_split(root / "test", args.eval, args.num_classes, seed=2)
    print(f"synthetic MPI-Cooking written to {root}")


if __name__ == "__main__":
    main()
