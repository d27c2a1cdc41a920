#!/usr/bin/env python
"""Capture a jax.profiler device trace of the training hot loop.

TPU-native replacement for the reference's wall-clock-only observability
(SURVEY §5: no profiler integration existed). Produces a TensorBoard-loadable
trace (op timeline, HBM usage, MXU utilisation):

    python scripts/profile_step.py --logdir /tmp/msfa_trace --steps 4
    tensorboard --logdir /tmp/msfa_trace
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", type=str, default="/tmp/msfa_trace")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--config", type=str, default=str(REPO_ROOT / "config" / "base.yaml"))
    args = parser.parse_args()

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
        enable_persistent_compilation_cache,
        load_config,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.profiling import (
        trace,
    )

    enable_persistent_compilation_cache()
    config = load_config(args.config)
    config.set_dotted("dataset.batch_size", args.batch)
    config.set_dotted("dataset.chunk_size", args.chunk)

    dims = {"imu_hand": 17, "imu_chest": 17, "imu_ankle": 17, "heart_rate": 1}
    windows = SyntheticMultimodalDataset(
        num_samples=args.steps * args.batch,
        num_classes=25,
        modality_dims=dims,
        sequence_length=args.chunk,
    ).windows

    trainer = Trainer(config)
    data = device_put_split(windows)
    boot = next(iter(BatchLoader(windows, args.batch)))
    state = trainer.init_state(boot, steps_per_epoch=args.steps)
    epoch_fn = trainer.make_train_epoch_fn()
    idx = jnp.asarray(
        np.arange(args.steps * args.batch).reshape(args.steps, args.batch) % len(windows),
        jnp.int32,
    )
    weight = jnp.ones((args.steps, args.batch), jnp.float32)

    print("compiling...")
    state, loss, acc = epoch_fn(state, data, idx, weight)
    print(f"warmup loss={float(loss):.4f}")

    print(f"tracing {args.steps}-step epoch into {args.logdir} ...")
    with trace(args.logdir):
        state, loss, acc = epoch_fn(state, data, idx, weight)
        _ = float(loss)  # fence inside the trace window
    print(f"done. loss={float(loss):.4f}  acc={float(acc):.4f}")
    print(f"view with: tensorboard --logdir {args.logdir}")


if __name__ == "__main__":
    main()
