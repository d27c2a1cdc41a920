"""Test harness: force an 8-device CPU mesh (no TPU needed for unit tests).

The reference tests run single-process CPU pytest (SURVEY §4); here the same
suite additionally exercises multi-device sharding on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``, the JAX analogue of
"multi-node without a real cluster".
"""

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU backend and
# overrides jax_platforms; undo that so tests run hermetically on host CPU.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)


@pytest.fixture(scope="session")
def tiny_model_cfg(tmp_path_factory):
    """A small full config tree usable by Trainer/eval tests."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        ConfigNode,
    )

    tmp = tmp_path_factory.mktemp("runs")
    return ConfigNode(
        {
            "dataset": {
                "name": "synthetic",
                "data_dir": str(tmp / "data"),
                "modalities": ["sensor1", "sensor2"],
                "num_classes": 5,
                "num_samples": 64,
                "sequence_length": 12,
                "modality_dim": 8,
                "batch_size": 16,
            },
            "model": {
                "fusion_type": "hybrid",
                "hidden_dim": 32,
                "output_dim": 16,
                "num_heads": 4,
                "dropout": 0.1,
                "layer_norm": True,
                "encoders": {
                    "sensor1": {"type": "sequence", "encoder_type": "cnn", "num_layers": 1},
                    "sensor2": {"type": "sequence", "encoder_type": "lstm", "num_layers": 1},
                },
            },
            "training": {
                "max_epochs": 2,
                "learning_rate": 1e-3,
                "weight_decay": 1e-4,
                "optimizer": "adamw",
                "scheduler": "cosine",
                "gradient_clip_norm": 1.0,
                "gradient_accumulation": 1,
                "early_stopping_patience": 10,
                "label_smoothing": 0.05,
                "augmentation": {"modality_dropout": 0.1},
            },
            "evaluation": {"num_calibration_bins": 15, "uncertainty_analysis": True},
            "uncertainty": {"method": "dropout", "num_mc_samples": 4,
                            "temperature_scaling": True},
            "experiment": {"name": "test_exp", "save_dir": str(tmp), "save_top_k": 2},
            "seed": 42,
        }
    )
