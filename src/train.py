#!/usr/bin/env python
"""Training CLI — thin wrapper over the TPU-native framework.

Usage matches the reference (Hydra-style dotted overrides):
    python src/train.py model.fusion_type=early dataset.chunk_size=1024
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
