#!/usr/bin/env python
"""Evaluation CLI — thin wrapper over the TPU-native framework.

Usage matches the reference:
    python src/eval.py --checkpoint <dir> [--missing_modality_test]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main()
