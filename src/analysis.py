#!/usr/bin/env python
"""Analysis/plots CLI — thin wrapper over the TPU-native framework.

Usage matches the reference:
    python src/analysis.py --experiment_dir experiments --output_dir analysis
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import analysis_main

if __name__ == "__main__":
    analysis_main()
