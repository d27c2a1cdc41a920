#!/usr/bin/env python
"""PAMAP2 preprocessing CLI — thin wrapper over the TPU-native ETL.

Usage matches the reference:
    python data/preprocess.py --raw-dir data/raw --output data
Plus:
    python data/preprocess.py --import-reference /path/to/reference/data --output data/pamap2
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.preprocess import main

if __name__ == "__main__":
    main()
