"""Short import alias: ``import msfa_tpu`` == the full framework package.

The canonical package name mirrors the upstream repo
(``multimodal_sensor_fusion_with_attention_rajeevatla_tpu``); this shim
registers it (and its subpackages) under the ergonomic alias ``msfa_tpu``.
"""

import importlib
import sys

_pkg = importlib.import_module(
    "multimodal_sensor_fusion_with_attention_rajeevatla_tpu"
)
sys.modules[__name__] = _pkg
for _sub in ("models", "ops", "data", "train", "parallel", "utils"):
    sys.modules[f"{__name__}.{_sub}"] = importlib.import_module(
        f"multimodal_sensor_fusion_with_attention_rajeevatla_tpu.{_sub}"
    )
