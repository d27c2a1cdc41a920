"""Module demo entry points run clean (reference-style __main__ coverage)."""

import runpy

import pytest

PKG = "multimodal_sensor_fusion_with_attention_rajeevatla_tpu"


@pytest.mark.parametrize(
    "module,expect",
    [
        (f"{PKG}.models.encoders", "Encoders OK"),
        (f"{PKG}.models.attention", "Attention OK"),
        (f"{PKG}.models.fusion", "Fusion OK"),
    ],
)
def test_module_demo_runs(module, expect, capsys):
    runpy.run_module(module, run_name="__main__")
    assert expect in capsys.readouterr().out
