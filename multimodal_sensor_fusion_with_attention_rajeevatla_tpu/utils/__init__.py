"""Utility layer: config tree, seeding, profiling, logging."""

from .config import ConfigNode, load_config, parse_overrides, to_container  # noqa: F401
