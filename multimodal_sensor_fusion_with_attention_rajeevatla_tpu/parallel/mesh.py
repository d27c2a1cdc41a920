"""Device mesh + sharding layout for data-parallel training.

The reference is single-process/single-device; its only scale-out is a CI job
matrix (SURVEY §2). The TPU-native scale-out story is SPMD data parallelism
over a ``jax.sharding.Mesh`` (e.g. the 8 chips of a v5e-8):

- model parameters + optimizer state: replicated,
- the device-resident dataset: replicated (it is small; each chip holds it),
- per-step batch gathers: sharded along the batch axis (``P('data')``),
- loss/metric reductions: ``psum`` inserted automatically by XLA under
  ``jit`` — collectives ride ICI, nothing crosses a process boundary.

Everything works identically on 1 device (trivial mesh) or a CPU host mesh
(``--xla_force_host_platform_device_count``) used by the unit tests and the
driver's multi-chip dry-run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    When the default backend has fewer than ``num_devices`` chips, fall back
    to the host CPU device pool (``--xla_force_host_platform_device_count``):
    the tests and the driver's multi-chip dry-run validate the SPMD program on
    a virtual CPU mesh exactly this way.
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None and num_devices > len(devices):
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= num_devices:
                devices = cpu
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices but only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def resolve_num_devices(requested) -> int:
    """Map a ``parallel.num_devices`` config value to a device count.

    ``auto`` = every visible device of the default backend; ``None``/``1``/
    falsy = single-device (no mesh).
    """
    if requested in (None, False, "", "none", "null"):
        return 1
    if isinstance(requested, str) and requested.lower() == "auto":
        return len(jax.devices())
    return int(requested)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array in a batch pytree with its batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
