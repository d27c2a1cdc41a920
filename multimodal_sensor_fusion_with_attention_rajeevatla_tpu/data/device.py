"""Device-resident data: the TPU-native replacement for DataLoader workers.

The reference hides storage latency with DataLoader worker processes and
shard caches (``src/data.py:244-261``, ``:536-589``). On TPU the entire
windowed PAMAP2 dataset is ~tens of MB — it fits in HBM outright. So the
pipeline here is: materialise windows once on the host (``dataset.py``),
``device_put`` the dense arrays ONCE, and make every training batch a
device-side ``take`` inside the jitted step. Host<->device traffic per step
is a single ``[B]`` int32 index vector.

For multi-chip data parallelism the arrays are replicated (every host/chip
holds the full split) and the *gathered batch* is sharded along its batch
axis by the step function's output sharding — collectives stay on ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .dataset import WindowedSplit


class DeviceSplit(struct.PyTreeNode):
    """A :class:`WindowedSplit` resident on device (a jit-friendly pytree)."""

    features: Dict[str, jax.Array]  # {mod: [N, T, D]}
    labels: jax.Array  # [N] int32
    lengths: jax.Array  # [N] int32
    modalities: tuple = struct.field(pytree_node=False)

    @property
    def num_windows(self) -> int:
        return int(self.labels.shape[0])

    def gather(self, idx: jax.Array):
        """Device-side batch gather — call inside ``jit``."""
        features = {m: jnp.take(self.features[m], idx, axis=0) for m in self.modalities}
        labels = jnp.take(self.labels, idx, axis=0)
        lengths = jnp.take(self.lengths, idx, axis=0)
        return features, labels, lengths


class StreamingDeviceLoader:
    """Double-buffered host->device batch streaming for HBM-exceeding data.

    The default path keeps the whole windowed split in HBM. When a dataset
    outgrows device memory, this loader pipelines instead: while the device
    computes on batch ``t``, batch ``t+1``'s ``device_put`` is already in
    flight (JAX transfers are async; we simply enqueue one batch ahead and
    never synchronise on the host copy). Yields the same
    ``(features, labels, mask, lengths, weight)`` tuples as ``BatchLoader``
    but as device arrays.
    """

    def __init__(
        self,
        loader,  # a BatchLoader (or any iterable of host batch tuples)
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.loader = loader
        self.sharding = sharding

    def __len__(self) -> int:
        return len(self.loader)

    def _put(self, batch):
        def put(x):
            # host numpy straight onto the target sharding (never allocate on
            # the default backend first — see device_put_split)
            if self.sharding is not None:
                return jax.device_put(np.asarray(x), self.sharding)
            return jnp.asarray(x)

        features, labels, mask, lengths, weight = batch
        return (
            {m: put(v) for m, v in features.items()},
            put(labels),
            put(mask),
            put(lengths),
            put(weight),
        )

    def __iter__(self):
        pending = None
        for batch in self.loader:
            ready = pending
            pending = self._put(batch)  # async: overlaps with compute on `ready`
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending


def device_put_split(
    windows: WindowedSplit,
    sharding: Optional[jax.sharding.Sharding] = None,
    dtype=jnp.float32,
) -> DeviceSplit:
    """Push a windowed split to device (optionally with an explicit sharding)."""

    def put(x, force_dtype=None):
        # NB: go straight from host numpy to the target sharding. A
        # ``jnp.asarray`` first would allocate on the DEFAULT backend — which
        # may be an entirely different (even broken) platform than the mesh
        # the caller is sharding onto (the driver's multi-chip dry-run runs
        # on a CPU mesh while the default backend is a tunneled TPU).
        arr = np.asarray(x)
        if force_dtype is not None:
            arr = arr.astype(force_dtype)
        elif np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        if sharding is not None:
            return jax.device_put(arr, sharding)
        return jnp.asarray(arr)

    return DeviceSplit(
        features={m: put(windows.features[m]) for m in windows.modalities},
        labels=put(windows.labels, force_dtype=np.int32),
        lengths=put(windows.lengths, force_dtype=np.int32),
        modalities=tuple(windows.modalities),
    )
