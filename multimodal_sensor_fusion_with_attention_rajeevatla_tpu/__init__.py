"""TPU-native multimodal sensor fusion framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
``Rutgers-ECE-MML4SS/multimodal-sensor-fusion-with-attention-RajeevAtla``:
attention-based multimodal sensor fusion for heterogeneous sensor streams
(PAMAP2 human-activity recognition as the flagship task, with MHAD and
MPI-Cooking configurations), rebuilt TPU-first:

- the full windowed dataset lives in device HBM; training batches are
  device-side gathers inside ``jit`` (no per-step host transfer),
- encoders/fusion are pure flax modules compiled once with ``jax.jit``,
- all M(M-1) cross-modal attention pairs run as one stacked batched matmul
  (and a fused Pallas kernel on TPU) instead of M(M-1) module calls,
- scale-out is data parallelism over a ``jax.sharding.Mesh`` (ICI
  collectives via ``psum``), not a process-level DDP port.

Short import alias: ``import msfa_tpu`` (see ``msfa_tpu.py`` at repo root).
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
