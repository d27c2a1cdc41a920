"""Cheap deterministic dropout-mask generation (packed threefry bits).

Dropout-mask RNG is a first-order training cost on TPU: the transformer
flagship draws ~100M Bernoulli samples per step, and ``jax.random.bernoulli``
burns one full threefry-2x32 word (dozens of VPU ALU ops) per sample —
measured at ~30% of the whole train step (docs/notes.md "Measured
performance findings"). ``jax.random.bits(..., uint8)`` does NOT help: JAX
still generates one u32 word per uint8 (verified against the compiled HLO).

``bernoulli_packed`` instead draws ``ceil(n/4)`` threefry words and slices
each into four independent 8-bit lanes, comparing against an 8-bit
threshold: 4x fewer threefry invocations for a few extra shift/mask VPU ops.

Properties:
- deterministic and backend-independent (pure threefry; the guaranteed-
  stable JAX PRNG), unlike ``jax.default_prng_impl = rbg`` which is only
  stable within a backend — so it is safe as a DEFAULT, not an opt-in.
- keep-probability quantised to 1/256: ``round(p * 256) / 256`` (e.g.
  dropout 0.1 realises as 0.1016). Dropout rates are hyperparameters, not
  contracts; the realised rate is documented and pinned by tests.
- independence across lanes comes from threefry's per-bit uniformity (each
  output bit of a counter-based PRNG word is an independent fair coin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def bernoulli_packed(key: jax.Array, keep_prob, shape) -> jax.Array:
    """Bernoulli(keep) mask of ``shape`` from packed threefry bytes.

    Returns a ``bool`` array; ``keep_prob`` is realised at 1/256 resolution.
    ``keep_prob`` must be a static Python float (it parameterises the
    threshold constant, mirroring ``nn.Dropout``'s static rate).
    """
    keep_prob = float(keep_prob)
    if not 0.0 <= keep_prob <= 1.0:
        raise ValueError(f"keep_prob must be in [0, 1], got {keep_prob}")
    n = 1
    for d in shape:
        n *= int(d)
    thresh = int(round(keep_prob * 256.0))
    if n == 0 or thresh >= 256:
        return jnp.ones(shape, bool)
    if thresh <= 0:
        return jnp.zeros(shape, bool)
    words = (n + 3) // 4
    bits32 = jax.random.bits(key, (words,), jnp.uint32)
    # [words, 4] int32 bytes; stack order fixes the lane layout permanently
    # (changing it would silently change every seeded training history)
    lanes = jnp.stack(
        [
            (bits32 >> jnp.uint32(shift)).astype(jnp.int32) & 0xFF
            for shift in (0, 8, 16, 24)
        ],
        axis=-1,
    )
    flat = lanes.reshape(-1)[:n]
    return (flat < thresh).reshape(shape)


def realized_keep_prob(keep_prob: float) -> float:
    """The keep probability ``bernoulli_packed`` actually realises.

    The dropout SCALING must use this value, not the nominal one, for the
    estimator to stay unbiased: ``E[mask / realized_keep] == 1``.
    """
    keep_prob = float(keep_prob)
    thresh = int(round(keep_prob * 256.0))
    if thresh >= 256:
        return 1.0
    if thresh <= 0:
        return 0.0
    return thresh / 256.0


class PackedDropout(nn.Module):
    """``nn.Dropout`` drop-in backed by :func:`bernoulli_packed`.

    Same call contract (``deterministic`` gates the draw; rng stream
    ``'dropout'``), but the mask costs 4x fewer threefry words and the
    rescale uses the realised (1/256-quantised) keep probability so the
    estimator stays unbiased.
    """

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate <= 0.0:
            return x
        keep = realized_keep_prob(1.0 - self.rate)
        if keep == 0.0:
            return jnp.zeros_like(x)
        mask = bernoulli_packed(
            self.make_rng("dropout"), 1.0 - self.rate, x.shape
        )
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype), 0.0)
