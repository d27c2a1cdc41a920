"""Masking primitives with the reference's exact fallback semantics.

The reference relies on a specific masked-softmax contract throughout its
attention and fusion stack (reference: ``src/attention.py:120-129``,
``src/fusion.py:464-479``): masked positions get ``-inf`` scores, softmax is
taken, and a fully-masked row — which produces NaN — is scrubbed to exactly
zero via ``nan_to_num``. Tests in the reference pin these values down, so the
TPU rebuild centralises them here. Everything is branch-free and jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def nan_to_num(x: jax.Array) -> jax.Array:
    """``torch.nan_to_num(x, nan=0, posinf=0, neginf=0)`` equivalent."""
    zeros = jnp.zeros_like(x)
    x = jnp.where(jnp.isnan(x), zeros, x)
    x = jnp.where(jnp.isinf(x), zeros, x)
    return x


def masked_softmax(
    scores: jax.Array,
    mask: Optional[jax.Array] = None,
    axis: int = -1,
) -> jax.Array:
    """Softmax with all-masked rows collapsing to exactly zero.

    ``mask`` broadcasts against ``scores``; positions where ``mask == 0`` are
    excluded. A row whose keys are all masked yields all-zero weights (the
    reference's softmax(-inf) -> NaN -> nan_to_num(0) path).
    """
    out_dtype = scores.dtype
    # softmax accumulates in float32 regardless of the (possibly bf16)
    # activation dtype — a no-op for f32 inputs, a precision guard under
    # mixed_precision
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask == 0, NEG_INF, scores)
    # Max-subtracted softmax; guard the all--inf row explicitly instead of
    # relying on NaN propagation (XLA folds 'inf - inf' differently per
    # backend, so we make the zero-row contract explicit).
    row_max = jnp.max(scores, axis=axis, keepdims=True)
    safe_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    unnorm = jnp.exp(scores - safe_max)
    unnorm = jnp.where(jnp.isfinite(scores), unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    out = jnp.where(denom > 0, unnorm / jnp.where(denom > 0, denom, 1.0), 0.0)
    return out.astype(out_dtype)


def adaptive_gate_weights(
    scores: jax.Array,  # [..., M] gate scores
    mask: jax.Array,    # [..., M] {0,1} availability mask
    num_modalities: int,
    axis: int = -1,
) -> jax.Array:
    """Masked-softmax gate weights with the reference's fallback math.

    Reference ``src/fusion.py:429-479``: ``-inf``-mask -> softmax -> nan
    scrub -> re-mask -> renormalise; rows whose weights sum to zero fall back
    to mask-proportional weights, or uniform ``1/num_modalities`` when the
    mask itself is all-zero. This is THE single implementation of the
    contract — the XLA fusion head and the Pallas serving kernel both call
    it (jnp ops trace fine inside a Pallas kernel body).
    """
    mask = mask.astype(scores.dtype)
    weights = masked_softmax(scores, (mask > 0).astype(mask.dtype), axis=axis)
    weights = weights * mask
    return mask_renormalize(
        weights, mask, num_modalities, fallback="proportional", axis=axis
    )


def mask_renormalize(
    weights: jax.Array,  # [..., M] non-negative raw weights (already masked)
    mask: jax.Array,     # [..., M] {0,1} availability mask
    num_modalities: int,
    fallback: str = "proportional",
    axis: int = -1,
) -> jax.Array:
    """Renormalise masked weights with the reference's zero-row fallbacks.

    ``fallback="uniform"``: zero-sum rows get ``1/M`` everywhere (LateFusion,
    reference ``src/fusion.py:237-240``). ``fallback="proportional"``:
    zero-sum rows get mask-proportional weights, then uniform when the mask
    itself is all-zero (HybridFusion/UncertaintyFusion,
    ``src/fusion.py:464-479``). One implementation; the exact-value tests
    pin both behaviors.
    """
    sums = jnp.sum(weights, axis=axis, keepdims=True)
    if fallback == "uniform":
        fb = jnp.full_like(weights, 1.0 / num_modalities)
    else:
        mask = mask.astype(weights.dtype)
        mask_sum = jnp.sum(mask, axis=axis, keepdims=True)
        fb = jnp.where(
            mask_sum > 0,
            mask / (mask_sum + 1e-8),
            jnp.full_like(mask, 1.0 / num_modalities),
        )
    return jnp.where(sums > 0, weights / (sums + 1e-8), fb)


def masked_mean_pool(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    axis: int = 1,
    min_denom: float = 1.0,
) -> jax.Array:
    """Mean over ``axis`` restricted to positions where ``mask != 0``.

    Matches the reference transformer pooling (``src/encoders.py:196-203``):
    denominator clamped to ``min_denom`` so empty masks divide by 1, not 0.
    """
    if mask is None:
        return jnp.mean(x, axis=axis)
    mask = jnp.expand_dims(mask.astype(x.dtype), -1)
    total = jnp.sum(x * mask, axis=axis)
    denom = jnp.clip(jnp.sum(mask, axis=axis), min_denom, None)
    return total / denom


def lengths_to_mask(lengths: jax.Array, seq_len: int) -> jax.Array:
    """``[B]`` int lengths -> ``[B, T]`` float {0,1} validity mask."""
    positions = jnp.arange(seq_len)[None, :]
    return (positions < lengths[:, None]).astype(jnp.float32)
