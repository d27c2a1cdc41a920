"""Fusion heads: Early / Late / Hybrid (flax.linen).

Capability parity with the reference's fusion stack (``src/fusion.py``):

- ``EarlyFusion`` — mask-multiply, concat, 3-layer MLP (``:17-123``), with the
  same error strings ("No modalities configured...", "Missing features...",
  "Expected 2D tensor...").
- ``LateFusion`` — per-modality classifiers + learned softmax weights with the
  masked renormalisation / uniform fallback (``:126-245``); returns
  ``(fused_logits, per_modality_logits)``.
- ``HybridFusion`` — per-modality projections, all-pairs cross-modal attention
  (run as one stacked einsum, see ``StackedPairAttention``), mean-aggregation,
  adaptive gated weighting with the exact masked-softmax fallback math of
  ``compute_adaptive_weights`` (``:429-479``), and a 2-layer classifier.

All fallback arithmetic (uniform weights when everything is masked,
mask-proportional renormalisation, ``+1e-8`` epsilons) matches the reference
bit-for-bit in structure because the reference's tests assert exact values.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import adaptive_gate_weights, mask_renormalize, masked_softmax
from .attention import StackedPairAttention, ordered_pairs


def _default_mask(batch: int, num_modalities: int, dtype) -> jax.Array:
    return jnp.ones((batch, num_modalities), dtype=dtype)


class EarlyFusion(nn.Module):
    """Concatenate masked modality features, classify jointly."""

    modality_names: Sequence[str]
    hidden_dim: int = 256
    num_classes: int = 11
    dropout: float = 0.1
    dtype: Optional[Any] = None  # bf16 under mixed_precision (params stay f32)

    @nn.compact
    def __call__(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        names = list(self.modality_names)
        if not names:
            raise ValueError("No modalities configured for EarlyFusion.")
        first = names[0]
        if first not in modality_features:
            raise KeyError(
                f"Missing features for modality '{first}' in EarlyFusion forward pass."
            )
        batch = modality_features[first].shape[0]
        dtype = modality_features[first].dtype
        if modality_mask is None:
            modality_mask = _default_mask(batch, len(names), dtype)
        modality_mask = modality_mask.astype(dtype)

        fused_inputs = []
        for idx, name in enumerate(names):
            if name not in modality_features:
                raise KeyError(
                    f"Missing features for modality '{name}' in EarlyFusion forward pass."
                )
            features = modality_features[name]
            if features.ndim != 2:
                raise ValueError(
                    f"Expected 2D tensor for modality '{name}', got shape {features.shape}."
                )
            fused_inputs.append(features * modality_mask[:, idx : idx + 1])

        x = jnp.concatenate(fused_inputs, axis=1)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        x = drop(nn.relu(nn.Dense(self.hidden_dim, name="fc0", dtype=self.dtype)(x)))
        x = drop(nn.relu(nn.Dense(self.hidden_dim, name="fc1", dtype=self.dtype)(x)))
        return nn.Dense(self.num_classes, name="head", dtype=self.dtype)(x)


class LateFusion(nn.Module):
    """Per-modality classifiers combined with learned masked softmax weights."""

    modality_names: Sequence[str]
    hidden_dim: int = 256
    num_classes: int = 11
    dropout: float = 0.1
    dtype: Optional[Any] = None  # bf16 under mixed_precision (params stay f32)

    @nn.compact
    def __call__(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        names = list(self.modality_names)
        if not names:
            raise ValueError("No modalities configured for LateFusion.")
        num_mod = len(names)
        first = names[0]
        if first not in modality_features:
            raise KeyError(
                f"Missing features for modality '{first}' in LateFusion forward pass."
            )
        batch = modality_features[first].shape[0]
        dtype = modality_features[first].dtype
        if modality_mask is None:
            modality_mask = _default_mask(batch, num_mod, dtype)
        modality_mask = modality_mask.astype(dtype)

        drop = nn.Dropout(self.dropout, deterministic=not train)
        per_modality_logits: Dict[str, jax.Array] = {}
        stack = []
        for idx, name in enumerate(names):
            if name not in modality_features:
                raise KeyError(
                    f"Missing features for modality '{name}' in LateFusion forward pass."
                )
            masked = modality_features[name] * modality_mask[:, idx : idx + 1]
            h = nn.relu(
                nn.Dense(self.hidden_dim, name=f"cls_{name}_fc", dtype=self.dtype)(
                    drop(masked)
                )
            )
            logits = nn.Dense(
                self.num_classes, name=f"cls_{name}_head", dtype=self.dtype
            )(drop(h))
            per_modality_logits[name] = logits
            stack.append(logits)

        stacked_logits = jnp.stack(stack, axis=1)  # (B, M, C)
        weight_logits = self.param("weight_logits", nn.initializers.zeros, (num_mod,))
        base_weights = jax.nn.softmax(weight_logits)
        weights = base_weights[None, :] * modality_mask
        normalized = mask_renormalize(
            weights, modality_mask, num_mod, fallback="uniform", axis=1
        )
        fused_logits = jnp.sum(stacked_logits * normalized[..., None], axis=1)
        return fused_logits, per_modality_logits


class UncertaintyFusion(nn.Module):
    """Uncertainty-weighted late fusion with learned per-sample log-variances.

    Realises the reference's declared-but-unimplemented ``fusion_type:
    uncertainty`` option (its ``config/base.yaml:27`` lists it as an extra-
    credit choice, but the factory ``src/fusion.py:485-515`` rejects it).
    Per-modality classifier heads as in :class:`LateFusion`, plus a
    per-modality log-variance head; fusion weights are inverse-variance
    ``mask * exp(-log_var)`` renormalised per sample, with the same
    mask-proportional / uniform fallbacks as
    :func:`uncertainty.uncertainty_weighted_fusion`. Trainable end-to-end
    and deterministic at eval; MC-dropout refinement of the weights at eval
    time is available via ``uncertainty.mc_dropout_uncertainty_fusion``.
    """

    modality_names: Sequence[str]
    hidden_dim: int = 256
    num_classes: int = 11
    dropout: float = 0.1
    dtype: Optional[Any] = None  # bf16 under mixed_precision (params stay f32)

    @nn.compact
    def __call__(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        names = list(self.modality_names)
        if not names:
            raise ValueError("No modalities configured for UncertaintyFusion.")
        num_mod = len(names)
        first = names[0]
        if first not in modality_features:
            raise KeyError(
                f"Missing features for modality '{first}' in UncertaintyFusion forward pass."
            )
        batch = modality_features[first].shape[0]
        dtype = modality_features[first].dtype
        if modality_mask is None:
            modality_mask = _default_mask(batch, num_mod, dtype)
        modality_mask = modality_mask.astype(dtype)

        drop = nn.Dropout(self.dropout, deterministic=not train)
        per_modality_logits: Dict[str, jax.Array] = {}
        stack = []
        log_vars = []
        for idx, name in enumerate(names):
            if name not in modality_features:
                raise KeyError(
                    f"Missing features for modality '{name}' in UncertaintyFusion forward pass."
                )
            masked = modality_features[name] * modality_mask[:, idx : idx + 1]
            h = nn.relu(
                nn.Dense(self.hidden_dim, name=f"cls_{name}_fc", dtype=self.dtype)(
                    drop(masked)
                )
            )
            logits = nn.Dense(
                self.num_classes, name=f"cls_{name}_head", dtype=self.dtype
            )(drop(h))
            # bounded log-variance keeps exp(-log_var) finite and the
            # weighting well-conditioned early in training
            log_var = jnp.clip(
                nn.Dense(1, name=f"unc_{name}_head", dtype=self.dtype)(h)[:, 0], -6.0, 6.0
            )
            per_modality_logits[name] = logits
            stack.append(logits)
            log_vars.append(log_var)

        stacked_logits = jnp.stack(stack, axis=1)  # (B, M, C)
        inv_var = jnp.exp(-jnp.stack(log_vars, axis=1))  # (B, M)
        weights = mask_renormalize(
            inv_var * modality_mask, modality_mask, num_mod,
            fallback="proportional", axis=1,
        )
        fused_logits = jnp.sum(stacked_logits * weights[..., None], axis=1)
        return fused_logits, per_modality_logits


class HybridFusion(nn.Module):
    """Cross-modal attention + adaptive gated weighting (the flagship head)."""

    modality_names: Sequence[str]
    hidden_dim: int = 256
    num_classes: int = 11
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None

    def setup(self):
        names = list(self.modality_names)
        self._names = names
        self.projections = {
            name: nn.Dense(self.hidden_dim, name=f"proj_{name}", dtype=self.dtype)
            for name in names
        }
        self.pair_attention = StackedPairAttention(
            num_modalities=len(names),
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            name="pairs",
        )
        self.gates = {
            name: nn.Dense(1, name=f"gate_{name}", dtype=self.dtype) for name in names
        }
        self.classifier_hidden = nn.Dense(
            self.hidden_dim, name="classifier_hidden", dtype=self.dtype
        )
        self.classifier_out = nn.Dense(
            self.num_classes, name="classifier_out", dtype=self.dtype
        )
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: Optional[jax.Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        names = self._names
        if not names:
            raise ValueError("No modalities configured for HybridFusion.")
        num_mod = len(names)
        first = names[0]
        if first not in modality_features:
            raise KeyError(
                f"Missing features for modality '{first}' in HybridFusion forward pass."
            )
        batch = modality_features[first].shape[0]
        dtype = modality_features[first].dtype
        if modality_mask is None:
            modality_mask = _default_mask(batch, num_mod, dtype)
        modality_mask = modality_mask.astype(dtype)

        projected = []
        for idx, name in enumerate(names):
            if name not in modality_features:
                raise KeyError(
                    f"Missing features for modality '{name}' in HybridFusion forward pass."
                )
            feats = modality_features[name] * modality_mask[:, idx : idx + 1]
            x = self.projections[name](self.drop(feats, deterministic=not train))
            projected.append(
                self.drop(nn.relu(x), deterministic=not train)
            )
        stacked = jnp.stack(projected, axis=0)  # [M, B, H]

        attended, pair_weights = self.pair_attention(stacked, modality_mask, train=train)

        pairs = ordered_pairs(names)
        per_query: Dict[int, list] = {}
        for pair_idx, (qi, _ki) in enumerate(pairs):
            per_query.setdefault(qi, []).append(pair_idx)
        aggregated = []
        for qi in range(num_mod):
            contributions = [stacked[qi]] + [attended[p] for p in per_query.get(qi, [])]
            aggregated.append(jnp.mean(jnp.stack(contributions, axis=0), axis=0))
        agg = jnp.stack(aggregated, axis=0) * modality_mask.T[:, :, None]  # [M, B, H]

        aggregated_dict = {name: agg[i] for i, name in enumerate(names)}
        fusion_weights = self.compute_adaptive_weights(aggregated_dict, modality_mask)

        modality_tensor = jnp.stack([aggregated_dict[n] for n in names], axis=1)  # (B,M,H)
        fused = jnp.sum(modality_tensor * fusion_weights[..., None], axis=1)
        h = self.drop(nn.relu(self.classifier_hidden(fused)), deterministic=not train)
        logits = self.classifier_out(h)

        if return_attention:
            attention_maps = {
                f"{names[qi]}_to_{names[ki]}": pair_weights[p]
                for p, (qi, ki) in enumerate(pairs)
            }
            return logits, {
                "attention_maps": attention_maps,
                "fusion_weights": fusion_weights,
            }
        return logits

    def compute_adaptive_weights(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: jax.Array,
    ) -> jax.Array:
        """Masked-softmax gate weights with the reference's fallback math.

        Reference ``src/fusion.py:429-479``: gate scores -> ``-inf`` mask ->
        softmax -> nan scrub -> re-mask -> renormalise; rows whose weights sum
        to zero fall back to mask-proportional weights, or uniform
        ``1/num_modalities`` when the mask itself is all-zero.
        """
        if modality_mask is None:
            raise ValueError("modality_mask must be provided for adaptive weighting.")
        names = self._names
        scores = []
        for name in names:
            if name not in modality_features:
                raise KeyError(f"Missing aggregated features for modality '{name}'.")
            scores.append(self.gates[name](modality_features[name]))
        score_tensor = jnp.concatenate(scores, axis=1)  # (B, M)
        mask = modality_mask.astype(score_tensor.dtype)
        return adaptive_gate_weights(score_tensor, mask, len(names), axis=1)


_FUSION_CLASSES = {
    "early": EarlyFusion,
    "late": LateFusion,
    "hybrid": HybridFusion,
    "uncertainty": UncertaintyFusion,
}


def build_fusion_model(
    fusion_type: str,
    modality_dims: Mapping[str, int],
    num_classes: int,
    **kwargs,
) -> nn.Module:
    """Factory mirroring the reference (``src/fusion.py:485-515``).

    ``modality_dims`` keys define modality order; dims themselves are
    shape-inferred by flax. ``num_heads`` is stripped for non-hybrid heads.
    """
    if fusion_type not in _FUSION_CLASSES:
        raise ValueError(f"Unknown fusion type: {fusion_type}")
    fusion_kwargs = dict(kwargs)
    if fusion_type != "hybrid":
        fusion_kwargs.pop("num_heads", None)
    return _FUSION_CLASSES[fusion_type](
        modality_names=tuple(modality_dims.keys()),
        num_classes=num_classes,
        **fusion_kwargs,
    )


if __name__ == "__main__":
    import jax

    print("Testing fusion architectures...")
    rng = jax.random.PRNGKey(0)
    feats = {"video": jnp.ones((2, 6)), "imu": jnp.ones((2, 4))}
    mask = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
    for fusion_type in ("early", "late", "hybrid"):
        model = build_fusion_model(
            fusion_type, {"video": 6, "imu": 4}, num_classes=3, hidden_dim=8
        )
        out = model.apply(model.init(rng, feats, mask), feats, mask)
        logits = out[0] if isinstance(out, tuple) else out
        print(f"  {fusion_type}: {logits.shape}")
    print("Fusion OK")
