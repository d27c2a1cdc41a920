"""Attention mechanisms (flax.linen), vectorised for TPU.

Capability parity with the reference (``src/attention.py:16-485``):

- ``CrossModalAttention``: multi-head attention between two modalities with
  separate Q and K/V input dims, 2D-input auto-unsqueeze, and the
  all-keys-masked -> zero-weights contract.
- ``TemporalAttention``: self-attention over timesteps with padding masks and
  ``pool_sequence``.
- ``PairwiseModalityAttention``: all M(M-1) ordered modality pairs. The
  TPU-first redesign stores each attention role as ONE stacked ``[P, H, H]``
  parameter tensor and computes every pair with a single batched einsum (MXU
  batched matmul) instead of M(M-1) separate module calls — semantically
  identical (independent weights per pair), dramatically better for XLA.
- ``visualize_attention``: heatmap rendering util.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import masked_softmax


class CrossModalAttention(nn.Module):
    """Modality A attends to modality B (reference ``src/attention.py:16-146``).

    Accepts 2D ``(B, D)`` or 3D ``(B, T, D)`` queries/keys/values. Returns
    ``(attended, attention_weights)``; with 2D keys the weights collapse to
    ``(B, heads, q_len, 1)`` as in the reference.
    """

    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None  # bf16 under mixed_precision (params stay f32)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        assert self.hidden_dim % self.num_heads == 0, (
            f"hidden_dim ({self.hidden_dim}) must be divisible by "
            f"num_heads ({self.num_heads})"
        )
        head_dim = self.hidden_dim // self.num_heads
        batch = query.shape[0]
        squeeze_query = query.ndim == 2
        squeeze_key = key.ndim == 2
        if squeeze_query:
            query = query[:, None, :]
        if squeeze_key:
            key = key[:, None, :]
        if value.ndim == 2:
            value = value[:, None, :]

        q_len, k_len = query.shape[1], key.shape[1]
        q = nn.Dense(self.hidden_dim, name="query_proj", dtype=self.dtype)(query)
        k = nn.Dense(self.hidden_dim, name="key_proj", dtype=self.dtype)(key)
        v = nn.Dense(self.hidden_dim, name="value_proj", dtype=self.dtype)(value)

        q = q.reshape(batch, q_len, self.num_heads, head_dim)
        k = k.reshape(batch, k_len, self.num_heads, head_dim)
        v = v.reshape(batch, k_len, self.num_heads, head_dim)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * head_dim**-0.5
        if mask is not None:
            if mask.ndim == 1:
                mask = mask[:, None]
            mask = mask[:, None, None, :]  # (B, 1, 1, k_len)
        weights = masked_softmax(scores, mask)
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)

        attended = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        attended = attended.reshape(batch, q_len, self.hidden_dim)
        attended = nn.Dense(self.hidden_dim, name="out_proj", dtype=self.dtype)(attended)

        if squeeze_query:
            attended = attended[:, 0, :]
        if squeeze_key:
            weights = weights[:, :, :, :1]
        return attended, weights


class TemporalAttention(nn.Module):
    """Self-attention over timesteps (reference ``src/attention.py:149-281``)."""

    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        sequence: jax.Array,  # [B, T, D]
        mask: Optional[jax.Array] = None,  # [B, T] or [T]
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        head_dim = self.hidden_dim // self.num_heads
        batch, seq_len, _ = sequence.shape

        q = nn.Dense(self.hidden_dim, name="query_proj", dtype=self.dtype)(sequence)
        k = nn.Dense(self.hidden_dim, name="key_proj", dtype=self.dtype)(sequence)
        v = nn.Dense(self.hidden_dim, name="value_proj", dtype=self.dtype)(sequence)
        q = q.reshape(batch, seq_len, self.num_heads, head_dim)
        k = k.reshape(batch, seq_len, self.num_heads, head_dim)
        v = v.reshape(batch, seq_len, self.num_heads, head_dim)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * head_dim**-0.5
        broadcast_mask = None
        if mask is not None:
            if mask.ndim == 1:
                mask = mask[None, :]
            broadcast_mask = mask[:, None, None, :]
        weights = masked_softmax(scores, broadcast_mask)
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)

        attended = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        attended = attended.reshape(batch, seq_len, self.hidden_dim)
        attended = nn.Dense(self.hidden_dim, name="out_proj", dtype=self.dtype)(attended)
        if mask is not None:
            attended = attended * mask[..., None].astype(attended.dtype)
        return attended, weights

    @staticmethod
    def pool_sequence(sequence: jax.Array, attention_weights: jax.Array) -> jax.Array:
        """Collapse attention into a timestep distribution and pool ``(B,T,D)->(B,D)``."""
        if attention_weights.ndim != 4:
            raise ValueError(
                "Expected attention weights with 4 dims, got "
                f"{attention_weights.shape}"
            )
        mean_weights = jnp.mean(attention_weights, axis=1)  # (B, T, T)
        pooling = jnp.mean(mean_weights, axis=1)  # (B, T)
        pooling = pooling / (jnp.sum(pooling, axis=1, keepdims=True) + 1e-8)
        return jnp.einsum("bt,btd->bd", pooling, sequence)


def ordered_pairs(names: Sequence[str]) -> list[Tuple[int, int]]:
    """All ordered (query, key) index pairs, query-major (reference order)."""
    return [(qi, ki) for qi in range(len(names)) for ki in range(len(names)) if qi != ki]


class StackedPairAttention(nn.Module):
    """All M(M-1) cross-modal pairs as stacked batched matmuls.

    Each ordered pair owns independent Q/K/V/out projections, stored stacked
    as ``[P, H, H]`` so every pair runs in one ``einsum`` on the MXU. Inputs
    are the already-projected per-modality embeddings ``[M, B, H]``; output is
    per-pair attended features ``[P, B, H]`` plus per-pair scalar attention
    weights ``[P, B, heads, 1, 1]`` (pooled embeddings are length-1 sequences,
    reference ``src/fusion.py:383-404``).
    """

    num_modalities: int
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        stacked: jax.Array,  # [M, B, H]
        modality_mask: jax.Array,  # [B, M]
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        num_mod = self.num_modalities
        pairs = ordered_pairs(range(num_mod))
        num_pairs = len(pairs)
        head_dim = self.hidden_dim // self.num_heads
        batch = stacked.shape[1]
        if num_pairs == 0:
            # single modality: no cross-modal pairs exist (reference builds
            # zero attention modules in this case, src/fusion.py:300-314)
            return (
                jnp.zeros((0, batch, self.hidden_dim), stacked.dtype),
                jnp.zeros((0, batch, self.num_heads, 1, 1), stacked.dtype),
            )
        q_idx = jnp.array([p[0] for p in pairs])
        k_idx = jnp.array([p[1] for p in pairs])

        def pair_param(name):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.lecun_normal(),
                (num_pairs, self.hidden_dim, self.hidden_dim),
            )
            b = self.param(f"{name}_bias", nn.initializers.zeros, (num_pairs, self.hidden_dim))
            if self.dtype is not None:  # params stored f32, computed in dtype
                w, b = w.astype(self.dtype), b.astype(self.dtype)
            return w, b

        wq, bq = pair_param("query")
        wk, bk = pair_param("key")
        wv, bv = pair_param("value")
        wo, bo = pair_param("out")

        if self.dtype is not None:
            stacked = stacked.astype(self.dtype)
        q_in = jnp.take(stacked, q_idx, axis=0)  # [P, B, H]
        k_in = jnp.take(stacked, k_idx, axis=0)  # [P, B, H]

        q = jnp.einsum("pbh,phk->pbk", q_in, wq) + bq[:, None, :]
        k = jnp.einsum("pbh,phk->pbk", k_in, wk) + bk[:, None, :]
        v = jnp.einsum("pbh,phk->pbk", k_in, wv) + bv[:, None, :]

        batch = stacked.shape[1]
        qh = q.reshape(num_pairs, batch, self.num_heads, head_dim)
        kh = k.reshape(num_pairs, batch, self.num_heads, head_dim)
        # Length-1 sequences: scores are per-head scalars.
        scores = jnp.sum(qh * kh, axis=-1) * (head_dim**-0.5)  # [P, B, heads]
        key_mask = jnp.take(modality_mask.T, k_idx, axis=0)  # [P, B]
        # softmax over a single key: weight = 1 where key available, else 0
        weights = masked_softmax(
            scores[..., None], key_mask[:, :, None, None], axis=-1
        )  # [P, B, heads, 1]
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)

        attended = weights * v.reshape(num_pairs, batch, self.num_heads, head_dim)
        attended = attended.reshape(num_pairs, batch, self.hidden_dim)
        attended = jnp.einsum("pbh,phk->pbk", attended, wo) + bo[:, None, :]
        return attended, weights[..., None]  # [P,B,heads,1,1] after expand


class PairwiseModalityAttention(nn.Module):
    """Pairwise attention across modalities (reference ``src/attention.py:284-424``).

    Projects each modality, runs all ordered pairs through
    ``StackedPairAttention``, mean-aggregates self + attended per modality,
    and re-masks unavailable modalities.
    """

    modality_names: Sequence[str]
    hidden_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        modality_features: Mapping[str, jax.Array],
        modality_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        names = list(self.modality_names)
        if not names:
            raise ValueError("No modalities provided for PairwiseModalityAttention.")
        num_mod = len(names)
        batch = modality_features[names[0]].shape[0]
        if modality_mask is None:
            modality_mask = jnp.ones((batch, num_mod))
        modality_mask = modality_mask.astype(modality_features[names[0]].dtype)

        drop = nn.Dropout(self.dropout, deterministic=not train)
        projected = []
        for name in names:
            x = nn.Dense(self.hidden_dim, name=f"proj_{name}", dtype=self.dtype)(
                modality_features[name]
            )
            projected.append(drop(nn.relu(x)))
        stacked = jnp.stack(projected, axis=0)  # [M, B, H]

        attended, weights = StackedPairAttention(
            num_modalities=num_mod,
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            name="pairs",
        )(stacked, modality_mask, train=train)

        pairs = ordered_pairs(names)
        # Aggregate: mean over [self] + [attended from every key modality].
        per_query: Dict[int, list] = {}
        for pair_idx, (qi, _ki) in enumerate(pairs):
            per_query.setdefault(qi, []).append(pair_idx)
        aggregated = []
        for qi in range(num_mod):
            contributions = [stacked[qi]] + [attended[p] for p in per_query.get(qi, [])]
            aggregated.append(jnp.mean(jnp.stack(contributions, axis=0), axis=0))
        agg = jnp.stack(aggregated, axis=0)  # [M, B, H]
        agg = agg * modality_mask.T[:, :, None]

        attended_features = {name: agg[i] for i, name in enumerate(names)}
        attention_maps = {
            f"{names[qi]}_to_{names[ki]}": weights[p]
            for p, (qi, ki) in enumerate(pairs)
        }
        return attended_features, attention_maps


def visualize_attention(
    attention_weights,
    modality_names: Sequence[str],
    save_path: Path | str | None = None,
) -> None:
    """Render attention weights as a 2D heatmap (reference ``src/attention.py:427-485``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tensor = np.asarray(attention_weights, dtype=np.float32)
    if tensor.ndim == 0:
        tensor = tensor[None]
    if tensor.ndim == 1:
        tensor = tensor[None, :]
    while tensor.ndim > 2:
        tensor = tensor.mean(axis=0)
    heatmap = tensor
    if heatmap.ndim != 2:
        heatmap = np.expand_dims(heatmap, axis=0)

    fig, ax = plt.subplots(figsize=(4 + 0.5 * heatmap.shape[1], 4))
    im = ax.imshow(heatmap, cmap="viridis", aspect="auto")
    num_queries, num_keys = heatmap.shape
    ax.set_xticks(np.arange(num_keys))
    ax.set_yticks(np.arange(num_queries))
    ax.set_xticklabels(list(modality_names)[:num_keys], rotation=45, ha="right")
    ax.set_yticklabels(list(modality_names)[:num_queries])
    ax.set_xlabel("Key Modality")
    ax.set_ylabel("Query Modality")
    ax.set_title("Cross-Modal Attention Weights")
    plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    plt.tight_layout()

    if save_path is not None:
        output_path = Path(save_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(output_path, dpi=300, bbox_inches="tight")
        plt.close(fig)
    else:
        plt.show()


if __name__ == "__main__":
    import jax

    print("Testing attention mechanisms...")
    rng = jax.random.PRNGKey(0)
    q = jnp.ones((2, 6))
    k = jnp.ones((2, 4))
    cma = CrossModalAttention(hidden_dim=8, num_heads=2)
    out, w = cma.apply(cma.init(rng, q, k, k), q, k, k)
    print("  CrossModalAttention:", out.shape, w.shape)
    seq = jnp.ones((2, 5, 6))
    ta = TemporalAttention(hidden_dim=8, num_heads=2)
    out, w = ta.apply(ta.init(rng, seq), seq)
    print("  TemporalAttention:", out.shape, w.shape)
    pma = PairwiseModalityAttention(modality_names=("a", "b"), hidden_dim=8, num_heads=2)
    feats = {"a": jnp.ones((2, 6)), "b": jnp.ones((2, 6))}
    att, maps = pma.apply(pma.init(rng, feats), feats)
    print("  PairwiseModalityAttention:", sorted(att), sorted(maps))
    print("Attention OK")
