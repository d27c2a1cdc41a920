"""Mixture-of-Experts feed-forward with expert parallelism (ep).

Beyond-parity extension: the reference's transformer encoder has a single
dense feed-forward block (``src/encoders.py:99-111``); this module swaps it
for a router + E expert FFWs so the encoder's capacity scales without
scaling per-token FLOPs, and so the expert weights can shard over the mesh's
"model" axis (expert parallelism — the 5th parallelism axis next to
dp/tp/sp/dcn, see ``parallel/mesh.py``).

TPU-first design choices:

- **Static shapes end-to-end.** Top-k routing with a fixed per-expert
  capacity ``C`` (GShard/Switch recipe): every tensor shape is a function of
  the static token count, never of the routing decisions, so one compiled
  program serves every batch.
- **Scatter/gather dispatch, not one-hot einsum.** The classic GShard
  dispatch builds a ``[tokens, E, C]`` one-hot tensor whose memory dwarfs
  the expert compute at our token counts (B*T can be 32k). Instead tokens
  are scattered into a dense ``[E*C, H]`` buffer (positions are unique by
  construction, overflow drops via scatter ``mode="drop"``) and gathered
  back with ``mode="fill"`` — O(E*C*H + N*H) memory, and the expert matmuls
  stay large, batched MXU einsums over ``[E, C, H] x [E, H, F]``.
- **Expert parallelism via shardings, not collectives.** The ``[E, ...]``
  expert weights carry ``PartitionSpec("model", ...)`` (see
  ``parallel.mesh.tp_param_spec``) and the expert buffer gets the matching
  activation constraint; XLA's SPMD partitioner materialises the
  token-exchange collectives over ICI. No hand-written all_to_all.
- **Load-balance aux loss** (Switch: ``E * sum(f_e * P_e)`` over valid
  tokens) is sown into the ``"losses"`` collection; the Trainer adds
  ``training.moe_aux_weight`` times its sum to the objective.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def moe_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Per-expert token capacity, rounded up to a TPU sublane multiple (8)."""
    c = int(-(-top_k * num_tokens * capacity_factor // num_experts))
    c = max(8, ((c + 7) // 8) * 8)
    return min(c, max(8, ((top_k * num_tokens + 7) // 8) * 8))


class MoEFeedForward(nn.Module):
    """Top-k routed expert FFW: ``relu(x @ w1_e + b1_e) @ w2_e + b2_e``.

    Drop-in replacement for the dense feed-forward inside
    ``_TransformerEncoderLayer`` (same ``[B, T, H] -> [B, T, H]`` contract;
    the caller keeps the residual + LayerNorm). Padded timesteps
    (``valid_mask == 0``) neither consume expert capacity nor contribute to
    the aux loss, and their output is exactly zero.
    """

    hidden_dim: int
    dim_feedforward: int = 2048
    num_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H]
        valid_mask: Optional[jax.Array] = None,  # [B, T], 1 = valid
        train: bool = False,
    ) -> jax.Array:
        if not 1 <= self.top_k <= self.num_experts:
            raise ValueError(
                f"moe_top_k ({self.top_k}) must be in [1, moe_experts="
                f"{self.num_experts}]"
            )
        batch, seq_len, hidden = x.shape
        num_e, k_slots = self.num_experts, self.top_k
        n_tokens = batch * seq_len
        tokens = x.reshape(n_tokens, hidden)
        valid = (
            valid_mask.reshape(n_tokens).astype(jnp.float32)
            if valid_mask is not None
            else jnp.ones((n_tokens,), jnp.float32)
        )

        # -- routing (always f32: tiny matmul, softmax needs the precision) --
        wr = self.param(
            "router", _uniform(hidden**-0.5), (hidden, num_e)
        )
        logits = tokens.astype(jnp.float32) @ wr
        probs = jax.nn.softmax(logits, axis=-1)  # [N, E]
        gates, expert_idx = jax.lax.top_k(probs, k_slots)  # [N, K]
        gates = gates / jnp.clip(
            jnp.sum(gates, axis=-1, keepdims=True), 1e-9, None
        )
        gates = gates * valid[:, None]

        cap = moe_capacity(
            n_tokens, num_e, k_slots, self.capacity_factor
        )
        # Position of each (token, slot) inside its expert's capacity window.
        # Slot 0 claims positions for ALL tokens before slot 1 does (GShard
        # priority order); ``base`` carries the running per-expert count so
        # positions are globally unique — the scatter below cannot collide.
        base = jnp.zeros((num_e,), jnp.float32)
        slot_addr, slot_keep = [], []
        for k in range(k_slots):
            onehot = (
                jax.nn.one_hot(expert_idx[:, k], num_e, dtype=jnp.float32)
                * valid[:, None]
            )  # [N, E]
            pos = jnp.cumsum(onehot, axis=0) - onehot + base[None, :]
            base = base + jnp.sum(onehot, axis=0)
            p = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # [N]
            keep = (p < cap) & (valid > 0)
            # out-of-capacity / padded (token, slot)s address past the buffer
            # end: scatter mode="drop" / gather mode="fill" turn them into
            # exact no-ops
            addr = jnp.where(keep, expert_idx[:, k] * cap + p, num_e * cap)
            slot_addr.append(addr)
            slot_keep.append(keep)

        # -- dispatch: dense [E*C, H] buffer (unique addresses per slot) --
        cdt = self.dtype or x.dtype
        buf = jnp.zeros((num_e * cap, hidden), cdt)
        for k in range(k_slots):
            buf = buf.at[slot_addr[k]].set(tokens.astype(cdt), mode="drop")

        # -- expert compute: batched MXU einsums over the expert dim --
        w1 = self.param(
            "moe_w1", _uniform(hidden**-0.5),
            (num_e, hidden, self.dim_feedforward),
        )
        b1 = self.param(
            "moe_b1", _uniform(hidden**-0.5), (num_e, self.dim_feedforward)
        )
        w2 = self.param(
            "moe_w2", _uniform(self.dim_feedforward**-0.5),
            (num_e, self.dim_feedforward, hidden),
        )
        b2 = self.param(
            "moe_b2", _uniform(self.dim_feedforward**-0.5), (num_e, hidden)
        )
        from ..parallel.mesh import expert_sharded_constraint

        ebuf = expert_sharded_constraint(
            buf.reshape(num_e, cap, hidden), self.num_experts
        )
        h = (
            jnp.einsum("ech,ehf->ecf", ebuf.astype(cdt), w1.astype(cdt))
            + b1.astype(cdt)[:, None, :]
        )
        h = nn.relu(h)
        if train and self.dropout > 0.0:
            keep_prob = 1.0 - self.dropout
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep_prob, h.shape
            )
            h = jnp.where(mask, h / keep_prob, 0.0).astype(h.dtype)
        out_e = (
            jnp.einsum("ecf,efh->ech", h, w2.astype(cdt))
            + b2.astype(cdt)[:, None, :]
        )
        out_e = expert_sharded_constraint(out_e, self.num_experts)

        # -- combine: gather each slot's output, weight by its gate --
        flat_out = out_e.reshape(num_e * cap, hidden)
        y = jnp.zeros((n_tokens, hidden), jnp.float32)
        for k in range(k_slots):
            picked = jnp.take(
                flat_out, slot_addr[k], axis=0, mode="fill", fill_value=0
            ).astype(jnp.float32)
            y = y + gates[:, k, None] * picked

        # -- load-balance aux loss (Switch): E * sum_e f_e * P_e --
        denom = jnp.clip(jnp.sum(valid), 1.0, None)
        top1 = (
            jax.nn.one_hot(expert_idx[:, 0], num_e, dtype=jnp.float32)
            * valid[:, None]
        )
        frac_tokens = jnp.sum(top1, axis=0) / denom
        mean_prob = jnp.sum(probs * valid[:, None], axis=0) / denom
        aux = num_e * jnp.sum(frac_tokens * mean_prob)
        self.sow(
            "losses",
            "moe_aux",
            aux,
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.add,
        )

        return y.reshape(batch, seq_len, hidden).astype(x.dtype)
