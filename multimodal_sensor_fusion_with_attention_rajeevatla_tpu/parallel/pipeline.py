"""Pipeline parallelism (pp) for the transformer encoder layer stack.

GPipe-style microbatch pipelining over a dedicated "pipe" mesh axis — the
6th parallelism axis next to dp/tp/sp/ep/dcn (``parallel/mesh.py``). The
reference is single-device (its only scale-out is a CI job matrix); pipeline
parallelism exists here for depth-scaled variants whose layer stack outgrows
one chip.

Design (the standard JAX SPMD pipelining recipe):

- **Stacked homogeneous stages.** All L transformer layers' parameters are
  stored STACKED (leading ``[L, ...]`` dim) in one dict-valued flax param
  (``pipe_layers``) and shard over "pipe" (``tp_param_spec``): each of the P
  pipeline ranks holds L/P contiguous layers.
- **shard_map over "pipe" only.** The schedule runs manually over the pipe
  axis while the batch dims stay under the automatic partitioner
  (``axis_names={"pipe"}``), so pp composes with data parallelism with no
  extra code.
- **GPipe schedule.** The batch splits into M microbatches; at step t, rank
  r processes microbatch ``t - r`` and ``ppermute``s its activation to rank
  ``r+1``. ``M + P - 1`` steps drain the pipeline (bubble fraction
  ``(P-1)/(M+P-1)``). The whole loop is a ``lax.scan`` — one compiled step,
  reverse-differentiable.
- **XLA-path layer math only.** The per-layer forward reproduces
  ``_TransformerEncoderLayer``'s XLA path exactly (equivalence-tested);
  Pallas kernels cannot lower inside this shard_map and are ignored on the
  pipelined path. Dropout draws fold (layer, microbatch) into the base key,
  so the realised masks are independent per stage and microbatch.

Off-mesh (no active "pipe" axis — single device, unit tests, init traces)
the module runs its layers sequentially with identical math, so the same
checkpoint serves both regimes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax
from ..ops.pallas_mlp import transformer_ffw
from .mesh import PIPE_AXIS, current_activation_mesh


def stacked_layers_init(
    num_layers: int, hidden_dim: int, dim_feedforward: int
):
    """Init for the stacked ``[L, ...]`` transformer-layer param dict.

    Same per-leaf distributions as ``_TransformerEncoderLayer``'s
    ``dense_params_init`` / ``ln_params_init`` (lecun-normal kernels with
    per-layer fan, ZERO biases; LayerNorm scale 1 / bias 0) — drawn per
    layer and stacked, so a fresh ``pipeline_parallel`` run starts from
    the same distribution as the sequential stack.
    """
    lecun = jax.nn.initializers.lecun_normal()

    def stacked_kernel(key, d_in, d_out, dtype):
        keys = jax.random.split(key, num_layers)
        return jnp.stack([lecun(k, (d_in, d_out), dtype) for k in keys])

    def init(key, dtype=jnp.float32):
        ks = jax.random.split(key, 6)
        h, f, L = hidden_dim, dim_feedforward, num_layers
        return {
            "q_proj": {"kernel": stacked_kernel(ks[0], h, h, dtype),
                       "bias": jnp.zeros((L, h), dtype)},
            "k_proj": {"kernel": stacked_kernel(ks[1], h, h, dtype),
                       "bias": jnp.zeros((L, h), dtype)},
            "v_proj": {"kernel": stacked_kernel(ks[2], h, h, dtype),
                       "bias": jnp.zeros((L, h), dtype)},
            "out_proj": {"kernel": stacked_kernel(ks[3], h, h, dtype),
                         "bias": jnp.zeros((L, h), dtype)},
            "norm1": {"scale": jnp.ones((L, h), dtype),
                      "bias": jnp.zeros((L, h), dtype)},
            "linear1": {"kernel": stacked_kernel(ks[4], h, f, dtype),
                        "bias": jnp.zeros((L, f), dtype)},
            "linear2": {"kernel": stacked_kernel(ks[5], f, h, dtype),
                        "bias": jnp.zeros((L, h), dtype)},
            "norm2": {"scale": jnp.ones((L, h), dtype),
                      "bias": jnp.zeros((L, h), dtype)},
        }

    return init


def _residual_ln(x, y, scale, bias):
    """Residual add + manual LayerNorm (f32 stats, eps 1e-6) — the exact
    math of ``_TransformerEncoderLayer``'s norm1/norm2 blocks."""
    r = x.astype(jnp.float32) + y.astype(jnp.float32)
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
    xhat = (r - mu) * jax.lax.rsqrt(var + 1e-6)
    return xhat * scale + bias


def layer_forward(
    p,  # one layer's param dict (leaves WITHOUT the leading L dim)
    x: jax.Array,  # [B, T, H]
    num_heads: int,
    valid_mask: Optional[jax.Array] = None,  # [B, T], 1 = valid
    dropout_rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
    dtype: Optional[Any] = None,
) -> jax.Array:
    """One post-LN transformer encoder layer, XLA path.

    Mirrors ``_TransformerEncoderLayer.__call__``'s non-kernel branch
    (``models/encoders.py``) exactly: one [H, 3H] qkv matmul, masked
    softmax attention (no attention-prob dropout), out-projection +
    residual dropout + add + norm1, dense FFW with hidden dropout +
    residual dropout + add + norm2. Equivalence is pinned by
    ``tests/test_pipeline.py``.
    """
    batch, seq_len, hidden = x.shape
    head_dim = hidden // num_heads
    cd = dtype or x.dtype
    w_qkv = jnp.concatenate(
        [p["q_proj"]["kernel"], p["k_proj"]["kernel"], p["v_proj"]["kernel"]],
        axis=1,
    ).astype(cd)
    b_qkv = jnp.concatenate(
        [p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]]
    ).astype(cd)
    qkv = (x.astype(cd) @ w_qkv + b_qkv).reshape(
        batch, seq_len, 3, num_heads, head_dim
    )
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * head_dim**-0.5
    mask = valid_mask[:, None, None, :] if valid_mask is not None else None
    weights = masked_softmax(scores, mask)
    attended = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(
        batch, seq_len, hidden
    )

    keep_prob = 1.0 - dropout
    rngs = (
        jax.random.split(dropout_rng, 3) if dropout_rng is not None else None
    )
    cd32 = dtype or jnp.float32
    y = (
        jnp.einsum(
            "btd,do->bto", attended.astype(cd32), p["out_proj"]["kernel"].astype(cd32)
        ).astype(jnp.float32)
        + p["out_proj"]["bias"]
    )
    if rngs is not None and dropout > 0.0:
        att_mask = jax.random.bernoulli(rngs[0], keep_prob, y.shape)
        y = jnp.where(att_mask, y / keep_prob, 0.0)
    x = _residual_ln(x, y, p["norm1"]["scale"], p["norm1"]["bias"]).astype(
        x.dtype
    )

    # feed-forward block: the shared transformer_ffw helper (XLA path) —
    # identical math AND dtype rounding to the sequential encoder's FFW
    keep_mask = (
        jax.random.bernoulli(
            rngs[1], keep_prob, x.shape[:-1] + (p["linear1"]["kernel"].shape[-1],)
        )
        if rngs is not None and dropout > 0.0
        else None
    )
    ff = transformer_ffw(
        x, p["linear1"], p["linear2"],
        keep_mask=keep_mask, keep_prob=keep_prob,
        use_fused=False, dtype=dtype,
    )
    if rngs is not None and dropout > 0.0:
        res_mask = jax.random.bernoulli(rngs[2], keep_prob, ff.shape)
        ff = jnp.where(res_mask, ff / keep_prob, 0.0).astype(ff.dtype)
    out = _residual_ln(x, ff, p["norm2"]["scale"], p["norm2"]["bias"])
    return out.astype(x.dtype)


class PipelinedTransformerLayers(nn.Module):
    """L transformer encoder layers with GPipe pipeline parallelism.

    With an active mesh carrying a "pipe" axis (published by
    ``Trainer._device_ctx`` via ``parallel.mesh.activation_mesh``), the
    layer stack runs as a P-stage microbatch pipeline under ``shard_map``;
    otherwise the layers run sequentially with identical math.
    """

    hidden_dim: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pipeline_parallel: int = 2
    # microbatch count M (0 = use pipeline_parallel); bubble fraction is
    # (P-1)/(M+P-1), so raise M to amortise it
    microbatches: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H]
        key_padding_mask: Optional[jax.Array] = None,  # [B, T], 1 = valid
        train: bool = False,
    ) -> jax.Array:
        if self.num_layers % self.pipeline_parallel:
            raise ValueError(
                f"num_layers ({self.num_layers}) must divide evenly over "
                f"pipeline_parallel ({self.pipeline_parallel})"
            )
        params = self.param(
            "pipe_layers",
            stacked_layers_init(
                self.num_layers, self.hidden_dim, self.dim_feedforward
            ),
        )
        use_dropout = train and self.dropout > 0.0
        base_rng = self.make_rng("dropout") if use_dropout else None

        mesh = current_activation_mesh()
        # the init trace runs the fallback: the param tree is created above
        # (identical either way) and EAGER shard_map (outside jit) trips on
        # inputs carrying auto-axis shardings (_shard_map_impl unmatch)
        pipelined = (
            self.pipeline_parallel > 1
            and not self.is_initializing()
            and mesh is not None
            and PIPE_AXIS in mesh.axis_names
        )
        if not pipelined:
            # sequential fallback: identical math, same params, same
            # per-(layer, microbatch=whole-batch) rng folding
            for layer in range(self.num_layers):
                lp = jax.tree_util.tree_map(lambda a: a[layer], params)
                rng = (
                    jax.random.fold_in(base_rng, layer)
                    if base_rng is not None
                    else None
                )
                x = layer_forward(
                    lp, x, self.num_heads, key_padding_mask,
                    rng, self.dropout, self.dtype,
                )
            return x

        n_pipe = mesh.shape[PIPE_AXIS]
        if n_pipe != self.pipeline_parallel:
            raise ValueError(
                f"mesh 'pipe' axis ({n_pipe}) != pipeline_parallel "
                f"({self.pipeline_parallel})"
            )
        batch = x.shape[0]
        n_micro = self.microbatches or self.pipeline_parallel
        if batch % n_micro:
            raise ValueError(
                f"batch ({batch}) must divide evenly into "
                f"pipeline microbatches ({n_micro})"
            )
        x_mb = x.reshape((n_micro, batch // n_micro) + x.shape[1:])
        valid_mb = (
            key_padding_mask.reshape(
                (n_micro, batch // n_micro) + key_padding_mask.shape[1:]
            )
            if key_padding_mask is not None
            else None
        )
        if base_rng is None:
            # scan carries need uniform types; a dummy key keeps one
            # schedule for both train and eval
            base_rng = jax.random.PRNGKey(0)

        schedule = partial(
            _pipeline_schedule,
            num_heads=self.num_heads,
            layers_per_stage=self.num_layers // self.pipeline_parallel,
            n_micro=n_micro,
            n_pipe=self.pipeline_parallel,
            dropout=self.dropout if use_dropout else 0.0,
            dtype=self.dtype,
            has_mask=valid_mb is not None,
        )
        out_mb = jax.shard_map(
            schedule,
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(
                    lambda _: jax.sharding.PartitionSpec(PIPE_AXIS), params
                ),
                jax.sharding.PartitionSpec(),
                jax.sharding.PartitionSpec(),
                jax.sharding.PartitionSpec(),
            ),
            out_specs=jax.sharding.PartitionSpec(),
            axis_names={PIPE_AXIS},
            check_vma=False,
        )(
            params,
            x_mb,
            valid_mb if valid_mb is not None else jnp.zeros((), x.dtype),
            base_rng,
        )
        return out_mb.reshape(x.shape)


def _pipeline_schedule(
    local_params,
    x_mb,  # [M, mb, T, H] (replicated over pipe; batch dims stay auto)
    valid_mb,  # [M, mb, T] or scalar placeholder
    base_rng,
    *,
    num_heads: int,
    layers_per_stage: int,
    n_micro: int,
    n_pipe: int,
    dropout: float,
    dtype,
    has_mask: bool,
):
    """GPipe schedule body, executed per pipe rank under shard_map."""
    rank = jax.lax.axis_index(PIPE_AXIS)
    fwd_perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

    def stage(y, vmask, micro_idx):
        for layer in range(layers_per_stage):
            lp = jax.tree_util.tree_map(lambda a: a[layer], local_params)
            global_layer = rank * layers_per_stage + layer
            rng = (
                jax.random.fold_in(
                    jax.random.fold_in(base_rng, global_layer), micro_idx
                )
                if dropout > 0.0
                else None
            )
            y = layer_forward(
                lp, y, num_heads, vmask, rng, dropout, dtype
            )
        return y

    def body(carry, t):
        state, outs = carry
        micro_idx = jnp.clip(t - rank, 0, n_micro - 1)
        # rank 0 feeds fresh microbatches; later ranks consume the
        # activation ppermuted to them at the previous step
        inp = jnp.where(
            rank == 0, x_mb[jnp.clip(t, 0, n_micro - 1)], state
        )
        vmask = valid_mb[micro_idx] if has_mask else None
        y = stage(inp, vmask, micro_idx)
        out_idx = t - (n_pipe - 1)
        is_out = (rank == n_pipe - 1) & (out_idx >= 0)
        # write y into its output slot as a SELECT over the (small) M dim,
        # not a scatter: XLA's partial-manual scatter partitioning CHECK-
        # fails when other "data"-sharded tensors (ZeRO moments) change the
        # program's device grouping, and the select is as fast at M <= 8
        slot_mask = (jnp.arange(n_micro) == out_idx) & is_out  # [M]
        outs = jnp.where(
            slot_mask.reshape((n_micro,) + (1,) * (outs.ndim - 1)),
            y[None], outs,
        )
        state = jax.lax.ppermute(y, PIPE_AXIS, fwd_perm)
        return (state, outs), None

    state0 = jnp.zeros_like(x_mb[0])
    outs0 = jnp.zeros_like(x_mb)
    (_, outs), _ = jax.lax.scan(
        body, (state0, outs0), jnp.arange(n_micro + n_pipe - 1)
    )
    # only the last rank holds real outputs; psum replicates them so the
    # downstream (pooling, fusion) program is rank-uniform
    outs = jnp.where(rank == n_pipe - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, PIPE_AXIS)
