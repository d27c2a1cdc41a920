"""Per-modality encoders (flax.linen), re-designed for XLA/TPU.

Capability parity with the reference's encoder stack
(``src/encoders.py:16-451``): SequenceEncoder (lstm / gru / cnn /
transformer), FrameEncoder (attention / average / max pooling with exact
masked semantics), SimpleMLPEncoder, and the ``build_encoder`` factory with
the same modality-name routing rules and error messages.

TPU-first divergences from the torch design:

- RNNs precompute the input projection ``x @ W_ih`` for ALL timesteps as one
  large MXU matmul, so the ``lax.scan`` recurrence only carries the
  ``h @ W_hh`` matmul — the standard XLA-friendly RNN formulation.
- Variable-length sequences use a carry-freeze (``h = where(t < len, h', h)``)
  instead of packed sequences; the final carry equals the state at the last
  valid step, matching ``pack_padded_sequence`` semantics exactly.
- The CNN/transformer paths pool with a length mask so padded windows (an
  artifact of real batching, which the reference's batch_size=1 path never
  had) do not pollute the embedding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import lengths_to_mask, masked_mean_pool, masked_softmax, nan_to_num
from ..ops.pallas_mlp import (
    _RNG_P_ATT,
    _RNG_P_HIDDEN,
    _RNG_P_RES,
    dense_params_init,
    dropout_keep_mask,
    fused_mlp_residual_ln,
    fused_proj_residual_ln,
    kernel_rng_seed,
    ln_params_init,
    transformer_ffw,
)


def _uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


class _RNNStack(nn.Module):
    """Multi-layer LSTM/GRU with torch gate ordering and init.

    Torch parity: weights/biases ~ U(-1/sqrt(H), 1/sqrt(H)); LSTM gates
    ordered (i, f, g, o); GRU gates ordered (r, z, n) with separate
    input/hidden biases on the candidate gate; inter-layer dropout only when
    ``num_layers > 1`` (reference: ``src/encoders.py:67-85``).
    """

    hidden_dim: int
    num_layers: int
    cell_type: str  # 'lstm' | 'gru'
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        sequence: jax.Array,  # [B, T, D]
        lengths: Optional[jax.Array] = None,  # [B]
        train: bool = False,
    ) -> jax.Array:
        batch, seq_len, _ = sequence.shape
        hidden = self.hidden_dim
        gates = 4 if self.cell_type == "lstm" else 3
        scale = hidden**-0.5

        if lengths is not None:
            step_valid = (
                jnp.arange(seq_len)[:, None] < lengths[None, :].astype(jnp.int32)
            ).astype(sequence.dtype)  # [T, B]
        else:
            step_valid = None

        layer_input = sequence
        final_state = None
        for layer in range(self.num_layers):
            in_dim = layer_input.shape[-1]
            w_ih = self.param(f"weight_ih_l{layer}", _uniform(scale), (in_dim, gates * hidden))
            w_hh = self.param(f"weight_hh_l{layer}", _uniform(scale), (hidden, gates * hidden))
            b_ih = self.param(f"bias_ih_l{layer}", _uniform(scale), (gates * hidden,))
            b_hh = self.param(f"bias_hh_l{layer}", _uniform(scale), (gates * hidden,))

            # One big [B*T, D] @ [D, G*H] matmul feeds the whole scan.
            x_proj = (
                jnp.einsum("btd,dg->btg", layer_input, w_ih) + b_ih
            ).transpose(1, 0, 2)  # [T, B, G*H]

            h0 = jnp.zeros((batch, hidden), layer_input.dtype)

            if self.cell_type == "lstm":
                c0 = jnp.zeros_like(h0)

                def lstm_step(carry, xs):
                    h, c = carry
                    xp, valid = xs
                    z = xp + h @ w_hh + b_hh
                    i, f, g, o = jnp.split(z, 4, axis=-1)
                    i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
                    g = jnp.tanh(g)
                    c_new = f * c + i * g
                    h_new = o * jnp.tanh(c_new)
                    if valid is not None:
                        keep = valid[:, None]
                        h_new = keep * h_new + (1 - keep) * h
                        c_new = keep * c_new + (1 - keep) * c
                    return (h_new, c_new), h_new

                if step_valid is None:
                    (h_final, _), outputs = jax.lax.scan(
                        lambda carry, xp: lstm_step(carry, (xp, None)), (h0, c0), x_proj
                    )
                else:
                    (h_final, _), outputs = jax.lax.scan(
                        lstm_step, (h0, c0), (x_proj, step_valid)
                    )
            else:

                def gru_step(carry, xs):
                    h = carry
                    xp, valid = xs
                    hp = h @ w_hh + b_hh
                    xr, xz, xn = jnp.split(xp, 3, axis=-1)
                    hr, hz, hn = jnp.split(hp, 3, axis=-1)
                    r = nn.sigmoid(xr + hr)
                    z = nn.sigmoid(xz + hz)
                    n = jnp.tanh(xn + r * hn)
                    h_new = (1 - z) * n + z * h
                    if valid is not None:
                        keep = valid[:, None]
                        h_new = keep * h_new + (1 - keep) * h
                    return h_new, h_new

                if step_valid is None:
                    h_final, outputs = jax.lax.scan(
                        lambda carry, xp: gru_step(carry, (xp, None)), h0, x_proj
                    )
                else:
                    h_final, outputs = jax.lax.scan(gru_step, h0, (x_proj, step_valid))

            final_state = h_final
            layer_input = outputs.transpose(1, 0, 2)  # [B, T, H]
            if self.num_layers > 1 and layer < self.num_layers - 1:
                layer_input = nn.Dropout(self.dropout, deterministic=not train)(layer_input)

        assert final_state is not None
        return final_state  # [B, H] — last layer's final hidden state


class _MaskedBatchNorm(nn.Module):
    """BatchNorm over ``[B, T, C]`` whose batch statistics weight only the
    VALID timesteps (``mask [B, T]``), so zero-padded window tails cannot
    drag the train-mode normalisation or the running stats used at eval.

    Param/variable tree matches ``nn.BatchNorm`` (scale/bias +
    batch_stats.mean/var), so checkpoints restore across the swap.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        mask: Optional[jax.Array] = None,  # [B, T], 1 = valid
        use_running_average: bool = False,
    ) -> jax.Array:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mean = jnp.mean(xf, axis=(0, 1))
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1))
            else:
                w = mask.astype(jnp.float32)[..., None]  # [B, T, 1]
                denom = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w, axis=(0, 1)) / denom
                var = jnp.sum(w * jnp.square(xf - mean), axis=(0, 1)) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class _TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch ``TransformerEncoderLayer``)."""

    hidden_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    # computation dtype (bf16 under mixed_precision; params stay f32 and
    # softmax/LayerNorm statistics accumulate in f32)
    dtype: Optional[Any] = None
    # flash (tiled online-softmax Pallas) attention, forward AND backward
    # (custom VJP): the O(T^2) score tensor never materialises in training or
    # inference (ops/pallas_attention.py). Attention-prob dropout is applied
    # on NEITHER path (backend-independent training semantics); residual/ffn
    # dropouts carry the regularisation.
    use_flash: bool = False
    # fused feed-forward (Dense -> ReLU -> dropout -> Dense) Pallas kernel
    # pair (ops/pallas_mlp.py): the [B*T, dim_feedforward] hidden activation
    # never reaches HBM in either pass. Both paths draw the SAME dropout
    # keep-mask from the 'dropout' rng stream, so training stochasticity is
    # independent of which backend resolved ``fused_mlp: auto``.
    use_fused_mlp: bool = False
    # widen the fusion to the layer's whole second half (FFW + residual
    # dropout + add + norm2 in one kernel). Off by default until validated
    # on the real chip — HEAD's default path must only use TPU-proven
    # kernels (the driver benches HEAD unattended).
    use_fused_mlp_ln: bool = False
    # dropout-mask source (training.dropout_rng):
    #   "auto"   — "kernel" on a real TPU, "xla" elsewhere (default)
    #   "xla"    — threefry jax.random.bernoulli masks (backend-independent,
    #              bit-reproducible across versions — pick for exact
    #              cross-machine replay)
    #   "kernel" — the same u8 masks produced by the dropout_keep_mask
    #              Pallas kernel (TPU hardware PRNG, ~15x cheaper than the
    #              threefry fusions — which profiled at ~23% of the flagship
    #              device step; ops/pallas_mlp.py module docstring).
    #              Deterministic per seed but TPU-specific streams (same
    #              caveat as training.prng_impl: rbg). Falls back to "xla"
    #              off-TPU / in interpret mode, where the HW PRNG does not
    #              exist.
    dropout_rng: str = "auto"
    # Megatron-style SEQUENCE PARALLELISM over the mesh's "model" axis
    # (parallel.sequence_parallel): the norm/dropout/residual regions hold
    # their [B, T, H] activations sharded on T across the tensor-parallel
    # group (1/M of the work and memory per chip) instead of M redundant
    # replicas; XLA materialises the boundary collectives (all-gather into
    # the attention/FFW matmuls, reduce-scatter back out) from the
    # region-boundary sharding constraints below. Only meaningful with an
    # active tensor-parallel mesh (parallel/mesh.py::activation_mesh);
    # otherwise every constraint is a no-op.
    seq_parallel: bool = False
    # E > 0 swaps the dense feed-forward for a top-k routed Mixture-of-
    # Experts block (models/moe.py) whose [E, ...] expert weights shard over
    # the mesh's "model" axis (EXPERT parallelism). Beyond-parity extension;
    # the fused_mlp kernels apply only to the dense path.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, H]
        key_padding_mask: Optional[jax.Array] = None,  # [B, T], 1 = valid
        train: bool = False,
    ) -> jax.Array:
        if self.seq_parallel:
            from ..parallel.mesh import (
                seq_gathered_constraint as _gather,
                seq_sharded_constraint as _shard_t,
            )
        else:
            def _gather(a):
                return a

            _shard_t = _gather
        head_dim = self.hidden_dim // self.num_heads
        batch, seq_len, _ = x.shape
        # layer input lives in a norm-region layout (sequence-sharded); the
        # qkv projection below re-enters a tensor-parallel region
        x = _shard_t(x)
        # jax.default_backend() INITIALISES the default backend — only consult
        # it when a Pallas path is actually enabled, so hermetic CPU-mesh runs
        # with every kernel flag pinned off never touch a (possibly broken)
        # tunneled-TPU default backend (CLAUDE.md contract; the value is
        # unused when no kernel flag is on).
        interpret = (
            jax.default_backend() != "tpu"
            if (self.use_flash or self.use_fused_mlp)
            else True
        )

        # q/k/v params keep their separate nn.Dense checkpoint names, but the
        # projections run as ONE [H, 3H] matmul: x is read from HBM once
        # instead of three times and the MXU gets one big dot per layer
        pq = self.param("q_proj", dense_params_init(self.hidden_dim, self.hidden_dim))
        pk = self.param("k_proj", dense_params_init(self.hidden_dim, self.hidden_dim))
        pv = self.param("v_proj", dense_params_init(self.hidden_dim, self.hidden_dim))
        cd = self.dtype or x.dtype
        w_qkv = jnp.concatenate(
            [pq["kernel"], pk["kernel"], pv["kernel"]], axis=1
        ).astype(cd)
        b_qkv = jnp.concatenate([pq["bias"], pk["bias"], pv["bias"]]).astype(cd)
        qkv = (_gather(x).astype(cd) @ w_qkv + b_qkv).reshape(
            batch, seq_len, 3, self.num_heads, head_dim
        )
        if self.use_flash:
            from ..ops.pallas_attention import (
                flash_mha_packed,
                flash_self_attention,
                packed_route_ok,
            )

            # Training runs through the Pallas forward+backward kernel pair
            # (custom VJP) — the O(T^2) score tensor never materialises in
            # either pass. Attention-PROBABILITY dropout is not applied on
            # this path (the [T, T] weight tile only exists inside the
            # kernel); residual/ffn/output dropouts below are unchanged.
            # suffix padding -> contiguous valid prefix; mask == lengths
            lengths = (
                jnp.sum(key_padding_mask, axis=-1).astype(jnp.int32)
                if key_padding_mask is not None
                else None
            )
            if packed_route_ok(seq_len, self.num_heads, head_dim):
                # transpose-free single-block path: the kernel consumes the
                # projection's packed [B, T, 3*H*d] output directly (heads
                # sliced in-kernel), casts bf16 in-kernel, and returns the
                # packed dqkv cotangent — no [B,H,T,d] relayout, no
                # standalone converts on either side (the round-5 HEAD
                # profile put ~25% of train-step device time in that glue)
                attended = flash_mha_packed(
                    qkv.reshape(batch, seq_len, 3 * self.hidden_dim),
                    lengths,
                    num_heads=self.num_heads,
                    interpret=interpret,
                ).astype(x.dtype)
            else:
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                # cast to the kernels' bf16 stream dtype BEFORE the
                # [B, T, H, d] -> [B, H, T, d] transpose: the layout copy
                # moves half the bytes and the custom-VJP residuals store
                # bf16 (profiled ~2.2 ms/step of reshape traffic at the
                # flagship point). Off-TPU (interpret) keeps f32.
                kd = jnp.bfloat16 if not interpret else q.dtype
                attended = flash_self_attention(
                    q.astype(kd).transpose(0, 2, 1, 3),
                    k.astype(kd).transpose(0, 2, 1, 3),
                    v.astype(kd).transpose(0, 2, 1, 3),
                    lengths,
                    interpret=interpret,
                ).transpose(0, 2, 1, 3).reshape(batch, seq_len, self.hidden_dim)
                attended = attended.astype(x.dtype)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * head_dim**-0.5
            mask = None
            if key_padding_mask is not None:
                mask = key_padding_mask[:, None, None, :]
            weights = masked_softmax(scores, mask)
            # NO attention-probability dropout on either path: the flash
            # kernel cannot apply it (the [T, T] weight tile only exists
            # inside the kernel), so the XLA path matches — training
            # semantics must not depend on which backend resolved
            # ``flash_attention: auto``. Regularisation comes from the
            # residual/ffn/output dropouts below (torch divergence: its
            # MultiheadAttention also drops attention probs).
            attended = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(
                batch, seq_len, self.hidden_dim
            )
        # out-projection + residual dropout + add + norm1: dict-valued params
        # keep the nn.Dense / nn.LayerNorm checkpoint trees; under the
        # combined-kernel flag the whole first half runs as one Pallas kernel
        po = self.param(
            "out_proj", dense_params_init(self.hidden_dim, self.hidden_dim)
        )
        pn1 = self.param("norm1", ln_params_init(self.hidden_dim))
        keep_prob = 1.0 - self.dropout
        # HW-PRNG dropout masks (training.dropout_rng: kernel/auto): one
        # [2]-word seed per layer, masks generated by the dropout_keep_mask
        # Pallas kernel (~15x cheaper than the threefry fusions;
        # ops/pallas_mlp.py module docstring). The generator is ITSELF a
        # Pallas kernel, so it follows the layer's kernel resolution (the
        # shared `interpret` flag): it engages only when at least one Pallas
        # kernel path (flash_attention / fused_mlp) is active on a real TPU.
        # With both flags off the layer is a pure-XLA program BY REQUEST and
        # masks stay threefry — also what keeps hermetic CPU-mesh runs (which
        # pin the kernel flags off) from ever consulting the default backend.
        # Off-TPU / interpret mode likewise falls back to the XLA draws
        # below (the interpret-mode HW PRNG is a zero stub). Consequence to
        # note when A/B-benching: BENCH_DROPOUT_RNG=kernel with BOTH
        # BENCH_FLASH=0 and BENCH_FUSED_MLP=0 measures the threefry path.
        krng = (
            str(self.dropout_rng).lower() in ("kernel", "auto")
            and not interpret
            and train
            and self.dropout > 0.0
        )
        if krng:
            krng_seed = kernel_rng_seed(self.make_rng("dropout"))

            def _hw_mask(cols, purpose):
                return dropout_keep_mask(
                    krng_seed, batch * seq_len, cols, keep_prob,
                    purpose=purpose,
                ).reshape(batch, seq_len, cols)

        att_mask = None
        if train and self.dropout > 0.0:
            if krng:
                att_mask = _hw_mask(self.hidden_dim, _RNG_P_ATT)
            else:
                att_mask = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    keep_prob,
                    (batch, seq_len, self.hidden_dim),
                )
        cd = self.dtype or jnp.float32
        # TRAIN-only kernel: in the pipelined eval regime XLA's own fusion of
        # this matmul+elementwise chain measured faster (10,496 vs 10,107
        # fwd windows/s), while in training the kernel's recompute backward
        # wins (1,865 vs 1,756 train windows/s) — so each mode takes its
        # measured-best path (outputs are parity-tested identical).
        if self.use_fused_mlp and self.use_fused_mlp_ln and train:
            x = fused_proj_residual_ln(
                x.reshape(batch * seq_len, self.hidden_dim).astype(cd),
                attended.reshape(batch * seq_len, self.hidden_dim).astype(cd),
                po["kernel"].astype(cd),
                po["bias"].astype(jnp.float32),
                pn1["scale"].astype(jnp.float32),
                pn1["bias"].astype(jnp.float32),
                res_mask=(
                    att_mask.reshape(batch * seq_len, -1)
                    if att_mask is not None else None
                ),
                keep_prob=keep_prob,
                interpret=interpret,
            ).reshape(batch, seq_len, self.hidden_dim).astype(x.dtype)
        else:
            y = (
                jnp.einsum(
                    "btd,do->bto", attended.astype(cd), po["kernel"].astype(cd)
                ).astype(jnp.float32)
                + po["bias"]
            )
            # out-projection output re-enters the norm region: sharding it on
            # T here turns the boundary into a reduce-scatter and keeps the
            # residual dropout + add + norm1 work sequence-sharded
            y = _shard_t(y)
            if att_mask is not None:
                y = jnp.where(att_mask, y / keep_prob, 0.0)
            r = x.astype(jnp.float32) + y
            mu = jnp.mean(r, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0
            )
            xhat = (r - mu) * jax.lax.rsqrt(var + 1e-6)
            x = (xhat * pn1["scale"] + pn1["bias"]).astype(x.dtype)
        # the FFW matmuls below are the layer's second tensor-parallel
        # region; norm1's output stays sequence-sharded for the residual add
        # while its gathered copy feeds the FFW
        x_ffw = _gather(x)
        if self.moe_experts > 0:
            # Mixture-of-Experts feed-forward (expert parallelism) in place
            # of the dense pair; residual dropout + add + norm2 are shared
            # with the dense path below (same math, same param tree names)
            from .moe import MoEFeedForward

            pn2 = self.param("norm2", ln_params_init(self.hidden_dim))
            ff = MoEFeedForward(
                hidden_dim=self.hidden_dim,
                dim_feedforward=self.dim_feedforward,
                num_experts=self.moe_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name="moe",
            )(x_ffw, valid_mask=key_padding_mask, train=train)
            ff = _shard_t(ff)
            if train and self.dropout > 0.0:
                # krng covers this residual mask too (purpose _RNG_P_RES is
                # unused on the MoE branch); MoE-INTERNAL dropout
                # (models/moe.py) keeps its own threefry draws
                res_mask = (
                    _hw_mask(self.hidden_dim, _RNG_P_RES)
                    if krng
                    else jax.random.bernoulli(
                        self.make_rng("dropout"),
                        keep_prob,
                        (batch, seq_len, self.hidden_dim),
                    )
                )
                ff = jnp.where(res_mask, ff / keep_prob, 0.0).astype(ff.dtype)
            r = x.astype(jnp.float32) + ff.astype(jnp.float32)
            mu = jnp.mean(r, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0
            )
            xhat = (r - mu) * jax.lax.rsqrt(var + 1e-6)
            out = xhat * pn2["scale"] + pn2["bias"]
            return _shard_t(out.astype(x.dtype))
        # feed-forward block: dict-valued params keep the exact nn.Dense
        # checkpoint tree (params['linear1']['kernel'|'bias']) while letting
        # the fused Pallas kernel consume the raw weights
        p1 = self.param(
            "linear1", dense_params_init(self.hidden_dim, self.dim_feedforward)
        )
        p2 = self.param(
            "linear2", dense_params_init(self.dim_feedforward, self.hidden_dim)
        )
        pn2 = self.param("norm2", ln_params_init(self.hidden_dim))
        keep_mask = res_mask = None
        # masks drawn OUTSIDE the kernel so the fused and XLA paths consume
        # the same draws (backend-independent training semantics). Plain
        # threefry bernoulli: a 4-masks-per-word packed variant was measured
        # SLOWER on TPU (docs/notes.md "negative results") and was removed.
        # training.dropout_rng: kernel swaps the threefry draws for the
        # HW-PRNG generator kernel (same u8 masks, ~50x cheaper to produce).
        if train and self.dropout > 0.0:
            if krng:
                keep_mask = _hw_mask(self.dim_feedforward, _RNG_P_HIDDEN)
                res_mask = _hw_mask(self.hidden_dim, _RNG_P_RES)
            else:
                keep_mask = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    keep_prob,
                    (batch, seq_len, self.dim_feedforward),
                )
                res_mask = jax.random.bernoulli(
                    self.make_rng("dropout"),
                    keep_prob,
                    (batch, seq_len, self.hidden_dim),
                )
        if self.use_fused_mlp and self.use_fused_mlp_ln and train:
            # whole second half of the layer in ONE kernel: FFW + residual
            # dropout + add + LayerNorm (ops/pallas_mlp.py). Neither the
            # hidden activation nor the FFW output reach HBM. TRAIN-only,
            # like the first-half kernel above: in the pipelined eval
            # regime XLA's own fusion of the FFW chain measured FASTER on
            # chip (round-5 paired A/B: all fused-FFW kernels off = fwd
            # 13,723 vs 13,281 w/s with them on, while train drops 2,653
            # -> 2,099 without them) — so eval takes the XLA path and
            # training keeps the kernels (outputs parity-tested identical).
            cd = self.dtype or jnp.float32
            out2d = fused_mlp_residual_ln(
                x_ffw.reshape(batch * seq_len, self.hidden_dim).astype(cd),
                p1["kernel"].astype(cd),
                p1["bias"].astype(jnp.float32),
                p2["kernel"].astype(cd),
                p2["bias"].astype(jnp.float32),
                pn2["scale"].astype(jnp.float32),
                pn2["bias"].astype(jnp.float32),
                ffw_mask=(
                    keep_mask.reshape(batch * seq_len, -1)
                    if keep_mask is not None else None
                ),
                res_mask=(
                    res_mask.reshape(batch * seq_len, -1)
                    if res_mask is not None else None
                ),
                keep_prob=keep_prob,
                interpret=interpret,
            )
            return out2d.reshape(batch, seq_len, self.hidden_dim).astype(x.dtype)
        ff = transformer_ffw(
            x_ffw,
            p1,
            p2,
            keep_mask=keep_mask,
            keep_prob=keep_prob,
            # train-only for the same measured reason as the combined
            # kernel above: eval-mode XLA fusion of the FFW beats the
            # Pallas kernel on chip
            use_fused=self.use_fused_mlp and train,
            dtype=self.dtype,
            interpret=interpret,
        )
        # linear2's output re-enters the norm region (reduce-scatter
        # boundary); the residual dropout + add + norm2 run sequence-sharded
        ff = _shard_t(ff)
        if res_mask is not None:
            ff = jnp.where(res_mask, ff / keep_prob, 0.0).astype(ff.dtype)
        # manual LayerNorm on the shared raw params (flax semantics: fast
        # variance, f32 statistics, eps 1e-6) — both paths share one
        # checkpoint tree (params['norm2']['scale'|'bias'])
        r = x.astype(jnp.float32) + ff.astype(jnp.float32)
        mu = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        xhat = (r - mu) * jax.lax.rsqrt(var + 1e-6)
        out = xhat * pn2["scale"] + pn2["bias"]
        return _shard_t(out.astype(x.dtype))


class SequenceEncoder(nn.Module):
    """Time-series -> fixed embedding (lstm | gru | cnn | transformer).

    Reference parity: ``src/encoders.py:16-208``. Raises the same error
    strings for bad ranks / unknown encoder types.
    """

    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 2
    encoder_type: str = "lstm"
    dropout: float = 0.1
    flash_attention: bool = False  # Pallas flash attention (transformer path)
    fused_mlp: bool = False  # Pallas fused feed-forward (transformer path)
    fused_mlp_ln: bool = False  # widen fusion to residual-dropout + norm2
    # dropout-mask source: "auto" (kernel on TPU; default) | "xla"
    # (threefry bernoulli, backend-independent) | "kernel" (TPU HW-PRNG
    # generator — training.dropout_rng; see _TransformerEncoderLayer)
    dropout_rng: str = "auto"
    # Megatron sequence parallelism over the active tensor-parallel mesh
    # (transformer path; see _TransformerEncoderLayer.seq_parallel)
    sequence_parallel: bool = False
    # Mixture-of-Experts feed-forward (transformer path; expert weights
    # shard over the "model" mesh axis — see models/moe.py). 0 = dense FFW.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # P > 1 runs the transformer layer stack as a GPipe microbatch pipeline
    # over the mesh's "pipe" axis (parallel/pipeline.py). The pipelined
    # path is XLA-only: flash/fused kernel flags are ignored on it.
    pipeline_parallel: int = 1
    pipeline_microbatches: int = 0
    # bf16 computation under mixed_precision (cnn/transformer paths; the RNN
    # recurrence keeps f32 carries — the grouped encoder has its own
    # mixed_precision recurrence flag)
    dtype: Optional[Any] = None

    def _check(self):
        if self.encoder_type not in ("lstm", "gru", "cnn", "transformer"):
            raise ValueError(f"Unknown encoder type: {self.encoder_type}")
        # same validation as training.dropout_rng in from_config — a typo'd
        # per-encoder override must not silently fall back to threefry (the
        # layer's membership test would read any unknown string as "xla")
        if str(self.dropout_rng).lower() not in ("auto", "xla", "kernel"):
            raise ValueError(
                f"Unknown dropout_rng {self.dropout_rng!r}; "
                "expected auto, xla or kernel"
            )

    @nn.compact
    def __call__(
        self,
        sequence: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        self._check()
        if sequence.ndim != 3:
            raise ValueError(
                f"Expected 3D input sequence, got shape {sequence.shape}"
            )
        batch, seq_len, _ = sequence.shape
        drop = nn.Dropout(self.dropout, deterministic=not train)

        if self.encoder_type in ("lstm", "gru"):
            final_state = _RNNStack(
                hidden_dim=self.hidden_dim,
                num_layers=self.num_layers,
                cell_type=self.encoder_type,
                dropout=self.dropout,
                name="rnn",
            )(sequence, lengths=lengths, train=train)
            return nn.Dense(self.output_dim, name="projection")(drop(final_state))

        if self.encoder_type == "cnn":
            mask = lengths_to_mask(lengths, seq_len) if lengths is not None else None
            x = sequence
            if mask is not None:
                # zero the padded tail up front: the 3-wide SAME conv reads
                # one step past each boundary, so whatever sits in the pad
                # region would bleed into the last valid step
                x = x * mask[..., None].astype(x.dtype)
            for idx in range(2):
                x = nn.Conv(
                    self.hidden_dim, kernel_size=(3,), padding="SAME",
                    name=f"conv{idx}", dtype=self.dtype,
                )(x)
                # batch statistics over VALID timesteps only, and re-zero
                # the padded tail after each block so conv bias/bleed from
                # padding cannot pollute stats or pooling
                x = _MaskedBatchNorm(
                    momentum=0.9, epsilon=1e-5, name=f"bn{idx}", dtype=self.dtype
                )(x, mask=mask, use_running_average=not train)
                x = nn.relu(x)
                if mask is not None:
                    x = x * mask[..., None].astype(x.dtype)
            pooled = masked_mean_pool(x, mask, axis=1, min_denom=1.0)
            return nn.Dense(self.output_dim, name="projection", dtype=self.dtype)(
                drop(pooled)
            )

        # transformer
        x = nn.Dense(self.hidden_dim, name="input_projection", dtype=self.dtype)(
            sequence
        )
        nhead = 4 if self.hidden_dim % 4 == 0 else 1
        valid_mask = (
            lengths_to_mask(lengths, seq_len) if lengths is not None else None
        )
        if self.pipeline_parallel > 1:
            if self.moe_experts > 0:
                raise ValueError(
                    "pipeline_parallel does not compose with moe_experts"
                )
            # GPipe microbatch pipeline over the mesh's "pipe" axis; off-
            # mesh the module runs the same stacked layers sequentially.
            # Pallas kernel flags are ignored here: the pipelined layer
            # math is the XLA path (kernels cannot lower inside the
            # pipe-manual shard_map).
            from ..parallel.pipeline import PipelinedTransformerLayers

            x = PipelinedTransformerLayers(
                hidden_dim=self.hidden_dim,
                num_heads=nhead,
                num_layers=self.num_layers,
                dropout=self.dropout,
                pipeline_parallel=self.pipeline_parallel,
                microbatches=self.pipeline_microbatches,
                dtype=self.dtype,
                name="pipeline",
            )(x, key_padding_mask=valid_mask, train=train)
        else:
            for idx in range(self.num_layers):
                x = _TransformerEncoderLayer(
                    hidden_dim=self.hidden_dim,
                    num_heads=nhead,
                    dropout=self.dropout,
                    use_flash=self.flash_attention,
                    use_fused_mlp=self.fused_mlp,
                    use_fused_mlp_ln=self.fused_mlp_ln,
                    dropout_rng=self.dropout_rng,
                    seq_parallel=self.sequence_parallel,
                    moe_experts=self.moe_experts,
                    moe_top_k=self.moe_top_k,
                    moe_capacity_factor=self.moe_capacity_factor,
                    dtype=self.dtype,
                    name=f"layer{idx}",
                )(x, key_padding_mask=valid_mask, train=train)
        pooled = masked_mean_pool(x, valid_mask, axis=1, min_denom=1.0)
        return nn.Dense(self.output_dim, name="projection", dtype=self.dtype)(
            drop(pooled)
        )


class FrameEncoder(nn.Module):
    """Frame features -> clip embedding with masked temporal pooling.

    Reference parity: ``src/encoders.py:211-336`` including the
    attention-pool's all-masked -> zero-weights contract and the max-pool's
    ``-inf -> nan_to_num`` scrub.
    """

    hidden_dim: int = 256
    output_dim: int = 128
    temporal_pooling: str = "attention"
    dropout: float = 0.1
    dtype: Optional[Any] = None

    def _check(self):
        if self.temporal_pooling not in ("attention", "average", "max"):
            raise ValueError(f"Unknown pooling: {self.temporal_pooling}")

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,  # [B, T, D]
        mask: Optional[jax.Array] = None,  # [B, T]
        train: bool = False,
    ) -> jax.Array:
        self._check()
        if frames.ndim != 3:
            raise ValueError(f"Expected 3D frame tensor, got shape {frames.shape}")

        drop = nn.Dropout(self.dropout, deterministic=not train)
        processed = drop(
            nn.relu(
                nn.Dense(self.hidden_dim, name="frame_processor", dtype=self.dtype)(
                    frames
                )
            )
        )
        if mask is not None:
            mask = mask.astype(processed.dtype)

        if self.temporal_pooling == "attention":
            scores = nn.Dense(1, name="attention", dtype=self.dtype)(processed)  # [B, T, 1]
            score_mask = mask[..., None] if mask is not None else None
            weights = masked_softmax(scores, score_mask, axis=1)
            pooled = jnp.sum(weights * processed, axis=1)
        elif self.temporal_pooling == "average":
            pooled = masked_mean_pool(processed, mask, axis=1, min_denom=1e-8)
        else:  # max
            if mask is None:
                pooled = jnp.max(processed, axis=1)
            else:
                neg = jnp.where(mask[..., None] == 0, -jnp.inf, processed)
                pooled = nan_to_num(jnp.max(neg, axis=1))

        x = drop(
            nn.relu(
                nn.Dense(self.hidden_dim, name="proj_hidden", dtype=self.dtype)(pooled)
            )
        )
        return nn.Dense(self.output_dim, name="proj_out", dtype=self.dtype)(x)


class SimpleMLPEncoder(nn.Module):
    """MLP over pre-extracted 2D features (reference ``src/encoders.py:339-397``)."""

    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    batch_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False) -> jax.Array:
        if features.ndim != 2:
            raise ValueError(
                f"Expected 2D feature tensor, got shape {features.shape}"
            )
        x = features
        for idx in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, name=f"dense{idx}", dtype=self.dtype)(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"bn{idx}",
                    dtype=self.dtype,
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="out", dtype=self.dtype)(x)


_SEQUENCE_MODALITIES = {"imu", "audio", "mocap", "accelerometer"}


def build_encoder(
    modality: str,
    input_dim: int,
    output_dim: int,
    encoder_config: Optional[Dict[str, Any]] = None,
) -> nn.Module:
    """Factory with the reference's routing rules (``src/encoders.py:400-451``).

    ``input_dim`` is accepted for API parity but flax infers it from data.
    """
    config: Dict[str, Any] = dict(encoder_config) if encoder_config else {}
    override_type = config.pop("type", None)
    config.pop("input_dim", None)  # shape-inferred under flax
    modality_key = modality.lower()
    del input_dim

    def make_frame():
        allowed = {"hidden_dim", "temporal_pooling", "dropout", "dtype"}
        return FrameEncoder(output_dim=output_dim, **{k: v for k, v in config.items() if k in allowed})

    def make_sequence():
        allowed = {"hidden_dim", "num_layers", "encoder_type", "dropout",
                   "flash_attention", "fused_mlp", "fused_mlp_ln",
                   "dropout_rng", "sequence_parallel", "moe_experts",
                   "moe_top_k", "moe_capacity_factor", "pipeline_parallel",
                   "pipeline_microbatches", "dtype"}
        enc = SequenceEncoder(output_dim=output_dim, **{k: v for k, v in config.items() if k in allowed})
        enc._check()
        return enc

    def make_mlp():
        allowed = {"hidden_dim", "num_layers", "dropout", "batch_norm", "dtype"}
        return SimpleMLPEncoder(output_dim=output_dim, **{k: v for k, v in config.items() if k in allowed})

    if override_type == "frame":
        return make_frame()
    if override_type == "sequence":
        return make_sequence()
    if override_type == "mlp":
        return make_mlp()
    if modality_key in ("video", "frames"):
        return make_frame()
    if modality_key in _SEQUENCE_MODALITIES or modality_key.startswith("imu_"):
        return make_sequence()
    return make_mlp()


if __name__ == "__main__":
    # Tiny smoke demo (mirrors the reference module demos).
    import jax

    print("Testing encoders...")
    rng = jax.random.PRNGKey(0)
    seq = jnp.ones((2, 6, 5))
    for enc_type in ("lstm", "gru", "cnn", "transformer"):
        enc = SequenceEncoder(
            hidden_dim=8, output_dim=4, num_layers=1, encoder_type=enc_type
        )
        out = enc.apply(enc.init(rng, seq), seq)
        print(f"  SequenceEncoder[{enc_type}]: {out.shape}")
    frame = FrameEncoder(hidden_dim=8, output_dim=4)
    print("  FrameEncoder:", frame.apply(frame.init(rng, seq), seq).shape)
    mlp = SimpleMLPEncoder(hidden_dim=8, output_dim=4)
    flat = jnp.ones((2, 5))
    print("  SimpleMLPEncoder:", mlp.apply(mlp.init(rng, flat), flat).shape)
    print("Encoders OK")
