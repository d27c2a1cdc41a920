"""Grouped sequence encoding: all modality RNNs in ONE batched scan.

The reference runs one encoder module per modality sequentially
(``src/train.py:253-269``) — on TPU that serialises 4 independent
1024-step LSTM scans, each with a matmul too small to fill the MXU. This
module is the TPU-first redesign: modalities with compatible sequence
encoders (same ``encoder_type``/``hidden_dim``/``num_layers``) are stacked
into a group axis ``G`` and encoded by ONE ``lax.scan`` whose per-step
recurrence is a single batched ``[G,B,H] x [G,H,4H]`` ``dot_general`` — the
MXU sees one 4x-larger matmul instead of four small ones, and the scan
overhead is paid once.

Exact-function equivalence with per-modality encoders: inputs are zero-padded
on the feature axis to the group max ``D_max``; padded columns multiply
weight rows against zeros, contributing nothing. Each group member still owns
independent weights (the stacked parameter's leading axis).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _grouped_uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


class GroupedRNNEncoder(nn.Module):
    """G independent LSTM/GRU stacks evaluated as one batched scan.

    Input: ``[G, B, T, D_max]`` (zero-padded features), output ``[G, B, out]``
    (the per-member final hidden state, dropout + projection applied), exactly
    what ``SequenceEncoder`` yields per modality.
    """

    num_groups: int
    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 1
    cell_type: str = "lstm"
    dropout: float = 0.1
    # Route the recurrence through the Pallas kernel (ops/pallas_rnn.py) on
    # non-training calls. Parameters are identical either way, so checkpoints
    # are interchangeable; training always uses the autodiff-able XLA scan.
    use_pallas: bool = False
    # bf16 matmuls in the recurrence (params stay f32; carries accumulate in
    # f32). Halves activation bandwidth on TPU; off by default for bit parity.
    mixed_precision: bool = False

    @nn.compact
    def __call__(
        self,
        stacked: jax.Array,  # [G, B, T, D]
        lengths: Optional[jax.Array] = None,  # [B]
        train: bool = False,
    ) -> jax.Array:
        groups, batch, seq_len, _ = stacked.shape
        hidden = self.hidden_dim
        gates = 4 if self.cell_type == "lstm" else 3
        scale = hidden**-0.5

        if lengths is not None:
            step_valid = (
                jnp.arange(seq_len)[:, None] < lengths[None, :].astype(jnp.int32)
            ).astype(stacked.dtype)  # [T, B]
        else:
            step_valid = None

        layer_input = stacked
        final_state = None
        for layer in range(self.num_layers):
            in_dim = layer_input.shape[-1]
            w_ih = self.param(
                f"weight_ih_l{layer}", _grouped_uniform(scale),
                (groups, in_dim, gates * hidden),
            )
            w_hh = self.param(
                f"weight_hh_l{layer}", _grouped_uniform(scale),
                (groups, hidden, gates * hidden),
            )
            b_ih = self.param(
                f"bias_ih_l{layer}", _grouped_uniform(scale), (groups, gates * hidden)
            )
            b_hh = self.param(
                f"bias_hh_l{layer}", _grouped_uniform(scale), (groups, gates * hidden)
            )

            # bf16 dot support varies off-TPU (the CPU thunk rejects
            # BF16xBF16=F32), so mixed precision only engages on TPU
            compute_dtype = (
                jnp.bfloat16
                if self.mixed_precision and jax.default_backend() == "tpu"
                else stacked.dtype
            )

            # one big grouped matmul feeds the whole scan: [G,B,T,D]x[G,D,GH]
            x_proj = jnp.einsum(
                "gbtd,gdh->tgbh",
                layer_input.astype(compute_dtype),
                w_ih.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            x_proj = (x_proj + b_ih[None, :, None, :]).astype(compute_dtype)

            h0 = jnp.zeros((groups, batch, hidden), stacked.dtype)

            if (
                self.use_pallas
                and self.cell_type == "gru"
                and self.num_layers == 1
            ):
                if train:
                    # differentiable kernel pair (custom VJP): recurrence in
                    # Pallas, W_ih/b_ih grads flow through the x_proj einsum
                    from ..ops.pallas_rnn_train import grouped_gru_trainable

                    final_state = grouped_gru_trainable(
                        x_proj.astype(jnp.float32), w_hh, b_hh, lengths
                    )
                else:
                    from ..ops.pallas_rnn import grouped_gru_fused

                    final_state = grouped_gru_fused(
                        layer_input.transpose(2, 0, 1, 3),  # [G,B,T,D]->[T,G,B,D]
                        w_ih,
                        w_hh,
                        b_ih,
                        b_hh,  # GRU candidate bias stays on the hidden path
                        lengths=lengths if lengths is not None else None,
                        interpret=jax.default_backend() != "tpu",
                    )
                break

            if (
                self.use_pallas
                and self.cell_type == "lstm"
                and self.num_layers == 1
            ):
                if train:
                    # differentiable kernel pair (custom VJP): recurrence in
                    # Pallas, W_ih/b_ih grads flow through the x_proj einsum
                    from ..ops.pallas_rnn_train import grouped_lstm_trainable

                    final_state = grouped_lstm_trainable(
                        x_proj.astype(jnp.float32), w_hh, b_hh, lengths
                    )
                else:
                    from ..ops.pallas_rnn import grouped_lstm_fused

                    final_state = grouped_lstm_fused(
                        layer_input.transpose(2, 0, 1, 3),  # [G,B,T,D]->[T,G,B,D]
                        w_ih,
                        w_hh,
                        b_ih + b_hh,  # LSTM gate biases are purely additive
                        lengths=lengths if lengths is not None else None,
                        # interpret off-TPU so the flag is portable in tests
                        interpret=jax.default_backend() != "tpu",
                    )
                break

            if self.cell_type == "lstm":
                c0 = jnp.zeros_like(h0)

                w_hh_c = w_hh.astype(compute_dtype)

                def lstm_step(carry, xs):
                    h, c = carry
                    xp, valid = xs
                    z = (
                        xp.astype(jnp.float32)
                        + jnp.einsum(
                            "gbh,ghk->gbk",
                            h.astype(compute_dtype),
                            w_hh_c,
                            preferred_element_type=jnp.float32,
                        )
                        + b_hh[:, None, :]
                    )
                    i, f, g, o = jnp.split(z, 4, axis=-1)
                    i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
                    g = jnp.tanh(g)
                    c_new = f * c + i * g
                    h_new = o * jnp.tanh(c_new)
                    if valid is not None:
                        keep = valid[None, :, None]
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

                w_hh_c = w_hh.astype(compute_dtype)

                def gru_step(carry, xs):
                    h = carry
                    xp, valid = xs
                    xp = xp.astype(jnp.float32)
                    # hidden bias stays on the hidden path: the GRU candidate
                    # gate applies r AFTER adding b_hh (torch semantics)
                    hp = (
                        jnp.einsum(
                            "gbh,ghk->gbk",
                            h.astype(compute_dtype),
                            w_hh_c,
                            preferred_element_type=jnp.float32,
                        )
                        + b_hh[:, None, :]
                    )
                    xr, xz, xn = jnp.split(xp, 3, axis=-1)
                    hr, hz, hn = jnp.split(hp, 3, axis=-1)
                    r = nn.sigmoid(xr + hr)
                    z = nn.sigmoid(xz + hz)
                    n = jnp.tanh(xn + r * hn)
                    h_new = (1 - z) * n + z * h
                    if valid is not None:
                        keep = valid[None, :, None]
                        h_new = keep * h_new + (1 - keep) * h
                    return h_new, h_new

                if step_valid is None:
                    h_final, outputs = jax.lax.scan(
                        lambda carry, xp: gru_step(carry, (xp, None)), h0, x_proj
                    )
                else:
                    h_final, outputs = jax.lax.scan(gru_step, h0, (x_proj, step_valid))

            final_state = h_final  # [G, B, H]
            if layer < self.num_layers - 1:
                # feed per-step outputs [T,G,B,H] to the next layer as
                # [G,B,T,H], with torch-style inter-layer dropout
                layer_input = outputs.transpose(1, 2, 0, 3)
                layer_input = nn.Dropout(
                    self.dropout, deterministic=not train
                )(layer_input)

        assert final_state is not None
        dropped = nn.Dropout(self.dropout, deterministic=not train)(final_state)
        w_out = self.param(
            "proj_kernel", nn.initializers.lecun_normal(batch_axis=(0,)),
            (groups, hidden, self.output_dim),
        )
        b_out = self.param("proj_bias", nn.initializers.zeros, (groups, self.output_dim))
        return jnp.einsum("gbh,gho->gbo", dropped, w_out) + b_out[:, None, :]


def _grouped_dense_init(groups: int, d_in: int, d_out: int):
    """Stacked equivalent of ``ops.pallas_mlp.dense_params_init``: G
    independent lecun-normal kernels ``[G, d_in, d_out]`` + zero biases,
    matching what G separate ``nn.Dense`` modules would draw."""
    kernel_init = nn.initializers.lecun_normal(batch_axis=(0,))

    def init(key):
        return {
            "kernel": kernel_init(key, (groups, d_in, d_out)),
            "bias": jnp.zeros((groups, d_out), jnp.float32),
        }

    return init


def _grouped_ln_init(groups: int, dim: int):
    def init(_key):
        return {
            "scale": jnp.ones((groups, dim), jnp.float32),
            "bias": jnp.zeros((groups, dim), jnp.float32),
        }

    return init


def _ln_f32(r, scale, bias):
    """Shared manual LayerNorm (fast variance, f32 stats, eps 1e-6) — the
    exact math of ``_TransformerEncoderLayer``'s post-LN blocks."""
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
    return (r - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


class GroupedTransformerEncoder(nn.Module):
    """G independent transformer encoder stacks evaluated as one pass.

    The TPU-first replacement for looping same-signature per-modality
    transformer encoders (the reference runs one module per modality,
    ``src/train.py:253-269``): member weights stack on a leading group axis
    so every dense layer is ONE G-batched MXU matmul, and the whole group
    shares ONE flash-attention kernel launch over the folded ``[G*B]``
    batch instead of G sequential kernel grids.

    Exact-function equivalence with per-modality ``SequenceEncoder``
    (transformer path): same post-LN layer math, same masked mean pooling,
    same ``nhead`` rule, no attention-probability dropout. Inputs are
    zero-padded on the feature axis to the group ``D_max`` (padded columns
    contribute nothing through the input projection). Input ``[G, B, T,
    D_max]``, output ``[G, B, output_dim]``.
    """

    num_groups: int
    hidden_dim: int = 256
    output_dim: int = 128
    num_layers: int = 2
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_flash: bool = False
    # dropout-mask source, same contract as _TransformerEncoderLayer:
    # "auto"/"kernel" use the TPU HW-PRNG generator kernel when a Pallas
    # path is active on a real TPU; "xla" pins threefry draws.
    dropout_rng: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        stacked: jax.Array,  # [G, B, T, D_max]
        lengths: Optional[jax.Array] = None,  # [B]
        train: bool = False,
    ) -> jax.Array:
        from ..ops.masked import lengths_to_mask, masked_mean_pool
        from ..ops.pallas_mlp import (
            _RNG_P_ATT,
            _RNG_P_HIDDEN,
            _RNG_P_RES,
            dropout_keep_mask,
            kernel_rng_seed,
        )

        groups, batch, seq_len, d_in = stacked.shape
        hidden, ffw = self.hidden_dim, self.dim_feedforward
        nhead = 4 if hidden % 4 == 0 else 1
        head_dim = hidden // nhead
        cd = self.dtype or stacked.dtype
        keep_prob = 1.0 - self.dropout

        # consult the default backend only when a Pallas path is enabled
        # (hermetic CPU-mesh contract, see _TransformerEncoderLayer)
        interpret = jax.default_backend() != "tpu" if self.use_flash else True
        krng = (
            str(self.dropout_rng).lower() in ("kernel", "auto")
            and not interpret
            and train
            and self.dropout > 0.0
        )
        if krng:
            krng_seed = kernel_rng_seed(self.make_rng("dropout"))

        def _mask(cols, purpose):
            """[G, B, T, cols] keep mask; one draw covers the whole group."""
            if krng:
                return dropout_keep_mask(
                    krng_seed, groups * batch * seq_len, cols, keep_prob,
                    purpose=purpose,
                ).reshape(groups, batch, seq_len, cols)
            return jax.random.bernoulli(
                self.make_rng("dropout"), keep_prob,
                (groups, batch, seq_len, cols),
            )

        valid_mask = (
            lengths_to_mask(lengths, seq_len) if lengths is not None else None
        )

        p_in = self.param(
            "input_projection", _grouped_dense_init(groups, d_in, hidden)
        )
        x = (
            jnp.einsum(
                "gbtd,gdh->gbth",
                stacked.astype(cd),
                p_in["kernel"].astype(cd),
            )
            + p_in["bias"][:, None, None, :].astype(cd)
        ).astype(stacked.dtype)

        for layer in range(self.num_layers):
            pq = self.param(
                f"q_proj_l{layer}", _grouped_dense_init(groups, hidden, hidden)
            )
            pk = self.param(
                f"k_proj_l{layer}", _grouped_dense_init(groups, hidden, hidden)
            )
            pv = self.param(
                f"v_proj_l{layer}", _grouped_dense_init(groups, hidden, hidden)
            )
            po = self.param(
                f"out_proj_l{layer}", _grouped_dense_init(groups, hidden, hidden)
            )
            pn1 = self.param(f"norm1_l{layer}", _grouped_ln_init(groups, hidden))
            pn2 = self.param(f"norm2_l{layer}", _grouped_ln_init(groups, hidden))
            p1 = self.param(
                f"linear1_l{layer}", _grouped_dense_init(groups, hidden, ffw)
            )
            p2 = self.param(
                f"linear2_l{layer}", _grouped_dense_init(groups, ffw, hidden)
            )

            # one G-batched [G,H,3H] matmul feeds q/k/v for every member
            w_qkv = jnp.concatenate(
                [pq["kernel"], pk["kernel"], pv["kernel"]], axis=2
            ).astype(cd)
            b_qkv = jnp.concatenate(
                [pq["bias"], pk["bias"], pv["bias"]], axis=1
            ).astype(cd)
            qkv = (
                jnp.einsum("gbth,ghk->gbtk", x.astype(cd), w_qkv)
                + b_qkv[:, None, None, :]
            ).reshape(groups, batch, seq_len, 3, nhead, head_dim)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

            if self.use_flash:
                from ..ops.pallas_attention import flash_self_attention

                # fold the group axis into batch: ONE kernel launch with a
                # G x larger grid instead of G sequential launches
                fold = lambda a: a.reshape(  # noqa: E731
                    groups * batch, seq_len, nhead, head_dim
                ).transpose(0, 2, 1, 3)
                flat_lengths = (
                    jnp.tile(lengths.astype(jnp.int32), groups)
                    if lengths is not None
                    else None
                )
                attended = (
                    flash_self_attention(
                        fold(q), fold(k), fold(v), flat_lengths,
                        interpret=interpret,
                    )
                    .transpose(0, 2, 1, 3)
                    .reshape(groups, batch, seq_len, hidden)
                    .astype(x.dtype)
                )
            else:
                from ..ops.masked import masked_softmax

                scores = (
                    jnp.einsum("gbqhd,gbkhd->gbhqk", q, k) * head_dim**-0.5
                )
                mask = (
                    valid_mask[None, :, None, None, :]
                    if valid_mask is not None
                    else None
                )
                weights = masked_softmax(scores, mask)
                attended = jnp.einsum("gbhqk,gbkhd->gbqhd", weights, v).reshape(
                    groups, batch, seq_len, hidden
                )

            y = (
                jnp.einsum(
                    "gbth,gho->gbto", attended.astype(cd), po["kernel"].astype(cd)
                ).astype(jnp.float32)
                + po["bias"][:, None, None, :]
            )
            if train and self.dropout > 0.0:
                y = jnp.where(_mask(hidden, _RNG_P_ATT), y / keep_prob, 0.0)
            r = x.astype(jnp.float32) + y
            x = _ln_f32(
                r, pn1["scale"][:, None, None, :], pn1["bias"][:, None, None, :]
            ).astype(x.dtype)

            h = nn.relu(
                jnp.einsum(
                    "gbth,ghf->gbtf", x.astype(cd), p1["kernel"].astype(cd)
                ).astype(jnp.float32)
                + p1["bias"][:, None, None, :]
            )
            if train and self.dropout > 0.0:
                h = jnp.where(_mask(ffw, _RNG_P_HIDDEN), h / keep_prob, 0.0)
            ff = (
                jnp.einsum(
                    "gbtf,gfh->gbth", h.astype(cd), p2["kernel"].astype(cd)
                ).astype(jnp.float32)
                + p2["bias"][:, None, None, :]
            )
            if train and self.dropout > 0.0:
                ff = jnp.where(_mask(hidden, _RNG_P_RES), ff / keep_prob, 0.0)
            r = x.astype(jnp.float32) + ff
            x = _ln_f32(
                r, pn2["scale"][:, None, None, :], pn2["bias"][:, None, None, :]
            ).astype(x.dtype)

        pooled = masked_mean_pool(
            x,
            valid_mask[None] if valid_mask is not None else None,
            axis=2,
            min_denom=1.0,
        )  # [G, B, H]
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        w_out = self.param(
            "proj_kernel", nn.initializers.lecun_normal(batch_axis=(0,)),
            (groups, hidden, self.output_dim),
        )
        b_out = self.param(
            "proj_bias", nn.initializers.zeros, (groups, self.output_dim)
        )
        return jnp.einsum("gbh,gho->gbo", pooled, w_out) + b_out[:, None, :]


def groupable_transformer_modalities(
    modalities: Sequence[str], encoder_configs: Mapping[str, Mapping]
) -> Tuple[List[str], Dict]:
    """Subset of modalities encodable by one grouped transformer pass.

    Groupable = sequence-typed transformer encoders sharing (hidden_dim,
    num_layers, flash_attention, dropout_rng) with none of the
    non-groupable features engaged (MoE, pipeline, sequence parallelism —
    those paths shard or stage the layer stack per modality).
    """
    candidates = []
    signatures = set()
    for name in modalities:
        cfg = dict(encoder_configs.get(name, {}) or {})
        if cfg.get("type", "sequence") != "sequence":
            continue
        if cfg.get("encoder_type", "lstm") != "transformer":
            continue
        if int(cfg.get("moe_experts", 0) or 0) > 0:
            continue
        if int(cfg.get("pipeline_parallel", 1) or 1) > 1:
            continue
        if bool(cfg.get("sequence_parallel", False)):
            continue
        signatures.add(
            (
                cfg.get("hidden_dim"),
                int(cfg.get("num_layers", 2)),
                bool(cfg.get("flash_attention", False)),
                str(cfg.get("dropout_rng", "auto")),
            )
        )
        candidates.append(name)
    if len(candidates) >= 2 and len(signatures) == 1:
        hidden, layers, flash, drng = next(iter(signatures))
        return candidates, {
            "hidden_dim": hidden,
            "num_layers": layers,
            "flash_attention": flash,
            "dropout_rng": drng,
        }
    return [], {}


def groupable_modalities(
    modalities: Sequence[str], encoder_configs: Mapping[str, Mapping]
) -> Tuple[List[str], Dict]:
    """Return the subset of modalities encodable by one grouped RNN scan.

    Groupable = explicitly-or-implicitly sequence-typed with a single-layer
    lstm/gru, all sharing (cell, hidden_dim, dropout). Returns ``(names,
    shared_config)``; names is empty when grouping does not apply.
    """
    candidates = []
    signatures = set()
    for name in modalities:
        cfg = dict(encoder_configs.get(name, {}) or {})
        etype = cfg.get("type")
        if etype is None:
            key = name.lower()
            is_seq = key in ("imu", "audio", "mocap", "accelerometer") or key.startswith("imu_")
        else:
            is_seq = etype == "sequence"
        if not is_seq:
            continue
        cell = cfg.get("encoder_type", "lstm")
        layers = int(cfg.get("num_layers", 2))
        if cell not in ("lstm", "gru"):
            continue
        signatures.add((cell, cfg.get("hidden_dim"), layers))
        candidates.append(name)
    if len(candidates) >= 2 and len(signatures) == 1:
        cell, hidden, layers = next(iter(signatures))
        return candidates, {"encoder_type": cell, "hidden_dim": hidden, "num_layers": layers}
    return [], {}


def stack_group_features(
    features: Mapping[str, jax.Array], names: Sequence[str]
) -> jax.Array:
    """Zero-pad each ``[B,T,D_m]`` to the group D_max and stack to ``[G,B,T,D]``."""
    d_max = max(int(features[n].shape[-1]) for n in names)
    parts = []
    for n in names:
        x = features[n]
        pad = d_max - x.shape[-1]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        parts.append(x)
    return jnp.stack(parts, axis=0)


__all__ = [
    "GroupedRNNEncoder",
    "GroupedTransformerEncoder",
    "groupable_modalities",
    "groupable_transformer_modalities",
    "stack_group_features",
]
