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
    "groupable_modalities",
    "stack_group_features",
]
