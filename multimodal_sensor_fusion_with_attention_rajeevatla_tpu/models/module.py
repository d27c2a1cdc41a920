"""The flagship model: per-modality encoders + fusion head.

Equivalent of the reference's ``MultimodalFusionModule`` model graph
(``src/train.py:125-291``) as a pure flax module: builds one encoder per
modality from the config (same factory routing), optional per-modality
LayerNorm, then the configured fusion head. Training-loop concerns
(optimizers, checkpoints, logging) live in ``..train.trainer``.

Late fusion's tuple output is normalised here exactly like the reference's
``forward`` (``src/train.py:281-291``): callers always get ``logits`` (plus
aux info when requested).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import FrameEncoder, SequenceEncoder, SimpleMLPEncoder, build_encoder
from .fusion import build_fusion_model
from .grouped import (
    GroupedRNNEncoder,
    GroupedTransformerEncoder,
    groupable_modalities,
    groupable_transformer_modalities,
    stack_group_features,
)
from ..ops.masked import lengths_to_mask


def _parse_backend_flag(value, name: str) -> bool:
    """Parse an auto/bool kernel flag that may arrive as a STRING (dotted CLI
    overrides, env plumbing): "auto" resolves per-backend, everything else
    parses as a bool — ``bool("0")`` would otherwise silently ENABLE the
    kernel the user asked to disable."""
    if isinstance(value, str):
        low = value.lower()
        if low == "auto":
            return jax.default_backend() == "tpu"
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(
            f"Unknown {name} value {value!r}; expected auto/true/false"
        )
    return bool(value)


class MultimodalFusionModel(nn.Module):
    """Encoders + optional LayerNorm + fusion head, config-driven.

    Attributes:
        modalities: ordered modality names.
        encoder_configs: per-modality encoder config dicts (may contain
            ``type``, ``encoder_type``, ``num_layers``, ...).
        fusion_type: 'early' | 'late' | 'hybrid'.
        output_dim: encoder embedding width.
        hidden_dim / num_heads / dropout: fusion head hyperparameters.
        num_classes: logit width (PAMAP2 uses 25 = raw activity-id space).
        layer_norm: per-modality LayerNorm on encoder outputs.
        grouped_encoders: when True (default), modalities with compatible
            single-layer LSTM/GRU sequence encoders are encoded by ONE
            batched scan (see ``grouped.GroupedRNNEncoder``) — the TPU-first
            replacement for running M serial per-modality RNN scans.
    """

    modalities: tuple
    encoder_configs: Any  # Mapping[str, dict]; tuple-of-pairs also accepted
    fusion_type: str = "hybrid"
    output_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 4
    num_classes: int = 25
    dropout: float = 0.1
    layer_norm: bool = True
    grouped_encoders: bool = True
    # Opt-in: encode same-signature per-modality TRANSFORMER stacks as one
    # leading-group-axis pass (grouped.GroupedTransformerEncoder) — every
    # dense layer becomes one G-batched MXU matmul and the group shares one
    # flash-attention launch. Off by default: it changes the checkpoint
    # param tree for transformer models (committed flagship checkpoints
    # store per-modality encoder params).
    grouped_transformer: bool = False
    pallas_rnn: bool = False  # Pallas recurrence kernels (fwd + custom-VJP bwd)
    # End-to-end bf16 computation: encoder/attention/fusion matmuls run in
    # bf16 (params stored f32, softmax/LayerNorm statistics and the final
    # logits in f32); the grouped RNN recurrence additionally switches its
    # scan matmuls to bf16. False = full f32.
    mixed_precision: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else None

    def setup(self):
        configs = {k: dict(v) for k, v in dict(self.encoder_configs).items()}
        if self.mixed_precision:
            for cfg in configs.values():
                cfg.setdefault("dtype", jnp.bfloat16)
        self._grouped_names = []
        # per-modality input dims, needed to zero-fill a MISSING grouped
        # modality with its own feature width (not the template's)
        self._grouped_dims = {
            n: int(configs.get(n, {}).get("input_dim", 64) or 64)
            for n in self.modalities
        }
        if self.grouped_encoders:
            names, shared = groupable_modalities(self.modalities, configs)
            if names:
                self._grouped_names = names
                self.grouped_encoder = GroupedRNNEncoder(
                    num_groups=len(names),
                    hidden_dim=int(shared.get("hidden_dim") or self.hidden_dim),
                    output_dim=self.output_dim,
                    num_layers=int(shared.get("num_layers") or 1),
                    cell_type=shared["encoder_type"],
                    dropout=self.dropout,
                    use_pallas=self.pallas_rnn,
                    mixed_precision=self.mixed_precision,
                    name="grouped_rnn",
                )
        self._grouped_tf_names = []
        if self.grouped_encoders and self.grouped_transformer:
            tf_names, tf_shared = groupable_transformer_modalities(
                self.modalities, configs
            )
            if tf_names:
                self._grouped_tf_names = tf_names
                self.grouped_tf_encoder = GroupedTransformerEncoder(
                    num_groups=len(tf_names),
                    hidden_dim=int(tf_shared.get("hidden_dim") or self.hidden_dim),
                    output_dim=self.output_dim,
                    num_layers=int(tf_shared.get("num_layers") or 2),
                    dropout=self.dropout,
                    use_flash=bool(tf_shared.get("flash_attention", False)),
                    dropout_rng=str(tf_shared.get("dropout_rng") or "auto"),
                    dtype=self.compute_dtype,
                    name="grouped_transformer_enc",
                )
        grouped = set(self._grouped_names) | set(self._grouped_tf_names)
        self.encoders = {
            name: build_encoder(
                modality=name,
                input_dim=int(configs.get(name, {}).get("input_dim", 64) or 64),
                output_dim=self.output_dim,
                encoder_config=dict(configs.get(name, {})),
            )
            for name in self.modalities
            if name not in grouped
        }
        if self.layer_norm:
            self.layer_norms = {
                name: nn.LayerNorm(name=f"ln_{name}") for name in self.modalities
            }
        self.fusion_model = build_fusion_model(
            fusion_type=self.fusion_type,
            modality_dims={name: self.output_dim for name in self.modalities},
            num_classes=self.num_classes,
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.compute_dtype,
        )

    @staticmethod
    def _scale_lengths(
        lengths: Optional[jax.Array], ref_len: Optional[int], this_len: int
    ) -> Optional[jax.Array]:
        """Rescale window valid-lengths between modality time axes.

        ``lengths`` follows the first modality's time axis (``ref_len``).
        Modalities sampled at different rates (e.g. MHAD video 30 fps vs IMU
        50 Hz) cover the same wall-clock span with different step counts, so
        the valid fraction transfers proportionally.
        """
        if lengths is None or ref_len is None:
            return lengths
        if ref_len == this_len:
            return lengths
        scaled = jnp.ceil(
            lengths.astype(jnp.float32) * (this_len / ref_len)
        ).astype(jnp.int32)
        return jnp.clip(scaled, 0, this_len)

    def encode(
        self,
        features: Mapping[str, jax.Array],
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        """Run every available modality through its encoder (+LayerNorm)."""
        encoded: Dict[str, jax.Array] = {}
        ref_len = None
        for name in self.modalities:
            if name in features and features[name].ndim == 3:
                ref_len = int(features[name].shape[1])
                break
        group_specs = []
        if self._grouped_names:
            group_specs.append((self._grouped_names, self.grouped_encoder))
        if self._grouped_tf_names:
            group_specs.append((self._grouped_tf_names, self.grouped_tf_encoder))
        for gnames, gencoder in group_specs:
            grouped_present = [n for n in gnames if n in features]
            if not grouped_present:
                continue
            if len(grouped_present) == len(gnames):
                stacked = stack_group_features(features, grouped_present)
                names_out = grouped_present
            else:
                # partial availability: fall back to a stacked call with the
                # missing members zero-filled at their OWN feature width
                # (their outputs are discarded; zero-filling with the
                # template's width would change the group's d_max and break
                # the packed weights)
                template = features[grouped_present[0]]
                full = {
                    n: features.get(
                        n,
                        jnp.zeros(
                            template.shape[:2] + (self._grouped_dims[n],),
                            template.dtype,
                        ),
                    )
                    for n in gnames
                }
                stacked = stack_group_features(full, gnames)
                names_out = gnames
            # grouped members share one time axis; rescale lengths from the
            # reference timebase like every per-modality encoder call does
            grp_lengths = self._scale_lengths(lengths, ref_len, int(stacked.shape[2]))
            group_out = gencoder(stacked, lengths=grp_lengths, train=train)
            for i, name in enumerate(names_out):
                if name not in features:
                    continue
                emb = group_out[i]
                if self.layer_norm:
                    emb = self.layer_norms[name](emb)
                encoded[name] = emb
        grouped_all = set(self._grouped_names) | set(self._grouped_tf_names)
        for name in self.modalities:
            if name not in features or name in grouped_all:
                continue
            encoder = self.encoders[name]
            x = features[name]
            mod_lengths = (
                self._scale_lengths(lengths, ref_len, int(x.shape[1]))
                if x.ndim == 3
                else lengths
            )
            if isinstance(encoder, SequenceEncoder):
                emb = encoder(x, lengths=mod_lengths, train=train)
            elif isinstance(encoder, FrameEncoder):
                frame_mask = (
                    lengths_to_mask(mod_lengths, x.shape[1])
                    if mod_lengths is not None
                    else None
                )
                emb = encoder(x, mask=frame_mask, train=train)
            elif isinstance(encoder, SimpleMLPEncoder):
                emb = encoder(x, train=train)
            else:  # pragma: no cover - custom encoder plug-ins
                emb = encoder(x, train=train)
            if self.layer_norm:
                emb = self.layer_norms[name](emb)
            encoded[name] = emb
        return encoded

    def fuse(
        self,
        encoded: Mapping[str, jax.Array],
        mask: Optional[jax.Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        """Fusion head over pre-encoded embeddings, with tuple normalisation."""
        if return_attention:
            if self.fusion_type != "hybrid":
                raise ValueError(
                    "Attention information is only available for HybridFusion."
                )
            output = self.fusion_model(
                encoded, mask, train=train, return_attention=True
            )
        else:
            output = self.fusion_model(encoded, mask, train=train)
        if isinstance(output, tuple):
            logits, aux = output[0], (output[1] if len(output) > 1 else None)
        else:
            logits, aux = output, None
        if self.mixed_precision:
            # losses/softmax/metrics always see f32 logits
            logits = logits.astype(jnp.float32)
        if return_attention:
            return logits, aux
        return logits

    def __call__(
        self,
        features: Mapping[str, jax.Array],
        mask: Optional[jax.Array] = None,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        encoded = self.encode(features, lengths=lengths, train=train)
        return self.fuse(
            encoded, mask=mask, train=train, return_attention=return_attention
        )

    @classmethod
    def from_config(cls, config) -> "MultimodalFusionModel":
        """Build from the YAML config tree (same keys as the reference)."""
        model_cfg = config.model
        dataset_cfg = config.dataset
        modalities = tuple(dataset_cfg.modalities)
        flash = _parse_backend_flag(
            model_cfg.get("flash_attention", "auto"), "flash_attention"
        )
        fused_mlp = _parse_backend_flag(
            model_cfg.get("fused_mlp", "auto"), "fused_mlp"
        )
        fused_mlp_ln = _parse_backend_flag(
            model_cfg.get("fused_mlp_ln", "auto"), "fused_mlp_ln"
        )
        par_cfg = config.get("parallel", {}) or {}
        seq_par = bool(par_cfg.get("sequence_parallel", False))
        pipe_par = int(par_cfg.get("pipeline_parallel", 1) or 1)
        pipe_micro = int(par_cfg.get("microbatches", 0) or 0)
        # training.dropout_rng: auto (default: HW-PRNG generator kernel on a
        # real TPU, threefry elsewhere — +25% measured train throughput,
        # deterministic per seed on a given hardware/compiler generation) |
        # kernel | xla (threefry bernoulli masks — bit-reproducible across
        # backends AND versions; pick this when exact cross-machine replay
        # matters). See ops/pallas_mlp.py::dropout_keep_mask. Resolution of
        # "auto" happens INSIDE the encoder layer off the same interpret
        # flag as the other kernels, so hermetic CPU paths never touch the
        # default backend.
        train_cfg = config.get("training", {}) or {}
        dropout_rng = str(train_cfg.get("dropout_rng", "auto") or "auto").lower()
        if dropout_rng not in ("auto", "xla", "kernel"):
            raise ValueError(
                f"Unknown training.dropout_rng {dropout_rng!r}; "
                "expected auto, xla or kernel"
            )
        enc_cfgs = {}
        all_encoder_cfg = model_cfg.get("encoders", {}) or {}
        for name in modalities:
            raw = all_encoder_cfg.get(name, {}) or {}
            cfg = dict(raw.items()) if hasattr(raw, "items") else dict(raw)
            cfg.setdefault("dropout", float(model_cfg.get("dropout", 0.1)))
            if "hidden_dim" not in cfg:
                cfg["hidden_dim"] = int(model_cfg.get("hidden_dim", 256))
            if cfg.get("encoder_type") == "transformer":
                cfg.setdefault("flash_attention", bool(flash))
                cfg.setdefault("fused_mlp", bool(fused_mlp))
                cfg.setdefault("fused_mlp_ln", bool(fused_mlp_ln))
                cfg.setdefault("dropout_rng", dropout_rng)
                # parallel.sequence_parallel: Megatron sequence parallelism
                # in the transformer layers — only meaningful when the
                # Trainer also runs a model_parallel mesh (the constraints
                # are no-ops without an active "model" axis)
                cfg.setdefault("sequence_parallel", seq_par)
                # model.moe_experts > 0: Mixture-of-Experts feed-forward
                # with expert weights sharded over the "model" mesh axis
                # (expert parallelism; models/moe.py)
                cfg.setdefault("moe_experts", int(model_cfg.get("moe_experts", 0) or 0))
                cfg.setdefault("moe_top_k", int(model_cfg.get("moe_top_k", 2) or 2))
                cfg.setdefault(
                    "moe_capacity_factor",
                    float(model_cfg.get("moe_capacity_factor", 1.25) or 1.25),
                )
                # parallel.pipeline_parallel: GPipe microbatch pipelining of
                # the layer stack over the "pipe" mesh axis
                # (parallel/pipeline.py)
                cfg.setdefault("pipeline_parallel", pipe_par)
                cfg.setdefault("pipeline_microbatches", pipe_micro)
            enc_cfgs[name] = cfg
        pallas_rnn = _parse_backend_flag(
            model_cfg.get("pallas_rnn", False), "pallas_rnn"
        )
        return cls(
            modalities=modalities,
            encoder_configs=tuple(sorted((k, tuple(sorted(v.items()))) for k, v in enc_cfgs.items())),
            fusion_type=str(model_cfg.get("fusion_type", "hybrid")),
            output_dim=int(model_cfg.get("output_dim", 128)),
            hidden_dim=int(model_cfg.get("hidden_dim", 256)),
            num_heads=int(model_cfg.get("num_heads", 4)),
            num_classes=int(dataset_cfg.get("num_classes", 11)),
            dropout=float(model_cfg.get("dropout", 0.1)),
            # default MUST match the class attribute default (True): the same
            # config dict must build the same param tree through either
            # construction path, or checkpoints fail to restore
            layer_norm=bool(model_cfg.get("layer_norm", True)),
            grouped_encoders=bool(model_cfg.get("grouped_encoders", True)),
            grouped_transformer=bool(model_cfg.get("grouped_transformer", False)),
            pallas_rnn=bool(pallas_rnn),
            mixed_precision=bool(config.get("mixed_precision", False)),
        )
