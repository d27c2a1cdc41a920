"""Fused HybridFusion head as a single Pallas TPU kernel.

The reference's hybrid head runs M(M-1) = 12 separate CrossModalAttention
modules plus gating and a classifier — ~40 small ops, each a round-trip
through HBM (``src/fusion.py:383-419``). On pooled (length-1) embeddings the
whole head is mathematically:

    att_p      = (e_{k(p)} Wv_p + bv_p) Wo_p + bo_p        per ordered pair p
    att_p      = mask_{k(p)} * att_p + (1-mask_{k(p)}) * bo_p
                 (softmax over ONE key is 1 when available; when masked the
                  zero attention output still picks up the out-proj bias)
    agg_q      = mean(e_q, att_{p: query(p)=q}) * mask_q
    w          = masked-softmax(gate_q . agg_q) with fallback renorm
    logits     = W2 relu(W1 (sum_q w_q agg_q) + b1) + b2

This kernel evaluates ALL of it in one ``pallas_call``: every pair matmul is
a ``[B,H] x [H,H]`` MXU op with weights resident in VMEM, the elementwise
mask/softmax/fallback logic runs on the VPU between them, and only the final
logits leave the chip. Used on the inference/serving path (training uses the
XLA graph, which autodiffs); numerics are validated against the XLA path in
``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masked import adaptive_gate_weights


def _head_kernel(
    num_mod: int,
    pairs: Tuple[Tuple[int, int], ...],
    # refs ------------------------------------------------------------
    e_ref,        # [M, TB, H]   projected embeddings (post relu)
    mask_ref,     # [TB, M]      modality availability
    wv_ref,       # [P, H, H]
    bv_ref,       # [P, H]
    wo_ref,       # [P, H, H]
    bo_ref,       # [P, H]
    wg_ref,       # [M, H]
    bg_ref,       # [1, M]
    w1_ref,       # [H, H]
    b1_ref,       # [1, H]
    w2_ref,       # [H, C]
    b2_ref,       # [1, C]
    out_ref,      # [TB, C]
):
    mask = mask_ref[:]  # [TB, M]
    agg_list = []
    for q in range(num_mod):
        total = e_ref[q]  # self contribution [TB, H]
        for p, (pq, pk) in enumerate(pairs):
            if pq != q:
                continue
            e_k = e_ref[pk]
            bv = bv_ref[p : p + 1, :]  # [1, H]
            bo = bo_ref[p : p + 1, :]
            v = jnp.dot(e_k, wv_ref[p], preferred_element_type=jnp.float32) + bv
            att = jnp.dot(v, wo_ref[p], preferred_element_type=jnp.float32) + bo
            key_mask = mask[:, pk : pk + 1]  # [TB, 1]
            # masked key: attention weight 0 -> out-proj sees zeros -> bias
            att = jnp.where(key_mask > 0, att, bo)
            total = total + att
        agg = total / (1.0 + sum(1 for pq, _ in pairs if pq == q))
        agg = agg * mask[:, q : q + 1]
        agg_list.append(agg)

    # adaptive gate weights: the ONE shared implementation of the
    # masked-softmax + fallback contract (ops/masked.py) traces inside the
    # kernel body — serving cannot silently diverge from training
    score_cols = [
        jnp.sum(agg_list[m] * wg_ref[m : m + 1, :], axis=-1, keepdims=True)
        + bg_ref[0, m]
        for m in range(num_mod)
    ]
    score = jnp.concatenate(score_cols, axis=-1)  # [TB, M]
    weights = adaptive_gate_weights(score, mask, num_mod)

    fused = agg_list[0] * weights[:, 0:1]
    for m in range(1, num_mod):
        fused = fused + agg_list[m] * weights[:, m : m + 1]

    hidden = (
        jnp.dot(fused, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0:1, :]
    )
    hidden = jnp.maximum(hidden, 0.0)
    out_ref[:] = (
        jnp.dot(hidden, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0:1, :]
    )


def fused_hybrid_head(
    projected: jax.Array,  # [M, B, H] post-ReLU projected embeddings
    modality_mask: jax.Array,  # [B, M]
    pair_params: dict,  # {"value_kernel": [P,H,H], "value_bias": [P,H], "out_kernel", "out_bias"}
    gate_kernels: jax.Array,  # [M, H]
    gate_biases: jax.Array,  # [M]
    w1: jax.Array,  # [H, H]
    b1: jax.Array,  # [H]
    w2: jax.Array,  # [H, C]
    b2: jax.Array,  # [C]
    pairs: Sequence[Tuple[int, int]],
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused head. Returns logits ``[B, C]``."""
    num_mod, batch, hidden = projected.shape
    num_classes = w2.shape[-1]
    pairs = tuple(pairs)

    padded = batch
    if batch % block_b:
        padded = (batch // block_b + 1) * block_b
        projected = jnp.pad(projected, ((0, 0), (0, padded - batch), (0, 0)))
        modality_mask = jnp.pad(
            modality_mask, ((0, padded - batch), (0, 0)), constant_values=1.0
        )
    grid = (padded // block_b,)

    kernel = functools.partial(_head_kernel, num_mod, pairs)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (num_mod, block_b, hidden), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_b, num_mod), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wg
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (block_b, num_classes), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, num_classes), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * hidden * hidden * 2 * len(pairs)
            + 2 * padded * hidden * (hidden + num_classes),
            bytes_accessed=projected.size * 4 + len(pairs) * hidden * hidden * 8,
            transcendentals=padded * num_mod,
        ),
    )(
        projected.astype(jnp.float32),
        modality_mask.astype(jnp.float32),
        pair_params["value_kernel"].astype(jnp.float32),
        pair_params["value_bias"].astype(jnp.float32),
        pair_params["out_kernel"].astype(jnp.float32),
        pair_params["out_bias"].astype(jnp.float32),
        gate_kernels.astype(jnp.float32),
        gate_biases.reshape(1, -1).astype(jnp.float32),
        w1.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
    )
    return out[:batch]


def hybrid_head_params_from_variables(variables, modality_names: Sequence[str]):
    """Extract fused-head parameter arrays from a HybridFusion flax tree."""
    params = variables["params"]
    fusion = params["fusion_model"] if "fusion_model" in params else params
    pair_tree = fusion["pairs"]
    pair_params = {
        "value_kernel": pair_tree["value_kernel"],
        "value_bias": pair_tree["value_bias"],
        "out_kernel": pair_tree["out_kernel"],
        "out_bias": pair_tree["out_bias"],
    }
    gate_kernels = jnp.stack(
        [fusion[f"gate_{m}"]["kernel"][:, 0] for m in modality_names], axis=0
    )
    gate_biases = jnp.stack(
        [fusion[f"gate_{m}"]["bias"][0] for m in modality_names], axis=0
    )
    w1 = fusion["classifier_hidden"]["kernel"]
    b1 = fusion["classifier_hidden"]["bias"]
    w2 = fusion["classifier_out"]["kernel"]
    b2 = fusion["classifier_out"]["bias"]
    proj = {
        m: (fusion[f"proj_{m}"]["kernel"], fusion[f"proj_{m}"]["bias"])
        for m in modality_names
    }
    return pair_params, gate_kernels, gate_biases, w1, b1, w2, b2, proj


def hybrid_fused_inference(
    variables,
    encoded: dict,
    modality_mask: jax.Array,
    modality_names: Sequence[str],
    interpret: bool = False,
) -> jax.Array:
    """Full hybrid head from encoder outputs via the fused kernel.

    Equivalent to ``HybridFusion.__call__`` with ``train=False`` (dropout
    off): per-modality projection+ReLU in XLA (cheap, differs per modality
    input dim), then the fused Pallas head.
    """
    from ..models.attention import ordered_pairs

    (
        pair_params, gate_kernels, gate_biases, w1, b1, w2, b2, proj
    ) = hybrid_head_params_from_variables(variables, modality_names)

    mask = modality_mask.astype(jnp.float32)
    projected = []
    for i, m in enumerate(modality_names):
        k, b = proj[m]
        x = encoded[m] * mask[:, i : i + 1]
        projected.append(jnp.maximum(x @ k + b, 0.0))
    stacked = jnp.stack(projected, axis=0)

    pairs = ordered_pairs(modality_names)
    return fused_hybrid_head(
        stacked, mask, pair_params, gate_kernels, gate_biases,
        w1, b1, w2, b2, pairs, interpret=interpret,
    )
