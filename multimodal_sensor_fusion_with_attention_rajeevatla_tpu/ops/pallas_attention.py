"""Flash (tiled, online-softmax) self-attention — forward AND backward kernels.

The reference's transformer sequence encoder and TemporalAttention are vanilla
O(T^2) attention (``src/encoders.py:99-111``, ``src/attention.py:149-251``) —
at chunk_size 1024-2048 the ``[B, heads, T, T]`` score tensor dominates
memory. These kernels compute attention block-by-block with the
online-softmax recurrence, so scores never materialise beyond a
``[block_q, block_k]`` tile in VMEM:

- FORWARD: grid = (batch*heads, T/block_q, T/block_k) with the key axis
  innermost; m/l/acc statistics live in VMEM scratch across key blocks (TPU
  grids are sequential, scratch persists). Additionally emits the row
  log-sum-exp ``lse = m + log(l)`` — the only residual the backward needs
  beyond q/k/v/out (FlashAttention-2 style).
- BACKWARD: two kernels sharing the recomputed ``p = exp(s - lse)`` tile.
  dK/dV walk (bh, k-block, q-block) accumulating ``p^T dO`` and ``ds^T q`` in
  VMEM scratch; dQ walks (bh, q-block, k-block) accumulating ``ds k``. The
  softmax-Jacobian term uses ``delta = rowsum(dO * out)``, computed as one
  fused XLA reduction outside the kernels.
- key-padding masks from per-row valid lengths (the data pipeline's padded
  windows) fold into every score tile; fully-masked query rows produce
  EXACTLY zero output and zero gradients (the framework's all-masked -> zeros
  contract, same as ``ops.masked.masked_softmax``).

The custom VJP makes the transformer encoders train through these kernels
(the shipping PAMAP2 default); gradient equivalence vs ``jax.grad`` of the
XLA attention path is pinned in ``tests/test_pallas.py``. Precision note: the
in-kernel dots run at the backend's default matmul precision (bf16 multiplies
on TPU), matching the XLA attention path's own default — outputs agree to
~1e-3 at DEFAULT precision and to ~1e-6 under
``jax.default_matmul_precision('highest')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _env_int(name: str, default: int) -> int:
    import os

    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


# Shape-routing thresholds for the single-block specializations (the
# online-softmax-free forward and the fused one-kernel backward). The
# single-tile kernels generalize beyond T=512 — a [block_q, T] score tile
# still fits VMEM at T=1024/2048 — and the extensions were measured on the
# real chip (round 5, paired same-session A/B at the bench operating
# point, report/bench.jsonl; numerics probe scripts/onchip_flash_probe.py
# fwd ≤3.0e-3 / grads ≤5.1e-3 rel vs XLA, deterministic):
#   chunk 1024: fwd 3,589 → 4,495 w/s (+25%), train 911 → 1,072 (+18%)
#               (single-k forward + fused backward, both engaged)
#   chunk 2048: fwd 1,220 → 1,577 w/s (+29%), train 317 → 345 (+9%)
#               (single-k forward; the fused backward's [T, T] f32 tiles
#               were only probe-validated up to T=1024, so its default
#               stays there)
# Env knobs still override for sweeps:
#   MSFA_FLASH_SINGLE_K_MAX  — engage the single-kblock forward while
#                              padded_len <= this (whole key axis one tile)
#   MSFA_FLASH_SINGLE_K_BQ   — query-block rows for that kernel
#   MSFA_FLASH_FUSED_BWD_MAX — engage the fused backward while
#                              padded_len <= this ([T, T] tiles in VMEM)
def _single_k_max() -> int:
    return _env_int("MSFA_FLASH_SINGLE_K_MAX", 2048)


def _fused_bwd_max() -> int:
    return _env_int("MSFA_FLASH_FUSED_BWD_MAX", 1024)


def _bf16_exp() -> bool:
    """Run the single-block kernels' exp/softmax chain in bf16 (the VPU-
    bound part the round-4 roofline named as the remaining headroom).
    Experimental env knob for on-chip A/B — f32 unless set."""
    return _env_int("MSFA_FLASH_BF16_EXP", 0) == 1


def _flash_kernel(
    q_ref,    # VMEM [1, block_q, d]
    k_ref,    # VMEM [1, block_k, d]
    v_ref,    # VMEM [1, block_k, d]
    len_ref,  # VMEM [BH, 1] int32 valid key length per (batch*head) row
    o_ref,    # VMEM [1, block_q, d]
    lse_ref,  # VMEM out [1, block_q, 1] row log-sum-exp (trailing singleton
              # keeps the TPU block layout legal: sublane dim = block_q)
    m_ref,    # scratch VMEM [block_q, 1]
    l_ref,    # scratch VMEM [block_q, 1]
    acc_ref,  # scratch VMEM [block_q, d]
    *,
    block_q: int,
    block_k: int,
    sm_scale: float,
    cast_bf16: bool,
):
    bh = pl.program_id(0)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(cd)  # [block_q, d]
    k = k_ref[0].astype(cd)  # [block_k, d]
    # bf16 dot inputs on real TPU (f32 accumulate): matches the XLA path's
    # DEFAULT matmul precision; an uncast f32 Mosaic dot runs multi-pass
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [block_q, block_k]

    valid_len = len_ref[bh, 0]
    col_ids = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    scores = jnp.where(col_ids < valid_len, scores, NEG_INF)

    m_prev = m_ref[:]  # [block_q, 1]
    block_max = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, block_max)
    # all-masked rows keep m at NEG_INF; clamp the exp argument instead of
    # letting (-inf) - (-inf) produce NaN
    p = jnp.exp(scores - m_new)
    p = jnp.where(col_ids < valid_len, p, 0.0)
    correction = jnp.exp(jnp.clip(m_prev - m_new, None, 0.0))
    correction = jnp.where(m_prev <= NEG_INF, 0.0, correction)

    l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(cd), v_ref[0].astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kb == num_kb - 1)
    def _emit():
        l = l_ref[:]
        # fully-masked query rows: l == 0 -> exactly zero output, lse NEG_INF
        o_ref[0] = jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)
        lse = jnp.where(
            l > 0, m_ref[:] + jnp.log(jnp.where(l > 0, l, 1.0)), NEG_INF
        )
        lse_ref[0] = lse  # [block_q, 1]


def _fwd_single_kblock_kernel(
    q_ref,    # VMEM [1, block_q, d]
    k_ref,    # VMEM [1, T, d]
    v_ref,    # VMEM [1, T, d]
    len_ref,  # VMEM [BH, 1] int32
    o_ref,    # VMEM [1, block_q, d]
    lse_ref,  # VMEM out [1, block_q, 1]
    *,
    sm_scale: float,
    cast_bf16: bool,
):
    """Forward with the whole key axis in one tile (T <= block_k).

    The online-softmax machinery of ``_flash_kernel`` (running max carry,
    correction exp, accumulator rescale, scratch traffic) exists to merge
    key blocks; with exactly one key block every correction is a
    multiply-by-one. This specialization drops it: one max, one exp, one
    normalize — same math, fewer VPU ops per score element at the shipping
    PAMAP2 shapes (T=512 <= block 512)."""
    bh = pl.program_id(0)
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32

    q = q_ref[0].astype(cd)  # [block_q, d]
    k = k_ref[0].astype(cd)  # [T, d]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [block_q, T]

    valid_len = len_ref[bh, 0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col_ids < valid_len, scores, NEG_INF)

    m = jnp.max(scores, axis=1, keepdims=True)  # [block_q, 1]
    # fully-masked rows: m == NEG_INF; clamp the exp argument, zero p
    arg = scores - jnp.maximum(m, NEG_INF / 2)
    if cast_bf16 and _bf16_exp():
        # bf16 exp chain: halves the VPU element traffic of the softmax
        # and feeds the dot directly (no separate p cast pass). The row
        # sum still accumulates in f32.
        p = jnp.exp(arg.astype(jnp.bfloat16))
        p = jnp.where(col_ids < valid_len, p, jnp.bfloat16(0))
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    else:
        p = jnp.exp(arg)
        p = jnp.where(col_ids < valid_len, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)

    acc = jax.lax.dot_general(
        p.astype(cd), v_ref[0].astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0)
    lse_ref[0] = jnp.where(l > 0, m + jnp.log(jnp.where(l > 0, l, 1.0)), NEG_INF)


def _flash_forward(qf, kf, vf, len_bh, *, block_q, block_k, sm_scale, interpret):
    """Padded/flattened forward: ``[BH, T, d]`` -> (out, lse ``[BH, T]``)."""
    # float lengths cross the custom-VJP boundary (a well-typed zero
    # cotangent slot); the kernels compare against int32
    len_bh = len_bh.astype(jnp.int32)
    bh, padded_len, d = qf.shape
    if not interpret:
        # pre-cast ONCE: in-kernel astype re-runs per grid step, and bf16
        # streams halve the q/k/v HBM traffic
        qf = qf.astype(jnp.bfloat16)
        kf = kf.astype(jnp.bfloat16)
        vf = vf.astype(jnp.bfloat16)

    if padded_len <= max(block_k, _single_k_max()):
        # one key block -> online-softmax-free specialization (no scratch)
        kv_spec = pl.BlockSpec(
            (1, padded_len, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        bq = min(block_q, padded_len, _env_int("MSFA_FLASH_SINGLE_K_BQ", 512))
        while padded_len % bq:
            bq //= 2
        out, lse = pl.pallas_call(
            functools.partial(
                _fwd_single_kblock_kernel,
                sm_scale=sm_scale, cast_bf16=not interpret,
            ),
            grid=(bh, padded_len // bq),
            in_specs=[
                pl.BlockSpec(
                    (1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                kv_spec,
                kv_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
                jax.ShapeDtypeStruct((bh, padded_len, 1), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * padded_len * padded_len * d,
                bytes_accessed=3 * qf.size * 4 + qf.size * 4,
                transcendentals=bh * padded_len * padded_len,
            ),
        )(qf, kf, vf, len_bh)
        return out, lse

    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale,
        cast_bf16=not interpret,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, padded_len // block_q, padded_len // block_k),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, padded_len, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * padded_len * padded_len * d,
            bytes_accessed=3 * qf.size * 4 + qf.size * 4,
            transcendentals=bh * padded_len * padded_len,
        ),
    )(qf, kf, vf, len_bh)
    return out, lse


def _dkv_kernel(
    q_ref,      # VMEM [1, block_q, d]
    k_ref,      # VMEM [1, block_k, d]
    v_ref,      # VMEM [1, block_k, d]
    do_ref,     # VMEM [1, block_q, d]
    lse_ref,    # VMEM [1, block_q, 1]
    delta_ref,  # VMEM [1, block_q, 1]
    len_ref,    # VMEM [BH, 1] int32
    dk_ref,     # VMEM out [1, block_k, d]
    dv_ref,     # VMEM out [1, block_k, d]
    dk_acc,     # scratch VMEM [block_k, d]
    dv_acc,     # scratch VMEM [block_k, d]
    *,
    block_q: int,
    block_k: int,
    sm_scale: float,
    cast_bf16: bool,
):
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(cd)   # [block_q, d]
    k = k_ref[0].astype(cd)   # [block_k, d]
    do = do_ref[0]            # [block_q, d]
    lse = lse_ref[0]          # [block_q, 1]
    delta = delta_ref[0]      # [block_q, 1]
    valid_len = len_ref[bh, 0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [block_q, block_k]
    col_ids = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    # p = exp(s - lse); masked columns and fully-masked rows (lse == NEG_INF)
    # contribute exactly zero
    p = jnp.exp(scores - jnp.maximum(lse, NEG_INF / 2))
    p = jnp.where((col_ids < valid_len) & (lse > NEG_INF / 2), p, 0.0)

    # dV += p^T dO
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(cd), do.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = dO v^T ; ds = p * (dp - delta) * scale
    dp = jax.lax.dot_general(
        do.astype(cd), v_ref[0].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * sm_scale
    # dK += ds^T q
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(cd), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qb == num_qb - 1)
    def _emit():
        dk_ref[0] = dk_acc[:]
        dv_ref[0] = dv_acc[:]


def _dq_kernel(
    q_ref,      # VMEM [1, block_q, d]
    k_ref,      # VMEM [1, block_k, d]
    v_ref,      # VMEM [1, block_k, d]
    do_ref,     # VMEM [1, block_q, d]
    lse_ref,    # VMEM [1, block_q, 1]
    delta_ref,  # VMEM [1, block_q, 1]
    len_ref,    # VMEM [BH, 1] int32
    dq_ref,     # VMEM out [1, block_q, d]
    dq_acc,     # scratch VMEM [block_q, d]
    *,
    block_q: int,
    block_k: int,
    sm_scale: float,
    cast_bf16: bool,
):
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(cd)
    k = k_ref[0].astype(cd)
    do = do_ref[0]
    lse = lse_ref[0]      # [block_q, 1]
    delta = delta_ref[0]  # [block_q, 1]
    valid_len = len_ref[bh, 0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    col_ids = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    p = jnp.exp(scores - jnp.maximum(lse, NEG_INF / 2))
    p = jnp.where((col_ids < valid_len) & (lse > NEG_INF / 2), p, 0.0)

    dp = jax.lax.dot_general(
        do.astype(cd), v_ref[0].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * sm_scale
    # dQ += ds k
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(cd), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == num_kb - 1)
    def _emit():
        dq_ref[0] = dq_acc[:]


def _bwd_fused_kernel(
    q_ref,      # VMEM [1, T, d]
    k_ref,      # VMEM [1, T, d]
    v_ref,      # VMEM [1, T, d]
    do_ref,     # VMEM [1, T, d]
    lse_ref,    # VMEM [1, T, 1]
    delta_ref,  # VMEM [1, T, 1]
    len_ref,    # VMEM [BH, 1] int32
    dq_ref,     # VMEM out [1, T, d]
    dk_ref,     # VMEM out [1, T, d]
    dv_ref,     # VMEM out [1, T, d]
    *,
    sm_scale: float,
    cast_bf16: bool,
):
    """Single-block fused backward: dq + dk + dv in ONE kernel.

    When the whole sequence fits in one [block_q, block_k] tile (the
    shipping PAMAP2 default: T=512 <= block 512), the split dkv/dq kernels
    each recompute the full scores->exp->mask->ds chain and duplicate the
    dO.V^T dot — 8 [T,T,d] dots and 2 exp chains per (batch*head) element.
    Fusing computes the chain once and 5 dots, cutting both the VPU
    (softmax-chain) and MXU work of the backward pass, which the round-4
    train-path profile names as the top device op (docs/notes.md)."""
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32
    bh = pl.program_id(0)

    q = q_ref[0].astype(cd)   # [T, d]
    k = k_ref[0].astype(cd)   # [T, d]
    do = do_ref[0]            # [T, d]
    lse = lse_ref[0]          # [T, 1]
    delta = delta_ref[0]      # [T, 1]
    valid_len = len_ref[bh, 0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [T, T]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    arg = scores - jnp.maximum(lse, NEG_INF / 2)
    keep = (col_ids < valid_len) & (lse > NEG_INF / 2)
    bf16_chain = cast_bf16 and _bf16_exp()
    if bf16_chain:
        # bf16 exp/ds chain: the [T, T] elementwise softmax-Jacobian work
        # (exp, select, p*(dp-delta)*scale) runs on bf16 vectors and feeds
        # the three dots directly with no separate cast passes
        p = jnp.where(keep, jnp.exp(arg.astype(jnp.bfloat16)), jnp.bfloat16(0))
    else:
        p = jnp.where(keep, jnp.exp(arg), 0.0)

    doc = do.astype(cd)
    # dV = p^T dO
    dv_ref[0] = jax.lax.dot_general(
        p.astype(cd), doc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = dO v^T ; ds = p * (dp - delta) * scale  (computed ONCE here,
    # where the split path computes it in both kernels)
    dp = jax.lax.dot_general(
        doc, v_ref[0].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bf16_chain:
        ds = p * (((dp - delta) * sm_scale).astype(jnp.bfloat16))
    else:
        ds = (p * (dp - delta) * sm_scale).astype(cd)
    # dK = ds^T q ; dQ = ds k
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _flash_backward(
    qf, kf, vf, len_bh, out, lse, dof, *, block_q, block_k, sm_scale, interpret
):
    len_bh = len_bh.astype(jnp.int32)
    bh, padded_len, d = qf.shape
    # softmax-Jacobian row term, one fused XLA reduction (f32, before the
    # bf16 pre-cast below)
    delta = jnp.sum(dof * out, axis=-1, keepdims=True)  # [BH, T, 1]
    if not interpret:
        qf = qf.astype(jnp.bfloat16)
        kf = kf.astype(jnp.bfloat16)
        vf = vf.astype(jnp.bfloat16)
        dof = dof.astype(jnp.bfloat16)

    if padded_len <= max(min(block_q, block_k), _fused_bwd_max()):
        # single tile in both axes -> the fused one-kernel backward
        full_spec = pl.BlockSpec(
            (1, padded_len, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        row_spec = pl.BlockSpec(
            (1, padded_len, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        fused_kernel = functools.partial(
            _bwd_fused_kernel, sm_scale=sm_scale, cast_bf16=not interpret
        )
        dq, dk, dv = pl.pallas_call(
            fused_kernel,
            grid=(bh,),
            in_specs=[
                full_spec, full_spec, full_spec, full_spec,
                row_spec, row_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(full_spec, full_spec, full_spec),
            out_shape=(
                jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
                jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
                jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=10 * bh * padded_len * padded_len * d,
                bytes_accessed=7 * qf.size * 4,
                transcendentals=bh * padded_len * padded_len,
            ),
        )(qf, kf, vf, dof, lse, delta, len_bh)
        return dq, dk, dv

    q_spec_kq = pl.BlockSpec(
        (1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    k_spec_kq = pl.BlockSpec(
        (1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM
    )
    row_spec_kq = pl.BlockSpec(
        (1, block_q, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    dkv_kernel = functools.partial(
        _dkv_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale,
        cast_bf16=not interpret,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, padded_len // block_k, padded_len // block_q),
        in_specs=[
            q_spec_kq,
            k_spec_kq,
            k_spec_kq,
            q_spec_kq,
            row_spec_kq,
            row_spec_kq,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * padded_len * padded_len * d,
            bytes_accessed=6 * qf.size * 4,
            transcendentals=bh * padded_len * padded_len,
        ),
    )(qf, kf, vf, dof, lse, delta, len_bh)

    q_spec_qk = pl.BlockSpec(
        (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    k_spec_qk = pl.BlockSpec(
        (1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    row_spec_qk = pl.BlockSpec(
        (1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    dq_kernel = functools.partial(
        _dq_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale,
        cast_bf16=not interpret,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, padded_len // block_q, padded_len // block_k),
        in_specs=[
            q_spec_qk,
            k_spec_qk,
            k_spec_qk,
            q_spec_qk,
            row_spec_qk,
            row_spec_qk,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((bh, padded_len, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * padded_len * padded_len * d,
            bytes_accessed=5 * qf.size * 4,
            transcendentals=bh * padded_len * padded_len,
        ),
    )(qf, kf, vf, dof, lse, delta, len_bh)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(config, qf, kf, vf, len_bh):
    block_q, block_k, sm_scale, interpret = config
    out, _lse = _flash_forward(
        qf, kf, vf, len_bh,
        block_q=block_q, block_k=block_k, sm_scale=sm_scale, interpret=interpret,
    )
    return out


def _flash_core_fwd(config, qf, kf, vf, len_bh):
    block_q, block_k, sm_scale, interpret = config
    out, lse = _flash_forward(
        qf, kf, vf, len_bh,
        block_q=block_q, block_k=block_k, sm_scale=sm_scale, interpret=interpret,
    )
    return out, (qf, kf, vf, len_bh, out, lse)


def _flash_core_bwd(config, res, dout):
    block_q, block_k, sm_scale, interpret = config
    qf, kf, vf, len_bh, out, lse = res
    dq, dk, dv = _flash_backward(
        qf, kf, vf, len_bh, out, lse, dout.astype(jnp.float32),
        block_q=block_q, block_k=block_k, sm_scale=sm_scale, interpret=interpret,
    )
    # cotangent dtypes must match the primals (bf16 streams on TPU)
    return (
        dq.astype(qf.dtype),
        dk.astype(kf.dtype),
        dv.astype(vf.dtype),
        jnp.zeros_like(len_bh),
    )


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_self_attention(
    q: jax.Array,  # [B, H, T, d]
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array | None = None,  # [B] valid timesteps (keys+queries)
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Tiled attention; returns ``[B, H, T, d]``. Scores never hit HBM.

    Differentiable: gradients w.r.t. q/k/v run through the Pallas backward
    kernels (custom VJP) — the transformer encoders train through this.

    Default blocks 512x512 from a measured v5e sweep (B=32, H=4, d=64,
    grad-call incl. fwd+bwd): vs the XLA O(T^2) path 1.30x at T=512,
    1.74x at T=1024, 2.57x at T=2048; block 128 was uniformly worse
    (grid overhead dominates at these head dims).
    """
    batch, heads, seq_len, d = q.shape
    if sm_scale is None:
        sm_scale = d**-0.5
    block_q = min(block_q, seq_len)
    block_k = min(block_k, seq_len)
    pad = 0
    if seq_len % block_q or seq_len % block_k:
        target = max(block_q, block_k)
        padded = ((seq_len + target - 1) // target) * target
        pad = padded - seq_len
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    padded_len = q.shape[2]

    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    len_bh = (
        jnp.repeat(lengths, heads).reshape(batch * heads, 1).astype(jnp.float32)
    )
    len_bh = jax.lax.stop_gradient(len_bh)

    # On a real TPU the kernels consume bf16 streams, so KEEP a caller's
    # bf16 q/k/v instead of round-tripping through f32: the caller can then
    # cast BEFORE its [B, T, H, d] -> [B, H, T, d] transpose, halving that
    # HBM copy (profiled at ~2.2 ms/step of pure reshape traffic at the
    # flagship point) and halving the custom-VJP residual storage. The
    # interpret (off-TPU test) path pins f32 as before.
    cd = jnp.float32 if interpret else None
    qf = q.reshape(batch * heads, padded_len, d)
    kf = k.reshape(batch * heads, padded_len, d)
    vf = v.reshape(batch * heads, padded_len, d)
    if cd is not None or qf.dtype not in (jnp.float32, jnp.bfloat16):
        qf = qf.astype(cd or jnp.float32)
        kf = kf.astype(cd or jnp.float32)
        vf = vf.astype(cd or jnp.float32)

    config = (block_q, block_k, float(sm_scale), bool(interpret))
    out = _flash_core(config, qf, kf, vf, len_bh)
    out = out.reshape(batch, heads, padded_len, d)
    if pad:
        out = out[:, :, :seq_len]
    return out


# ---------------------------------------------------------------------------
# Packed-layout (transpose-free) single-block path
#
# The [B, T, H, d] -> [B, H, T, d] relayout feeding the kernels above is pure
# HBM glue: at the flagship point the round-5 HEAD profile attributes ~25% of
# train-step device time to the convert/transpose/slice ops AROUND the
# attention custom-calls (standalone f32->bf16 converts ~90us each, reshape
# relayouts, dq/dk/dv converts + transposes on the way back), while the
# kernels themselves run near their compute bounds. These kernels instead
# consume the qkv projection's NATURAL output layout — one [B, T, 3*H*d]
# array, heads packed along the minor dim — and loop over heads inside the
# kernel with static column slices. Nothing is transposed, converted, or
# concatenated outside: bf16 casting happens in-kernel (each element visited
# once — grid is (B,)), `delta = rowsum(dO*out)` moves in-kernel, and the
# backward emits the packed dqkv cotangent directly. The per-head dot shapes
# ([T, d] operands, [T, T] score tile) are identical to the proven
# single-block kernels above; only the data movement changes. Mosaic's
# last-two-dims block rule rejected the (1, bq, 1, d) 4-D block probe
# (round 4); the [T, 3*H*d] block satisfies it.
# ---------------------------------------------------------------------------


def _packed_max() -> int:
    return _env_int("MSFA_FLASH_PACKED_MAX", 512)


def packed_route_ok(seq_len: int, num_heads: int, head_dim: int) -> bool:
    """True when the packed transpose-free kernels should take this shape."""
    if _env_int("MSFA_FLASH_PACKED", 1) != 1:
        return False
    # single-block kernels: the whole (padded) sequence is one tile
    padded = ((seq_len + 7) // 8) * 8
    return padded <= _packed_max()


def _packed_fwd_kernel(
    qkv_ref,  # VMEM [1, T, 3*H*d]
    len_ref,  # VMEM [B, 1] f32 valid key length per batch row
    o_ref,    # VMEM out [1, T, H*d]
    lse_ref,  # VMEM out [1, T, H]
    *,
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    cast_bf16: bool,
):
    b = pl.program_id(0)
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32
    feat = num_heads * head_dim

    tile = qkv_ref[0]  # [T, 3F] — one load, cast once per element
    seq = tile.shape[0]
    # fold sm_scale into q on the [T, F] operand (exact for power-of-two
    # scales, e.g. d=64) instead of multiplying every [T, T] score tile
    qs = (tile[:, :feat] * sm_scale).astype(cd)
    kt = tile[:, feat : 2 * feat].astype(cd)
    vt = tile[:, 2 * feat :].astype(cd)

    valid_len = len_ref[b, 0].astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
    colmask = col_ids < valid_len

    outs, lses = [], []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        scores = jax.lax.dot_general(
            qs[:, sl], kt[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, T]
        scores = jnp.where(colmask, scores, NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        arg = scores - jnp.maximum(m, NEG_INF / 2)
        p = jnp.exp(arg)
        p = jnp.where(colmask, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(cd), vt[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(jnp.where(l > 0, acc / jnp.where(l > 0, l, 1.0), 0.0))
        lses.append(
            jnp.where(l > 0, m + jnp.log(jnp.where(l > 0, l, 1.0)), NEG_INF)
        )
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_ref[0] = jnp.concatenate(lses, axis=1)


def _packed_bwd_kernel(
    qkv_ref,  # VMEM [1, T, 3*H*d]
    out_ref,  # VMEM [1, T, H*d]
    do_ref,   # VMEM [1, T, H*d]
    lse_ref,  # VMEM [1, T, H]
    len_ref,  # VMEM [B, 1] f32
    dqkv_ref,  # VMEM out [1, T, 3*H*d]
    *,
    num_heads: int,
    head_dim: int,
    sm_scale: float,
    cast_bf16: bool,
):
    b = pl.program_id(0)
    cd = jnp.bfloat16 if cast_bf16 else jnp.float32
    feat = num_heads * head_dim

    tile = qkv_ref[0]  # [T, 3F]
    seq = tile.shape[0]
    qs = (tile[:, :feat] * sm_scale).astype(cd)  # scale folded, as in fwd
    kt = tile[:, feat : 2 * feat].astype(cd)
    vt = tile[:, 2 * feat :].astype(cd)
    out = out_ref[0]          # [T, F] f32
    do = do_ref[0]            # [T, F] f32
    doc = do.astype(cd)
    lse_all = lse_ref[0]      # [T, H] f32

    valid_len = len_ref[b, 0].astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)

    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        lse = lse_all[:, h : h + 1]  # [T, 1]
        scores = jax.lax.dot_general(
            qs[:, sl], kt[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, T] — already sm_scale-scaled via qs
        keep = (col_ids < valid_len) & (lse > NEG_INF / 2)
        p = jnp.where(keep, jnp.exp(scores - jnp.maximum(lse, NEG_INF / 2)), 0.0)
        # softmax-Jacobian row term, in-kernel (the transpose path computes
        # it as a separate XLA reduction over the [BH, T, d] layout)
        delta = jnp.sum(do[:, sl] * out[:, sl], axis=1, keepdims=True)  # [T,1]
        pb = p.astype(cd)
        dvs.append(
            jax.lax.dot_general(
                pb, doc[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dp = jax.lax.dot_general(
            doc[:, sl], vt[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ds0 = p * (dp - delta): sm_scale is NOT applied to the [T, T]
        # tile — dk uses the pre-scaled qs (exact), dq post-scales on [T, d]
        ds0 = (p * (dp - delta)).astype(cd)
        dks.append(
            jax.lax.dot_general(
                ds0, qs[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dqs.append(
            jax.lax.dot_general(
                ds0, kt[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
    dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=1).astype(dqkv_ref.dtype)


def _packed_forward(qkv, len_b, *, num_heads, head_dim, sm_scale, interpret):
    batch, padded_len, three_f = qkv.shape
    feat = three_f // 3
    full = pl.BlockSpec(
        (1, padded_len, three_f), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, padded_len, feat), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, padded_len, num_heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _packed_fwd_kernel,
            num_heads=num_heads, head_dim=head_dim,
            sm_scale=sm_scale, cast_bf16=not interpret,
        ),
        grid=(batch,),
        in_specs=[full, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(out_spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, padded_len, feat), jnp.float32),
            jax.ShapeDtypeStruct((batch, padded_len, num_heads), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * padded_len * padded_len * head_dim,
            bytes_accessed=qkv.size * 4 + batch * padded_len * feat * 4,
            transcendentals=batch * num_heads * padded_len * padded_len,
        ),
    )(qkv, len_b)
    return out, lse


def _packed_backward(
    qkv, len_b, out, lse, dout, *, num_heads, head_dim, sm_scale, interpret
):
    batch, padded_len, three_f = qkv.shape
    feat = three_f // 3
    full = pl.BlockSpec(
        (1, padded_len, three_f), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (1, padded_len, feat), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, padded_len, num_heads), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel,
            num_heads=num_heads, head_dim=head_dim,
            sm_scale=sm_scale, cast_bf16=not interpret,
        ),
        grid=(batch,),
        in_specs=[
            full, f_spec, f_spec, lse_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((batch, padded_len, three_f), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * batch * num_heads * padded_len * padded_len * head_dim,
            bytes_accessed=qkv.size * 8,
            transcendentals=batch * num_heads * padded_len * padded_len,
        ),
    )(qkv, out, dout, lse, len_b)
    return dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _packed_core(config, qkv, len_b):
    num_heads, head_dim, sm_scale, interpret = config
    out, _lse = _packed_forward(
        qkv, len_b,
        num_heads=num_heads, head_dim=head_dim,
        sm_scale=sm_scale, interpret=interpret,
    )
    return out


def _packed_core_fwd(config, qkv, len_b):
    num_heads, head_dim, sm_scale, interpret = config
    out, lse = _packed_forward(
        qkv, len_b,
        num_heads=num_heads, head_dim=head_dim,
        sm_scale=sm_scale, interpret=interpret,
    )
    return out, (qkv, len_b, out, lse)


def _packed_core_bwd(config, res, dout):
    num_heads, head_dim, sm_scale, interpret = config
    qkv, len_b, out, lse = res
    dqkv = _packed_backward(
        qkv, len_b, out, lse, dout.astype(jnp.float32),
        num_heads=num_heads, head_dim=head_dim,
        sm_scale=sm_scale, interpret=interpret,
    )
    return dqkv, jnp.zeros_like(len_b)


_packed_core.defvjp(_packed_core_fwd, _packed_core_bwd)


def flash_mha_packed(
    qkv: jax.Array,  # [B, T, 3*H*d] — q | k | v packed along the minor dim
    lengths: jax.Array | None = None,  # [B] valid timesteps (keys)
    *,
    num_heads: int,
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Transpose-free single-block attention on the packed qkv layout.

    Consumes the qkv projection's natural ``[B, T, 3*H*d]`` output and
    returns ``[B, T, H*d]`` — no ``[B, H, T, d]`` relayout, no standalone
    f32->bf16 converts (casting happens in-kernel, once per element), and
    the backward emits the packed ``dqkv`` cotangent directly. Same math
    and masking contract as ``flash_self_attention`` (column masking from
    per-row lengths; fully-masked rows -> exact zeros, zero grads).
    Differentiable via custom VJP. Route with ``packed_route_ok``.
    """
    batch, seq_len, three_f = qkv.shape
    feat = three_f // 3
    head_dim = feat // num_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    pad = (-seq_len) % 8  # sublane multiple; padded cols masked via lengths
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    len_b = jax.lax.stop_gradient(
        lengths.reshape(batch, 1).astype(jnp.float32)
    )
    if qkv.dtype not in (jnp.float32, jnp.bfloat16) or (
        interpret and qkv.dtype != jnp.float32
    ):
        qkv = qkv.astype(jnp.float32)
    config = (int(num_heads), int(head_dim), float(sm_scale), bool(interpret))
    out = _packed_core(config, qkv, len_b)
    if pad:
        out = out[:, :seq_len]
    return out
