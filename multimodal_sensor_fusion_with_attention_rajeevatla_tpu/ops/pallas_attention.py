"""Flash (tiled, online-softmax) self-attention for temporal encoders.

The reference's transformer sequence encoder and TemporalAttention are vanilla
O(T^2) attention (``src/encoders.py:99-111``, ``src/attention.py:149-251``) —
at chunk_size 1024-2048 the ``[B, heads, T, T]`` score tensor dominates
memory. This kernel computes attention block-by-block with the online-softmax
recurrence, so scores never materialise beyond a ``[block_q, block_k]`` tile
in VMEM:

- grid = (batch*heads, T/block_q, T/block_k) with the key axis innermost;
  m/l/acc statistics live in VMEM scratch across key blocks (TPU grids are
  sequential, scratch persists),
- key-padding masks from per-row valid lengths (the data pipeline's padded
  windows) fold into the score tile before the softmax update,
- fully-masked query rows produce EXACTLY zero output (the framework's
  all-masked -> zeros contract, same as ``ops.masked.masked_softmax``).

Forward-only, used on inference paths; validated against the XLA reference in
``tests/test_pallas.py``. Precision note: the in-kernel dots run at the
backend's default matmul precision (bf16 multiplies on TPU), matching the XLA
attention path's own default — outputs agree to ~1e-3 at DEFAULT precision
and to ~1e-6 under ``jax.default_matmul_precision('highest')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,    # VMEM [1, block_q, d]
    k_ref,    # VMEM [1, block_k, d]
    v_ref,    # VMEM [1, block_k, d]
    len_ref,  # VMEM [BH, 1] int32 valid key length per (batch*head) row
    o_ref,    # VMEM [1, block_q, d]
    m_ref,    # scratch VMEM [block_q, 1]
    l_ref,    # scratch VMEM [block_q, 1]
    acc_ref,  # scratch VMEM [block_q, d]
    *,
    block_q: int,
    block_k: int,
    sm_scale: float,
):
    bh = pl.program_id(0)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [block_k, d]
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
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(kb == num_kb - 1)
    def _emit():
        l = l_ref[:]
        # fully-masked query rows: l == 0 -> exactly zero output
        o_ref[0] = jnp.where(l > 0, acc_ref[:] / jnp.where(l > 0, l, 1.0), 0.0)


def flash_self_attention(
    q: jax.Array,  # [B, H, T, d]
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array | None = None,  # [B] valid timesteps (keys+queries)
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Tiled attention; returns ``[B, H, T, d]``. Scores never hit HBM."""
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
    len_bh = jnp.repeat(lengths.astype(jnp.int32), heads).reshape(batch * heads, 1)

    qf = q.reshape(batch * heads, padded_len, d)
    kf = k.reshape(batch * heads, padded_len, d)
    vf = v.reshape(batch * heads, padded_len, d)

    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch * heads, padded_len // block_q, padded_len // block_k),
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
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((batch * heads, padded_len, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * padded_len * padded_len * d,
            bytes_accessed=3 * qf.size * 4 + qf.size * 4,
            transcendentals=batch * heads * padded_len * padded_len,
        ),
    )(qf.astype(jnp.float32), kf.astype(jnp.float32), vf.astype(jnp.float32), len_bh)
    out = out.reshape(batch, heads, padded_len, d)
    if pad:
        out = out[:, :, :seq_len]
    return out
