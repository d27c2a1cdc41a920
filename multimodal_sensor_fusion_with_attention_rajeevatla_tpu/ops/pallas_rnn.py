"""Grouped LSTM recurrence as a Pallas TPU kernel.

The encoder hot loop is a 1024-step LSTM scan (reference: 4 per-modality
torch LSTMs, ``src/encoders.py:135-166``; here already grouped into one
batched scan, ``models/grouped.py``). Under XLA the scan is a while-loop
whose carry and per-step inputs round-trip HBM every iteration. This kernel
runs the WHOLE recurrence in one ``pallas_call``:

- the grouped hidden->gate weights ``W_hh [G,H,4H]`` live in VMEM for the
  entire sequence,
- ``h``/``c`` carries live in VMEM scratch (never touch HBM),
- the precomputed input projections ``x_proj [T,G,B,4H]`` stream in
  ``block_t``-step chunks through the sequential grid pipeline (Pallas
  double-buffers the HBM->VMEM DMAs automatically),
- per step, each group's ``[B,H] x [H,4H]`` gate matmul hits the MXU and the
  sigmoid/tanh gate math runs on the VPU without leaving VMEM,
- per-row valid lengths freeze the carry at each row's last valid step
  (``pack_padded_sequence`` semantics, same as the XLA path).

Forward-only: used on inference/serving paths and validated against the XLA
scan in ``tests/test_pallas.py``; training keeps the autodiff-able XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(
    x_ref,          # VMEM [block_t, G, B, 4H] streamed chunk
    whh_ref,        # VMEM [G, H, 4H]
    bhh_ref,        # VMEM [G, 4H]
    len_ref,        # VMEM [B, 1] int32 per-row valid lengths
    out_ref,        # VMEM [G, B, H] final hidden state
    h_ref,          # scratch VMEM [G, B, H]
    c_ref,          # scratch VMEM [G, B, H]
    *,
    block_t: int,
    groups: int,
    hidden: int,
):
    step0 = pl.program_id(0) * block_t
    num_blocks = pl.num_programs(0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    lengths = len_ref[:]  # [B, 1]

    def step(t, _):
        keep = ((step0 + t) < lengths).astype(jnp.float32)  # [B, 1]
        for g in range(groups):
            xp = x_ref[t, g]  # [B, 4H]
            h = h_ref[g]
            c = c_ref[g]
            z = (
                xp
                + jnp.dot(h, whh_ref[g], preferred_element_type=jnp.float32)
                + bhh_ref[g : g + 1, :]
            )
            i = jax.nn.sigmoid(z[:, 0 * hidden : 1 * hidden])
            f = jax.nn.sigmoid(z[:, 1 * hidden : 2 * hidden])
            gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(z[:, 3 * hidden : 4 * hidden])
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            # freeze the carry past each row's valid length
            h_ref[g] = keep * h_new + (1.0 - keep) * h
            c_ref[g] = keep * c_new + (1.0 - keep) * c
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        out_ref[:] = h_ref[:]


def _lstm_fused_kernel(
    x_ref,          # VMEM [block_t, G, B, D] streamed raw inputs
    wih_ref,        # VMEM [G, D, 4H]
    whh_ref,        # VMEM [G, H, 4H]
    bias_ref,       # VMEM [G, 4H] combined b_ih + b_hh
    len_ref,        # VMEM [B, 1] int32 per-row valid lengths
    out_ref,        # VMEM [G, B, H] final hidden state
    h_ref,          # scratch VMEM [G, B, H]
    c_ref,          # scratch VMEM [G, B, H]
    xp_ref,         # scratch VMEM [G, block_t, B, 4H] block input projections
    *,
    block_t: int,
    groups: int,
    hidden: int,
):
    step0 = pl.program_id(0) * block_t
    num_blocks = pl.num_programs(0)
    batch = h_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    # input projection for the whole block: one [block_t*B, D] x [D, 4H]
    # MXU matmul per group (the HBM-heavy x_proj materialisation the XLA
    # path needs simply never exists)
    for g in range(groups):
        xg = x_ref[:, g]  # [block_t, B, D]
        xg2 = xg.reshape(block_t * batch, xg.shape[-1])
        xp_ref[g] = jnp.dot(
            xg2, wih_ref[g], preferred_element_type=jnp.float32
        ).reshape(block_t, batch, 4 * hidden)

    lengths = len_ref[:]  # [B, 1]

    def step(t, _):
        keep = ((step0 + t) < lengths).astype(jnp.float32)  # [B, 1]
        for g in range(groups):
            xp = xp_ref[g, t]  # [B, 4H]
            h = h_ref[g]
            c = c_ref[g]
            z = (
                xp
                + jnp.dot(h, whh_ref[g], preferred_element_type=jnp.float32)
                + bias_ref[g : g + 1, :]
            )
            i = jax.nn.sigmoid(z[:, 0 * hidden : 1 * hidden])
            f = jax.nn.sigmoid(z[:, 1 * hidden : 2 * hidden])
            gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(z[:, 3 * hidden : 4 * hidden])
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            h_ref[g] = keep * h_new + (1.0 - keep) * h
            c_ref[g] = keep * c_new + (1.0 - keep) * c
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        out_ref[:] = h_ref[:]


def grouped_lstm_fused(
    x: jax.Array,  # [T, G, B, D] raw (feature-padded) inputs
    w_ih: jax.Array,  # [G, D, 4H]
    w_hh: jax.Array,  # [G, H, 4H]
    bias: jax.Array,  # [G, 4H] combined input+hidden bias
    lengths: jax.Array | None = None,  # [B]
    block_t: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused grouped LSTM: in-kernel input projection + recurrence.

    HBM traffic is just the raw ``x`` (tens of MB) instead of the ``x_proj``
    tensor (~1 GB for the PAMAP2 flagship shapes) — the input projection is
    computed block-wise in VMEM. Returns final hidden ``[G, B, H]``.

    ``block_t`` (timesteps per grid iteration) defaults to whatever keeps the
    in-VMEM block projection scratch within ~4 MB for the given batch.
    """
    seq_len, groups, batch, _ = x.shape
    hidden = w_hh.shape[1]
    if block_t is None:
        per_step_bytes = groups * ((batch + 7) // 8 * 8) * 4 * hidden * 4
        block_t = max(1, min(8, (4 << 20) // max(1, per_step_bytes)))
    if seq_len % block_t:
        pad = block_t - seq_len % block_t
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    padded_len = x.shape[0]
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    batch_pad = (-batch) % 8  # sublane alignment for [B, ...] tiles
    if batch_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, batch_pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, batch_pad))
    padded_batch = batch + batch_pad
    lengths_col = lengths.astype(jnp.int32).reshape(padded_batch, 1)

    kernel = functools.partial(
        _lstm_fused_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    out = pl.pallas_call(
        kernel,
        grid=(padded_len // block_t,),
        in_specs=[
            pl.BlockSpec(
                (block_t, groups, padded_batch, x.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, padded_batch, hidden), jnp.float32),
            pltpu.VMEM((groups, padded_batch, hidden), jnp.float32),
            pltpu.VMEM((groups, block_t, padded_batch, 4 * hidden), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((groups, padded_batch, hidden), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_len * groups * padded_batch * hidden * (4 * hidden + 4 * x.shape[-1]),
            bytes_accessed=x.size * 4 + w_hh.size * 4 + w_ih.size * 4,
            transcendentals=padded_len * groups * padded_batch * hidden * 4,
        ),
    )(
        x.astype(jnp.float32),
        w_ih.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        bias.astype(jnp.float32),
        lengths_col,
    )
    return out[:, :batch]


def grouped_lstm_forward(
    x_proj: jax.Array,  # [T, G, B, 4H] precomputed input projections (+b_ih)
    w_hh: jax.Array,  # [G, H, 4H]
    b_hh: jax.Array,  # [G, 4H]
    lengths: jax.Array | None = None,  # [B] per-row valid steps
    block_t: int = 4,  # VMEM: 2 x [block_t,G,B,4H] f32 stream buffers + W_hh
    interpret: bool = False,
) -> jax.Array:
    """Run the grouped LSTM recurrence; returns final hidden ``[G, B, H]``."""
    seq_len, groups, batch, gates_h = x_proj.shape
    hidden = gates_h // 4
    if seq_len % block_t:
        pad = block_t - seq_len % block_t
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0), (0, 0)))
    padded_len = x_proj.shape[0]
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    lengths_col = lengths.astype(jnp.int32).reshape(batch, 1)

    kernel = functools.partial(
        _lstm_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    return pl.pallas_call(
        kernel,
        grid=(padded_len // block_t,),
        in_specs=[
            pl.BlockSpec(
                (block_t, groups, batch, gates_h),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((groups, batch, hidden), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_len * groups * batch * hidden * 4 * hidden,
            bytes_accessed=x_proj.size * 4 + w_hh.size * 4,
            transcendentals=padded_len * groups * batch * hidden * 4,
        ),
    )(
        x_proj.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.astype(jnp.float32),
        lengths_col,
    )


def _gru_fused_kernel(
    x_ref,          # VMEM [block_t, G, B, D] streamed raw inputs
    wih_ref,        # VMEM [G, D, 3H]
    whh_ref,        # VMEM [G, H, 3H]
    bih_ref,        # VMEM [G, 3H]
    bhh_ref,        # VMEM [G, 3H]  (candidate bias applies INSIDE the reset gate)
    len_ref,        # VMEM [B, 1] int32 per-row valid lengths
    out_ref,        # VMEM [G, B, H] final hidden state
    h_ref,          # scratch VMEM [G, B, H]
    xp_ref,         # scratch VMEM [G, block_t, B, 3H]
    *,
    block_t: int,
    groups: int,
    hidden: int,
):
    step0 = pl.program_id(0) * block_t
    num_blocks = pl.num_programs(0)
    batch = h_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    for g in range(groups):
        xg = x_ref[:, g]
        xg2 = xg.reshape(block_t * batch, xg.shape[-1])
        xp_ref[g] = (
            jnp.dot(xg2, wih_ref[g], preferred_element_type=jnp.float32)
            + bih_ref[g : g + 1, :]
        ).reshape(block_t, batch, 3 * hidden)

    lengths = len_ref[:]  # [B, 1]

    def step(t, _):
        keep = ((step0 + t) < lengths).astype(jnp.float32)
        for g in range(groups):
            xp = xp_ref[g, t]  # [B, 3H]
            h = h_ref[g]
            hp = (
                jnp.dot(h, whh_ref[g], preferred_element_type=jnp.float32)
                + bhh_ref[g : g + 1, :]
            )
            r = jax.nn.sigmoid(
                xp[:, 0 * hidden : 1 * hidden] + hp[:, 0 * hidden : 1 * hidden]
            )
            z = jax.nn.sigmoid(
                xp[:, 1 * hidden : 2 * hidden] + hp[:, 1 * hidden : 2 * hidden]
            )
            n = jnp.tanh(
                xp[:, 2 * hidden : 3 * hidden] + r * hp[:, 2 * hidden : 3 * hidden]
            )
            h_new = (1.0 - z) * n + z * h
            h_ref[g] = keep * h_new + (1.0 - keep) * h
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        out_ref[:] = h_ref[:]


def grouped_gru_fused(
    x: jax.Array,  # [T, G, B, D]
    w_ih: jax.Array,  # [G, D, 3H]
    w_hh: jax.Array,  # [G, H, 3H]
    b_ih: jax.Array,  # [G, 3H]
    b_hh: jax.Array,  # [G, 3H]
    lengths: jax.Array | None = None,
    block_t: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused grouped GRU (inference): torch gate semantics, in-kernel
    input projection, VMEM-resident weights/carry. Returns ``[G, B, H]``."""
    seq_len, groups, batch, _ = x.shape
    hidden = w_hh.shape[1]
    if block_t is None:
        per_step_bytes = groups * ((batch + 7) // 8 * 8) * 3 * hidden * 4
        block_t = max(1, min(8, (4 << 20) // max(1, per_step_bytes)))
    if seq_len % block_t:
        pad = block_t - seq_len % block_t
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    padded_len = x.shape[0]
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    batch_pad = (-batch) % 8
    if batch_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, batch_pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, batch_pad))
    padded_batch = batch + batch_pad
    lengths_col = lengths.astype(jnp.int32).reshape(padded_batch, 1)

    kernel = functools.partial(
        _gru_fused_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    out = pl.pallas_call(
        kernel,
        grid=(padded_len // block_t,),
        in_specs=[
            pl.BlockSpec(
                (block_t, groups, padded_batch, x.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, padded_batch, hidden), jnp.float32),
            pltpu.VMEM((groups, block_t, padded_batch, 3 * hidden), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((groups, padded_batch, hidden), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_len * groups * padded_batch * hidden * (3 * hidden + 3 * x.shape[-1]),
            bytes_accessed=x.size * 4 + w_hh.size * 4 + w_ih.size * 4,
            transcendentals=padded_len * groups * padded_batch * hidden * 3,
        ),
    )(
        x.astype(jnp.float32),
        w_ih.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_ih.astype(jnp.float32),
        b_hh.astype(jnp.float32),
        lengths_col,
    )
    return out[:, :batch]
