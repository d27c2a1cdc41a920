"""Trainable grouped LSTM + GRU: Pallas fwd + bwd kernels via custom VJP.

``ops/pallas_rnn.py`` covers inference. This module makes the grouped
LSTM/GRU recurrences differentiable with hand-written kernels:

- the FORWARD kernel runs the recurrence with weights/carries in VMEM (as in
  the inference kernel) and additionally streams per-step residuals to HBM:
  post-activation gates ``(i,f,g,o)``, and the incoming carries ``h_{t-1}``,
  ``c_{t-1}`` — exactly what the backward chain needs (the same residuals XLA
  autodiff would save, but written block-wise from VMEM).
- the BACKWARD kernel walks the grid in REVERSE time order (its index maps
  flip the block index), carrying ``dh``/``dc`` in VMEM scratch, computing
  the per-step gate cotangents on the VPU, the ``dz @ W_hh^T`` and
  ``h_{t-1}^T @ dz`` matmuls on the MXU, and accumulating ``dW_hh``/``db``
  in VMEM — they leave the chip once, at the last grid step.

The custom-VJP function operates at the ``x_proj`` level (inputs already
projected); gradients for ``W_ih``/``b_ih``/``x`` flow through the XLA einsum
that produced ``x_proj``, so this kernel pair only owns the recurrence.
Validated against ``jax.grad`` of the XLA scan in ``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(
    x_ref,       # VMEM [block_t, G, B, 4H] x_proj chunk
    whh_ref,     # VMEM [G, H, 4H]
    bhh_ref,     # VMEM [G, 4H]
    len_ref,     # VMEM [B, 1] float32 valid lengths
    out_ref,     # VMEM [G, B, H] final hidden
    gates_ref,   # VMEM out [block_t, G, B, 4H] post-activation gates
    hprev_ref,   # VMEM out [block_t, G, B, H]
    cprev_ref,   # VMEM out [block_t, G, B, H]
    h_ref,       # scratch [G, B, H]
    c_ref,       # scratch [G, B, H]
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
        keep = ((step0 + t) < lengths).astype(jnp.float32)
        for g in range(groups):
            h = h_ref[g]
            c = c_ref[g]
            hprev_ref[t, g] = h
            cprev_ref[t, g] = c
            z = (
                x_ref[t, g]
                + jnp.dot(h, whh_ref[g], preferred_element_type=jnp.float32)
                + bhh_ref[g : g + 1, :]
            )
            i = jax.nn.sigmoid(z[:, 0 * hidden : 1 * hidden])
            f = jax.nn.sigmoid(z[:, 1 * hidden : 2 * hidden])
            gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(z[:, 3 * hidden : 4 * hidden])
            gates_ref[t, g] = jnp.concatenate([i, f, gg, o], axis=-1)
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            h_ref[g] = keep * h_new + (1.0 - keep) * h
            c_ref[g] = keep * c_new + (1.0 - keep) * c
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        out_ref[:] = h_ref[:]


def _bwd_kernel(
    gates_ref,   # VMEM [block_t, G, B, 4H]  (reversed block order)
    hprev_ref,   # VMEM [block_t, G, B, H]
    cprev_ref,   # VMEM [block_t, G, B, H]
    whh_ref,     # VMEM [G, H, 4H]
    len_ref,     # VMEM [B, 1] float32 valid lengths
    dhout_ref,   # VMEM [G, B, H] cotangent of the final hidden state
    dx_ref,      # VMEM out [block_t, G, B, 4H] (reversed block order)
    dh_ref,      # scratch [G, B, H]
    dc_ref,      # scratch [G, B, H]
    *,
    block_t: int,
    groups: int,
    hidden: int,
    total_steps: int,
):
    num_blocks = pl.num_programs(0)
    # reversed walk: grid iteration j covers block (num_blocks-1-j); the
    # index maps already flip the streamed blocks, so in-kernel step indices
    # run block-locally from block_t-1 down to 0
    step0 = (num_blocks - 1 - pl.program_id(0)) * block_t

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = dhout_ref[:]
        dc_ref[:] = jnp.zeros_like(dc_ref)

    lengths = len_ref[:]  # [B, 1]

    def step(s, _):
        t = block_t - 1 - s  # reverse order within the block
        keep = ((step0 + t) < lengths).astype(jnp.float32)
        for g in range(groups):
            gates = gates_ref[t, g]
            i = gates[:, 0 * hidden : 1 * hidden]
            f = gates[:, 1 * hidden : 2 * hidden]
            gg = gates[:, 2 * hidden : 3 * hidden]
            o = gates[:, 3 * hidden : 4 * hidden]
            c_prev = cprev_ref[t, g]
            h_prev = hprev_ref[t, g]
            c_t = f * c_prev + i * gg
            tanh_c = jnp.tanh(c_t)

            dh = dh_ref[g]
            dc = dc_ref[g]
            # carry-freeze bwd: updated lane gets the gradient, frozen lane
            # passes it straight through to t-1
            dh_t = keep * dh
            dh_skip = (1.0 - keep) * dh
            dc_t = keep * dc
            dc_skip = (1.0 - keep) * dc

            do = dh_t * tanh_c
            dc_t = dc_t + dh_t * o * (1.0 - tanh_c * tanh_c)
            di = dc_t * gg
            dg = dc_t * i
            df = dc_t * c_prev
            dc_prev = dc_t * f + dc_skip

            dz = jnp.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - gg * gg),
                    do * o * (1.0 - o),
                ],
                axis=-1,
            )  # [B, 4H]
            dx_ref[t, g] = dz
            # dW_hh/db_hh are reduced OUTSIDE the kernel (one XLA einsum
            # over the dx output): keeping the [G,H,4H] accumulator in VMEM
            # blew the 16 MB budget at flagship shapes
            dh_prev = jax.lax.dot_general(
                dz, whh_ref[g], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_ref[g] = dh_prev + dh_skip
            dc_ref[g] = dc_prev
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)
    _ = total_steps


def _lstm_core_fwd_kernels(x_proj, w_hh, b_hh, lengths_col, block_t):
    seq_len, groups, batch, gates_h = x_proj.shape
    hidden = gates_h // 4
    kernel = functools.partial(
        _fwd_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=(seq_len // block_t,),
        in_specs=[
            pl.BlockSpec(
                (block_t, groups, batch, gates_h), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_t, groups, batch, gates_h), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_t, groups, batch, hidden), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_t, groups, batch, hidden), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((groups, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, gates_h), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, hidden), jnp.float32),
        ),
        interpret=interpret,
    )(x_proj, w_hh, b_hh, lengths_col)


def _lstm_core_bwd_kernels(
    gates, hprev, cprev, w_hh, lengths_col, dh_out, block_t
):
    seq_len, groups, batch, gates_h = gates.shape
    hidden = gates_h // 4
    num_blocks = seq_len // block_t
    kernel = functools.partial(
        _bwd_kernel, block_t=block_t, groups=groups, hidden=hidden,
        total_steps=seq_len,
    )
    interpret = jax.default_backend() != "tpu"
    rev = lambda i: (num_blocks - 1 - i, 0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, groups, batch, gates_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, groups, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, groups, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, groups, batch, gates_h), rev, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
            pltpu.VMEM((groups, batch, hidden), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct(
            (seq_len, groups, batch, gates_h), jnp.float32
        ),
        interpret=interpret,
    )(gates, hprev, cprev, w_hh, lengths_col, dh_out)


def _pick_block_t(seq_len: int, groups: int, batch: int, hidden: int) -> int:
    # VMEM-budget heuristic; non-divisible seq_len is handled by padding in
    # _prep (padded steps sit beyond every row's length, so the freeze
    # semantics make them no-ops with zero gradients)
    del seq_len
    per_step = groups * batch * 4 * hidden * 4  # gates bytes per step
    return max(1, min(8, (2 << 20) // max(1, per_step)))


def grouped_lstm_trainable(x_proj, w_hh, b_hh, lengths=None):
    """Differentiable grouped LSTM recurrence (Pallas fwd+bwd kernels).

    Args mirror :func:`ops.pallas_rnn.grouped_lstm_forward`; returns the
    final hidden state ``[G, B, H]``. ``lengths`` is non-differentiable.
    """
    seq_len, _g, batch, _gh = x_proj.shape
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    # float lengths so the custom-VJP can hand back a well-typed zero
    # cotangent (JAX has no None slot for array args)
    return _core(x_proj, w_hh, b_hh, lengths.astype(jnp.float32))


@jax.custom_vjp
def _core(x_proj, w_hh, b_hh, lengths_f):
    out, _res = _core_fwd(x_proj, w_hh, b_hh, lengths_f)
    return out


def _prep(x_proj, lengths_f):
    seq_len, groups, batch, gates_h = x_proj.shape
    hidden = gates_h // 4
    block_t = _pick_block_t(seq_len, groups, batch, hidden)
    pad_t = (-seq_len) % block_t
    # sublane alignment for [B, ...] VMEM tiles, same as the inference
    # kernels (pallas_rnn.py); padded rows carry length 0 -> frozen at the
    # zero init, zero output, zero gradient
    pad_b = (-batch) % 8
    if pad_t or pad_b:
        x_proj = jnp.pad(x_proj, ((0, pad_t), (0, 0), (0, pad_b), (0, 0)))
    if pad_b:
        lengths_f = jnp.pad(lengths_f, (0, pad_b))
    lengths_col = lengths_f.reshape(batch + pad_b, 1)
    return x_proj, lengths_col, block_t, seq_len, batch


def _core_fwd(x_proj, w_hh, b_hh, lengths_f):
    x_pad, lengths_col, block_t, seq_len, batch = _prep(x_proj, lengths_f)
    out, gates, hprev, cprev = _lstm_core_fwd_kernels(
        x_pad.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.astype(jnp.float32),
        lengths_col,
        block_t,
    )
    out = out[:, :batch]
    return out, (gates, hprev, cprev, w_hh, lengths_col, block_t, seq_len, batch)


def _core_bwd(res, dh_out):
    gates, hprev, cprev, w_hh, lengths_col, block_t, seq_len, batch = res
    pad_b = lengths_col.shape[0] - batch
    dh_pad = dh_out.astype(jnp.float32)
    if pad_b:
        dh_pad = jnp.pad(dh_pad, ((0, 0), (0, pad_b), (0, 0)))
    dx_pad = _lstm_core_bwd_kernels(
        gates, hprev, cprev, w_hh.astype(jnp.float32), lengths_col,
        dh_pad, block_t,
    )
    # weight/bias grads as ONE large MXU einsum each (padded steps/rows have
    # dz == 0, so they contribute nothing)
    dw_hh = jnp.einsum("tgbh,tgbk->ghk", hprev, dx_pad)
    db_hh = jnp.sum(dx_pad, axis=(0, 2))
    dx = dx_pad[:seq_len, :, :batch]
    return dx, dw_hh, db_hh, jnp.zeros((batch,), lengths_col.dtype)


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# trainable grouped GRU (custom-VJP pair, same design as the LSTM above)
# ---------------------------------------------------------------------------

def _gru_fwd_kernel(
    x_ref,       # VMEM [block_t, G, B, 3H] x_proj chunk (b_ih already added)
    whh_ref,     # VMEM [G, H, 3H]
    bhh_ref,     # VMEM [G, 3H]
    len_ref,     # VMEM [B, 1] float32 valid lengths
    out_ref,     # VMEM [G, B, H] final hidden
    gates_ref,   # VMEM out [block_t, G, B, 3H] post-activation (r, z, n)
    hprev_ref,   # VMEM out [block_t, G, B, H]
    hn_ref,      # VMEM out [block_t, G, B, H] candidate hidden path hn
    h_ref,       # scratch [G, B, H]
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

    lengths = len_ref[:]  # [B, 1]

    def step(t, _):
        keep = ((step0 + t) < lengths).astype(jnp.float32)
        for g in range(groups):
            h = h_ref[g]
            hprev_ref[t, g] = h
            xp = x_ref[t, g]  # [B, 3H]
            hp = (
                jnp.dot(h, whh_ref[g], preferred_element_type=jnp.float32)
                + bhh_ref[g : g + 1, :]
            )
            hn = hp[:, 2 * hidden : 3 * hidden]
            hn_ref[t, g] = hn
            r = jax.nn.sigmoid(
                xp[:, 0 * hidden : 1 * hidden] + hp[:, 0 * hidden : 1 * hidden]
            )
            z = jax.nn.sigmoid(
                xp[:, 1 * hidden : 2 * hidden] + hp[:, 1 * hidden : 2 * hidden]
            )
            # torch semantics: candidate bias INSIDE the reset gate
            n = jnp.tanh(xp[:, 2 * hidden : 3 * hidden] + r * hn)
            gates_ref[t, g] = jnp.concatenate([r, z, n], axis=-1)
            h_new = (1.0 - z) * n + z * h
            h_ref[g] = keep * h_new + (1.0 - keep) * h
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        out_ref[:] = h_ref[:]


def _gru_bwd_kernel(
    gates_ref,   # VMEM [block_t, G, B, 3H]  (reversed block order)
    hprev_ref,   # VMEM [block_t, G, B, H]
    hn_ref,      # VMEM [block_t, G, B, H]
    whh_ref,     # VMEM [G, H, 3H]
    len_ref,     # VMEM [B, 1] float32 valid lengths
    dhout_ref,   # VMEM [G, B, H] cotangent of the final hidden state
    dx_ref,      # VMEM out [block_t, G, B, 3H] x_proj cotangent (reversed)
    dh_ref,      # scratch [G, B, H]
    *,
    block_t: int,
    groups: int,
    hidden: int,
):
    num_blocks = pl.num_programs(0)
    step0 = (num_blocks - 1 - pl.program_id(0)) * block_t

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = dhout_ref[:]

    lengths = len_ref[:]  # [B, 1]

    def step(s, _):
        t = block_t - 1 - s  # reverse order within the block
        keep = ((step0 + t) < lengths).astype(jnp.float32)
        for g in range(groups):
            gates = gates_ref[t, g]
            r = gates[:, 0 * hidden : 1 * hidden]
            z = gates[:, 1 * hidden : 2 * hidden]
            n = gates[:, 2 * hidden : 3 * hidden]
            h_prev = hprev_ref[t, g]
            hn = hn_ref[t, g]

            dh = dh_ref[g]
            dh_t = keep * dh
            dh_skip = (1.0 - keep) * dh

            # h' = (1 - z) n + z h_prev
            dz = dh_t * (h_prev - n)
            dn = dh_t * (1.0 - z)
            dh_prev = dh_t * z

            dn_pre = dn * (1.0 - n * n)       # d tanh
            dr = dn_pre * hn                  # n = tanh(xn + r * hn)
            dhn = dn_pre * r                  # hidden-path candidate slot
            dr_pre = dr * r * (1.0 - r)
            dz_pre = dz * z * (1.0 - z)

            # x_proj cotangent: (xr, xz, xn) slots
            dx_ref[t, g] = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
            # hidden-path cotangent differs in the n slot (dhn = dn_pre * r);
            # dW_hh/db_hh are reduced OUTSIDE the kernel from dx and r
            dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
            dh_prev = dh_prev + jax.lax.dot_general(
                dhp, whh_ref[g], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_ref[g] = dh_prev + dh_skip
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def _gru_core_fwd_kernels(x_proj, w_hh, b_hh, lengths_col, block_t):
    seq_len, groups, batch, gates_h = x_proj.shape
    hidden = gates_h // 3
    kernel = functools.partial(
        _gru_fwd_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    interpret = jax.default_backend() != "tpu"
    stream = lambda last: pl.BlockSpec(  # noqa: E731
        (block_t, groups, batch, last), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(seq_len // block_t,),
        in_specs=[
            stream(gates_h),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            stream(gates_h),
            stream(hidden),
            stream(hidden),
        ),
        scratch_shapes=[pltpu.VMEM((groups, batch, hidden), jnp.float32)],
        out_shape=(
            jax.ShapeDtypeStruct((groups, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, gates_h), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, groups, batch, hidden), jnp.float32),
        ),
        interpret=interpret,
    )(x_proj, w_hh, b_hh, lengths_col)


def _gru_core_bwd_kernels(gates, hprev, hn, w_hh, lengths_col, dh_out, block_t):
    seq_len, groups, batch, gates_h = gates.shape
    hidden = gates_h // 3
    num_blocks = seq_len // block_t
    kernel = functools.partial(
        _gru_bwd_kernel, block_t=block_t, groups=groups, hidden=hidden
    )
    interpret = jax.default_backend() != "tpu"
    rev = lambda i: (num_blocks - 1 - i, 0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, groups, batch, gates_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, groups, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, groups, batch, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, groups, batch, gates_h), rev, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((groups, batch, hidden), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(
            (seq_len, groups, batch, gates_h), jnp.float32
        ),
        interpret=interpret,
    )(gates, hprev, hn, w_hh, lengths_col, dh_out)


def grouped_gru_trainable(x_proj, w_hh, b_hh, lengths=None):
    """Differentiable grouped GRU recurrence (Pallas fwd+bwd kernels).

    ``x_proj`` is ``x @ W_ih + b_ih`` ``[T, G, B, 3H]`` (torch gate order
    r, z, n; candidate bias stays on the hidden path per torch semantics).
    Returns the final hidden state ``[G, B, H]``; ``lengths`` is
    non-differentiable.
    """
    seq_len, _g, batch, _gh = x_proj.shape
    if lengths is None:
        lengths = jnp.full((batch,), seq_len, jnp.int32)
    return _gru_core(x_proj, w_hh, b_hh, lengths.astype(jnp.float32))


@jax.custom_vjp
def _gru_core(x_proj, w_hh, b_hh, lengths_f):
    out, _res = _gru_core_fwd(x_proj, w_hh, b_hh, lengths_f)
    return out


def _gru_prep(x_proj, lengths_f):
    seq_len, groups, batch, gates_h = x_proj.shape
    hidden = gates_h // 3
    # same VMEM-budget heuristic as the LSTM pair (gates bytes per step);
    # non-divisible seq_len is padded below (padded steps sit beyond every
    # row's length -> frozen, zero-gradient), and the batch pads to the
    # 8-row sublane tile like the inference kernels (length-0 pad rows)
    per_step = groups * batch * 3 * hidden * 4
    block_t = max(1, min(8, (2 << 20) // max(1, per_step)))
    pad_t = (-seq_len) % block_t
    pad_b = (-batch) % 8
    if pad_t or pad_b:
        x_proj = jnp.pad(x_proj, ((0, pad_t), (0, 0), (0, pad_b), (0, 0)))
    if pad_b:
        lengths_f = jnp.pad(lengths_f, (0, pad_b))
    lengths_col = lengths_f.reshape(batch + pad_b, 1)
    return x_proj, lengths_col, block_t, seq_len, batch


def _gru_core_fwd(x_proj, w_hh, b_hh, lengths_f):
    x_pad, lengths_col, block_t, seq_len, batch = _gru_prep(x_proj, lengths_f)
    out, gates, hprev, hn = _gru_core_fwd_kernels(
        x_pad.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        b_hh.astype(jnp.float32),
        lengths_col,
        block_t,
    )
    out = out[:, :batch]
    return out, (gates, hprev, hn, w_hh, lengths_col, block_t, seq_len, batch)


def _gru_core_bwd(res, dh_out):
    gates, hprev, hn, w_hh, lengths_col, block_t, seq_len, batch = res
    hidden = hn.shape[-1]
    pad_b = lengths_col.shape[0] - batch
    dh_pad = dh_out.astype(jnp.float32)
    if pad_b:
        dh_pad = jnp.pad(dh_pad, ((0, 0), (0, pad_b), (0, 0)))
    dx_pad = _gru_core_bwd_kernels(
        gates, hprev, hn, w_hh.astype(jnp.float32), lengths_col,
        dh_pad, block_t,
    )
    # hidden-path cotangent: same as dx except the candidate slot carries an
    # extra reset-gate factor (n = tanh(xn + r * hn)); padded steps/rows have
    # dx == 0 so they contribute nothing
    r = gates[..., :hidden]
    dhp = jnp.concatenate(
        [dx_pad[..., : 2 * hidden], dx_pad[..., 2 * hidden :] * r], axis=-1
    )
    dw_hh = jnp.einsum("tgbh,tgbk->ghk", hprev, dhp)
    db_hh = jnp.sum(dhp, axis=(0, 2))
    dx = dx_pad[:seq_len, :, :batch]
    return dx, dw_hh, db_hh, jnp.zeros((batch,), lengths_col.dtype)


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)
