"""Fused transformer feed-forward (Dense -> ReLU -> dropout -> Dense) kernels.

The reference's transformer encoder layer runs its feed-forward block as two
separate torch Linears around a ReLU/dropout (``src/encoders.py:99-111`` uses
``nn.TransformerEncoderLayer`` with ``dim_feedforward=2048``). Under XLA the
same structure materialises the ``[B*T, dim_ff]`` hidden activation to HBM
between the two matmuls — at the flagship shape (B=64, T=512, dim_ff=2048,
f32) that is ~268 MB written + read per modality per layer, and with dropout
the tensor makes another round trip. On a v5e that traffic, not the FLOPs, is
the forward bottleneck.

These kernels keep the hidden activation entirely in VMEM:

- FORWARD: grid over row tiles of the flattened ``[N, d_in]`` input; both
  weight matrices live in VMEM across the whole grid (constant index maps);
  per tile: ``h = relu(x @ W1 + b1)`` -> optional dropout (a precomputed
  uint8 keep-mask streamed in, 1 byte/element instead of a 4-byte f32
  activation round trip) -> ``out = h' @ W2 + b2``. ``h`` never leaves VMEM.
- BACKWARD (custom VJP): recomputes ``h`` from the saved ``x`` tile (one
  extra MXU matmul instead of a 268 MB residual), then accumulates
  ``dW1``/``dW2``/``db1`` in VMEM output blocks with constant index maps —
  they are written to HBM once, at the final grid step. ``db2`` is one XLA
  column reduction outside the kernel.

The dropout keep-mask is drawn OUTSIDE the kernel from the module's threefry
``dropout`` rng stream (`jax.random.bernoulli`), so training semantics are
backend-independent and bit-reproducible: the fused and unfused paths consume
the same mask and agree to kernel-precision tolerance. (An in-kernel
hardware-PRNG mask would be faster still but would make the realised dropout
pattern depend on which backend resolved ``fused_mlp: auto`` — rejected.)

Gradient equivalence vs ``jax.grad`` of the XLA path is pinned in
``tests/test_pallas_mlp.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_params_init(d_in: int, d_out: int):
    """Init fn for a dict-valued ``self.param`` that mirrors ``nn.Dense``:
    lecun-normal kernel ``[d_in, d_out]`` + zero bias — the stored pytree is
    identical to an ``nn.Dense(name=...)`` submodule's, so checkpoints are
    interchangeable between the fused and module-based layouts."""
    kernel_init = nn.initializers.lecun_normal()

    def init(key):
        return {
            "kernel": kernel_init(key, (d_in, d_out)),
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    return init


def _pick_block_rows(d_ff: int, budget_bytes: int) -> int:
    """Row-tile size so the in-VMEM hidden tile stays within budget."""
    rows = budget_bytes // max(1, d_ff * 4)
    rows = max(8, min(512, rows))
    return (rows // 8) * 8  # sublane alignment


def _fwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest, has_mask, inv_keep, cast_bf16
):
    if has_mask:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[:]
    # on real TPU, cast dot inputs to bf16 (f32 accumulation): this matches
    # the XLA path's DEFAULT matmul precision (single bf16 MXU pass) — an
    # uncast f32 Mosaic dot runs the slower multi-pass form. Interpret mode
    # keeps f32, matching XLA-on-CPU.
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    pre = (
        jax.lax.dot_general(
            x.astype(cd), w1_ref[:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )
    h = jnp.maximum(pre, 0.0)
    if has_mask:
        # u8 -> i32 -> f32 two-step cast: Mosaic supports neither a direct
        # u8 -> f32 cast nor the i1 relayout a compare-select produces
        h = h * (
            mask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep
        )
    out = (
        jax.lax.dot_general(
            h.astype(cd), w2_ref[:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:]
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, do_ref, *rest, has_mask, inv_keep, cast_bf16
):
    if has_mask:
        mask_ref, dx_ref, dw1_ref, db1_ref, dw2_ref = rest
    else:
        dx_ref, dw1_ref, db1_ref, dw2_ref = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    x = x_ref[:]
    # bf16 dot inputs on real TPU: see _fwd_kernel (XLA's own backward also
    # runs DEFAULT-precision bf16 passes for these dots)
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    rows = x.shape[0]
    do = do_ref[:]

    # recompute the hidden tile (cheaper than streaming a [N, d_ff] residual)
    pre = (
        jax.lax.dot_general(
            x.astype(cd), w1_ref[:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )
    h = jnp.maximum(pre, 0.0)
    if has_mask:
        # u8 -> i32 -> f32 two-step cast (see _fwd_kernel)
        scale = (
            mask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep
        )
        hd = h * scale
    else:
        hd = h

    # dW2 += hd^T dO  (contraction over the row tile)
    dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
        hd.astype(cd), do.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dh' = dO W2^T ; back through dropout and ReLU
    dhd = jax.lax.dot_general(
        do.astype(cd), w2_ref[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        dhd = dhd * scale
    dpre = jnp.where(pre > 0.0, dhd, 0.0)

    # dW1 += x^T dpre ; db1 partial-sums in 8-row lanes (final fold outside)
    dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
        x.astype(cd), dpre.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] = db1_ref[:] + jnp.sum(
        dpre.reshape(rows // 8, 8, -1), axis=0
    )
    # dx = dpre W1^T
    dx_ref[:] = jax.lax.dot_general(
        dpre.astype(cd), w1_ref[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _pad_rows(x, block_rows):
    n = x.shape[0]
    pad = (-n) % block_rows
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n


def _mlp_forward(x, w1, b1, w2, b2, mask, *, has_mask, inv_keep, interpret):
    cast_bf16 = not interpret and x.dtype == jnp.float32
    if cast_bf16:
        # pre-cast ONCE here: an in-kernel astype on a constant-index-map ref
        # re-runs on every grid step (64x per call at flagship shapes)
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
    d_in = x.shape[1]
    d_ff = w1.shape[1]
    d_out = w2.shape[1]
    block_rows = _pick_block_rows(d_ff, 4 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    rows = x_pad.shape[0]
    kernel = functools.partial(
        _fwd_kernel, has_mask=has_mask, inv_keep=inv_keep, cast_bf16=cast_bf16
    )
    whole = lambda i: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_in, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_ff, d_out), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_out), whole, memory_space=pltpu.VMEM),
    ]
    args = [x_pad, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1)]
    if has_mask:
        mask_pad, _ = _pad_rows(mask, block_rows)
        in_specs.append(
            pl.BlockSpec(
                (block_rows, d_ff), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(mask_pad)
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d_in * d_ff,
            bytes_accessed=x_pad.size * x_pad.dtype.itemsize * 2
            + (w1.size + w2.size) * 4,
            transcendentals=0,
        ),
    )(*args)
    return out[:n]


def _mlp_backward(x, w1, b1, w2, mask, dout, *, has_mask, inv_keep, interpret):
    # the dx cotangent must carry the PRIMAL x dtype (custom_vjp contract),
    # captured before any bf16 pre-cast below
    dx_dtype = x.dtype
    cast_bf16 = not interpret and x.dtype == jnp.float32
    if cast_bf16:
        # pre-cast weights once (see _mlp_forward); x/dout stream in bf16 too
        # — halves their HBM traffic, and the dots consume bf16 anyway
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
        x = x.astype(jnp.bfloat16)
        dout_k = dout.astype(jnp.bfloat16)
    else:
        dout_k = dout
    d_in = x.shape[1]
    d_ff = w1.shape[1]
    d_out = w2.shape[1]
    # backward holds ~5 row-tile intermediates plus both weights and both
    # weight-grad accumulators in VMEM; use a smaller tile than forward
    block_rows = _pick_block_rows(d_ff, 1 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    dout_pad, _ = _pad_rows(dout_k, block_rows)
    rows = x_pad.shape[0]
    kernel = functools.partial(
        _bwd_kernel, has_mask=has_mask, inv_keep=inv_keep, cast_bf16=cast_bf16
    )
    whole = lambda i: (0, 0)  # noqa: E731
    row_tile = lambda last: pl.BlockSpec(  # noqa: E731
        (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        row_tile(d_in),
        pl.BlockSpec((d_in, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_ff, d_out), whole, memory_space=pltpu.VMEM),
        row_tile(d_out),
    ]
    args = [x_pad, w1, b1.reshape(1, -1), w2, dout_pad]
    if has_mask:
        mask_pad, _ = _pad_rows(mask, block_rows)
        in_specs.append(row_tile(d_ff))
        args.append(mask_pad)
    dx, dw1, db1_lanes, dw2 = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=in_specs,
        out_specs=(
            row_tile(d_in),
            pl.BlockSpec((d_in, d_ff), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_ff), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ff, d_out), whole, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d_in), dx_dtype),
            jax.ShapeDtypeStruct((d_in, d_ff), jnp.float32),
            jax.ShapeDtypeStruct((8, d_ff), jnp.float32),
            jax.ShapeDtypeStruct((d_ff, d_out), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d_in * d_ff,
            bytes_accessed=x_pad.size * x_pad.dtype.itemsize * 3
            + (w1.size + w2.size) * 8,
            transcendentals=0,
        ),
    )(*args)
    return dx[:n], dw1, jnp.sum(db1_lanes, axis=0), dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_core(config, x, w1, b1, w2, b2, mask):
    out, _ = _mlp_core_fwd(config, x, w1, b1, w2, b2, mask)
    return out


def _mlp_core_fwd(config, x, w1, b1, w2, b2, mask):
    has_mask, inv_keep, interpret = config
    out = _mlp_forward(
        x, w1, b1, w2, b2, mask,
        has_mask=has_mask, inv_keep=inv_keep, interpret=interpret,
    )
    return out, (x, w1, b1, w2, mask)


def _mlp_core_bwd(config, res, dout):
    has_mask, inv_keep, interpret = config
    x, w1, b1, w2, mask = res
    dx, dw1, db1, dw2 = _mlp_backward(
        x, w1, b1, w2, mask, dout,
        has_mask=has_mask, inv_keep=inv_keep, interpret=interpret,
    )
    db2 = jnp.sum(dout.astype(jnp.float32), axis=0)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b1.dtype),
        np.zeros(mask.shape, jax.dtypes.float0),
    )


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def fused_mlp(
    x: jax.Array,  # [N, d_in]
    w1: jax.Array,  # [d_in, d_ff]
    b1: jax.Array,  # [d_ff]
    w2: jax.Array,  # [d_ff, d_out]
    b2: jax.Array,  # [d_out]
    keep_mask: Optional[jax.Array] = None,  # [N, d_ff] uint8/bool, 1 = keep
    keep_prob: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``relu(x @ w1 + b1) -> dropout -> @ w2 + b2``; differentiable.

    The ``[N, d_ff]`` hidden activation never reaches HBM in either pass.
    ``keep_mask`` (when given) is applied between the ReLU and the second
    matmul as ``h * mask / keep_prob`` — exactly ``nn.Dropout`` semantics
    with an externally drawn mask.
    """
    has_mask = keep_mask is not None
    if has_mask:
        mask = keep_mask.astype(jnp.uint8)
    else:
        mask = jnp.zeros((8, 128), jnp.uint8)  # placeholder, never read
    config = (has_mask, float(1.0 / keep_prob), bool(interpret))
    return _mlp_core(config, x, w1, b1, w2, b2, mask)


def transformer_ffw(
    x: jax.Array,  # [B, T, d_in]
    params1,  # {"kernel": [d_in, d_ff], "bias": [d_ff]}
    params2,  # {"kernel": [d_ff, d_out], "bias": [d_out]}
    keep_mask: Optional[jax.Array] = None,  # [B, T, d_ff], 1 = keep
    keep_prob: float = 1.0,
    use_fused: bool = False,
    dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Transformer feed-forward block, fused-Pallas or XLA path.

    Both paths consume the SAME externally drawn dropout mask, so the
    realised training stochasticity does not depend on which backend
    resolved ``fused_mlp: auto`` (the framework's backend-independence
    contract for kernel flags).
    """
    batch, seq_len, d_in = x.shape
    cd = dtype or jnp.float32
    w1 = params1["kernel"].astype(cd)
    b1 = params1["bias"].astype(jnp.float32)
    w2 = params2["kernel"].astype(cd)
    b2 = params2["bias"].astype(jnp.float32)
    d_out = w2.shape[1]
    if use_fused:
        x2d = x.reshape(batch * seq_len, d_in).astype(cd)
        mask2d = (
            keep_mask.reshape(batch * seq_len, -1) if keep_mask is not None else None
        )
        out = fused_mlp(
            x2d, w1, b1, w2, b2, mask2d, keep_prob, interpret=interpret
        )
        return out.reshape(batch, seq_len, d_out).astype(x.dtype)
    h = jnp.maximum(
        jnp.einsum("btd,df->btf", x.astype(cd), w1).astype(jnp.float32) + b1, 0.0
    )
    if keep_mask is not None:
        h = jnp.where(keep_mask.astype(bool), h / keep_prob, 0.0)
    out = (
        jnp.einsum("btf,fo->bto", h.astype(cd), w2).astype(jnp.float32) + b2
    )
    return out.astype(x.dtype)
