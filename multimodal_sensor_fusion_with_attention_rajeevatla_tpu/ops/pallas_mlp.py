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

The dropout keep-mask is drawn OUTSIDE the kernel, from one of two sources
(``training.dropout_rng``, DEFAULT ``auto`` = kernel on a real TPU, xla
elsewhere):

- ``kernel`` (the TPU default via ``auto``): :func:`dropout_keep_mask`, a
  dedicated Pallas kernel that fills the u8 mask with the TPU hardware
  PRNG. Profiling the flagship train step showed the XLA threefry mask
  fusions alone at ~23% of device step time (docs/notes.md); the HW-PRNG
  generator produces the same masks in ~0.09 ms per ``[32768, 2048]`` mask
  in-program vs ~1.4 ms threefry. The masks still stream through HBM as u8
  into the unchanged consumption kernels — generating them INSIDE the
  matmul kernels was measured SLOWER (the per-tile draws serialize against
  the MXU and the scale scratch shrinks the row tiles; 1,573–1,680 vs
  1,910 train-windows/s), so the generator stays a separate kernel that
  XLA schedules like any other producer. Draws are deterministic per seed
  but TPU-generation-specific (same caveat as ``training.prng_impl:
  rbg``); validated on-chip by ``scripts/validate_kernel_rng.py``.
- ``xla``: the module's threefry ``dropout`` rng stream
  (`jax.random.bernoulli`) — backend-independent and bit-reproducible
  across machines and versions: the fused and unfused paths consume the
  same mask and agree to kernel-precision tolerance. Pick this for exact
  cross-machine replay.

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


def _inv_keep(keep_prob: float) -> float:
    """``1/keep_prob`` with the ``p = 1`` edge defined: at ``keep_prob == 0``
    the externally drawn mask is all-drop, so the scale is never applied to a
    surviving element — return 0.0 instead of dividing by zero (torch
    ``Dropout(p=1)`` semantics: the output is exactly zero, not NaN)."""
    return 0.0 if keep_prob <= 0.0 else float(1.0 / keep_prob)


# --- hardware-PRNG dropout-mask generator (training.dropout_rng: kernel) ---
#
# ``pltpu.prng_seed`` accepts at most TWO 32-bit words, so the (seed, purpose,
# row-group) triple is folded into two words with odd-constant multiplies
# (golden-ratio / murmur3 mixers). The +1 on the group index keeps group 0
# from degenerating to the raw seed word.
_RNG_P_HIDDEN = 1  # [N, d_ff] mask between ReLU and the second matmul
_RNG_P_RES = 2  # [N, d_in] residual-dropout mask (FFW side)
_RNG_P_ATT = 3  # [N, d_in] residual-dropout mask (attention side)


def _keep_thr(keep_prob: float) -> int:
    """uint32 threshold: keep an element iff its random word < thr."""
    return min(int(round(float(keep_prob) * 2.0**32)), 2**32 - 1)


def kernel_rng_seed(key) -> jax.Array:
    """Fold a JAX PRNG key into the ``[2]`` int32 seed-word array
    :func:`dropout_keep_mask` consumes.

    Accepts typed keys of any impl (threefry = 2 words, rbg/unsafe_rbg = 4)
    and legacy raw ``uint32`` key arrays; extra words fold in by XOR so the
    whole key contributes."""
    data = key
    if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    flat = jax.lax.bitcast_convert_type(
        jnp.asarray(data).reshape(-1).astype(jnp.uint32), jnp.int32
    )
    words = [flat[i] for i in range(flat.shape[0])]
    w0 = words[0]
    w1 = words[1] if len(words) > 1 else words[0]
    for i, w in enumerate(words[2:]):
        if i % 2 == 0:
            w0 = w0 ^ w
        else:
            w1 = w1 ^ w
    return jnp.stack([w0, w1])


def dropout_keep_mask(
    rng_seed: jax.Array,  # [2] int32 (kernel_rng_seed)
    rows: int,
    cols: int,
    keep_prob: float,
    purpose: int = _RNG_P_HIDDEN,
    interpret: bool = False,
) -> jax.Array:
    """``uint8`` Bernoulli(keep_prob) keep mask from the TPU hardware PRNG.

    One PRNG seeding + one whole-tile draw per grid step, seeded by
    ``(seed0 ^ purpose*MIX0, seed1 ^ (tile+1)*MIX1)`` — deterministic per
    (seed, purpose, shape). Because the mask is generated ONCE here and
    streamed into the consumption kernels as an ordinary u8 input, the
    stream does not need to be tiling-independent (unlike an in-kernel
    regeneration scheme, which was tried and measured slower — module
    docstring); a per-8-row-group seeded variant also measured ~7x slower
    in-program (0.57 vs ~0.09 ms per [32768, 2048] mask: the seed/draw
    loop serializes the VPU). ``pltpu.prng_random_bits`` returns int32; the
    uint32 bitcast before the threshold compare is what makes it unsigned
    (measured: a signed compare skews the keep-rate). The compare selects
    f32 and converts on the output store (f32 -> bool -> u8, the one cast
    chain Mosaic supports — a u8 select needs an i1 relayout it rejects).

    Requires a real TPU: the interpret-mode HW PRNG is a zero stub, which
    would silently produce an all-drop mask — rejected instead.
    """
    if interpret:
        raise ValueError(
            "dropout_keep_mask needs a real TPU (the interpret-mode hardware"
            " PRNG is a zero stub)"
        )
    mix0 = np.int32(-1640531527)  # 0x9E3779B9
    mix1 = np.int32(-2048144789)  # 0x85EBCA6B
    thr = np.uint32(_keep_thr(keep_prob))
    # bits (i32) + f32 select live per tile: ~8 B/element -> ~4 MB budget
    block = max(8, min(512, ((4 << 20) // (8 * cols)) // 8 * 8, (rows // 8) * 8 or 8))
    pad_rows = rows + (-rows) % block

    def kern(seed_ref, o_ref):
        w0 = seed_ref[0] ^ (jnp.int32(purpose) * mix0)
        w1 = seed_ref[1] ^ ((pl.program_id(0) + jnp.int32(1)) * mix1)
        pltpu.prng_seed(w0, w1)
        bits = pltpu.prng_random_bits((block, cols)).astype(jnp.uint32)
        scale = jnp.where(bits < thr, jnp.float32(1.0), jnp.float32(0.0))
        o_ref[:] = (scale > 0.0).astype(jnp.uint8)

    out = pl.pallas_call(
        kern,
        grid=(pad_rows // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pad_rows, cols), jnp.uint8),
    )(rng_seed)
    return out[:rows]


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
    return out, (x, w1, b1, w2, b2, mask)


def _mlp_core_bwd(config, res, dout):
    has_mask, inv_keep, interpret = config
    x, w1, b1, w2, b2, mask = res
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
        db2.astype(b2.dtype),
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
    config = (has_mask, _inv_keep(keep_prob), bool(interpret))
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


# ---------------------------------------------------------------------------
# fused FFW + residual dropout + add + LayerNorm (the transformer layer's
# entire second half in one kernel)
# ---------------------------------------------------------------------------
#
# After the fused FFW landed, the remaining HBM round trips in the layer's
# second half are elementwise: the FFW output [N, H], the residual-dropout
# mask/apply, the residual add, and LayerNorm's read+write. This kernel
# absorbs all of them: per row tile it computes
#   y   = ffw(x)            (hidden stays in VMEM, as in fused_mlp)
#   r   = x + y * res_mask / keep
#   out = LayerNorm(r) * gamma + beta   (flax semantics: fast variance,
#                                        eps in the rsqrt)
# and the custom-VJP backward recomputes the tile and accumulates
# dW1/db1/dW2/db2/dgamma/dbeta in VMEM output blocks (written once).


def ln_params_init(dim: int):
    """Init for a dict-valued ``self.param`` matching ``nn.LayerNorm``'s
    checkpoint tree ({'scale': ones, 'bias': zeros})."""

    def init(_key):
        return {
            "scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
        }

    return init


def _ln_rows(r, gamma, beta, eps):
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv
    return xhat * gamma + beta, xhat, inv


def _ffw_ln_fwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref, *rest,
    has_fmask, has_rmask, inv_keep, eps, cast_bf16,
):
    idx = 0
    fmask_ref = rmask_ref = None
    if has_fmask:
        fmask_ref = rest[idx]; idx += 1
    if has_rmask:
        rmask_ref = rest[idx]; idx += 1
    (o_ref,) = rest[idx:]

    x = x_ref[:]  # f32 [rows, H] — residual + LN stats stay full precision
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    pre = (
        jax.lax.dot_general(
            x.astype(cd), w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )
    h = jnp.maximum(pre, 0.0)
    if has_fmask:
        h = h * (fmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep)
    y = (
        jax.lax.dot_general(
            h.astype(cd), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:]
    )
    if has_rmask:
        y = y * (rmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep)
    r = x + y
    out, _xhat, _inv = _ln_rows(r, g_ref[:], bt_ref[:], eps)
    o_ref[:] = out.astype(o_ref.dtype)


def _ffw_ln_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref, do_ref, *rest,
    has_fmask, has_rmask, inv_keep, eps, cast_bf16,
):
    idx = 0
    fmask_ref = rmask_ref = None
    if has_fmask:
        fmask_ref = rest[idx]; idx += 1
    if has_rmask:
        rmask_ref = rest[idx]; idx += 1
    (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbt_ref) = rest[idx:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)

    x = x_ref[:]
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    rows = x.shape[0]
    do = do_ref[:]

    # recompute the whole tile forward
    pre = (
        jax.lax.dot_general(
            x.astype(cd), w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:]
    )
    h = jnp.maximum(pre, 0.0)
    if has_fmask:
        fscale = fmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep
        hd = h * fscale
    else:
        hd = h
    y = (
        jax.lax.dot_general(
            hd.astype(cd), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:]
    )
    if has_rmask:
        rscale = rmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep
        y = y * rscale
    r = x + y
    gamma = g_ref[:]
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv

    # LayerNorm backward (per row)
    dg_ref[:] = dg_ref[:] + jnp.sum(
        (do * xhat).reshape(rows // 8, 8, -1), axis=0
    )
    dbt_ref[:] = dbt_ref[:] + jnp.sum(do.reshape(rows // 8, 8, -1), axis=0)
    gdo = do * gamma
    mean_g = jnp.mean(gdo, axis=-1, keepdims=True)
    mean_gx = jnp.mean(gdo * xhat, axis=-1, keepdims=True)
    dr = (gdo - mean_g - xhat * mean_gx) * inv

    # back through the residual-dropout and the FFW
    dy = dr * rscale if has_rmask else dr
    db2_ref[:] = db2_ref[:] + jnp.sum(dy.reshape(rows // 8, 8, -1), axis=0)
    dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
        hd.astype(cd), dy.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhd = jax.lax.dot_general(
        dy.astype(cd), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_fmask:
        dhd = dhd * fscale
    dpre = jnp.where(pre > 0.0, dhd, 0.0)
    dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
        x.astype(cd), dpre.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] = db1_ref[:] + jnp.sum(dpre.reshape(rows // 8, 8, -1), axis=0)
    dx_ref[:] = (
        dr
        + jax.lax.dot_general(
            dpre.astype(cd), w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dx_ref.dtype)


def _ffw_ln_args(x, w1, b1, w2, b2, gamma, beta, fmask, rmask, block_rows, cast):
    whole = lambda i: (0, 0)  # noqa: E731
    d_in = x.shape[1]
    d_ff = w1.shape[1]
    row = lambda last: pl.BlockSpec(  # noqa: E731
        (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if cast:
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
    specs = [
        row(d_in),
        pl.BlockSpec((d_in, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_ff), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_ff, d_in), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_in), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_in), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_in), whole, memory_space=pltpu.VMEM),
    ]
    args = [
        x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
        gamma.reshape(1, -1), beta.reshape(1, -1),
    ]
    if fmask is not None:
        specs.append(row(d_ff))
        args.append(fmask)
    if rmask is not None:
        specs.append(row(d_in))
        args.append(rmask)
    return specs, args


def _ffw_ln_forward(
    x, w1, b1, w2, b2, gamma, beta, fmask, rmask,
    *, inv_keep, eps, interpret,
):
    cast = not interpret and x.dtype == jnp.float32
    d_in = x.shape[1]
    d_ff = w1.shape[1]
    block_rows = _pick_block_rows(d_ff, 4 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    rows = x_pad.shape[0]
    fmask_pad = _pad_rows(fmask, block_rows)[0] if fmask is not None else None
    rmask_pad = _pad_rows(rmask, block_rows)[0] if rmask is not None else None
    specs, args = _ffw_ln_args(
        x_pad, w1, b1, w2, b2, gamma, beta, fmask_pad, rmask_pad,
        block_rows, cast,
    )
    kernel = functools.partial(
        _ffw_ln_fwd_kernel,
        has_fmask=fmask is not None, has_rmask=rmask is not None,
        inv_keep=inv_keep, eps=eps, cast_bf16=cast,
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d_in), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d_in * d_ff,
            bytes_accessed=x_pad.size * 8 + (w1.size + w2.size) * 4,
            transcendentals=rows,
        ),
    )(*args)
    return out[:n]


def _ffw_ln_backward(
    x, w1, b1, w2, b2, gamma, beta, fmask, rmask, dout,
    *, inv_keep, eps, interpret,
):
    cast = not interpret and x.dtype == jnp.float32
    d_in = x.shape[1]
    d_ff = w1.shape[1]
    block_rows = _pick_block_rows(d_ff, 1 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    dout_pad = _pad_rows(dout, block_rows)[0]
    rows = x_pad.shape[0]
    fmask_pad = _pad_rows(fmask, block_rows)[0] if fmask is not None else None
    rmask_pad = _pad_rows(rmask, block_rows)[0] if rmask is not None else None
    specs, args = _ffw_ln_args(
        x_pad, w1, b1, w2, b2, gamma, beta, fmask_pad, rmask_pad,
        block_rows, cast,
    )
    # dout streams after the 7 fixed inputs, before the masks
    row = lambda last: pl.BlockSpec(  # noqa: E731
        (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    specs.insert(7, row(d_in))
    args.insert(7, dout_pad)
    whole = lambda i: (0, 0)  # noqa: E731
    kernel = functools.partial(
        _ffw_ln_bwd_kernel,
        has_fmask=fmask is not None, has_rmask=rmask is not None,
        inv_keep=inv_keep, eps=eps, cast_bf16=cast,
    )
    dx, dw1, db1l, dw2, db2l, dgl, dbtl = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=specs,
        out_specs=(
            row(d_in),
            pl.BlockSpec((d_in, d_ff), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_ff), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ff, d_in), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_in), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_in), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_in), whole, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d_in), x.dtype),
            jax.ShapeDtypeStruct((d_in, d_ff), jnp.float32),
            jax.ShapeDtypeStruct((8, d_ff), jnp.float32),
            jax.ShapeDtypeStruct((d_ff, d_in), jnp.float32),
            jax.ShapeDtypeStruct((8, d_in), jnp.float32),
            jax.ShapeDtypeStruct((8, d_in), jnp.float32),
            jax.ShapeDtypeStruct((8, d_in), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d_in * d_ff,
            bytes_accessed=x_pad.size * 12 + (w1.size + w2.size) * 8,
            transcendentals=rows,
        ),
    )(*args)
    return (
        dx[:n], dw1, jnp.sum(db1l, 0), dw2, jnp.sum(db2l, 0),
        jnp.sum(dgl, 0), jnp.sum(dbtl, 0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffw_ln_core(config, x, w1, b1, w2, b2, gamma, beta, fmask, rmask):
    out, _ = _ffw_ln_core_fwd(config, x, w1, b1, w2, b2, gamma, beta, fmask, rmask)
    return out


def _ffw_ln_core_fwd(config, x, w1, b1, w2, b2, gamma, beta, fmask, rmask):
    has_fmask, has_rmask, inv_keep, eps, interpret = config
    out = _ffw_ln_forward(
        x, w1, b1, w2, b2, gamma, beta,
        fmask if has_fmask else None, rmask if has_rmask else None,
        inv_keep=inv_keep, eps=eps, interpret=interpret,
    )
    return out, (x, w1, b1, w2, b2, gamma, beta, fmask, rmask)


def _ffw_ln_core_bwd(config, res, dout):
    has_fmask, has_rmask, inv_keep, eps, interpret = config
    x, w1, b1, w2, b2, gamma, beta, fmask, rmask = res
    dx, dw1, db1, dw2, db2, dg, dbt = _ffw_ln_backward(
        x, w1, b1, w2, b2, gamma, beta,
        fmask if has_fmask else None, rmask if has_rmask else None,
        dout.astype(jnp.float32),
        inv_keep=inv_keep, eps=eps, interpret=interpret,
    )
    return (
        dx,
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
        dg.astype(gamma.dtype), dbt.astype(beta.dtype),
        np.zeros(fmask.shape, jax.dtypes.float0),
        np.zeros(rmask.shape, jax.dtypes.float0),
    )


_ffw_ln_core.defvjp(_ffw_ln_core_fwd, _ffw_ln_core_bwd)


def fused_mlp_residual_ln(
    x: jax.Array,  # [N, d_in]
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    gamma: jax.Array, beta: jax.Array,  # LayerNorm scale/bias [d_in]
    ffw_mask: Optional[jax.Array] = None,   # [N, d_ff] keep mask
    res_mask: Optional[jax.Array] = None,   # [N, d_in] keep mask
    keep_prob: float = 1.0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x + dropout(ffw(x)))`` in one kernel; differentiable.

    Neither the ``[N, d_ff]`` hidden activation nor the FFW output / residual
    sum ever reach HBM. flax ``nn.LayerNorm`` semantics (fast variance,
    default eps 1e-6).
    """
    has_fmask = ffw_mask is not None
    has_rmask = res_mask is not None
    fmask = (
        ffw_mask.astype(jnp.uint8) if has_fmask
        else jnp.zeros((8, 128), jnp.uint8)
    )
    rmask = (
        res_mask.astype(jnp.uint8) if has_rmask
        else jnp.zeros((8, 128), jnp.uint8)
    )
    config = (has_fmask, has_rmask, _inv_keep(keep_prob), float(eps),
              bool(interpret))
    return _ffw_ln_core(config, x, w1, b1, w2, b2, gamma, beta, fmask, rmask)


# ---------------------------------------------------------------------------
# fused out-projection + residual dropout + add + LayerNorm (the transformer
# layer's FIRST half, post-attention)
# ---------------------------------------------------------------------------
#
# Sibling of fused_mlp_residual_ln for the attention side: computes
#   out = LayerNorm(x + dropout(attended @ Wo + bo))
# per row tile, so the projected attention output, its dropout round trip,
# the residual sum, and norm1's read+write never touch HBM.


def _proj_ln_fwd_kernel(
    x_ref, a_ref, wo_ref, bo_ref, g_ref, bt_ref, *rest,
    has_rmask, inv_keep, eps, cast_bf16,
):
    if has_rmask:
        rmask_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[:]
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    y = (
        jax.lax.dot_general(
            a_ref[:].astype(cd), wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:]
    )
    if has_rmask:
        y = y * (rmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep)
    r = x + y
    out, _xhat, _inv = _ln_rows(r, g_ref[:], bt_ref[:], eps)
    o_ref[:] = out.astype(o_ref.dtype)


def _proj_ln_bwd_kernel(
    x_ref, a_ref, wo_ref, bo_ref, g_ref, bt_ref, do_ref, *rest,
    has_rmask, inv_keep, eps, cast_bf16,
):
    if has_rmask:
        rmask_ref, dx_ref, da_ref, dwo_ref, dbo_ref, dg_ref, dbt_ref = rest
    else:
        dx_ref, da_ref, dwo_ref, dbo_ref, dg_ref, dbt_ref = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)

    x = x_ref[:]
    a = a_ref[:]
    cd = jnp.bfloat16 if cast_bf16 else x.dtype
    rows = x.shape[0]
    do = do_ref[:]

    y = (
        jax.lax.dot_general(
            a.astype(cd), wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:]
    )
    if has_rmask:
        rscale = rmask_ref[:].astype(jnp.int32).astype(jnp.float32) * inv_keep
        y = y * rscale
    r = x + y
    gamma = g_ref[:]
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv

    dg_ref[:] = dg_ref[:] + jnp.sum(
        (do * xhat).reshape(rows // 8, 8, -1), axis=0
    )
    dbt_ref[:] = dbt_ref[:] + jnp.sum(do.reshape(rows // 8, 8, -1), axis=0)
    gdo = do * gamma
    mean_g = jnp.mean(gdo, axis=-1, keepdims=True)
    mean_gx = jnp.mean(gdo * xhat, axis=-1, keepdims=True)
    dr = (gdo - mean_g - xhat * mean_gx) * inv

    dy = dr * rscale if has_rmask else dr
    dbo_ref[:] = dbo_ref[:] + jnp.sum(dy.reshape(rows // 8, 8, -1), axis=0)
    dwo_ref[:] = dwo_ref[:] + jax.lax.dot_general(
        a.astype(cd), dy.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da_ref[:] = jax.lax.dot_general(
        dy.astype(cd), wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(da_ref.dtype)
    dx_ref[:] = dr.astype(dx_ref.dtype)


def _proj_ln_forward(x, a, wo, bo, gamma, beta, rmask, *, inv_keep, eps, interpret):
    cast = not interpret and x.dtype == jnp.float32
    d = x.shape[1]
    block_rows = _pick_block_rows(d, 1 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    a_pad = _pad_rows(a, block_rows)[0]
    rows = x_pad.shape[0]
    if cast:
        wo = wo.astype(jnp.bfloat16)
    whole = lambda i: (0, 0)  # noqa: E731
    row = lambda last: pl.BlockSpec(  # noqa: E731
        (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    specs = [
        row(d), row(d),
        pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
    ]
    args = [x_pad, a_pad, wo, bo.reshape(1, -1), gamma.reshape(1, -1), beta.reshape(1, -1)]
    if rmask is not None:
        specs.append(row(d))
        args.append(_pad_rows(rmask, block_rows)[0])
    kernel = functools.partial(
        _proj_ln_fwd_kernel, has_rmask=rmask is not None,
        inv_keep=inv_keep, eps=eps, cast_bf16=cast,
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=specs,
        out_specs=row(d),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:n]


def _proj_ln_backward(x, a, wo, bo, gamma, beta, rmask, dout, *, inv_keep, eps, interpret):
    cast = not interpret and x.dtype == jnp.float32
    dx_dtype = x.dtype
    d = x.shape[1]
    block_rows = _pick_block_rows(d, 1 << 20)
    x_pad, n = _pad_rows(x, block_rows)
    a_pad = _pad_rows(a, block_rows)[0]
    dout_pad = _pad_rows(dout, block_rows)[0]
    rows = x_pad.shape[0]
    if cast:
        wo = wo.astype(jnp.bfloat16)
    whole = lambda i: (0, 0)  # noqa: E731
    row = lambda last: pl.BlockSpec(  # noqa: E731
        (block_rows, last), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    specs = [
        row(d), row(d),
        pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), whole, memory_space=pltpu.VMEM),
        row(d),
    ]
    args = [x_pad, a_pad, wo, bo.reshape(1, -1), gamma.reshape(1, -1),
            beta.reshape(1, -1), dout_pad]
    if rmask is not None:
        specs.append(row(d))
        args.append(_pad_rows(rmask, block_rows)[0])
    kernel = functools.partial(
        _proj_ln_bwd_kernel, has_rmask=rmask is not None,
        inv_keep=inv_keep, eps=eps, cast_bf16=cast,
    )
    dx, da, dwo, dbo_l, dg_l, dbt_l = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=specs,
        out_specs=(
            row(d), row(d),
            pl.BlockSpec((d, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), whole, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), dx_dtype),
            jax.ShapeDtypeStruct((rows, d), a.dtype),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return (
        dx[:n], da[:n], dwo, jnp.sum(dbo_l, 0), jnp.sum(dg_l, 0),
        jnp.sum(dbt_l, 0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _proj_ln_core(config, x, a, wo, bo, gamma, beta, rmask):
    out, _ = _proj_ln_core_fwd(config, x, a, wo, bo, gamma, beta, rmask)
    return out


def _proj_ln_core_fwd(config, x, a, wo, bo, gamma, beta, rmask):
    has_rmask, inv_keep, eps, interpret = config
    out = _proj_ln_forward(
        x, a, wo, bo, gamma, beta, rmask if has_rmask else None,
        inv_keep=inv_keep, eps=eps, interpret=interpret,
    )
    return out, (x, a, wo, bo, gamma, beta, rmask)


def _proj_ln_core_bwd(config, res, dout):
    has_rmask, inv_keep, eps, interpret = config
    x, a, wo, bo, gamma, beta, rmask = res
    dx, da, dwo, dbo, dg, dbt = _proj_ln_backward(
        x, a, wo, bo, gamma, beta, rmask if has_rmask else None,
        dout.astype(jnp.float32),
        inv_keep=inv_keep, eps=eps, interpret=interpret,
    )
    return (
        dx, da,
        dwo.astype(wo.dtype), dbo.astype(bo.dtype),
        dg.astype(gamma.dtype), dbt.astype(beta.dtype),
        np.zeros(rmask.shape, jax.dtypes.float0),
    )


_proj_ln_core.defvjp(_proj_ln_core_fwd, _proj_ln_core_bwd)


def fused_proj_residual_ln(
    x: jax.Array,         # [N, d] residual stream
    attended: jax.Array,  # [N, d] attention output (pre out-projection)
    wo: jax.Array, bo: jax.Array,        # out-projection [d, d], [d]
    gamma: jax.Array, beta: jax.Array,   # LayerNorm scale/bias [d]
    res_mask: Optional[jax.Array] = None,  # [N, d] keep mask
    keep_prob: float = 1.0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x + dropout(attended @ wo + bo))`` in one kernel."""
    has_rmask = res_mask is not None
    rmask = (
        res_mask.astype(jnp.uint8) if has_rmask
        else jnp.zeros((8, 128), jnp.uint8)
    )
    config = (has_rmask, _inv_keep(keep_prob), float(eps), bool(interpret))
    return _proj_ln_core(config, x, attended, wo, bo, gamma, beta, rmask)
