"""Tensor-parallel composition of the Pallas kernels (shard_map + psum).

The training path's tensor parallelism is GSPMD: params carry
``NamedSharding`` annotations (``mesh.tp_param_spec``) and XLA partitions
the (pure-XLA) graph, inserting collectives automatically. That works
because the graph is transparent to the SPMD partitioner. A ``pallas_call``
is NOT — XLA treats it as an opaque custom call and would replicate its
operands rather than partition the computation.

This module provides the explicit composition for pod-scale deployment:
Megatron column/row sharding of the transformer feed-forward with the
fused Pallas kernel (``ops/pallas_mlp.py``) running INSIDE each model
shard, under ``jax.shard_map``:

- ``W1 [H, F]`` shards over columns (``P(None, 'model')``), ``b1`` over
  ``P('model')`` — each shard computes its slice of the hidden activation
  entirely in VMEM,
- the ReLU/dropout are elementwise over the sharded F dim — no collective,
- ``W2 [F, H]`` shards over rows (``P('model', None)``) — each shard's
  second matmul yields a PARTIAL ``[N, H]`` output,
- one ``psum`` over the model axis completes the sum; ``b2`` is added once,
  after the reduction.

The batch axis (if the mesh has one) stays sharded throughout — the psum
rides only the model axis. Fully differentiable (shard_map composes with
the kernel's custom VJP; the weight gradients come back sharded exactly
like the weights). Validated against the single-device XLA path on a
virtual CPU mesh in ``tests/test_tp_kernels.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from ..ops.pallas_mlp import fused_mlp


def tp_fused_mlp(
    mesh,
    x: jax.Array,  # [N, d_in] (batch axis shardable over 'data')
    w1: jax.Array,  # [d_in, d_ff]   sharded P(None, 'model')
    b1: jax.Array,  # [d_ff]         sharded P('model')
    w2: jax.Array,  # [d_ff, d_out]  sharded P('model', None)
    b2: jax.Array,  # [d_out]        replicated
    keep_mask: Optional[jax.Array] = None,  # [N, d_ff] sharded like b1
    keep_prob: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused feed-forward under Megatron tensor parallelism. Returns [N, d_out].

    Each model shard runs the Pallas kernel on its F-slice of the weights;
    a single ``psum`` over ``'model'`` combines the partial outputs. The
    dropout ``keep_mask`` (when given) must be sharded on its F axis with
    the same spec as ``b1`` — the caller draws ONE global mask and lets
    shard_map slice it, so the realised dropout pattern is identical to the
    single-device path.
    """
    has_mask = keep_mask is not None
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    x_spec = P(data, None)
    mask_spec = P(data, MODEL_AXIS)

    def body(x_s, w1_s, b1_s, w2_s, mask_s):
        partial = fused_mlp(
            x_s,
            w1_s,
            b1_s,
            w2_s,
            jnp.zeros((w2_s.shape[1],), jnp.float32),  # b2 added post-psum
            mask_s if has_mask else None,
            keep_prob,
            interpret=interpret,
        )
        return jax.lax.psum(partial, MODEL_AXIS)

    if not has_mask:
        # a zero-size placeholder keeps one shard_map signature for both
        # modes without shipping a fake full-size mask
        keep_mask = jnp.zeros((x.shape[0], 0), jnp.uint8)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(x_spec, P(None, MODEL_AXIS), P(MODEL_AXIS),
                  P(MODEL_AXIS, None), mask_spec),
        out_specs=x_spec,
        # pallas_call's out_shape carries no varying-mesh-axes metadata, so
        # the vma replication check cannot see through it; correctness of
        # the out_specs is pinned by tests/test_tp_kernels.py instead
        check_vma=False,
    )
    out = mapped(x, w1, b1, w2, keep_mask)
    return out + b2.astype(out.dtype)
