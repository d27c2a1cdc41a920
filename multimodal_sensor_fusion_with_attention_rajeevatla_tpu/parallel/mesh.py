"""Device mesh + sharding layout for data-parallel training.

The reference is single-process/single-device; its only scale-out is a CI job
matrix (SURVEY §2). The TPU-native scale-out story is SPMD data parallelism
over a ``jax.sharding.Mesh`` (e.g. the 8 chips of a v5e-8):

- model parameters + optimizer state: replicated,
- the device-resident dataset: replicated (it is small; each chip holds it),
- per-step batch gathers: sharded along the batch axis (``P('data')``),
- loss/metric reductions: ``psum`` inserted automatically by XLA under
  ``jit`` — collectives ride ICI, nothing crosses a process boundary.

Everything works identically on 1 device (trivial mesh) or a CPU host mesh
(``--xla_force_host_platform_device_count``) used by the unit tests and the
driver's multi-chip dry-run.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"
PIPE_AXIS = "pipe"

# Active mesh for ACTIVATION sharding constraints (sequence parallelism).
# Model modules are built from config with no mesh in scope, so the Trainer
# publishes its mesh here for the duration of fit/eval; the transformer
# layers consult it AT TRACE TIME to emit `with_sharding_constraint`s. When
# unset (single-device runs, unit tests, eval CLI) every constraint helper
# is an exact no-op.
_ACTIVATION_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "msfa_activation_mesh", default=None
)


@contextlib.contextmanager
def activation_mesh(mesh: Optional[Mesh]):
    """Publish ``mesh`` as the activation-sharding mesh for the block."""
    token = _ACTIVATION_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVATION_MESH.reset(token)


def current_activation_mesh() -> Optional[Mesh]:
    return _ACTIVATION_MESH.get()


def _batch_axes(mesh: Mesh):
    axes = tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)
    if not axes:
        return None
    return axes if len(axes) > 1 else axes[0]


def seq_sharded_constraint(x: jax.Array) -> jax.Array:
    """Constrain a ``[B, T, H]`` activation to the SEQUENCE-PARALLEL layout:
    batch over (dcn, data), time over "model" (Megatron sequence
    parallelism). Applied in the norm/dropout/residual regions of the
    transformer layer, where the tensor-parallel group would otherwise hold
    ``model_parallel`` redundant copies of the full activation. No-op without
    an active mesh or without a "model" axis."""
    mesh = current_activation_mesh()
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return x
    spec = P(_batch_axes(mesh), MODEL_AXIS, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def seq_gathered_constraint(x: jax.Array) -> jax.Array:
    """Constrain a ``[B, T, H]`` activation to the TENSOR-PARALLEL region
    layout: batch sharded, time REPLICATED over "model" (XLA materialises the
    all-gather that re-enters the attention/FFW matmuls). No-op without an
    active mesh or without a "model" axis."""
    mesh = current_activation_mesh()
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return x
    spec = P(_batch_axes(mesh), None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def expert_sharded_constraint(x: jax.Array, num_experts: int) -> jax.Array:
    """Constrain an ``[E, C, H]`` MoE expert buffer to the EXPERT-PARALLEL
    layout: experts sharded over the "model" axis (each tensor-parallel rank
    owns ``E / M`` experts' tokens and weights; XLA materialises the token
    exchange). No-op without an active mesh, without a "model" axis, or when
    the expert count does not divide evenly over it."""
    mesh = current_activation_mesh()
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return x
    if num_experts % mesh.shape[MODEL_AXIS]:
        return x
    spec = P(MODEL_AXIS, None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed(par_cfg) -> bool:
    """Multi-process (multi-host pod) runtime init from the ``parallel:``
    config block.

    ``parallel.coordinator_address: "host:port"`` turns the process into one
    rank of a single-controller JAX job: ``jax.distributed.initialize`` wires
    the cross-host runtime so ``jax.devices()`` returns the GLOBAL device
    set and every mesh/sharding built here spans the pod (``num_processes``
    / ``process_id`` are optional — on TPU pods JAX infers both from the
    runtime environment). The rest of the stack is unchanged: the same
    ``make_mesh`` axes, ``state_shardings``, and batch shardings apply,
    with each process feeding its addressable shards through
    ``jax.device_put``.

    No-op (returns False) without a coordinator address; idempotent across
    Trainers in one process AND against an externally pre-initialised
    runtime. A REAL two-process rendezvous (two OS processes, one 8-device
    global CPU mesh, full Trainer.fit) runs in CI —
    ``tests/test_multiprocess.py``; config plumbing is additionally
    unit-tested via injection in ``tests/test_parallel.py``.
    """
    global _DISTRIBUTED_INITIALIZED
    cfg = par_cfg or {}
    coord = cfg.get("coordinator_address")
    if not coord:
        return False
    # idempotent against BOTH this module's own prior call and a launcher /
    # user script that already ran jax.distributed.initialize() itself (the
    # documented JAX pattern) — a second initialize() raises
    if _DISTRIBUTED_INITIALIZED or (
        hasattr(jax.distributed, "is_initialized")
        and jax.distributed.is_initialized()
    ):
        _DISTRIBUTED_INITIALIZED = True
        return True
    kwargs = {"coordinator_address": str(coord)}
    if cfg.get("num_processes") is not None:
        kwargs["num_processes"] = int(cfg["num_processes"])
    if cfg.get("process_id") is not None:
        kwargs["process_id"] = int(cfg["process_id"])
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
    model_parallel: int = 1,
    dcn_slices: int = 1,
    pipeline_parallel: int = 1,
) -> Mesh:
    """Device mesh over the first ``num_devices`` devices.

    ``model_parallel=1`` (default): 1-D data-parallel mesh ``("data",)``.
    ``model_parallel=M``: 2-D ``("data", "model")`` mesh of shape
    ``(num_devices // M, M)`` — batch shards over "data", the transformer
    feed-forward weights shard over "model" (see :func:`tp_param_spec`);
    XLA's SPMD partitioner inserts the all-gather/reduce-scatter collectives
    over ICI.
    ``dcn_slices=K``: adds a LEADING "dcn" axis of size K — the multi-slice
    layout. The dcn axis carries pure data parallelism (the batch shards
    over ("dcn", "data") jointly and params stay replicated across it), so
    the only cross-slice collective is the once-per-step gradient psum —
    the standard slow-outer-network recipe. On real multi-slice hardware
    the leading axis maps to the slice boundary; on a single slice / CPU
    mesh it is exercised as a logical axis with identical program
    structure.

    When the default backend has fewer than ``num_devices`` chips, fall back
    to the host CPU device pool (``--xla_force_host_platform_device_count``):
    the tests and the driver's multi-chip dry-run validate the SPMD program on
    a virtual CPU mesh exactly this way.
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None and num_devices > len(devices):
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= num_devices:
                devices = cpu
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices but only {len(devices)} available"
            )
        devices = devices[:num_devices]
    model_parallel = int(model_parallel or 1)
    dcn_slices = int(dcn_slices or 1)
    pipeline_parallel = int(pipeline_parallel or 1)
    if pipeline_parallel > 1 and model_parallel > 1:
        raise ValueError(
            "pipeline_parallel and model_parallel cannot be combined "
            "(the pipelined layer stack runs under a shard_map that is "
            "manual over 'pipe' only)"
        )
    n = len(devices)
    if n % (model_parallel * dcn_slices * pipeline_parallel):
        raise ValueError(
            f"model_parallel={model_parallel} x dcn_slices={dcn_slices} "
            f"x pipeline_parallel={pipeline_parallel} "
            f"must divide the device count ({n})"
        )
    if pipeline_parallel > 1:
        data = n // (dcn_slices * pipeline_parallel)
        if dcn_slices > 1:
            devices = _slice_grouped(devices, dcn_slices)
            grid = np.array(devices).reshape(
                dcn_slices, data, pipeline_parallel
            )
            return Mesh(grid, (DCN_AXIS, axis_name, PIPE_AXIS))
        grid = np.array(devices).reshape(data, pipeline_parallel)
        return Mesh(grid, (axis_name, PIPE_AXIS))
    data = n // (model_parallel * dcn_slices)
    if dcn_slices > 1 and model_parallel > 1:
        devices = _slice_grouped(devices, dcn_slices)
        grid = np.array(devices).reshape(dcn_slices, data, model_parallel)
        return Mesh(grid, (DCN_AXIS, axis_name, MODEL_AXIS))
    if dcn_slices > 1:
        devices = _slice_grouped(devices, dcn_slices)
        grid = np.array(devices).reshape(dcn_slices, data)
        return Mesh(grid, (DCN_AXIS, axis_name))
    if model_parallel > 1:
        grid = np.array(devices).reshape(data, model_parallel)
        return Mesh(grid, (axis_name, MODEL_AXIS))
    return Mesh(np.array(devices), (axis_name,))


def _slice_grouped(devices, dcn_slices: int):
    """Order devices so equal-size contiguous groups align with REAL slice
    boundaries — ``jax.devices()`` order is not contractually
    slice-contiguous on a multi-slice pod, and a raw reshape could put
    devices from different slices in the same ici row (per-step tp/dp
    collectives would then ride the slow DCN). On virtual/CPU meshes (no
    ``slice_index`` attribute) the given order is kept: the dcn axis is a
    logical axis there, exercised for program-structure parity only."""
    idx = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in idx):
        return list(devices)
    ordered = sorted(devices, key=lambda d: (d.slice_index, d.id))
    per = len(ordered) // dcn_slices
    for g in range(dcn_slices):
        group = ordered[g * per:(g + 1) * per]
        if len({d.slice_index for d in group}) != 1:
            raise ValueError(
                f"dcn_slices={dcn_slices} does not match the hardware slice "
                f"layout (found slice indices {sorted(set(idx))} over "
                f"{len(ordered)} devices)"
            )
    return ordered


def tp_param_spec(path_names: Sequence[str]) -> P:
    """Tensor-parallel PartitionSpec for a param (or optimizer-moment) leaf.

    The transformer encoder's feed-forward pair dominates its FLOPs and
    params; Megatron-style column/row sharding over the "model" axis:

    - ``linear1/kernel [H, ffw]`` -> shard ffw columns ``P(None, "model")``
      (+ its bias ``P("model")``),
    - ``linear2/kernel [ffw, H]`` -> shard ffw rows ``P("model", None)``
      (bias replicated — it follows the row-reduced output).

    The relu between them is elementwise, so activations stay sharded on the
    ffw dim with NO collective in between; XLA inserts one reduce/all-gather
    after linear2. Everything else (attention, projections, fusion, RNNs)
    stays replicated over "model" — at hidden_dim 256 those matmuls are too
    small for TP to pay for its collectives.

    Works on params, Adam mu/nu (same tree paths), and any state mirror.
    """
    names = list(path_names)
    leaf = names[-1]
    # MoE expert weights (models/moe.py): the leading E dim shards over
    # "model" — EXPERT parallelism reuses the tensor-parallel axis (each
    # rank owns E/M experts). The router stays replicated (it is tiny and
    # every rank routes every token).
    if leaf in ("moe_w1", "moe_w2"):
        return P(MODEL_AXIS, None, None)
    if leaf in ("moe_b1", "moe_b2"):
        return P(MODEL_AXIS, None)
    for i, name in enumerate(names[:-1]):
        if name == "linear1":
            if leaf == "kernel":
                return P(None, MODEL_AXIS)
            if leaf == "bias":
                return P(MODEL_AXIS)
        if name == "linear2" and leaf == "kernel":
            return P(MODEL_AXIS, None)
    return P()


def zero_extend_spec(spec: P, shape, n_data: int) -> P:
    """Extend a PartitionSpec with the "data" axis for ZeRO-1 sharding.

    Inserts ``DATA_AXIS`` into the FIRST dimension that is currently
    unsharded and whose size divides evenly by ``n_data`` (the data-axis
    size). Dimensions already sharded (e.g. Megatron "model" on a tp mesh)
    are kept — ZeRO composes with tensor parallelism by sharding a
    *different* dim of the same leaf. Pipeline-parallel ``pipe_layers``
    leaves never reach this function: :func:`state_shardings` deliberately
    skips ZeRO extension for them (see the inline note there — mixed
    pipe+data moment sharding CHECK-failed XLA's SPMD partitioner during
    bring-up, and those moments are already distributed 1/P over "pipe").
    Returns the original spec when no dimension qualifies (the leaf stays
    replicated).
    """
    ndim = len(shape)
    entries = list(spec) + [None] * (ndim - len(spec))
    for i in range(ndim):
        if entries[i] is None and shape[i] % n_data == 0 and shape[i] >= n_data:
            entries[i] = DATA_AXIS
            while entries and entries[-1] is None:
                entries.pop()
            return P(*entries)
    return spec


def _path_names(path) -> list:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if key is None:
            key = getattr(entry, "idx", None)
        names.append(str(key))
    return names


def state_shardings(mesh: Mesh, tree, zero_optimizer: bool = False):
    """NamedSharding pytree for a train state / param tree.

    On a 1-D (data-only) mesh everything is replicated; on a 2-D mesh the
    tensor-parallel rule (:func:`tp_param_spec`) applies wherever the leaf's
    path names a sharded layer — params AND optimizer moments match because
    optax moment trees mirror the param tree's nesting.

    ``zero_optimizer=True`` (ZeRO-1, `parallel.zero_optimizer`): every
    array leaf under an ``opt_state`` path (Adam mu/nu, MultiSteps
    accumulators — trees that mirror params) additionally shards over the
    "data" axis on its first evenly-divisible unsharded dim
    (:func:`zero_extend_spec`) — EXCEPT ``pipe_layers`` moments, which stay
    sharded only over "pipe" (see the inline note below; they are already
    distributed 1/P). Params stay replicated, so the math is
    unchanged: XLA materialises the update as reduce-scatter(grad) →
    sharded moment/delta math → all-gather(delta) — each data rank holds
    1/N of the optimizer state instead of a full copy. The "dcn" axis is
    deliberately NOT used: ZeRO's per-step all-gather must ride ICI, not
    the slow cross-slice network.
    """
    has_model = MODEL_AXIS in mesh.axis_names
    has_pipe = PIPE_AXIS in mesh.axis_names
    zero_n = (
        int(mesh.shape[DATA_AXIS])
        if zero_optimizer and DATA_AXIS in mesh.axis_names
        else 0
    )
    if not (has_model or has_pipe or zero_n > 1):
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)

    def one(path, leaf):
        names = _path_names(path)
        # stacked pipeline-parallel layer params (parallel/pipeline.py):
        # the leading [L] layer dim shards over "pipe"
        is_pipe_leaf = has_pipe and "pipe_layers" in names
        if is_pipe_leaf:
            spec = P(PIPE_AXIS)
        else:
            spec = tp_param_spec(names) if has_model else P()
        # rank guard: a spec longer than the leaf's rank is invalid
        if len(spec) > getattr(leaf, "ndim", 0):
            spec = P()
        # ZeRO-1 never touches pipe_layers moments: they are already
        # distributed 1/P over "pipe" (the memory win ZeRO targets), and
        # mixed pipe+data moment sharding next to the pipe-manual shard_map
        # sits on XLA SPMD partitioner paths that CHECK-failed during
        # bring-up (spmd_partitioner_util.cc scatter grouping) — kept
        # conservative even after the schedule's scatter was rewritten.
        if zero_n > 1 and "opt_state" in names and not is_pipe_leaf:
            shape = getattr(leaf, "shape", ())
            if len(spec) <= len(shape):
                spec = zero_extend_spec(spec, shape, zero_n)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def resolve_num_devices(requested) -> int:
    """Map a ``parallel.num_devices`` config value to a device count.

    ``auto`` = every visible device of the default backend; ``None``/``1``/
    falsy = single-device (no mesh).
    """
    if requested in (None, False, "", "none", "null"):
        return 1
    if isinstance(requested, str) and requested.lower() == "auto":
        return len(jax.devices())
    return int(requested)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh (incl. dcn)."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, axis_name)))
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array in a batch pytree with its batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
