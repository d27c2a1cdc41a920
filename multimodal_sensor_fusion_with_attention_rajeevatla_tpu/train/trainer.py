"""Training runtime: pure-JAX optax loops compiled whole-epoch.

Replaces the reference's Lightning module + Trainer (``src/train.py:125-554``)
with a functional design:

- ``TrainState`` is a pytree (params, batch_stats, opt_state, rng, step).
- ``build_optimizer`` reproduces the reference's optimizer/scheduler space:
  AdamW/Adam (+"Unknown optimizer" error), cosine (per-epoch, eta_min=lr/100)
  or StepLR(30, 0.1) schedules, global-norm gradient clipping, gradient
  accumulation (``optax.MultiSteps``), label smoothing.
- The hot loop is ONE jitted ``lax.scan`` over all steps of an epoch: the
  device-resident dataset is passed in, per-step batches are device gathers,
  modality dropout is drawn from the carried PRNG inside the scan — there is
  no per-step Python, no per-step host<->device traffic (the TPU-native
  replacement for torch.compile + DataLoader workers; reference
  ``src/train.py:29-122`` compile cache becomes simply "jit once per fit").
- Early stopping on ``val/loss`` with the reference's patience semantics, and
  top-k Orbax checkpoints via ``CheckpointManager``.
"""

from __future__ import annotations

import contextlib
import json
import math
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.dataset import BatchLoader, WindowedSplit
from ..data.device import DeviceSplit, device_put_split
from ..models.module import MultimodalFusionModel
from ..ops.metrics import cross_entropy_loss
from ..parallel.mesh import (
    activation_mesh,
    make_mesh,
    maybe_initialize_distributed,
    replicated_sharding,
    resolve_num_devices,
    state_shardings,
)
from .checkpoint import CheckpointManager


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def lr_schedule(
    scheduler: str,
    learning_rate: float,
    max_epochs: int,
    updates_per_epoch: int,
) -> Callable[[jax.Array], jax.Array]:
    """Per-epoch LR schedules matching torch semantics.

    cosine: ``CosineAnnealingLR(T_max=max_epochs, eta_min=lr/100)`` evaluated
    at the epoch index (reference ``src/train.py:395-404``).
    step: ``StepLR(step_size=30, gamma=0.1)`` (reference ``:405-412``).
    """
    updates_per_epoch = max(1, updates_per_epoch)

    def schedule(count):
        epoch = jnp.floor_divide(count, updates_per_epoch).astype(jnp.float32)
        epoch = jnp.minimum(epoch, max_epochs)
        if scheduler == "cosine":
            eta_min = learning_rate / 100.0
            return eta_min + 0.5 * (learning_rate - eta_min) * (
                1.0 + jnp.cos(jnp.pi * epoch / max(max_epochs, 1))
            )
        if scheduler == "step":
            return learning_rate * jnp.power(0.1, jnp.floor(epoch / 30.0))
        return jnp.asarray(learning_rate)

    return schedule


def build_optimizer(
    training_cfg,
    steps_per_epoch: int,
) -> Tuple[optax.GradientTransformation, int]:
    """Optimizer chain from the ``training:`` config block. Returns
    ``(optimizer, accumulation)``."""
    name = str(training_cfg.get("optimizer", "adamw"))
    lr = float(training_cfg.get("learning_rate", 1e-3))
    weight_decay = float(training_cfg.get("weight_decay", 0.0))
    clip = float(training_cfg.get("gradient_clip_norm", 0.0) or 0.0)
    accum = int(training_cfg.get("gradient_accumulation", 1) or 1)
    max_epochs = int(training_cfg.get("max_epochs", 1))
    scheduler = str(training_cfg.get("scheduler", "none"))
    updates_per_epoch = max(1, steps_per_epoch // max(1, accum))

    schedule = lr_schedule(scheduler, lr, max_epochs, updates_per_epoch)
    if name == "adamw":
        opt = optax.adamw(schedule, weight_decay=weight_decay)
    elif name == "adam":
        # torch Adam applies L2 via the gradient (coupled), not decoupled decay
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.adam(schedule),
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    chain = [optax.clip_by_global_norm(clip)] if clip > 0 else []
    chain.append(opt)
    tx: optax.GradientTransformation = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, accum


class Trainer:
    """Config-driven experiment driver (reference ``src/train.py:433-554``).

    Typical use::

        trainer = Trainer(config)
        results = trainer.fit(train_windows, val_windows, test_windows)

    ``fit`` trains with whole-epoch compiled scans, early-stops on val loss,
    checkpoints top-k, evaluates the best checkpoint on test, and writes
    ``results.json`` with the reference's schema
    (best_model_path / best_val_loss / config).
    """

    def __init__(self, config, model: Optional[MultimodalFusionModel] = None):
        self.config = config
        # multi-host pods: parallel.coordinator_address must wire the cross-
        # process runtime BEFORE anything initialises the XLA backend —
        # from_config below resolves "auto" kernel flags via
        # jax.default_backend(), after which jax.distributed.initialize()
        # refuses to run. Idempotent (no-op without the config key).
        maybe_initialize_distributed(config.get("parallel", {}))
        self.model = model or MultimodalFusionModel.from_config(config)
        self.label_smoothing = float(config.training.get("label_smoothing", 0.0))
        # jax.checkpoint around the forward pass: trades recompute for
        # activation memory (useful for chunk_size >= 2048 windows)
        self.remat = bool(config.training.get("remat", False))
        augmentation = config.training.get("augmentation", {}) or {}
        self.modality_dropout = float(augmentation.get("modality_dropout", 0.0))
        # On-device train-time augmentation. (The reference declares these
        # config keys but never wires them; here they are real.)
        self.gaussian_noise = float(augmentation.get("gaussian_noise", 0.0))
        self.temporal_jitter = float(augmentation.get("temporal_jitter", 0.0))
        self.batch_size = int(config.dataset.get("batch_size", 32))
        self.seed = int(config.get("seed", 42))
        # training.prng_impl: threefry (default; bit-reproducible across
        # backends/versions) | rbg (XLA RngBitGenerator). Dropout-mask bit
        # generation is a REAL cost of the train step on TPU — measured on
        # v5e at the transformer flagship (chunk 512, batch 64): threefry
        # 1214 train-windows/s, rbg 1624 (+34%), no-dropout 1924. rbg's
        # streams are deterministic per key but may change across compiler
        # versions, hence opt-in.
        prng_impl = str(config.training.get("prng_impl", "")).lower() or "threefry"
        if prng_impl not in ("threefry", "rbg", "unsafe_rbg"):
            raise ValueError(
                f"Unknown training.prng_impl {prng_impl!r}; "
                "expected threefry or rbg"
            )
        # ALWAYS set the impl (unset config -> the documented threefry
        # default) so a prior Trainer's rbg choice cannot leak into a later
        # Trainer in the same process
        jax.config.update(
            "jax_default_prng_impl",
            "threefry2x32" if prng_impl == "threefry" else prng_impl,
        )
        # dataset.streaming: true = do NOT keep the windowed split in HBM;
        # stream double-buffered host batches through StreamingDeviceLoader
        # and train with a per-batch jitted step. For datasets that outgrow
        # device memory; the default (false) whole-epoch scan is faster.
        self.streaming = bool(config.dataset.get("streaming", False))
        self._has_batch_stats = False
        # Mixture-of-Experts load-balance aux loss (models/moe.py sows it
        # into the "losses" collection; zero-weighting disables it).
        self.moe_aux_weight = float(
            config.training.get("moe_aux_weight", 0.01)
        )
        self._has_losses = False
        # SPMD data parallelism over a jax.sharding.Mesh (SURVEY §5/§7.5 —
        # the TPU-native replacement for the reference's CI-matrix scale-out):
        # params/opt-state replicated, per-step [S, B] index/weight matrices
        # sharded on the batch axis, collectives inserted by XLA over ICI.
        par_cfg = config.get("parallel", {}) or {}
        self.requested_devices = par_cfg.get("num_devices", 1)
        # parallel.model_parallel: M > 1 adds a second "model" mesh axis and
        # Megatron-shards the transformer feed-forward weights over it
        # (parallel/mesh.py::tp_param_spec); the mesh becomes
        # (num_devices // M) data x M model.
        self.model_parallel = int(par_cfg.get("model_parallel", 1) or 1)
        # parallel.dcn_slices: K > 1 adds a LEADING "dcn" mesh axis (multi-
        # slice layout): pure data parallelism across slices — batch shards
        # over ("dcn", "data"), params replicate, the only cross-slice
        # collective is the per-step gradient psum (rides DCN on real pods).
        self.dcn_slices = int(par_cfg.get("dcn_slices", 1) or 1)
        # parallel.sequence_parallel: shard the transformer layers' norm/
        # dropout/residual activations on the TIME axis across the tensor-
        # parallel group (Megatron sequence parallelism). The flag reaches
        # the model via MultimodalFusionModel.from_config; here it only
        # gates the config sanity check below.
        # parallel.pipeline_parallel: P > 1 adds a "pipe" mesh axis and runs
        # the transformer encoders' layer stack as a GPipe microbatch
        # pipeline (parallel/pipeline.py; layer params stacked [L, ...] and
        # sharded over "pipe"). parallel.microbatches tunes the bubble.
        self.pipeline_parallel = int(par_cfg.get("pipeline_parallel", 1) or 1)
        self.pipeline_microbatches = (
            int(par_cfg.get("microbatches", 0) or 0) or self.pipeline_parallel
        )
        if self.pipeline_parallel > 1 and self.model_parallel > 1:
            raise ValueError(
                "parallel.pipeline_parallel cannot be combined with "
                "parallel.model_parallel (the pipelined stack's shard_map "
                "is manual over 'pipe' only)"
            )
        # parallel.zero_optimizer: ZeRO-1 — shard the optimizer state (Adam
        # mu/nu, MultiSteps accumulators) over the "data" axis so each rank
        # holds 1/N of it instead of a full copy (params stay replicated;
        # XLA materialises reduce-scatter(grad) -> sharded update math ->
        # all-gather(delta), all over ICI). Numerics are unchanged.
        self.zero_optimizer = bool(par_cfg.get("zero_optimizer", False))
        self._opt_shardings = None
        self.sequence_parallel = bool(par_cfg.get("sequence_parallel", False))
        if self.sequence_parallel and self.model_parallel <= 1:
            raise ValueError(
                "parallel.sequence_parallel requires parallel.model_parallel"
                " > 1 (it shards activations across the tensor-parallel"
                " group)"
            )
        moe_experts = int(config.model.get("moe_experts", 0) or 0)
        if (
            moe_experts
            and self.model_parallel > 1
            and moe_experts % self.model_parallel
        ):
            raise ValueError(
                f"model.moe_experts ({moe_experts}) must divide evenly over "
                f"parallel.model_parallel ({self.model_parallel}) for expert"
                " parallelism"
            )
        self.mesh = None

    # -- mesh / placement ---------------------------------------------------
    def _ensure_mesh(self):
        """Build the mesh on first use (``parallel.num_devices`` > 1):
        1-D data-parallel, or 2-D data x model when model_parallel > 1."""
        if self.mesh is None:
            # multi-host pods: parallel.coordinator_address wires the
            # cross-process runtime FIRST so jax.devices() (and therefore
            # num_devices: auto and the mesh) spans the whole pod
            maybe_initialize_distributed(self.config.get("parallel", {}))
            n = resolve_num_devices(self.requested_devices)
            if n > 1:
                self.mesh = make_mesh(
                    n,
                    model_parallel=self.model_parallel,
                    dcn_slices=self.dcn_slices,
                    pipeline_parallel=self.pipeline_parallel,
                )
            elif (
                self.model_parallel > 1
                or self.dcn_slices > 1
                or self.pipeline_parallel > 1
                or self.zero_optimizer
            ):
                raise ValueError(
                    "parallel.model_parallel / parallel.dcn_slices / "
                    "parallel.pipeline_parallel / parallel.zero_optimizer "
                    "require parallel.num_devices > 1"
                )
        return self.mesh

    def _device_ctx(self):
        """Pin implicit array creation to the mesh's backend, and publish the
        mesh for ACTIVATION sharding constraints (sequence parallelism).

        Hermeticity: when training on a (possibly CPU) mesh, no ``jnp.asarray``
        may allocate on the DEFAULT backend — in the driver's dry-run env the
        default backend is a tunneled TPU that can be broken while the CPU
        mesh is fine.

        The activation-mesh publication lets transformer layers built with
        ``parallel.sequence_parallel`` emit their region-boundary
        ``with_sharding_constraint``s at trace time (parallel/mesh.py);
        models without the flag ignore it entirely.
        """
        if self.mesh is not None:
            # multi-host: the mesh spans the pod's GLOBAL device set, but a
            # process may only pin/commit to devices it can address — pick
            # the first mesh device owned by THIS process (single-process
            # meshes: that is devices.flat[0] unchanged)
            proc = jax.process_index()
            local = [
                d for d in self.mesh.devices.flat if d.process_index == proc
            ]
            stack = contextlib.ExitStack()
            stack.enter_context(
                jax.default_device(
                    local[0] if local else self.mesh.devices.flat[0]
                )
            )
            stack.enter_context(activation_mesh(self.mesh))
            return stack
        return contextlib.nullcontext()

    @property
    def n_shards(self) -> int:
        if self.mesh is None:
            return 1
        n = self.mesh.shape["data"]
        if "dcn" in self.mesh.axis_names:
            n *= self.mesh.shape["dcn"]
        return n

    def _effective_batch(self, batch_size: Optional[int] = None) -> int:
        """Round the batch up to a mesh-divisible size (pad rows get weight 0)."""
        b = int(batch_size or self.batch_size)
        n = self.n_shards
        if self.pipeline_parallel > 1:
            # the pipelined layer stack splits the batch into microbatches;
            # per-encoder pipeline_microbatches/pipeline_parallel overrides
            # each impose their own divisibility, so pad to the lcm of all
            n = math.lcm(n, self.pipeline_microbatches)
            encoders = self.config.model.get("encoders", {}) or {}
            for enc in encoders.values():
                pp = int(
                    enc.get("pipeline_parallel", self.pipeline_parallel) or 1
                )
                if pp > 1:
                    mb = int(enc.get("pipeline_microbatches", 0) or 0) or pp
                    n = math.lcm(n, mb)
        return ((b + n - 1) // n) * n

    def _step_sharding(self) -> Optional[NamedSharding]:
        """Sharding for the per-epoch ``[S, B]`` index/weight matrices."""
        if self.mesh is None:
            return None
        if "dcn" in self.mesh.axis_names:
            return NamedSharding(self.mesh, P(None, ("dcn", "data")))
        return NamedSharding(self.mesh, P(None, "data"))

    def _put_step_matrix(self, mat: np.ndarray, dtype) -> jax.Array:
        spec = self._step_sharding()
        mat = np.asarray(mat, dtype)
        if spec is None:
            return jnp.asarray(mat)
        return jax.device_put(mat, spec)

    def _put_split(self, windows: WindowedSplit) -> DeviceSplit:
        """Device-put a windowed split (replicated over the mesh if any)."""
        sharding = replicated_sharding(self.mesh) if self.mesh is not None else None
        return device_put_split(windows, sharding=sharding)

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch, steps_per_epoch: int) -> TrainState:
        features, labels, mask, lengths, _w = sample_batch
        rng = jax.random.PRNGKey(self.seed)
        init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": init_rng, "dropout": dropout_rng},
            {m: jnp.asarray(v) for m, v in features.items()},
            jnp.asarray(mask),
            jnp.asarray(lengths),
            train=False,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._has_batch_stats = bool(batch_stats)
        # MoE encoders sow their load-balance aux loss into "losses"
        self._has_losses = bool(variables.get("losses", {}))
        self.tx, self.accum = build_optimizer(self.config.training, steps_per_epoch)
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=state_rng,
        )

    def variables(self, state: TrainState) -> Dict[str, Any]:
        v = {"params": state.params}
        if self._has_batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # -- single-step loss -------------------------------------------------
    def _loss_and_updates(self, state: TrainState, features, labels, mask, lengths, weight, rng):
        def loss_fn(params):
            variables = {"params": params}
            if self._has_batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = []
            if self._has_batch_stats:
                mutable.append("batch_stats")
            if self._has_losses:
                mutable.append("losses")
            mutable = mutable or False

            def forward(variables, features):
                return self.model.apply(
                    variables,
                    features,
                    mask,
                    lengths,
                    train=True,
                    rngs={"dropout": rng},
                    mutable=mutable,
                )

            if self.remat:
                forward = jax.checkpoint(forward)
            out = forward(variables, features)
            if mutable:
                logits, updates = out
                new_batch_stats = updates.get("batch_stats", state.batch_stats)
            else:
                logits, updates = out, {}
                new_batch_stats = state.batch_stats
            loss = cross_entropy_loss(
                logits, labels, self.label_smoothing, sample_weight=weight
            )
            if self._has_losses and self.moe_aux_weight:
                aux_total = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b),
                    updates.get("losses", {}),
                    jnp.zeros((), jnp.float32),
                )
                loss = loss + self.moe_aux_weight * aux_total
            return loss, (logits, new_batch_stats)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        if self._opt_shardings is not None:
            # ZeRO-1 (parallel.zero_optimizer): keep the updated moments
            # sharded over "data" — XLA then feeds them from the gradient
            # SHARD (reduce-scatter) and all-gathers only the param delta
            new_opt_state = jax.lax.with_sharding_constraint(
                new_opt_state, self._opt_shardings
            )
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        wsum = jnp.clip(jnp.sum(weight), 1.0, None)
        acc = jnp.sum((preds == labels) * weight) / wsum
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, loss, acc

    def _apply_temporal_jitter(self, rng, features, lengths):
        """Random per-sample start-offset crop of up to ``jitter * T`` steps.

        Equivalent to resampling each window's start within the stream (the
        'temporal_jitter: ±10%' knob the reference declares); implemented as
        a device-side roll + length shrink so shapes stay static.
        """
        first = next(iter(features.values()))
        batch, ref_len = first.shape[0], first.shape[1]
        if int(self.temporal_jitter * ref_len) <= 0:
            return features, lengths
        # one per-sample shift FRACTION, applied per modality in its own
        # timebase (mixed-rate modalities have different T; a single
        # step-count shift would fail to broadcast / desynchronise streams)
        frac = jax.random.uniform(rng, (batch,)) * self.temporal_jitter

        def roll(x):
            if x.ndim < 3:
                return x
            t = x.shape[1]
            shift = jnp.floor(frac * t).astype(jnp.int32)  # [B]
            if x.shape[-1] < 8:
                # narrow modalities (heart_rate [B, T, 1]): the row gather
                # below degenerates to B*T one-element fetches — profiled at
                # 1 GiB/s, a single op worth ~0.33 ms/step. One contiguous
                # dynamic slice per sample out of a doubled buffer instead;
                # the 2x copy is trivial at these widths.
                doubled = jnp.concatenate([x, x], axis=1)  # [B, 2T, ...]
                return jax.vmap(
                    lambda xb, s: jax.lax.dynamic_slice_in_dim(xb, s, t, 0)
                )(doubled, shift)
            gather_t = (jnp.arange(t)[None, :] + shift[:, None]) % t
            idx = gather_t.reshape(batch, t, *([1] * (x.ndim - 2)))
            # keep the index [B, T, 1]: XLA lowers this to a ROW gather
            # (slice size D per index) instead of the per-element gather a
            # fully-broadcast index forces — measured 45% of device step
            # time at the flagship shapes before this. Indices are % t, so
            # skip the bounds clamp too.
            return jnp.take_along_axis(
                x, idx, axis=1, mode="promise_in_bounds"
            )

        jittered = {m: roll(v) for m, v in features.items()}
        # lengths stay in the REFERENCE timebase (encoders rescale per
        # modality); shrink by the reference-step shift
        if lengths is not None:
            ref_shift = jnp.floor(frac * ref_len).astype(jnp.int32)
            new_lengths = jnp.maximum(lengths - ref_shift, 1)
        else:
            new_lengths = None
        return jittered, new_lengths

    def _dropout_modality_mask(self, rng, batch: int, num_mod: int):
        """In-jit modality dropout: drop each modality with prob p, but never
        all of them (reference ``src/data.py:327-341``)."""
        if self.modality_dropout <= 0:
            return jnp.ones((batch, num_mod), jnp.float32)
        keep_rng, revive_rng = jax.random.split(rng)
        keep = (
            jax.random.uniform(keep_rng, (batch, num_mod)) > self.modality_dropout
        ).astype(jnp.float32)
        revive = jax.nn.one_hot(
            jax.random.randint(revive_rng, (batch,), 0, num_mod), num_mod
        )
        dead = jnp.sum(keep, axis=1, keepdims=True) == 0
        return jnp.where(dead, revive, keep)

    # -- compiled whole-epoch scan ---------------------------------------
    def make_train_epoch_fn(self):
        """Build ``epoch_fn(state, data, idx [S,B], weight [S,B])`` jitted."""

        def epoch_fn(state: TrainState, data: DeviceSplit, idx_mat, weight_mat):
            num_mod = len(data.modalities)

            def body(state, xs):
                idx, weight = xs
                step_rng = jax.random.fold_in(state.rng, state.step)
                drop_rng, noise_rng, jitter_rng, apply_rng = jax.random.split(
                    step_rng, 4
                )
                features, labels, lengths = data.gather(idx)
                if self.temporal_jitter > 0:
                    features, lengths = self._apply_temporal_jitter(
                        jitter_rng, features, lengths
                    )
                if self.gaussian_noise > 0:
                    features = {
                        m: v
                        + self.gaussian_noise
                        * jax.random.normal(
                            jax.random.fold_in(noise_rng, i), v.shape, v.dtype
                        )
                        for i, (m, v) in enumerate(features.items())
                    }
                mask = self._dropout_modality_mask(drop_rng, idx.shape[0], num_mod)
                new_state, loss, acc = self._loss_and_updates(
                    state, features, labels, mask, lengths, weight, apply_rng
                )
                return new_state, (loss, acc)

            state, (losses, accs) = jax.lax.scan(body, state, (idx_mat, weight_mat))
            return state, jnp.mean(losses), jnp.mean(accs)

        return jax.jit(epoch_fn, donate_argnums=(0,))

    def make_train_step_fn(self):
        """Jitted per-batch step for the streaming (HBM-exceeding) path.

        Same augmentation + update semantics as the whole-epoch scan body;
        the loader's modality mask is combined with in-jit modality dropout.
        """

        def step_fn(state: TrainState, features, labels, mask, lengths, weight):
            num_mod = mask.shape[1]
            step_rng = jax.random.fold_in(state.rng, state.step)
            drop_rng, noise_rng, jitter_rng, apply_rng = jax.random.split(step_rng, 4)
            if self.temporal_jitter > 0:
                features, lengths = self._apply_temporal_jitter(
                    jitter_rng, features, lengths
                )
            if self.gaussian_noise > 0:
                features = {
                    m: v
                    + self.gaussian_noise
                    * jax.random.normal(
                        jax.random.fold_in(noise_rng, i), v.shape, v.dtype
                    )
                    for i, (m, v) in enumerate(features.items())
                }
            mask = mask * self._dropout_modality_mask(
                drop_rng, mask.shape[0], num_mod
            )
            return self._loss_and_updates(
                state, features, labels, mask, lengths, weight, apply_rng
            )

        return jax.jit(step_fn, donate_argnums=(0,))

    def _streaming_epoch(self, step_fn, state, train_windows, eff_batch, epoch):
        """One epoch over double-buffered host->device batches."""
        from ..data.device import StreamingDeviceLoader

        loader = BatchLoader(
            train_windows, eff_batch, shuffle=True, seed=self.seed
        )
        loader.set_epoch(epoch)
        stream = StreamingDeviceLoader(loader, sharding=self._batch_sharding())
        losses, accs = [], []
        for features, labels, mask, lengths, weight in stream:
            state, loss, acc = step_fn(state, features, labels, mask, lengths, weight)
            losses.append(loss)
            accs.append(acc)
        if not losses:  # empty split: degrade to NaN like the scan path
            return state, float("nan"), float("nan")
        return state, float(jnp.mean(jnp.stack(losses))), float(jnp.mean(jnp.stack(accs)))

    def _batch_sharding(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        from ..parallel.mesh import batch_sharding

        return batch_sharding(self.mesh)

    def make_eval_fn(self):
        """Build ``eval_fn(variables, data, idx [S,B]) -> logits [S,B,C]``."""

        def eval_fn(variables, data: DeviceSplit, idx_mat):
            def body(carry, idx):
                features, labels, lengths = data.gather(idx)
                mask = jnp.ones((idx.shape[0], len(data.modalities)), jnp.float32)
                logits = self.model.apply(
                    variables, features, mask, lengths, train=False
                )
                return carry, logits

            _, logits = jax.lax.scan(body, None, idx_mat)
            if self.mesh is not None:
                # replicate before the host fetch: on a multi-PROCESS mesh a
                # batch-sharded output is not addressable from any single
                # process (np.asarray raises); the all-gather this inserts
                # is a no-op cost single-process and rides ICI on pods
                logits = jax.lax.with_sharding_constraint(
                    logits, NamedSharding(self.mesh, P())
                )
            return logits

        return jax.jit(eval_fn)

    # -- host-side epoch orchestration ------------------------------------
    @staticmethod
    def _index_matrix(n: int, batch_size: int, shuffle: bool, seed: int):
        from ..data.dataset import padded_index_matrix

        return padded_index_matrix(n, batch_size, shuffle=shuffle, seed=seed)

    def evaluate_logits(
        self, variables, data: DeviceSplit, batch_size: Optional[int] = None
    ) -> np.ndarray:
        """Full-split forward pass -> ``[N, C]`` logits (host numpy)."""
        self._ensure_mesh()
        batch_size = self._effective_batch(batch_size)
        n = data.num_windows
        idx_mat, _ = self._index_matrix(n, batch_size, shuffle=False, seed=0)
        if not hasattr(self, "_eval_fn"):
            self._eval_fn = self.make_eval_fn()
        with self._device_ctx():
            logits = self._eval_fn(
                variables, data, self._put_step_matrix(idx_mat, np.int32)
            )
            logits = np.asarray(logits).reshape(-1, logits.shape[-1])[:n]
        return logits

    def fit(
        self,
        train_windows: WindowedSplit,
        val_windows: WindowedSplit,
        test_windows: Optional[WindowedSplit] = None,
        save_dir: Optional[str | Path] = None,
        log_fn: Optional[Callable[[str], None]] = print,
        resume_from: Optional[str | Path] = None,
    ) -> Dict[str, Any]:
        # The whole fit runs with implicit allocation pinned to the mesh's
        # backend (hermetic: the default backend is never touched when
        # training on a CPU mesh — see _device_ctx).
        self._ensure_mesh()
        with self._device_ctx():
            return self._fit_inner(
                train_windows, val_windows, test_windows, save_dir, log_fn,
                resume_from,
            )

    def _fit_inner(
        self,
        train_windows: WindowedSplit,
        val_windows: WindowedSplit,
        test_windows: Optional[WindowedSplit],
        save_dir: Optional[str | Path],
        log_fn: Optional[Callable[[str], None]],
        resume_from: Optional[str | Path],
    ) -> Dict[str, Any]:
        if log_fn is print:  # flush through pipes (nohup/CI logs)
            log_fn = lambda msg: print(msg, flush=True)  # noqa: E731
        cfg = self.config
        max_epochs = int(cfg.training.get("max_epochs", 1))
        patience = int(cfg.training.get("early_stopping_patience", 10))
        exp_cfg = cfg.get("experiment", {}) or {}
        save_dir = Path(
            save_dir
            or Path(exp_cfg.get("save_dir", "runs")) / exp_cfg.get("name", "exp")
        )
        save_dir.mkdir(parents=True, exist_ok=True)

        mesh = self.mesh
        if mesh is not None and log_fn:
            if self.dcn_slices > 1:
                log_fn(
                    f"multi-slice mesh: {self.dcn_slices} slices x "
                    f"{mesh.shape['data']} data"
                    + (f" x {self.model_parallel} model" if self.model_parallel > 1 else "")
                    + (
                        f" x {self.pipeline_parallel} pipe"
                        if self.pipeline_parallel > 1
                        else ""
                    )
                    + f" devices ({mesh.devices.flat[0].platform}); batch "
                    "sharded over ('dcn','data'), cross-slice traffic = one "
                    "gradient psum per step"
                )
            elif self.model_parallel > 1:
                log_fn(
                    f"dp x tp mesh: {self.n_shards} data x "
                    f"{self.model_parallel} model devices "
                    f"({mesh.devices.flat[0].platform}), batch sharded over "
                    "'data', transformer ffw weights over 'model'"
                    + (
                        ", norm-region activations sequence-sharded over"
                        " 'model' (sequence parallelism)"
                        if self.sequence_parallel
                        else ""
                    )
                )
            elif self.pipeline_parallel > 1:
                log_fn(
                    f"dp x pp mesh: {self.n_shards} data x "
                    f"{self.pipeline_parallel} pipe devices "
                    f"({mesh.devices.flat[0].platform}), batch sharded over "
                    "'data', transformer layer stack GPipe-pipelined over "
                    "'pipe'"
                )
            else:
                log_fn(
                    f"data-parallel mesh: {self.n_shards} devices "
                    f"({mesh.devices.flat[0].platform}), batch axis sharded"
                )
            if self.zero_optimizer:
                log_fn(
                    "ZeRO-1: optimizer state sharded over 'data' "
                    f"(each rank holds 1/{mesh.shape['data']})"
                )
        eff_batch = self._effective_batch()

        # streaming mode never materialises the train split in HBM
        train_data = None if self.streaming else self._put_split(train_windows)
        val_data = self._put_split(val_windows)
        steps_per_epoch = (
            train_windows.num_windows + eff_batch - 1
        ) // eff_batch

        # bootstrap state from one host batch
        boot_loader = BatchLoader(train_windows, self.batch_size)
        state = self.init_state(next(iter(boot_loader)), steps_per_epoch)
        start_epoch = 0
        if resume_from is not None:
            from .checkpoint import load_checkpoint as _load_ckpt
            from .checkpoint import load_train_state

            state = load_train_state(resume_from, target=state)
            _vars, _cfg, meta = _load_ckpt(resume_from)
            start_epoch = int(meta.get("epoch", -1)) + 1
            if log_fn:
                log_fn(f"resumed from {resume_from} at epoch {start_epoch}")
        if mesh is not None:
            # replicated on a 1-D data mesh; on a 2-D data x model mesh the
            # transformer ffw params (and their Adam moments, which mirror
            # the param tree) shard over the "model" axis; with
            # parallel.zero_optimizer the optimizer state additionally
            # shards over "data" (ZeRO-1)
            shardings = state_shardings(
                mesh, state, zero_optimizer=self.zero_optimizer
            )
            state = jax.device_put(state, shardings)
            # re-asserted on every updated opt state inside the compiled
            # step so GSPMD cannot silently re-replicate it
            self._opt_shardings = (
                shardings.opt_state if self.zero_optimizer else None
            )
        epoch_fn = None if self.streaming else self.make_train_epoch_fn()
        step_fn = self.make_train_step_fn() if self.streaming else None

        ckpt = CheckpointManager(
            save_dir / "checkpoints",
            config=cfg,
            save_top_k=int(exp_cfg.get("save_top_k", 3)),
            save_last=True,
            # only a resumed run may adopt checkpoints already in save_dir; a
            # fresh run into a reused dir must not let a previous config's
            # better checkpoint win best_model_path / the test metric
            adopt_existing=resume_from is not None,
        )
        writer = None
        if jax.process_index() == 0:  # one event stream per run, not per rank
            try:
                from tensorboardX import SummaryWriter

                writer = SummaryWriter(str(save_dir / "logs"))
            except Exception:
                pass

        best_val = float("inf")
        bad_epochs = 0
        if resume_from is not None and ckpt.best_model_score is not None:
            # restore early-stopping state so interrupted and uninterrupted
            # runs of the same config stop at the same epoch
            best_val = float(ckpt.best_model_score)
            if ckpt.best_model_epoch is not None:
                bad_epochs = max(0, start_epoch - 1 - ckpt.best_model_epoch)
        history = []
        t_start = time.perf_counter()
        for epoch in range(start_epoch, max_epochs):
            if self.streaming:
                state, train_loss, train_acc = self._streaming_epoch(
                    step_fn, state, train_windows, eff_batch, epoch
                )
            else:
                idx_mat, weight_mat = self._index_matrix(
                    train_windows.num_windows, eff_batch, True, self.seed + epoch
                )
                state, train_loss, train_acc = epoch_fn(
                    state,
                    train_data,
                    self._put_step_matrix(idx_mat, np.int32),
                    self._put_step_matrix(weight_mat, np.float32),
                )

            val_logits = self.evaluate_logits(self.variables(state), val_data)
            val_labels = np.asarray(val_windows.labels)
            # same criterion as training (incl. label smoothing) — the
            # reference's LightningModule monitors val/loss through its one
            # smoothed criterion (src/train.py:185-186,329-340), and early
            # stopping / checkpoint ranking must rank by the same objective
            val_loss = float(
                cross_entropy_loss(
                    jnp.asarray(val_logits),
                    jnp.asarray(val_labels),
                    label_smoothing=self.label_smoothing,
                )
            )
            val_acc = float((val_logits.argmax(-1) == val_labels).mean())

            train_loss, train_acc = float(train_loss), float(train_acc)
            history.append(
                {
                    "epoch": epoch,
                    "train/loss": train_loss,
                    "train/acc": train_acc,
                    "val/loss": val_loss,
                    "val/acc": val_acc,
                }
            )
            if writer is not None:
                writer.add_scalar("train/loss", train_loss, epoch)
                writer.add_scalar("train/acc", train_acc, epoch)
                writer.add_scalar("val/loss", val_loss, epoch)
                writer.add_scalar("val/acc", val_acc, epoch)
            if log_fn:
                log_fn(
                    f"epoch {epoch}: train/loss={train_loss:.4f} train/acc={train_acc:.4f} "
                    f"val/loss={val_loss:.4f} val/acc={val_acc:.4f}"
                )

            ckpt.save(self.variables(state), epoch, val_loss, train_state=state)
            if val_loss < best_val:
                best_val = val_loss
                bad_epochs = 0
            else:
                # Lightning EarlyStopping semantics: stop once the counter
                # REACHES patience (wait_count >= patience), not one later
                bad_epochs += 1
                if bad_epochs >= patience:
                    if log_fn:
                        log_fn(f"early stopping at epoch {epoch} (patience {patience})")
                    break

        wall = time.perf_counter() - t_start
        results: Dict[str, Any] = {
            "best_model_path": ckpt.best_model_path or "",
            "best_val_loss": float(
                ckpt.best_model_score
                if ckpt.best_model_score is not None  # 0.0 is a real score
                else best_val
            ),
            "config": cfg.to_container(resolve=True),
        }

        if test_windows is not None:
            from .checkpoint import load_checkpoint

            best_vars = self.variables(state)
            if ckpt.best_model_path:
                restored, _cfg, _meta = load_checkpoint(ckpt.best_model_path)
                best_vars = restored
            test_data = self._put_split(test_windows)
            test_logits = self.evaluate_logits(best_vars, test_data)
            test_labels = np.asarray(test_windows.labels)
            results["test_acc"] = float((test_logits.argmax(-1) == test_labels).mean())
            if log_fn:
                log_fn(f"test/acc={results['test_acc']:.4f}")

        results["history"] = history
        results["train_wall_seconds"] = wall
        results_file = save_dir / "results.json"
        # multi-process: every rank computes the identical results dict
        # (metrics come from replicated arrays) but only rank 0 writes
        if jax.process_index() == 0:
            results_file.write_text(json.dumps(results, indent=2))
        if writer is not None:
            writer.close()
        self._final_state = state
        self._ckpt = ckpt
        return results
