"""Evaluation: metrics, latency, missing-modality robustness, attention viz.

Capability parity with the reference evaluator (``src/eval.py``):

- ``evaluate_model`` — accuracy / macro-F1 / loss / num_samples, optional
  (preds, labels, confidences[, logits]) tuple (``:39-130``).
- ``measure_inference_latency`` — per-sample ms mean/std (``:166-228``),
  measured on the jitted forward with ``block_until_ready``.
- ``evaluate_missing_modalities`` — all ``2^M - 1`` modality subsets
  (``:312-458``). TPU-first redesign: instead of 2^M - 1 separate dataset
  passes, each batch is encoded exactly TWICE (real inputs and zeroed
  inputs); the cheap fusion head is then ``vmap``-ed over every subset mask
  in one compiled program. ``encoder(zeros) == encoder(zeroed features)``
  makes this exactly equivalent to the reference's zero-out-and-re-run loop.
- ``generate_attention_visualization`` — hybrid-only M x M heatmap
  (``:231-309``).
- ``run_evaluation`` — the eval CLI body: loads a self-contained checkpoint,
  writes ``evaluation_results.json`` / ``uncertainty.json`` /
  ``missing_modality.json`` with the reference's exact key schema
  (``:598-656``).
"""

from __future__ import annotations

import itertools
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import WindowedSplit, create_datasets, padded_index_matrix
from .data.device import DeviceSplit, device_put_split
from .models.module import MultimodalFusionModel
from .ops.metrics import cross_entropy_loss, macro_f1
from .uncertainty import CalibrationMetrics


def _index_matrix(n: int, batch_size: int) -> Tuple[np.ndarray, int]:
    idx, _ = padded_index_matrix(n, batch_size)
    return idx, idx.shape[0]


# jitted forward programs cached per model: a fresh @jax.jit closure per
# forward_all call would miss jax's trace cache every time — an ensemble
# sweep or a temperature-scaling val pass would then pay one full retrace
# (minutes cold on the tunneled TPU) PER call at identical shapes. Keyed by
# the model dataclass itself when hashable (flax modules hash by fields).
_FORWARD_FN_CACHE: Dict[Any, Any] = {}


def _forward_fn(model: MultimodalFusionModel):
    # keyed by the module's repr: flax dataclass reprs print every field
    # (identical repr => identical config => identical apply), and the dict
    # -valued encoder_configs field makes the module itself unhashable
    key = repr(model)
    cached = _FORWARD_FN_CACHE.get(key)
    if cached is not None:
        return cached

    @jax.jit
    def run(variables, data, idx_mat):
        def body(_, idx):
            features, labels, lengths = data.gather(idx)
            mask = jnp.ones((idx.shape[0], len(data.modalities)), jnp.float32)
            return _, model.apply(variables, features, mask, lengths, train=False)

        _, logits = jax.lax.scan(body, None, idx_mat)
        return logits

    _FORWARD_FN_CACHE[key] = run
    return run


def forward_all(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    data: DeviceSplit,
    batch_size: int = 32,
) -> np.ndarray:
    """Jitted full-split forward -> ``[N, C]`` logits."""
    n = data.num_windows
    idx_mat, _ = _index_matrix(n, batch_size)
    logits = _forward_fn(model)(variables, data, jnp.asarray(idx_mat))
    return np.asarray(logits).reshape(-1, logits.shape[-1])[:n]


def evaluate_model(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    windows: WindowedSplit | DeviceSplit,
    batch_size: int = 32,
    return_predictions: bool = False,
    include_logits: bool = False,
):
    """Standard evaluation (reference ``src/eval.py:39-130``)."""
    data = windows if isinstance(windows, DeviceSplit) else device_put_split(windows)
    logits = forward_all(model, variables, data, batch_size)
    labels = np.asarray(data.labels)

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    confidences = probs.max(axis=-1)
    preds = probs.argmax(axis=-1)
    loss = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    metrics = {
        "accuracy": float((preds == labels).mean()),
        "f1_macro": macro_f1(labels, preds),
        "loss": loss,
        "num_samples": int(labels.shape[0]),
    }
    if return_predictions:
        out: Tuple[np.ndarray, ...] = (preds, labels, confidences)
        if include_logits:
            out = (*out, logits)
        return metrics, out
    return metrics


def _parse_latency_batch(batch):
    """Best-effort parsing of loose batch containers (reference
    ``src/eval.py:133-165``): a features Mapping, or a Sequence
    ``(features[, labels[, mask[, lengths...]]])``. Returns ``None`` when the
    batch is unusable."""
    from collections.abc import Mapping, Sequence as SeqABC

    if isinstance(batch, Mapping):
        return dict(batch), None, None, None
    if isinstance(batch, SeqABC) and len(batch) > 0:
        first = batch[0]
        if isinstance(first, Mapping):
            labels = batch[1] if len(batch) > 1 else None
            mask = batch[2] if len(batch) > 2 else None
            lengths = batch[3] if len(batch) > 3 else None
            return dict(first), labels, mask, lengths
    return None


def _infer_batch_size(labels, features) -> Optional[int]:
    if hasattr(labels, "shape") and getattr(labels, "shape", ()):
        return int(labels.shape[0])
    for tensor in features.values():
        if hasattr(tensor, "shape") and getattr(tensor, "shape", ()):
            return int(tensor.shape[0])
    return None


def _latency_over_batches(
    model, variables, batches, max_batches: int = 50, warmup: int = 3
) -> Tuple[float, float]:
    """Latency sweep over an arbitrary iterable of batches with the
    reference's skip-with-warning tolerance (``src/eval.py:185-221``).

    Consumes at most ``max_batches`` batches (the iterable may be a
    streaming/infinite loader) and performs ``warmup`` untimed calls per new
    input SIGNATURE — which covers feature shapes/dtypes AND the mask /
    lengths structure, since a ``lengths=None`` -> array change re-traces.
    """
    per_sample_ms: List[float] = []
    warmed: set = set()  # signatures already traced+compiled
    jitted = jax.jit(
        lambda variables, features, mask, lengths: jnp.sum(
            model.apply(variables, features, mask, lengths, train=False)
        )
    )
    for batch in itertools.islice(batches, max_batches):
        parsed = _parse_latency_batch(batch)
        if parsed is None:
            print("  Warning: Unable to parse batch for latency measurement, skipping.")
            continue
        features, labels, mask, lengths = parsed
        batch_size = _infer_batch_size(labels, features)
        if not batch_size:
            print("  Warning: Unable to infer batch size for latency measurement, skipping.")
            continue
        if not features:
            print("  Warning: Empty feature dict encountered during latency measurement, skipping.")
            continue
        try:
            features = {k: jnp.asarray(v) for k, v in features.items()}
        except (TypeError, ValueError):
            print("  Warning: Non-tensor feature encountered, skipping batch for latency measurement.")
            continue
        if mask is None:
            # default mask width = the MODEL's modality count (a batch dict
            # with extra/missing keys fails the model call and is skipped)
            num_mod = len(getattr(model, "modalities", ())) or max(1, len(features))
            mask = jnp.ones((batch_size, num_mod), jnp.float32)
        else:
            mask = jnp.asarray(mask)
        lengths = jnp.asarray(lengths) if lengths is not None else None
        # untimed warmups per NEW input signature absorb trace+compile, so
        # timed calls measure steady-state latency; the signature includes
        # mask/lengths structure (None vs array retraces). Any model error
        # (missing modality KeyError, shape mismatch, ...) is a skip, not an
        # abort — the reference tolerates malformed batches the same way
        # (src/eval.py:185-221)
        sig = (
            tuple(sorted((k, v.shape, str(v.dtype)) for k, v in features.items())),
            None if mask is None else (tuple(mask.shape), str(mask.dtype)),
            None if lengths is None else (tuple(lengths.shape), str(lengths.dtype)),
        )
        try:
            if sig not in warmed:
                for _ in range(max(1, warmup)):
                    float(jitted(variables, features, mask, lengths))
                warmed.add(sig)
            t0 = time.perf_counter()
            float(jitted(variables, features, mask, lengths))
        except Exception:
            print("  Warning: Model call failed during latency measurement, skipping batch.")
            continue
        per_sample_ms.append((time.perf_counter() - t0) / batch_size * 1000.0)
    if not per_sample_ms:
        return 0.0, 0.0
    arr = np.asarray(per_sample_ms)
    return float(arr.mean()), float(arr.std(ddof=0))


def measure_inference_latency(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    windows: WindowedSplit | DeviceSplit,
    batch_size: int = 32,
    max_batches: int = 50,
    warmup: int = 3,
) -> Tuple[float, float]:
    """Per-sample latency (ms) mean/std of the jitted forward.

    Unlike the reference's eager wall-clock loop, timing here brackets
    ``block_until_ready`` on a pre-compiled program, so it measures steady-
    state device latency (what serving sees), not tracing overhead.

    Tolerates loose inputs: besides the device-resident split, any iterable
    of batches is accepted with the reference's best-effort parse +
    skip-with-warning semantics (``src/eval.py:133-165,185-221``).
    """
    if not isinstance(windows, (DeviceSplit, WindowedSplit)):
        return _latency_over_batches(
            model, variables, windows, max_batches=max_batches, warmup=warmup
        )
    data = windows if isinstance(windows, DeviceSplit) else device_put_split(windows)
    n = data.num_windows
    idx_mat, steps = _index_matrix(n, batch_size)
    steps = min(steps, max_batches)

    @jax.jit
    def forward(variables, data, idx):
        features, labels, lengths = data.gather(idx)
        mask = jnp.ones((idx.shape[0], len(data.modalities)), jnp.float32)
        logits = model.apply(variables, features, mask, lengths, train=False)
        # scalar checksum: fetching it to host is the only honest fence on
        # remote backends where block_until_ready can return early
        return jnp.sum(logits)

    idx0 = jnp.asarray(idx_mat[0])
    for _ in range(warmup):
        float(forward(variables, data, idx0))

    per_sample_ms: List[float] = []
    for s in range(steps):
        idx = jnp.asarray(idx_mat[s])
        t0 = time.perf_counter()
        float(forward(variables, data, idx))
        elapsed = time.perf_counter() - t0
        per_sample_ms.append(elapsed / batch_size * 1000.0)
    if not per_sample_ms:
        return 0.0, 0.0
    arr = np.asarray(per_sample_ms)
    return float(arr.mean()), float(arr.std(ddof=0))


def measure_amortized_latency(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    data: DeviceSplit,
    batch_size: int = 32,
    repeats: int = 4,
) -> float:
    """Amortised per-window ms over a whole-split scan (one dispatch).

    The per-batch numbers above include the host->device dispatch round-trip
    (~35-45 ms on the tunneled backend) per batch; sustained serving pipelines
    many batches per dispatch. This runs the full split inside ONE jitted
    ``lax.scan`` ``repeats`` times and fences once — the honest steady-state
    throughput number.
    """
    n = data.num_windows
    idx_mat, _steps = _index_matrix(n, batch_size)
    idx = jnp.asarray(idx_mat)

    @jax.jit
    def sweep(variables, data, idx_mat):
        def body(acc, idx):
            features, _labels, lengths = data.gather(idx)
            mask = jnp.ones((idx.shape[0], len(data.modalities)), jnp.float32)
            logits = model.apply(variables, features, mask, lengths, train=False)
            return acc + jnp.sum(logits), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), idx_mat)
        return acc

    float(sweep(variables, data, idx))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        acc = sweep(variables, data, idx)
    float(acc)  # device->host fence
    elapsed = time.perf_counter() - t0
    return elapsed / (repeats * idx.shape[0] * batch_size) * 1000.0


# ---------------------------------------------------------------------------
# missing-modality robustness
# ---------------------------------------------------------------------------

def _subset_masks(num_modalities: int) -> Tuple[np.ndarray, List[Tuple[int, ...]]]:
    """All non-empty subsets, ordered by size then lexicographic (reference
    iteration order, ``src/eval.py:342-349``)."""
    combos: List[Tuple[int, ...]] = []
    for size in range(1, num_modalities + 1):
        combos.extend(itertools.combinations(range(num_modalities), size))
    masks = np.zeros((len(combos), num_modalities), np.float32)
    for i, combo in enumerate(combos):
        masks[i, list(combo)] = 1.0
    return masks, combos


def predict_all_subsets(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    data: DeviceSplit,
    batch_size: int = 32,
) -> Tuple[np.ndarray, List[Tuple[int, ...]]]:
    """Predictions under every modality subset: ``[S, N]`` class ids.

    One compiled program: per batch the encoders run twice (real + zero
    input), then the fusion head is vmapped across all subset masks.
    """
    num_mod = len(data.modalities)
    masks_np, combos = _subset_masks(num_mod)
    masks = jnp.asarray(masks_np)  # [S, M]
    n = data.num_windows
    idx_mat, _ = _index_matrix(n, batch_size)

    @jax.jit
    def run(variables, data, idx_mat, masks):
        def body(_, idx):
            features, labels, lengths = data.gather(idx)
            batch = idx.shape[0]
            zeros = {m: jnp.zeros_like(v) for m, v in features.items()}
            enc_real = model.apply(
                variables, features, lengths, method=MultimodalFusionModel.encode
            )
            enc_zero = model.apply(
                variables, zeros, lengths, method=MultimodalFusionModel.encode
            )

            def fuse_one(mask_row):
                enc = {
                    m: jnp.where(mask_row[i] > 0, enc_real[m], enc_zero[m])
                    for i, m in enumerate(data.modalities)
                }
                mask_b = jnp.tile(mask_row[None, :], (batch, 1))
                return model.apply(
                    variables, enc, mask_b, method=MultimodalFusionModel.fuse
                )

            logits = jax.vmap(fuse_one)(masks)  # [S, B, C]
            return _, jnp.argmax(logits, axis=-1)

        _, preds = jax.lax.scan(body, None, idx_mat)  # [steps, S, B]
        return preds

    preds = np.asarray(run(variables, data, jnp.asarray(idx_mat), masks))
    preds = preds.transpose(1, 0, 2).reshape(len(combos), -1)[:, :n]  # [S, N]
    return preds, combos


def _compute_modality_importance(
    results: Dict[str, Any], modality_names: Sequence[str]
) -> Dict[str, float]:
    """Importance = mean(acc with modality) - mean(acc without), abs-normalised
    (reference ``src/eval.py:427-458``)."""
    importance: Dict[str, float] = {}
    for modality in modality_names:
        with_scores, without_scores = [], []
        for combo_name, metrics in results["all_combinations"].items():
            if modality in combo_name.split("+"):
                with_scores.append(metrics["accuracy"])
            else:
                without_scores.append(metrics["accuracy"])
        if with_scores and without_scores:
            importance[modality] = float(
                np.mean(with_scores) - np.mean(without_scores)
            )
        else:
            importance[modality] = 0.0
    total = sum(abs(v) for v in importance.values())
    if total > 0:
        importance = {k: v / total for k, v in importance.items()}
    return importance


def evaluate_missing_modalities(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    windows: WindowedSplit | DeviceSplit,
    modality_names: Sequence[str],
    batch_size: int = 32,
) -> Dict[str, Any]:
    """Robustness over all ``2^M - 1`` modality subsets (one device pass)."""
    data = windows if isinstance(windows, DeviceSplit) else device_put_split(windows)
    labels = np.asarray(data.labels)
    preds, combos = predict_all_subsets(model, variables, data, batch_size)

    results: Dict[str, Any] = {
        "full_modalities": {},
        "single_modalities": {},
        "all_combinations": {},
    }
    num_mod = len(modality_names)
    for subset_preds, combo in zip(preds, combos):
        subset_names = [modality_names[i] for i in combo]
        subset_name = "+".join(subset_names)
        metrics = {
            "accuracy": float((subset_preds == labels).mean()),
            "f1_macro": macro_f1(labels, subset_preds),
        }
        results["all_combinations"][subset_name] = metrics
        if len(combo) == 1:
            results["single_modalities"][subset_names[0]] = metrics
        if len(combo) == num_mod:
            results["full_modalities"] = metrics

    results["modality_importance"] = _compute_modality_importance(
        results, modality_names
    )
    return results


# ---------------------------------------------------------------------------
# attention visualisation
# ---------------------------------------------------------------------------

def generate_attention_visualization(
    model: MultimodalFusionModel,
    variables: Dict[str, Any],
    windows: WindowedSplit | DeviceSplit,
    modality_names: Sequence[str],
    save_path: Path | str,
    batch_size: int = 32,
) -> Optional[Path]:
    """Hybrid-only M x M mean-attention heatmap (reference ``:231-309``)."""
    if not modality_names:
        return None
    if model.fusion_type != "hybrid":
        return None
    data = windows if isinstance(windows, DeviceSplit) else device_put_split(windows)
    n = min(batch_size, data.num_windows)
    idx = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def run(variables, data, idx):
        features, labels, lengths = data.gather(idx)
        mask = jnp.ones((idx.shape[0], len(data.modalities)), jnp.float32)
        return model.apply(
            variables, features, mask, lengths, train=False, return_attention=True
        )

    try:
        _, attention_info = run(variables, data, idx)
    except (ValueError, TypeError):
        return None
    attention_maps = attention_info.get("attention_maps", {})
    if not attention_maps:
        return None

    num_mod = len(modality_names)
    matrix = np.zeros((num_mod, num_mod), np.float32)
    counts = np.zeros_like(matrix)
    for key, weights in attention_maps.items():
        if "_to_" not in key:
            continue
        q_mod, k_mod = key.split("_to_", 1)
        if q_mod not in modality_names or k_mod not in modality_names:
            continue
        qi = list(modality_names).index(q_mod)
        ki = list(modality_names).index(k_mod)
        matrix[qi, ki] += float(np.asarray(weights).mean())
        counts[qi, ki] += 1
    with np.errstate(divide="ignore", invalid="ignore"):
        matrix = np.divide(
            matrix,
            np.where(counts == 0, 1.0, counts),
            out=np.zeros_like(matrix),
            where=counts != 0,
        )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(matrix, cmap="magma", aspect="equal")
    ax.set_xticks(range(num_mod))
    ax.set_yticks(range(num_mod))
    ax.set_xticklabels(modality_names, rotation=45, ha="right")
    ax.set_yticklabels(modality_names)
    ax.set_xlabel("Key Modality")
    ax.set_ylabel("Query Modality")
    ax.set_title("Cross-Modal Attention Heatmap")
    fig.colorbar(im, ax=ax, shrink=0.8)
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_path, dpi=300)
    plt.close(fig)
    return save_path


# ---------------------------------------------------------------------------
# eval CLI body
# ---------------------------------------------------------------------------

def save_results_json(results: Dict[str, Any], output_path: str | Path) -> None:
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(json.dumps(results, indent=2))
    print(f"Results saved to: {output_path}")


def run_evaluation(
    checkpoint: str,
    config_path: str = "config/base.yaml",
    output_dir: str = "experiments",
    analysis_dir: str = "analysis",
    missing_modality_test: bool = False,
) -> Dict[str, Any]:
    """Full evaluation pipeline writing the reference's JSON artifacts."""
    from .train.checkpoint import load_checkpoint
    from .utils.config import load_config

    print(f"Loading model from: {checkpoint}")
    variables, config, _meta = load_checkpoint(checkpoint)
    if config is None:
        config = load_config(config_path)
    model = MultimodalFusionModel.from_config(config)

    print("Creating dataloaders...")
    from .cli import _dataset_kwargs

    _kwargs = _dataset_kwargs(config)
    # overlap factor of the calibration split (chunk/stride) — overlapping
    # windows are near-duplicates, so calibrate_guarded counts effective
    # (non-overlapping-equivalent) windows toward its independence thresholds
    val_overlap = 1
    if bool((config.get("uncertainty", {}) or {}).get("temperature_scaling", False)):
        # Temperature scaling fits on the val split, whose non-overlapping
        # windowing yields only 45-89 windows on the surviving PAMAP2 subset —
        # too few for the ECE guard to ever engage (round-2 verdict: every
        # committed artifact showed T=1.00). Overlap-pool the calibration
        # split: stride chunk//4 extracts ~4x windows from the same rows.
        # Val is only consumed by the calibration fit in this entry point, so
        # no other metric changes.
        chunk = _kwargs.get("chunk_size")
        if _kwargs.get("dataset_name") != "synthetic" and chunk:
            stride = max(1, int(chunk) // 4)
            _kwargs["val_window_stride"] = stride
            val_overlap = max(1, int(chunk) // stride)
    _train_w, val_w, test_w = create_datasets(**_kwargs)
    test_data = device_put_split(test_w)
    batch_size = int(config.dataset.get("batch_size", 32))

    print("\n" + "=" * 80)
    print("Standard Evaluation")
    print("=" * 80)
    metrics, (preds, labels, confidences, logits) = evaluate_model(
        model, variables, test_data, batch_size,
        return_predictions=True, include_logits=True,
    )
    print(f"\nTest Accuracy: {metrics['accuracy']:.4f}")
    print(f"Test F1 (macro): {metrics['f1_macro']:.4f}")
    print(f"Test Loss: {metrics['loss']:.4f}")

    print("\nComputing calibration metrics...")
    eval_cfg = config.get("evaluation", {}) or {}
    num_bins = int(eval_cfg.get("num_calibration_bins", 15))
    ece = CalibrationMetrics.expected_calibration_error(confidences, preds, labels, num_bins)
    mce = CalibrationMetrics.maximum_calibration_error(confidences, preds, labels, num_bins)
    nll = CalibrationMetrics.negative_log_likelihood(logits, labels)
    print(f"ECE: {ece:.4f}\nMCE: {mce:.4f}\nNLL: {nll:.4f}")

    fusion_type = str(config.model.fusion_type)
    analysis_root = Path(analysis_dir) / fusion_type
    analysis_root.mkdir(parents=True, exist_ok=True)
    calibration_plot = analysis_root / "calibration.png"
    CalibrationMetrics.reliability_diagram(
        confidences, preds, labels, num_bins=num_bins, save_path=calibration_plot
    )

    attention_plot = None
    if fusion_type == "hybrid":
        attention_plot = generate_attention_visualization(
            model, variables, test_data, list(config.dataset.modalities),
            analysis_root / "attention_viz.png", batch_size,
        )
        if attention_plot is not None:
            print(f"Attention visualization saved to: {attention_plot}")

    print("\nMeasuring inference latency...")
    latency_mean_ms, latency_std_ms = measure_inference_latency(
        model, variables, test_data, batch_size
    )
    amortized_ms = measure_amortized_latency(model, variables, test_data, batch_size)
    print(f"Per-sample inference time: {latency_mean_ms:.3f} ± {latency_std_ms:.3f} ms")
    print(f"Amortized (pipelined) per-sample time: {amortized_ms:.3f} ms")

    per_class = {}
    for cls in np.unique(labels):
        cls_mask = labels == cls
        per_class[int(cls)] = float((preds[cls_mask] == cls).mean())

    standard_results: Dict[str, Any] = {
        "dataset": str(config.dataset.name),
        "fusion_type": fusion_type,
        "test_accuracy": metrics["accuracy"],
        "test_f1_macro": metrics["f1_macro"],
        "test_loss": metrics["loss"],
        "ece": ece,
        "mce": mce,
        "nll": nll,
        "inference_ms_mean": latency_mean_ms,
        "inference_ms_std": latency_std_ms,
        # per-batch numbers above include one host->device dispatch round-trip
        # (~35-45 ms on tunneled backends); this is the pipelined steady-state
        "inference_ms_amortized": amortized_ms,
        "per_class_accuracy": per_class,
        "num_test_windows": int(labels.shape[0]),
    }
    if attention_plot is not None:
        standard_results["attention_plot"] = str(attention_plot)

    if missing_modality_test:
        print("\n" + "=" * 80)
        print("Missing Modality Robustness Test")
        print("=" * 80)
        missing_results = evaluate_missing_modalities(
            model, variables, test_data, list(config.dataset.modalities), batch_size
        )
        print(f"\nFull modalities: {missing_results['full_modalities']['accuracy']:.4f}")
        print("\nSingle modality performance:")
        for modality, m in missing_results["single_modalities"].items():
            print(f"  {modality}: {m['accuracy']:.4f}")
        print("\nModality importance scores:")
        for modality, score in missing_results["modality_importance"].items():
            print(f"  {modality}: {score:.4f}")
        save_results_json(missing_results, Path(output_dir) / "missing_modality.json")

    save_results_json(standard_results, Path(output_dir) / "evaluation_results.json")

    uncertainty_results = {
        "dataset": str(config.dataset.name),
        "fusion_type": fusion_type,
        "ece": ece,
        "mce": mce,
        "nll": nll,
        "num_bins": num_bins,
        "calibration_plot": str(calibration_plot),
    }

    unc_cfg = config.get("uncertainty", {}) or {}
    if (
        bool(eval_cfg.get("uncertainty_analysis", False))
        and str(unc_cfg.get("method", "dropout")) == "dropout"
    ):
        # Epistemic uncertainty via MC dropout over the FULL test set
        # (reference sweeps the whole loader, src/uncertainty.py:19-71).
        # Memory-bounded: lax.scan over batches x lax.map over sample keys —
        # peak memory is one (batch, sample) forward, coverage is every window.
        from .uncertainty import mc_dropout_over_split

        print("\nMC-dropout uncertainty analysis...")
        num_mc = int(unc_cfg.get("num_mc_samples", 10))
        _mean_logits, variance = mc_dropout_over_split(
            model, variables, test_data, num_samples=num_mc,
            batch_size=batch_size,
        )
        uncertainty_results["mc_dropout"] = {
            "num_samples": num_mc,
            "mean_uncertainty": float(np.mean(variance)),
            "max_uncertainty": float(np.max(variance)),
            "num_windows": int(test_data.num_windows),
        }
        print(
            f"mean predictive variance over {test_data.num_windows} windows: "
            f"{uncertainty_results['mc_dropout']['mean_uncertainty']:.5f}"
        )

    if bool(unc_cfg.get("temperature_scaling", False)):
        # Post-hoc temperature scaling: fit T on the validation split, report
        # calibrated test metrics (the reference declares this config but the
        # report's "<0.03 ECE after temperature scaling" was computed offline).
        from .uncertainty import TemperatureScaling

        print("\nFitting temperature scaling on the validation split...")
        val_data = device_put_split(val_w)
        val_logits = forward_all(model, variables, val_data, batch_size)
        ts = TemperatureScaling()
        # ECE-guarded: considers {1, NLL-fit T, grid} and accepts only a
        # temperature whose val improvement is large and consistent across
        # the val (subject, activity) shards — the raw NLL fit over-sharpens
        # on the tiny surviving-subset val splits, and window-level folds
        # accepted temperatures that regressed TEST ECE in 11/23 committed
        # experiments (see scripts/calibration_study.py replay)
        ts.calibrate_guarded(
            val_logits, np.asarray(val_data.labels), num_bins,
            overlap_factor=val_overlap,
            shard_ids=val_w.shard_ids,
        )
        scaled = np.asarray(ts(logits))
        scaled_probs = np.asarray(jax.nn.softmax(jnp.asarray(scaled), axis=-1))
        scaled_conf = scaled_probs.max(-1)
        scaled_preds = scaled_probs.argmax(-1)
        uncertainty_results.update(
            {
                "temperature": float(ts.temperature),
                "ece_after_temperature_scaling": CalibrationMetrics.expected_calibration_error(
                    scaled_conf, scaled_preds, labels, num_bins
                ),
                "nll_after_temperature_scaling": CalibrationMetrics.negative_log_likelihood(
                    scaled, labels
                ),
            }
        )
        print(
            f"T={uncertainty_results['temperature']:.3f}  "
            f"ECE {ece:.4f} -> {uncertainty_results['ece_after_temperature_scaling']:.4f}"
        )
    save_results_json(uncertainty_results, Path(output_dir) / "uncertainty.json")
    print("\nEvaluation complete!")
    return standard_results
