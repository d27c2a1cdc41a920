#!/usr/bin/env python
"""Calibration-guard transfer study (round-5 verdict ask #1).

The round-4 matrix committed 9/24 rows where post-hoc temperature scaling
made TEST ECE *worse* than unscaled — the guard accepted temperatures on the
validation split that did not transfer. This script adjudicates the guard
design with data instead of intuition:

1. **extract** — for every committed experiment checkpoint, compute val
   (overlap-pooled, stride=chunk/4, exactly like `evaluate.run_evaluation`)
   and test logits on CPU, with per-window shard ids, cached to
   ``report/calibration_study/<exp>.npz``.
2. **replay** — simulate guard variants on the cached logits and score each
   by val->test transfer: #test regressions (ECE after > before by >1e-9),
   #real test wins, mean test delta-ECE.
3. **floor** — Monte-Carlo the ECE noise floor of a PERFECTLY calibrated
   model on this test set's size/confidence profile (why the reference's
   <0.03 post-scaling ECE is not reachable on 89 windows).

Usage:
    python scripts/calibration_study.py extract [--exp NAME ...]
    python scripts/calibration_study.py replay
    python scripts/calibration_study.py floor
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

STUDY_DIR = REPO_ROOT / "report" / "calibration_study"

# runs/<run_name> -> experiments/<exp_name> (the matrix's naming map)
RUN_TO_EXP = {
    "sweep_early": "early",
    "sweep_late": "late",
    "sweep_hybrid": "hybrid",
    "heads_1": "heads_1",
    "heads_4": "heads_4",
    "heads_8": "heads_8",
    "chunk_512": "chunk_512",
    "chunk_1024": "chunk_1024",
    "chunk_2048": "chunk_2048",
    "single_imu_hand": "imu_hand",
    "single_imu_chest": "imu_chest",
    "single_imu_ankle": "imu_ankle",
    "single_heart_rate": "heart_rate",
    "encoder_lstm": "encoder_lstm",
    "encoder_cnn": "encoder_cnn",
    "encoder_lstm_full": "encoder_lstm_full",
    "hybrid_transformer": "hybrid_transformer",
    "hybrid_transformer_s43": "hybrid_transformer_s43",
    "hybrid_transformer_s44": "hybrid_transformer_s44",
    "single_full_imu_hand": "single_full_imu_hand",
    "single_full_imu_chest": "single_full_imu_chest",
    "single_full_imu_ankle": "single_full_imu_ankle",
    "single_full_heart_rate": "single_full_heart_rate",
}


def extract(exp_filter=None):
    """Forward every checkpoint over val (overlap-pooled) + test on CPU."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
        _dataset_kwargs,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (
        create_datasets,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.device import (
        device_put_split,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.evaluate import (
        forward_all,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
        MultimodalFusionModel,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
        load_checkpoint,
    )

    STUDY_DIR.mkdir(parents=True, exist_ok=True)
    for run_name, exp_name in RUN_TO_EXP.items():
        if exp_filter and exp_name not in exp_filter:
            continue
        out = STUDY_DIR / f"{exp_name}.npz"
        results = REPO_ROOT / "runs" / run_name / "results.json"
        if not results.exists():
            print(f"[skip] {run_name}: no results.json")
            continue
        ckpt = json.loads(results.read_text())["best_model_path"]
        variables, config, _meta = load_checkpoint(ckpt)
        model = MultimodalFusionModel.from_config(config)

        kwargs = _dataset_kwargs(config)
        chunk = kwargs.get("chunk_size")
        val_overlap = 1
        if kwargs.get("dataset_name") != "synthetic" and chunk:
            stride = max(1, int(chunk) // 4)
            kwargs["val_window_stride"] = stride
            val_overlap = max(1, int(chunk) // stride)
        _train_w, val_w, test_w = create_datasets(**kwargs)
        batch = int(config.dataset.get("batch_size", 32))

        val_logits = forward_all(model, variables, device_put_split(val_w), batch)
        test_logits = forward_all(model, variables, device_put_split(test_w), batch)
        np.savez(
            out,
            val_logits=val_logits,
            val_labels=np.asarray(val_w.labels),
            val_shards=np.asarray(
                val_w.shard_ids
                if val_w.shard_ids is not None
                else np.arange(val_w.num_windows)
            ),
            test_logits=test_logits,
            test_labels=np.asarray(test_w.labels),
            test_shards=np.asarray(
                test_w.shard_ids
                if test_w.shard_ids is not None
                else np.arange(test_w.num_windows)
            ),
            val_overlap=val_overlap,
        )
        print(
            f"[ok] {exp_name}: val {val_logits.shape} "
            f"({len(np.unique(np.load(out)['val_shards']))} shards), "
            f"test {test_logits.shape}"
        )


# ---------------------------------------------------------------------------
# guard variants
# ---------------------------------------------------------------------------

def _softmax(z):
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(-1, keepdims=True)


def _ece(logits, labels, t, num_bins=15, sel=slice(None)):
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.metrics import (
        expected_calibration_error,
    )

    p = _softmax(np.asarray(logits[sel], np.float64) / t)
    return expected_calibration_error(
        p.max(-1), p.argmax(-1), np.asarray(labels)[sel], num_bins
    )


def _nll_fit_t(logits, labels):
    """1-D NLL minimisation over log T (golden-section; no jax needed)."""
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels)

    def nll(log_t):
        logp = np.log(_softmax(logits / np.exp(log_t)) + 1e-12)
        return -logp[np.arange(len(labels)), labels].mean()

    lo, hi = np.log(0.05), np.log(20.0)
    gr = (np.sqrt(5) - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    for _ in range(80):
        if nll(c) < nll(d):
            b = d
        else:
            a = c
        c, d = b - gr * (b - a), a + gr * (b - a)
    return float(np.exp((a + b) / 2))


GRID = np.exp(np.linspace(np.log(0.5), np.log(2.5), 21)).tolist()


def guard_round4(val_logits, val_labels, val_shards, overlap, num_bins=15):
    """Reproduce the shipped round-4 guard (grid + round-robin blocks)."""
    n = len(val_labels)
    t_nll = float(np.clip(_nll_fit_t(val_logits, val_labels), 0.5, 2.5))
    candidates = sorted(set([t_nll] + GRID))
    n_eff = max(1, n // max(1, overlap))
    num_bins_eff = int(np.clip(n_eff // 10, 5, num_bins))
    if n_eff < 10 * num_bins_eff:
        return 1.0
    block = 4 * max(1, overlap)
    fold_a = (np.arange(n) // block) % 2 == 0
    fold_b = ~fold_a
    ece = lambda t, sel=slice(None): _ece(  # noqa: E731
        val_logits, val_labels, t, num_bins_eff, sel
    )
    base, base_a, base_b = ece(1.0), ece(1.0, fold_a), ece(1.0, fold_b)
    best_t, best_e = 1.0, base
    for t in candidates:
        e = ece(t)
        if (
            e < base - 0.005
            and e < best_e - 1e-9
            and ece(t, fold_a) <= base_a + 1e-9
            and ece(t, fold_b) <= base_b + 1e-9
        ):
            best_t, best_e = float(t), e
    return best_t


def bootstrap_accept(
    val_logits, val_labels, val_shards, t, num_bins,
    n_boot=2000, confidence=0.9, seed=0,
):
    """Shard-level bootstrap of delta-ECE(T) = ECE(1) - ECE(T).

    Resamples SHARDS (subject-activity segments) with replacement — the unit
    whose variation drives val->test transfer failure — and accepts T only
    when the one-sided lower confidence bound of the improvement is > 0.
    """
    shards = np.unique(val_shards)
    idx_of = {s: np.flatnonzero(val_shards == s) for s in shards}
    rng = np.random.default_rng(seed)
    deltas = np.empty(n_boot)
    for b in range(n_boot):
        take = rng.choice(shards, size=len(shards), replace=True)
        sel = np.concatenate([idx_of[s] for s in take])
        deltas[b] = _ece(val_logits, val_labels, 1.0, num_bins, sel) - _ece(
            val_logits, val_labels, t, num_bins, sel
        )
    lower = float(np.quantile(deltas, 1.0 - confidence))
    return lower > 0.0, lower, float(deltas.mean())


def guard_nll_boot(val_logits, val_labels, val_shards, overlap, num_bins=15,
                   confidence=0.9):
    """Variant B: single NLL-fit candidate + shard bootstrap acceptance."""
    n_eff = max(1, len(val_labels) // max(1, overlap))
    num_bins_eff = int(np.clip(n_eff // 10, 5, num_bins))
    t = float(np.clip(_nll_fit_t(val_logits, val_labels), 0.5, 2.5))
    if abs(t - 1.0) < 1e-6:
        return 1.0
    ok, _, _ = bootstrap_accept(
        val_logits, val_labels, val_shards, t, num_bins_eff,
        confidence=confidence,
    )
    return t if ok else 1.0


def guard_grid_boot(val_logits, val_labels, val_shards, overlap, num_bins=15,
                    confidence=0.9):
    """Variant C: grid selection by val ECE, then shard bootstrap acceptance
    of the SELECTED temperature (selection bias partially remains)."""
    n_eff = max(1, len(val_labels) // max(1, overlap))
    num_bins_eff = int(np.clip(n_eff // 10, 5, num_bins))
    t_nll = float(np.clip(_nll_fit_t(val_logits, val_labels), 0.5, 2.5))
    candidates = sorted(set([t_nll] + GRID))
    eces = [_ece(val_logits, val_labels, t, num_bins_eff) for t in candidates]
    t_best = candidates[int(np.argmin(eces))]
    if abs(t_best - 1.0) < 1e-6:
        return 1.0
    ok, _, _ = bootstrap_accept(
        val_logits, val_labels, val_shards, t_best, num_bins_eff,
        confidence=confidence,
    )
    return t_best if ok else 1.0


def guard_loso_select(val_logits, val_labels, val_shards, overlap, num_bins=15,
                      confidence=0.9):
    """Variant D: leave-one-shard-out candidate scoring (each candidate's
    score = mean held-out-shard ECE when selected on the remaining shards),
    then bootstrap acceptance."""
    n_eff = max(1, len(val_labels) // max(1, overlap))
    num_bins_eff = int(np.clip(n_eff // 10, 5, num_bins))
    t_nll = float(np.clip(_nll_fit_t(val_logits, val_labels), 0.5, 2.5))
    candidates = sorted(set([t_nll] + GRID))
    shards = np.unique(val_shards)
    if len(shards) < 3:
        return guard_nll_boot(val_logits, val_labels, val_shards, overlap, num_bins)
    # per-candidate: mean ECE over held-out shards
    held = np.zeros(len(candidates))
    for s in shards:
        out = val_shards == s
        for i, t in enumerate(candidates):
            held[i] += _ece(val_logits, val_labels, t, num_bins_eff, out)
    t_best = candidates[int(np.argmin(held))]
    if abs(t_best - 1.0) < 1e-6:
        return 1.0
    ok, _, _ = bootstrap_accept(
        val_logits, val_labels, val_shards, t_best, num_bins_eff,
        confidence=confidence,
    )
    return t_best if ok else 1.0


def guard_maximin(val_logits, val_labels, val_shards, overlap, num_bins=15,
                  min_overall=0.02, shard_frac=0.75):
    """Variant E: shard-consistent maximin selection.

    Diagnosis (this study's `replay` on the committed logits): TEST ECE on
    45-89 windows is binning-noise dominated — even T=1.049 moved test ECE
    by ±0.035 — so acceptance must demand a LARGE, SHARD-CONSISTENT val
    effect. A candidate T is admissible iff it improves val ECE on >=
    ``shard_frac`` of the val shards (subject-activity segments) AND the
    overall val improvement >= ``min_overall`` (comparable to the test
    estimator's own noise). Among admissible candidates, pick the one
    maximising the MINIMUM per-shard improvement (the most uniformly-
    transferable temperature), tie-broken by overall improvement.
    """
    n_eff = max(1, len(val_labels) // max(1, overlap))
    num_bins_eff = int(np.clip(n_eff // 10, 5, num_bins))
    t_nll = float(np.clip(_nll_fit_t(val_logits, val_labels), 0.5, 2.5))
    candidates = sorted(set([t_nll] + GRID))
    shards = np.unique(val_shards)
    need = int(np.ceil(shard_frac * len(shards)))
    best_t, best_key = 1.0, (-np.inf, -np.inf)
    base_overall = _ece(val_logits, val_labels, 1.0, num_bins_eff)
    base_per = {
        s: _ece(val_logits, val_labels, 1.0, num_bins_eff, val_shards == s)
        for s in shards
    }
    for t in candidates:
        overall = base_overall - _ece(val_logits, val_labels, t, num_bins_eff)
        if overall < min_overall:
            continue
        per = np.array([
            base_per[s] - _ece(val_logits, val_labels, t, num_bins_eff, val_shards == s)
            for s in shards
        ])
        if (per > 0).sum() < need or per.min() < -0.005:
            continue
        key = (float(per.min()), overall)
        if key > best_key:
            best_t, best_key = float(t), key
    return best_t


VARIANTS = {
    "round4 (shipped)": guard_round4,
    "B: nll+shard-boot": guard_nll_boot,
    "C: grid+shard-boot": guard_grid_boot,
    "D: loso-sel+boot": guard_loso_select,
    "E: maximin-shard": guard_maximin,
}


def replay():
    files = sorted(STUDY_DIR.glob("*.npz"))
    if not files:
        print("no cached logits — run `extract` first")
        return
    table = {}
    for name, fn in VARIANTS.items():
        rows = []
        for f in files:
            z = np.load(f)
            t = fn(
                z["val_logits"], z["val_labels"], z["val_shards"],
                int(z["val_overlap"]),
            )
            before = _ece(z["test_logits"], z["test_labels"], 1.0)
            after = _ece(z["test_logits"], z["test_labels"], t)
            rows.append((f.stem, t, before, after))
        regressions = [r for r in rows if r[3] > r[2] + 1e-9]
        wins = [r for r in rows if r[3] < r[2] - 0.005]
        mean_delta = float(np.mean([r[2] - r[3] for r in rows]))
        table[name] = (rows, regressions, wins, mean_delta)
        print(f"\n== {name} ==")
        print(f"  test regressions: {len(regressions)}  "
              f"real wins (>0.005): {len(wins)}  mean dECE: {mean_delta:+.4f}")
        for exp, t, before, after in rows:
            mark = "REG" if after > before + 1e-9 else (
                "win" if after < before - 0.005 else "  -")
            print(f"  {mark} {exp:28s} T={t:5.3f}  {before:.4f} -> {after:.4f}")
    return table


def floor(num_draws=2000, seed=0):
    """ECE noise floor of a PERFECTLY calibrated model at this test size.

    For each committed test set: keep its confidence profile, redraw
    correctness as Bernoulli(confidence) — the true-calibration null — and
    measure the ECE the 15-bin estimator reports. The mean of that
    distribution is the floor no post-hoc method can beat on this many
    windows.
    """
    rng = np.random.default_rng(seed)
    out = {}
    for f in sorted(STUDY_DIR.glob("*.npz")):
        z = np.load(f)
        conf = _softmax(np.asarray(z["test_logits"], np.float64)).max(-1)
        n = len(conf)
        eces = np.empty(num_draws)
        from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.metrics import (
            expected_calibration_error,
        )

        for d in range(num_draws):
            correct = rng.random(n) < conf
            # correctness ~ Bernoulli(conf): predictions/labels only enter
            # ECE through the correctness indicator, so encode it directly
            preds = np.zeros(n, np.int64)
            labels = np.where(correct, 0, 1)
            eces[d] = expected_calibration_error(conf, preds, labels, 15)
        out[f.stem] = (float(eces.mean()), float(np.quantile(eces, 0.05)),
                       float(np.quantile(eces, 0.95)), n)
        print(f"  {f.stem:28s} n={n:4d} floor ECE = {eces.mean():.4f} "
              f"[{np.quantile(eces, 0.05):.4f}, {np.quantile(eces, 0.95):.4f}]")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("cmd", choices=["extract", "replay", "floor"])
    parser.add_argument("--exp", nargs="*", default=None)
    args = parser.parse_args()
    if args.cmd == "extract":
        extract(args.exp)
    elif args.cmd == "replay":
        replay()
    else:
        floor()


if __name__ == "__main__":
    main()
