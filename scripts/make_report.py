#!/usr/bin/env python
"""Assemble the results report (reference ``report/report.typ`` analogue).

Reads ``experiments/*/evaluation_results.json`` + ``missing_modality.json``
and the bench JSON (if present) and writes ``report/report.md`` with the
measured numbers, mirroring the reference report's sections (fusion
comparison, ablations, missing-modality robustness, calibration, perf).

    python scripts/make_report.py [--experiments experiments] [--out report/report.md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_json_str(text: str):
    try:
        return json.loads(text)
    except Exception:
        return None


def load_json(path: Path):
    try:
        return load_json_str(path.read_text())
    except Exception:
        return None


def fmt(x, digits=3):
    if x is None:
        return "—"
    return f"{x:.{digits}f}"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments", type=str, default="experiments")
    parser.add_argument("--bench", type=str, default=None, help="bench JSON line file")
    parser.add_argument("--out", type=str, default="report/report.md")
    args = parser.parse_args(argv)

    exp = Path(args.experiments)
    rows = {}
    missing = {}
    uncertainty = {}
    if exp.exists():
        for d in sorted(p for p in exp.iterdir() if p.is_dir()):
            ev = load_json(d / "evaluation_results.json")
            if ev:
                rows[d.name] = ev
            mm = load_json(d / "missing_modality.json")
            if mm:
                missing[d.name] = mm
            un = load_json(d / "uncertainty.json")
            if un:
                uncertainty[d.name] = un

    # the bench file is append-only history (one JSON line per measurement);
    # keep the LATEST entry per (model, chunk) and lead with the shipping
    # default (the plain transformer flagship)
    history = []
    fallbacks = []
    other_metrics = []
    if args.bench and Path(args.bench).exists():
        for line in Path(args.bench).read_text().splitlines():
            line = line.strip()
            if line.startswith("{"):
                parsed = load_json_str(line)
                if not parsed:
                    continue
                # bench.py also emits cpu-fallback rows (backend flag) and
                # error rows (value null) when the tunneled TPU is down —
                # neither belongs in the on-chip throughput table
                if parsed.get("value") is None or parsed.get("backend") == "cpu-fallback":
                    fallbacks.append(parsed)
                    continue
                # only the driver throughput metric belongs in the windows/s
                # table (same filter as bench.py::_last_tpu_row); kernel A/B
                # probes under other metrics get their own section below
                if not str(parsed.get("metric", "")).startswith("PAMAP2 windows/sec"):
                    other_metrics.append(parsed)
                    continue
                history.append(parsed)
    latest = {}
    for b in history:
        latest[(b.get("model"), b.get("chunk_size"))] = b
    benches = list(latest.values())
    default_key = ("hybrid-transformer-flash", 512)
    benches.sort(key=lambda b: (b.get("model"), b.get("chunk_size")) != default_key)
    bench = benches[0] if benches else None

    lines = [
        "# Results report — TPU-native multimodal sensor fusion",
        "",
        "All numbers measured on the shards surviving in the public mirror of",
        "the reference dataset (27/88 PAMAP2 shards, 5 activities — see",
        "`docs/notes.md` for why absolute accuracies are not comparable to the",
        "reference's full-data CI numbers). Training: instance-normalised",
        "512-step windows, stride 128, gaussian-noise + modality-dropout",
        "augmentation, AdamW + cosine, early stopping on val loss.",
        "",
    ]

    if bench:
        lines += [
            "## Throughput (single TPU v5e chip)",
            "",
            f"- **{bench['value']:.0f} windows/s** sustained end-to-end forward "
            f"({bench['metric']}, model `{bench.get('model', '?')}` at chunk "
            f"{bench.get('chunk_size', '?')}), **{bench['vs_baseline']:.0f}×** the torch-CPU "
            "re-implementation of the reference hot path "
            f"({bench.get('baseline_cpu_windows_per_sec', 0):.1f} windows/s).",
            f"- p50 latency: {bench.get('p50_latency_ms_per_window', 0):.3f} ms/window "
            f"at batch {bench.get('batch')}.",
        ]
        if bench.get("train_windows_per_sec"):
            lines.append(
                f"- training throughput: **{bench['train_windows_per_sec']:.0f} "
                "windows/s** (fwd + bwd + AdamW through the Pallas custom-VJP "
                "kernels)."
            )
        lines.append("")
        if fallbacks:
            n_err = sum(1 for f in fallbacks if f.get("value") is None)
            n_cpu = len(fallbacks) - n_err
            lines += [
                f"(History also contains {n_cpu} CPU-fallback and {n_err} "
                "error row(s) recorded while the TPU tunnel was down — "
                "excluded from the on-chip table above.)",
                "",
            ]
        if len(benches) > 1:
            lines += [
                "| model (chunk) | fwd windows/s | train windows/s | p50 ms/window | vs torch-CPU |",
                "|---|---|---|---|---|",
            ]
            for b in benches:
                # latency-only probes (batch-scaling rows) record no train
                # leg — print a dash, not a misleading 0
                train = b.get("train_windows_per_sec")
                lines.append(
                    f"| {b.get('model', '?')} ({b.get('chunk_size', '?')}) | "
                    f"{b.get('value', 0):.0f} | "
                    + (f"{train:.0f} | " if train else "— | ")
                    + f"{b.get('p50_latency_ms_per_window', 0):.3f} | "
                    f"{b.get('vs_baseline', 0):.0f}× |"
                )
            lines.append("")
        # roofline/MFU — rendered from the lead row's analytic-FLOPs keys
        # (bench.py emits model_flops_per_window + mfu/train_mfu on-chip)
        if bench.get("mfu") is not None:
            gflops = bench.get("model_flops_per_window", 0) / 1e9
            peak = bench.get("mfu_peak_tflops_bf16", 0)
            fwd_tf = bench["value"] * bench.get("model_flops_per_window", 0) / 1e12
            lines += [
                "### Roofline / MFU",
                "",
                "Analytic model cost (XLA compiled cost analysis of the pure-XLA",
                "path, which the Pallas kernels are equivalence-tested against —",
                f"`bench.py --flops`): **{gflops:.2f} GFLOPs per window** at the",
                f"shipping default. Against a v5e chip's {peak:.0f} TFLOP/s bf16",
                "MXU peak (f32-input matmuls execute as single-pass bf16 on the",
                "MXU at default precision):",
                "",
                f"- forward {bench['value']:.0f} windows/s → **{fwd_tf:.1f} "
                f"TFLOP/s ≈ {bench['mfu'] * 100:.0f}% MFU**;",
            ]
            if bench.get("train_mfu") is not None and bench.get("train_windows_per_sec"):
                train_tf = (
                    3 * bench["train_windows_per_sec"]
                    * bench.get("model_flops_per_window", 0) / 1e12
                )
                lines.append(
                    f"- training {bench['train_windows_per_sec']:.0f} windows/s at "
                    f"the standard fwd+bwd ≈ 3× fwd accounting → **{train_tf:.1f} "
                    f"TFLOP/s ≈ {bench['train_mfu'] * 100:.0f}% MFU**."
                )
            lines += [
                "",
                "For a model this small (d=256 GEMMs, heavy non-matmul work in",
                "masking, gating, layernorms and dropout between them), ~35%",
                "forward MFU is near the practical ceiling — LLM-scale d≥4096",
                "stacks are what reach 50–60%. `bench.py` emits",
                "`model_flops_per_window`, `mfu`, and `train_mfu` in its JSON",
                "line, so each kernel change is judged directly against this",
                "roofline (`docs/notes.md` has the measured evidence).",
                "",
            ]
    elif fallbacks:
        lines += [
            "## Throughput",
            "",
            "No on-chip measurement in the bench history — only CPU-fallback/"
            "error rows recorded while the TPU tunnel was down.",
            "",
        ]

    if other_metrics:
        # kernel/serving A/B probes recorded under their own metric names
        # (e.g. the head-only latency A/B) — latest row per metric, rendered
        # with each row's own unit, never mixed into the windows/s table
        latest_other = {}
        for b in other_metrics:
            latest_other[(b.get("metric"), b.get("model"), b.get("batch"))] = b
        lines += [
            "## Kernel / serving micro-benchmarks (on-chip)",
            "",
            "| metric | model | batch | value | unit | vs XLA |",
            "|---|---|---|---|---|---|",
        ]
        for b in latest_other.values():
            vs = b.get("speedup_vs_xla", b.get("vs_baseline"))
            lines.append(
                f"| {b.get('metric', '?')} | {b.get('model', '?')} | "
                f"{b.get('batch', '—')} | {fmt(b.get('value'))} | "
                f"{b.get('unit', '?')} | "
                + (f"{vs:.2f}× |" if vs is not None else "— |")
            )
        lines.append("")

    if rows:
        lines += [
            "## Experiment matrix",
            "",
            "| experiment | accuracy | macro-F1 | ECE | NLL |",
            "|---|---|---|---|---|",
        ]
        for name, ev in rows.items():
            lines.append(
                f"| {name} | {fmt(ev.get('test_accuracy'))} | "
                f"{fmt(ev.get('test_f1_macro'))} | {fmt(ev.get('ece'))} | "
                f"{fmt(ev.get('nll'))} |"
            )
        lines.append("")

    # headline robustness: flagship (full-length) over seeds 42/43/44, and
    # the fusion-vs-best-single margin measured like-for-like at the same
    # full training length (reference report.typ:164 claims +25-30%)
    flagship_accs = {
        name: rows[name].get("test_accuracy")
        for name in ("hybrid_transformer", "hybrid_transformer_s43", "hybrid_transformer_s44")
        if name in rows and rows[name].get("test_accuracy") is not None
    }
    single_full = {
        name: rows[name].get("test_accuracy")
        for name in rows
        if name.startswith("single_full_") and rows[name].get("test_accuracy") is not None
    }
    if len(flagship_accs) >= 2:
        import statistics

        # seed labels come from the experiment names actually present, not a
        # positional zip (a missing middle run would otherwise mislabel)
        seed_of = {
            "hybrid_transformer": "42",
            "hybrid_transformer_s43": "43",
            "hybrid_transformer_s44": "44",
        }
        accs = list(flagship_accs.values())
        mean, std = statistics.mean(accs), statistics.stdev(accs)
        lines += [
            "## Headline accuracy (flagship hybrid transformer, full training length)",
            "",
            f"**{mean:.3f} ± {std:.3f}** test accuracy over {len(accs)} seeds "
            f"({', '.join(f'{seed_of[n]}={fmt(a)}' for n, a in flagship_accs.items())}).",
            "",
        ]
        if single_full:
            best_name, best_acc = max(single_full.items(), key=lambda kv: kv[1])
            margin = (mean - best_acc) / best_acc * 100.0
            lines += [
                f"Fusion margin at the operating point: hybrid {mean:.3f} ± {std:.3f} "
                f"vs best full-length single modality "
                f"`{best_name.removeprefix('single_full_')}` {best_acc:.3f} "
                f"(**{margin:+.1f}%**). Full-length single-modality rows: "
                + ", ".join(
                    f"{n.removeprefix('single_full_')}={fmt(a)}"
                    for n, a in sorted(single_full.items())
                )
                + ".",
                "",
            ]
        lstm_full = rows.get("encoder_lstm_full", {}).get("test_accuracy")
        if lstm_full is not None:
            lines += [
                f"Reference-parity LSTM encoders at the same full length: "
                f"{fmt(lstm_full)} (the reference's default encoder; the "
                "transformer default is the shipping operating point).",
                "",
            ]

    c1024 = {
        name: rows[name].get("test_accuracy")
        for name in ("chunk1024_full", "chunk1024_full_s43", "chunk1024_full_s44")
        if name in rows and rows[name].get("test_accuracy") is not None
    }
    if len(c1024) >= 2 and len(flagship_accs) >= 2:
        import statistics

        m1024 = statistics.mean(c1024.values())
        s1024 = statistics.stdev(c1024.values())
        m512 = statistics.mean(flagship_accs.values())
        s512 = statistics.stdev(flagship_accs.values())
        lines += [
            "## Operating point: chunk 512 vs 1024 (both axes, seed-swept)",
            "",
            f"Accuracy at the flagship protocol: chunk 512 = {m512:.3f} ± "
            f"{s512:.3f}, chunk 1024 = **{m1024:.3f} ± {s1024:.3f}** (seeds "
            "42/43/44, full training length). Throughput at the shipping "
            "kernel defaults (windows are 2× longer at 1024, so compare "
            "sample-seconds/s = windows/s × chunk): see the bench table "
            "rows at chunk 512 and 1024.",
            "",
        ]

    loso = load_json(Path(args.experiments) / "loso" / "summary.json")
    if loso and loso.get("jobs"):
        lines += [
            "## Leave-one-subject-out cross-validation (9 PAMAP2 subjects)",
            "",
            "Fold i tests on subject i and validates on the next multi-class "
            "subject; training never sees the held-out subject. This is the "
            "defensible protocol on the 27-shard subset (the 89-window "
            "single split carries ~±6 pt seed noise, report/seed_variance).",
            "",
            "| job | mean ± std (all folds) | mean (multi-class folds) | mean ECE (multi-class) | folds |",
            "|---|---|---|---|---|",
        ]
        for job, info in loso["jobs"].items():
            multi = info.get("mean_accuracy_multiclass_folds")
            mstd = info.get("std_accuracy_multiclass_folds", 0.0)
            n_multi = info.get("num_multiclass_folds")
            eces = [
                r["ece"] for s, r in info["per_fold"].items()
                if r.get("ece") is not None
                and (n_multi is None or s != "subject_109")
            ]
            mean_ece = sum(eces) / len(eces) if eces else None
            lines.append(
                f"| {job} | {fmt(info['mean_accuracy'])} ± "
                f"{fmt(info['std_accuracy'])} | "
                + (f"{fmt(multi)} ± {fmt(mstd)}" if multi is not None else "—")
                + f" | {fmt(mean_ece)} | {info['num_folds']} |"
            )
        lines.append("")
        per_fold = next(iter(loso["jobs"].values()))["per_fold"]
        lines += [
            "Per-fold (flagship): "
            + ", ".join(
                f"{s.removeprefix('subject_')}={fmt(r['test_accuracy'])}"
                for s, r in sorted(per_fold.items())
            )
            + ". Subject 109 performed only rope jumping (single-class "
            "fold); subject 107 is the only subject with activity 2, so "
            "that class is unlearnable in its fold; subject 108 is the "
            "hardest transfer (its stair-descent windows classify at 0.84 "
            "cross-subject but its other activities mostly do not).",
            "",
        ]
        if "fusion_margin_mean" in loso:
            lines += [
                f"Per-fold fusion margin (flagship − single imu_chest): "
                f"mean {loso['fusion_margin_mean']:+.3f} ± "
                f"{loso.get('fusion_margin_std', 0.0):.3f}"
                + (
                    f" ({loso['fusion_margin_mean_multiclass_folds']:+.3f} "
                    "over multi-class folds)."
                    if "fusion_margin_mean_multiclass_folds" in loso
                    else "."
                ),
                "",
            ]

    oracle = load_json(Path(args.experiments) / "torch_oracle" / "summary.json")
    if oracle:
        lines += [
            "## Torch training oracle (reference implementation, same splits)",
            "",
            "The reference's own torch architecture trained on the SAME "
            "27-shard windows/splits (scripts/torch_oracle.py) — adjudicates "
            "whether accuracy gaps vs the reference's published numbers are "
            "the data subset or this framework.",
            "",
            "| recipe | seeds | torch accuracy (mean ± std) |",
            "|---|---|---|",
        ]
        for name, info in sorted(oracle.items()):
            lines.append(
                f"| {name} | {', '.join(str(s) for s in info['seeds'])} | "
                f"{fmt(info['mean'])} ± {fmt(info['std'])} |"
            )
        lines.append("")

    if uncertainty:
        calibrated = {
            k: v for k, v in uncertainty.items() if "ece_after_temperature_scaling" in v
        }
        if calibrated:
            lines += [
                "## Calibration (post-hoc temperature scaling)",
                "",
                "| experiment | T | ECE before | ECE after |",
                "|---|---|---|---|",
            ]
            for name, un in calibrated.items():
                lines.append(
                    f"| {name} | {fmt(un.get('temperature'), 2)} | "
                    f"{fmt(un.get('ece'))} | "
                    f"{fmt(un.get('ece_after_temperature_scaling'))} |"
                )
            lines.append("")

    # encoder-type ablation: hybrid (shipping transformer default) vs the
    # encoder_{lstm,cnn} sweep jobs with identical fusion/config otherwise
    enc_rows = {"transformer (default)": rows.get("hybrid")}
    for enc in ("lstm", "cnn"):
        enc_rows[enc] = rows.get(f"encoder_{enc}")
    if all(v is not None for v in enc_rows.values()):
        lines += [
            "## Encoder-type ablation (hybrid fusion, shipping config otherwise)",
            "",
            "| encoder | accuracy | macro-F1 | ECE |",
            "|---|---|---|---|",
        ]
        for enc, ev in enc_rows.items():
            lines.append(
                f"| {enc} | {fmt(ev.get('test_accuracy'))} | "
                f"{fmt(ev.get('test_f1_macro'))} | {fmt(ev.get('ece'))} |"
            )
        lines += [
            "",
            "Transformer encoders transfer across held-out subjects better than",
            "the recurrent/convolutional variants on this data; LSTM/GRU remain",
            "available for reference-parity runs and drive the Pallas recurrence",
            "kernels.",
            "",
        ]

    if missing:
        lines += ["## Missing-modality robustness", ""]
        for name, mm in missing.items():
            full = mm.get("full_modalities", {}).get("accuracy")
            singles = mm.get("single_modalities", {})
            best_single = max(
                (v.get("accuracy", 0) for v in singles.values()), default=None
            )
            imp = mm.get("modality_importance", {})
            top = max(imp, key=lambda k: imp[k]) if imp else "—"
            lines.append(
                f"- **{name}**: full-modality accuracy {fmt(full)}, best single "
                f"modality {fmt(best_single)}, most important modality: {top}."
            )
        lines.append("")

    seeds = load_json(exp / "bf16_flagship" / "seed_sweep.json")
    if seeds:
        lines += [
            "## Mixed precision (bf16)",
            "",
            f"Paired fp32-vs-bf16 runs ({seeds.get('config', '')}):",
            "",
            "| seed | fp32 acc | bf16 acc |",
            "|---|---|---|",
        ]
        for seed, pair in seeds.get("paired_seeds", {}).items():
            lines.append(
                f"| {seed} | {fmt(pair.get('fp32'))} | {fmt(pair.get('bf16'))} |"
            )
        lines += [
            "",
            f"Mean paired delta {seeds.get('mean_paired_delta_pts', 0):+.1f} pts — "
            + str(seeds.get("note", "")),
            "",
        ]

    lines += [
        "## Plots",
        "",
        "Generated under `analysis/`: fusion comparison, per-experiment",
        "missing-modality degradation, calibration reliability diagrams, and",
        "cross-modal attention heatmaps.",
        "",
    ]

    # hand-maintained sections (e.g. the seed-variance study) survive regen
    extra = Path(args.out).parent / "seed_variance.md"
    if extra.exists():
        lines += [extra.read_text(), ""]

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines))
    print(f"report written to {out}")


if __name__ == "__main__":
    main()
