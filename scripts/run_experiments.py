#!/usr/bin/env python
"""Local experiment matrix — the reference's 13-job CI "cluster" on one host,
extended with full-length seed/parity jobs (23 jobs total).

The reference scales out via a GitHub Actions matrix (fusion sweep, heads
ablation, chunk-size ablation, single-modality sweep) whose artifacts a merge
job aggregates into ``experiments/fusion_comparison.json`` + plots
(``.github/workflows/parallel_run.yml:13-312``). One TPU chip outruns 13
CPU runners, so here the same matrix runs as a sequential sweep with the
merge step inlined at the end.

Usage:
    python scripts/run_experiments.py [--epochs 10] [--groups fusion,heads,...]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import traceback
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (  # noqa: E402
    aggregate_fusion_comparison,
    analysis_main,
    eval_main,
    train_main,
)

MODALITIES = ["imu_hand", "imu_chest", "imu_ankle", "heart_rate"]


def matrix(epochs: int):
    jobs = []
    for fusion in ("early", "late", "hybrid"):
        jobs.append(
            (
                "fusion-sweep",
                fusion,
                [
                    f"model.fusion_type={fusion}",
                    f"training.max_epochs={epochs}",
                    f"experiment.name=sweep_{fusion}",
                ],
            )
        )
    for heads in (1, 4, 8):
        jobs.append(
            (
                "heads-ablation",
                f"heads_{heads}",
                [
                    "model.fusion_type=hybrid",
                    f"model.num_heads={heads}",
                    f"training.max_epochs={epochs}",
                    f"experiment.name=heads_{heads}",
                ],
            )
        )
    for chunk in (512, 1024, 2048):
        jobs.append(
            (
                "chunks-ablation",
                f"chunk_{chunk}",
                [
                    f"dataset.chunk_size={chunk}",
                    f"dataset.window_stride={max(chunk // 4, 128)}",
                    f"training.max_epochs={epochs}",
                    f"experiment.name=chunk_{chunk}",
                ],
            )
        )
    for modality in MODALITIES:
        jobs.append(
            (
                "single-modality-sweep",
                modality,
                [
                    f"dataset.modalities=[{modality}]",
                    f"training.max_epochs={epochs}",
                    f"experiment.name=single_{modality}",
                ],
            )
        )
    # flagship: the shipping default at FULL training length (base.yaml
    # max_epochs=100 + early stopping), not the 10-epoch matrix budget —
    # this is the best-known operating point (reference report.typ:120
    # claims 0.80-0.85 for hybrid; the 10-epoch rows sit at 0.66-0.78
    # with ~±6pt seed noise, see report.md seed study)
    jobs.append(
        (
            "flagship",
            "hybrid_transformer",
            [
                "model.fusion_type=hybrid",
                "experiment.name=hybrid_transformer",
            ],
        )
    )
    # encoder-type ablation: transformer is the shipping default (the
    # fusion-sweep hybrid job); lstm/cnn are the reference-parity variants
    for enc in ("lstm", "cnn"):
        jobs.append(
            (
                "encoder-ablation",
                f"encoder_{enc}",
                [
                    "model.fusion_type=hybrid",
                    *[f"model.encoders.{m}.encoder_type={enc}" for m in MODALITIES],
                    f"training.max_epochs={epochs}",
                    f"experiment.name=encoder_{enc}",
                ],
            )
        )
    # flagship seed sweep: the headline number must be mean±std over seeds,
    # not one draw — the 10-epoch paired study measured a ±9pt spread
    # (experiments/bf16_flagship/seed_sweep.json); seed 42 is the flagship
    # job above
    for seed in (43, 44):
        jobs.append(
            (
                "flagship-seeds",
                f"hybrid_transformer_s{seed}",
                [
                    "model.fusion_type=hybrid",
                    f"seed={seed}",
                    f"experiment.name=hybrid_transformer_s{seed}",
                ],
            )
        )
    # chunk-1024 operating point at the FLAGSHIP protocol (full length +
    # early stopping), seed-swept: the 10-epoch chunk ablation row beat the
    # shipping 512 on accuracy/NLL/ECE, so the candidate flip needs its own
    # seed-robust number before the tradeoff can be stated (round-5 verdict
    # ask #8)
    for seed in (42, 43, 44):
        suffix = "" if seed == 42 else f"_s{seed}"
        jobs.append(
            (
                "chunk1024-seeds",
                f"chunk1024_full{suffix}",
                [
                    "model.fusion_type=hybrid",
                    "dataset.chunk_size=1024",
                    "dataset.window_stride=256",
                    f"seed={seed}",
                    f"experiment.name=chunk1024_full{suffix}",
                ],
            )
        )
    # full-length single-modality runs: fusion-vs-best-single must be
    # like-for-like at the operating point (reference report.typ:164 claims
    # +25-30% for fusion over the best single stream at full training length)
    for modality in MODALITIES:
        jobs.append(
            (
                "single-full",
                f"single_full_{modality}",
                [
                    f"dataset.modalities=[{modality}]",
                    f"experiment.name=single_full_{modality}",
                ],
            )
        )
    # full-length LSTM parity run: the reference's DEFAULT encoder is LSTM
    # (reference config/base.yaml:37-55); the 10-epoch budget (0.416) is not
    # its operating point
    jobs.append(
        (
            "lstm-full",
            "encoder_lstm_full",
            [
                "model.fusion_type=hybrid",
                *[f"model.encoders.{m}.encoder_type=lstm" for m in MODALITIES],
                "experiment.name=encoder_lstm_full",
            ],
        )
    )
    return jobs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument(
        "--groups", type=str,
        default="fusion,heads,chunks,single,encoders,flagship,"
        "flagship-seeds,single-full,lstm-full",
        help="comma list: fusion,heads,chunks,single,encoders,flagship,"
        "flagship-seeds,single-full,lstm-full",
    )
    parser.add_argument("--experiments_dir", type=str, default="experiments")
    parser.add_argument("--analysis_dir", type=str, default="analysis")
    parser.add_argument(
        "--eval_only", action="store_true",
        help="skip training; re-evaluate each job's committed checkpoint "
        "(runs/<experiment.name>/results.json -> best_model_path)",
    )
    args = parser.parse_args()

    wanted = {g.strip() for g in args.groups.split(",")}
    group_map = {
        "fusion-sweep": "fusion",
        "heads-ablation": "heads",
        "chunks-ablation": "chunks",
        "single-modality-sweep": "single",
        "encoder-ablation": "encoders",
        "flagship": "flagship",
        "flagship-seeds": "flagship-seeds",
        "chunk1024-seeds": "chunk1024-seeds",
        "single-full": "single-full",
        "lstm-full": "lstm-full",
    }

    failures = []
    for group, name, overrides in matrix(args.epochs):
        if group_map[group] not in wanted:
            continue
        print(f"\n=== {group} / {name} ===", flush=True)
        out_dir = Path(args.experiments_dir) / name
        # fusion-sweep jobs map 1:1 to fusion_type subdirs of analysis/;
        # ablation jobs are all fusion_type=hybrid and would stomp each
        # other's plots, so each gets its own analysis root (the reference
        # avoided this with per-CI-job workspaces, parallel_run.yml:48-72)
        analysis_dir = (
            args.analysis_dir
            if group == "fusion-sweep"
            else str(Path(args.analysis_dir) / name)
        )
        try:
            if args.eval_only:
                run_name = next(
                    o.split("=", 1)[1]
                    for o in overrides
                    if o.startswith("experiment.name=")
                )
                results = json.loads(
                    (REPO_ROOT / "runs" / run_name / "results.json").read_text()
                )
            else:
                results = train_main(overrides)
            ckpt = results["best_model_path"]
            eval_args = [
                "--checkpoint", ckpt,
                "--output_dir", str(out_dir),
                "--analysis_dir", analysis_dir,
            ]
            if group in ("fusion-sweep", "flagship"):
                eval_args.append("--missing_modality_test")
            eval_main(eval_args)
        except Exception as exc:
            traceback.print_exc()
            failures.append((group, name, str(exc)))

    # merge step (reference parallel_run.yml:285-312)
    print("\n=== merge ===", flush=True)
    fusion_file = Path(args.experiments_dir) / "fusion_comparison.json"
    aggregate_fusion_comparison(args.experiments_dir, fusion_file)
    analysis_main(
        [
            "--experiment_dir", args.experiments_dir,
            "--output_dir", args.analysis_dir,
            "--fusion_file", str(fusion_file),
        ]
    )
    summary = {
        "jobs": [
            name
            for group, name, _ in matrix(args.epochs)
            if group_map[group] in wanted
        ],
        "failures": failures,
    }
    print(json.dumps(summary, indent=2))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
