"""CLI entry points (train / eval / analysis / preprocess).

Mirrors the reference's command surface so CI invocations port verbatim:

- ``python src/train.py model.fusion_type=early dataset.chunk_size=1024 ...``
  (Hydra-style dotted overrides; reference ``src/train.py:433``)
- ``python src/eval.py --checkpoint ... --missing_modality_test``
  (argparse; reference ``src/eval.py:472-506``)
- ``python src/analysis.py --experiment_dir ... --output_dir ...``
- ``python data/preprocess.py --raw-dir ... --output ...``
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List, Optional

import numpy as np

from .utils.config import ConfigNode, load_config

_REPO_ROOT = Path(__file__).resolve().parent.parent


def _apply_runtime_config(config: ConfigNode) -> None:
    """Seed + numeric-precision knobs (reference ``src/train.py:446-451``)."""
    import jax

    from .utils.config import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    seed = int(config.get("seed", 42))
    np.random.seed(seed)
    precision = str(config.get("training", {}).get("matmul_precision", "") or "")
    mapping = {
        "medium": "default",  # TPU default already uses bf16 multiplies
        "high": "default",
        "highest": "highest",
    }
    precision = mapping.get(precision, precision)
    if precision in ("default", "high", "highest", "bfloat16", "float32", "tensorfloat32"):
        try:
            jax.config.update("jax_default_matmul_precision", precision)
        except Exception:
            pass


def _resolve_config_arg(argv: List[str]):
    """Split hydra-ish args: ``--config-name X`` / ``--config-path P`` +
    dotted overrides."""
    config_name = "base"
    config_path = _REPO_ROOT / "config"
    overrides: List[str] = []
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg in ("--config-name", "-cn"):
            config_name = argv[i + 1]
            i += 2
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
            i += 1
        elif arg in ("--config-path", "-cp"):
            config_path = Path(argv[i + 1])
            i += 2
        elif arg.startswith("--config-path="):
            config_path = Path(arg.split("=", 1)[1])
            i += 1
        elif "=" in arg and not arg.startswith("-"):
            overrides.append(arg)
            i += 1
        else:
            i += 1
    if not str(config_name).endswith(".yaml"):
        config_name = f"{config_name}.yaml"
    return Path(config_path) / config_name, overrides


def _dataset_kwargs(config: ConfigNode) -> dict:
    ds = config.dataset
    kwargs = dict(
        dataset_name=str(ds.name),
        data_dir=str(ds.data_dir),
        modalities=list(ds.modalities),
        chunk_size=ds.get("chunk_size"),
        chunk_cache_dir=ds.get("chunk_cache_dir"),
        normalize=ds.get("normalize", False),
        window_stride=ds.get("window_stride"),
    )
    if str(ds.name) == "synthetic":
        kwargs.update(
            num_samples=int(ds.get("num_samples", 10000)),
            num_classes=int(ds.get("num_classes", 5)),
            sequence_length=int(ds.get("sequence_length", 100)),
            modality_dim=int(ds.get("modality_dim", 32)),
            seed=int(config.get("seed", 42)),
        )
    return kwargs


def train_main(argv: Optional[List[str]] = None) -> dict:
    """Training entry point (reference ``src/train.py:433-554``)."""
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    config_file, overrides = _resolve_config_arg(argv)
    config = load_config(config_file, overrides)

    print("=" * 80)
    print("Configuration:")
    print(config.to_yaml())
    print("=" * 80)

    _apply_runtime_config(config)

    from .data.dataset import create_datasets
    from .train.trainer import Trainer

    print("\nCreating datasets...")
    train_w, val_w, test_w = create_datasets(**_dataset_kwargs(config))
    print(f"Train windows: {train_w.num_windows}")
    print(f"Val windows: {val_w.num_windows}")
    print(f"Test windows: {test_w.num_windows}")

    print("\nCreating model...")
    trainer = Trainer(config)

    results = trainer.fit(train_w, val_w, test_w)
    import jax

    params = trainer._final_state.params
    total_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"Total parameters: {total_params:,}")
    print(f"\nTraining complete! Best model: {results['best_model_path']}")
    print(f"Best validation loss: {results['best_val_loss']:.4f}")
    return results


def eval_main(argv: Optional[List[str]] = None) -> dict:
    """Evaluation entry point (reference ``src/eval.py:472-658``)."""
    parser = argparse.ArgumentParser(description="Evaluate multimodal fusion model")
    parser.add_argument("--checkpoint", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--config", type=str, default="config/base.yaml", help="Path to config file")
    parser.add_argument("--output_dir", type=str, default="experiments", help="Directory to save results")
    parser.add_argument("--analysis_dir", type=str, default="analysis", help="Directory to save calibration plots")
    parser.add_argument("--missing_modality_test", action="store_true", help="Run missing modality robustness test")
    parser.add_argument("--device", type=str, default="tpu", help="Accepted for API parity (JAX picks the backend)")
    args = parser.parse_args(argv)

    from .evaluate import run_evaluation

    return run_evaluation(
        checkpoint=args.checkpoint,
        config_path=args.config,
        output_dir=args.output_dir,
        analysis_dir=args.analysis_dir,
        missing_modality_test=args.missing_modality_test,
    )


def analysis_main(argv: Optional[List[str]] = None) -> None:
    """Analysis/plots entry point (reference ``src/analysis.py:452-477``)."""
    parser = argparse.ArgumentParser(description="Generate analysis plots")
    parser.add_argument("--experiment_dir", type=str, default="experiments")
    parser.add_argument("--output_dir", type=str, default="analysis")
    parser.add_argument("--fusion_file", type=str, default=None)
    args = parser.parse_args(argv)

    from .analysis import generate_all_plots

    generate_all_plots(
        experiment_dir=args.experiment_dir,
        output_dir=args.output_dir,
        fusion_file=args.fusion_file,
    )


def aggregate_fusion_comparison(
    experiments_dir: str | Path = "experiments",
    output_path: Optional[str | Path] = None,
) -> dict:
    """Rebuild ``fusion_comparison.json`` from per-experiment eval JSONs.

    Equivalent of the reference CI merge job's aggregation step
    (``.github/workflows/parallel_run.yml:285-300``).
    """
    base = Path(experiments_dir)
    results = {"results": {}}
    if base.exists():
        for fusion_dir in sorted(p for p in base.iterdir() if p.is_dir()):
            eval_file = fusion_dir / "evaluation_results.json"
            if eval_file.exists():
                results["results"][fusion_dir.name] = json.loads(eval_file.read_text())
    output_path = Path(output_path or base / "fusion_comparison.json")
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(json.dumps(results, indent=2))
    return results
