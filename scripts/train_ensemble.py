#!/usr/bin/env python
"""Deep-ensemble driver: train K seeds, fuse their predictions, measure UQ.

The reference ships ``EnsembleUncertainty`` (``src/uncertainty.py:441-492``)
but no driver that produces an ensemble; this script completes the story:

    python scripts/train_ensemble.py --num-models 3 [--epochs 15] [overrides...]

Trains K models differing only in seed, evaluates the ensemble on the test
split (mean softmax probabilities; predictive variance as uncertainty), and
writes ``experiments/ensemble/ensemble_results.json`` with accuracy / ECE /
NLL of the ensemble vs the mean individual model.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-models", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--base-seed", type=int, default=42)
    parser.add_argument("--output_dir", type=str, default="experiments/ensemble")
    parser.add_argument("--config-name", type=str, default="base")
    parser.add_argument("overrides", nargs="*", help="dotted config overrides")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.cli import (
        _dataset_kwargs,
        _resolve_config_arg,
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
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import (
        Trainer,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.uncertainty import (
        compute_calibration_metrics,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import (
        enable_persistent_compilation_cache,
        load_config,
    )

    enable_persistent_compilation_cache()
    config_file, file_overrides = _resolve_config_arg(
        ["--config-name", args.config_name, *args.overrides]
    )
    config = load_config(config_file, file_overrides)

    train_w, val_w, test_w = create_datasets(**_dataset_kwargs(config))
    test_data = device_put_split(test_w)
    labels = np.asarray(test_data.labels)
    batch_size = int(config.dataset.get("batch_size", 32))

    member_logits = []
    member_metrics = []
    for k in range(args.num_models):
        seed = args.base_seed + k
        config.set_dotted("seed", seed)
        config.set_dotted("training.max_epochs", args.epochs)
        config.set_dotted("experiment.name", f"ensemble_member{seed}")
        print(f"=== training ensemble member {k+1}/{args.num_models} (seed {seed}) ===",
              flush=True)
        trainer = Trainer(config)
        member_results = trainer.fit(train_w, val_w, log_fn=None)
        # evaluate the BEST-val checkpoint (what ships), not the last-epoch
        # state — with early stopping the final epochs can be overfit
        best_path = member_results.get("best_model_path")
        if best_path:
            from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
                load_checkpoint,
            )

            variables, _cfg, _meta = load_checkpoint(best_path)
        else:
            variables = trainer.variables(trainer._final_state)
        logits = forward_all(trainer.model, variables, test_data, batch_size)
        member_logits.append(logits)
        member_metrics.append(compute_calibration_metrics(logits=logits, labels=labels))
        print(f"member {k}: acc={member_metrics[-1]['accuracy']:.4f}", flush=True)

    probs = np.stack(
        [np.asarray(jax.nn.softmax(jnp.asarray(l), axis=-1)) for l in member_logits]
    )  # [K, N, C]
    mean_probs = probs.mean(axis=0)
    uncertainty = probs.var(axis=0, ddof=0).mean(axis=-1)  # [N]
    ens_metrics = compute_calibration_metrics(
        logits=np.log(np.clip(mean_probs, 1e-9, None)), labels=labels
    )

    results = {
        "num_models": args.num_models,
        "ensemble": ens_metrics,
        "member_mean": {
            key: float(np.mean([m[key] for m in member_metrics]))
            for key in member_metrics[0]
        },
        "members": member_metrics,
        "mean_predictive_variance": float(uncertainty.mean()),
        "max_predictive_variance": float(uncertainty.max()),
    }
    out = Path(args.output_dir) / "ensemble_results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps({"ensemble_acc": ens_metrics["accuracy"],
                      "member_mean_acc": results["member_mean"]["accuracy"]}))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
