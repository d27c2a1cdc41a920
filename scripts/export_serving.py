#!/usr/bin/env python
"""Export a trained checkpoint as an AOT serving bundle (jax.export).

Usage:
    python scripts/export_serving.py --checkpoint runs/<exp>/checkpoints/<name> \
        --output_dir serving_bundle [--batch_size 64] [--platforms tpu,cpu]

The bundle (serialized StableHLO + flat params.npz + bundle.json) serves
without any of this framework's model code — see
``multimodal_sensor_fusion_with_attention_rajeevatla_tpu.serving``.
Multi-platform bundles lower the portable XLA graph (Pallas kernel flags
are forced off for the export build).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms, e.g. 'tpu,cpu'",
    )
    args = parser.parse_args(argv)

    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.module import (
        MultimodalFusionModel,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.serving import (
        export_serving_bundle,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
        load_checkpoint,
    )

    variables, config, _meta = load_checkpoint(args.checkpoint)
    if config is None:
        raise SystemExit("checkpoint has no bundled config; cannot rebuild model")
    # force the portable XLA graph: a Pallas custom call cannot be lowered
    # into a multi-platform StableHLO artifact
    config.set_dotted("model.flash_attention", False)
    config.set_dotted("model.fused_mlp", False)
    config.set_dotted("model.pallas_rnn", False)
    model = MultimodalFusionModel.from_config(config)

    dataset = config.dataset
    batch = int(args.batch_size or dataset.get("batch_size", 32))
    chunk = int(dataset.get("chunk_size", 512))
    dims = {}
    enc_cfgs = config.model.get("encoders", {}) or {}
    for m in dataset.modalities:
        cfg = enc_cfgs.get(m, {}) or {}
        dims[m] = int(cfg.get("input_dim", 64) or 64)
    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms
        else None
    )
    out = export_serving_bundle(
        model, variables, args.output_dir,
        batch_size=batch, chunk_size=chunk, feature_dims=dims,
        platforms=platforms,
    )
    print(f"Serving bundle exported to: {out}")


if __name__ == "__main__":
    main()
