#!/usr/bin/env python
"""Rank device ops from a ``scripts/profile_step.py`` trace.

Post-processes the xprof capture without TensorBoard: loads the raw trace
via ``xprof.convert.raw_to_tool_data`` and prints the top-N device ops by
self time from ``framework_op_stats`` (plus the ``hlo_stats`` view with
``--tool hlo_stats``). This is the workflow that found the 45% jitter-gather
tax (docs/notes.md:121).

    python scripts/profile_step.py --logdir /tmp/t --chunk 512
    python scripts/xprof_top_ops.py --logdir /tmp/t --top 25
"""

from __future__ import annotations

import argparse
import csv
import io
import json
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", type=str, default="/tmp/msfa_trace")
    parser.add_argument("--tool", type=str, default="framework_op_stats")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--json", action="store_true", help="dump raw rows as JSON")
    args = parser.parse_args()

    from xprof.convert import raw_to_tool_data

    run_dirs = sorted(Path(args.logdir).glob("plugins/profile/*"))
    if not run_dirs:
        raise SystemExit(f"no xprof runs under {args.logdir}/plugins/profile")
    run = run_dirs[-1]
    xspaces = sorted(run.glob("*.xplane.pb"))
    if not xspaces:
        raise SystemExit(f"no .xplane.pb under {run}")

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [str(p) for p in xspaces], args.tool, {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")

    # both tools emit CSV when asked via this API path; fall back to
    # printing raw output if the format is something else
    try:
        rows = list(csv.DictReader(io.StringIO(data)))
    except Exception:
        print(data[:5000])
        return
    if not rows:
        print(data[:5000])
        return

    # find the self-time column (name differs per tool version)
    time_keys = [
        k for k in rows[0]
        if k and "self" in k.lower() and ("time" in k.lower() or "dur" in k.lower())
    ]
    time_key = time_keys[0] if time_keys else None
    if time_key:
        def val(r):
            try:
                return float(r.get(time_key) or 0.0)
            except ValueError:
                return 0.0

        rows.sort(key=val, reverse=True)
        total = sum(val(r) for r in rows) or 1.0
    else:
        total = 1.0

    if args.json:
        print(json.dumps(rows[: args.top], indent=1))
        return

    name_key = next(
        (k for k in rows[0] if k and "name" in k.lower()), list(rows[0])[0]
    )
    cat_key = next((k for k in rows[0] if k and "categor" in k.lower()), None)
    print(f"tool={args.tool}  run={run.name}  time_key={time_key}")
    shown = 0.0
    for r in rows[: args.top]:
        t = float(r.get(time_key) or 0.0) if time_key else 0.0
        shown += t
        cat = f" [{r.get(cat_key, '')}]" if cat_key else ""
        print(f"{t:12.1f}  {t / total * 100:5.1f}%  {r.get(name_key, '?')[:110]}{cat}")
    if time_key:
        print(f"-- top {args.top} = {shown / total * 100:.1f}% of device self time --")


if __name__ == "__main__":
    main()
