#!/usr/bin/env python
"""Head-only A/B of the fused hybrid serving head (VERDICT r3 ask #4).

Two measurement pitfalls shape this script:

- The whole-model serving A/B cannot resolve the head: at flagship shapes
  the 4 transformer encoders dominate (~8 ms device time/batch) and the
  head is sub-ms.
- Per-call wall timing through the tunneled 1-chip TPU measures ~24 ms of
  RPC dispatch, flat across batch sizes — it cannot resolve sub-ms kernels
  (first attempt measured 24 ms "head latency" for BOTH paths at B=1..256).

So, like ``bench.py``, each path runs ``--iters`` head evaluations inside
ONE jitted ``lax.scan`` — the batch rows are re-gathered from a device pool
with iteration-shifted indices (XLA cannot hoist the gather or the head out
of the loop) and every output is consumed into the carry. Dispatch
amortizes to noise; the per-iteration time is device time.

Numerics are also compared ON DEVICE inside a single program (both heads in
one jit), which sidesteps any result-level caching in the remote-execute
path.

    python scripts/serving_head_ab.py [--no-append] [--iters 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-append", action="store_true")
    parser.add_argument("--iters", type=int, default=512)
    parser.add_argument("--pool", type=int, default=1024)
    parser.add_argument(
        "--bench-out", default=str(REPO_ROOT / "report" / "bench.jsonl")
    )
    args = parser.parse_args()

    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.fusion import (
        HybridFusion,
    )
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_fusion import (
        hybrid_fused_inference,
    )

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)
    on_tpu = jax.default_backend() == "tpu"

    modalities = ("imu_hand", "imu_chest", "imu_ankle", "heart_rate")
    hidden, num_classes = 128, 25
    fusion = HybridFusion(
        modality_names=list(modalities),
        hidden_dim=hidden,
        num_classes=num_classes,
        dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    enc1 = {
        m: jnp.asarray(gen.standard_normal((1, hidden)), jnp.float32)
        for m in modalities
    }
    variables = fusion.init({"params": rng}, enc1)

    pool = {
        m: jnp.asarray(gen.standard_normal((args.pool, hidden)), jnp.float32)
        for m in modalities
    }

    def head_xla(enc, mk):
        out = fusion.apply(variables, enc, mk, train=False)
        return out[0] if isinstance(out, tuple) else out

    def head_pallas(enc, mk):
        return hybrid_fused_inference(
            variables, enc, mk, modalities, interpret=not on_tpu
        )

    rows = []
    ok = True
    for batch in (16, 64, 256):
        mask = jnp.ones((batch, len(modalities)), jnp.float32)
        base = jnp.arange(batch, dtype=jnp.int32)

        def make_loop(head_fn):
            @jax.jit
            def loop(pool):
                def body(acc, i):
                    idx = (base + i * batch) % args.pool
                    enc = {m: v[idx] for m, v in pool.items()}
                    out = head_fn(enc, mask)
                    return acc + jnp.sum(out), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32),
                    jnp.arange(args.iters, dtype=jnp.int32),
                )
                return acc

            return loop

        loop_x = make_loop(head_xla)
        loop_p = make_loop(head_pallas)

        # on-device numerics: both graphs in ONE program, diff on chip
        @jax.jit
        def diff(pool):
            enc = {m: v[:batch] for m, v in pool.items()}
            ox = head_xla(enc, mask)
            op = head_pallas(enc, mask)
            return (
                jnp.max(jnp.abs(ox - op)) / (jnp.max(jnp.abs(ox)) + 1e-9),
                ox[0, :3],
                op[0, :3],
            )

        rel, x3, p3 = jax.block_until_ready(diff(pool))
        rel = float(rel)
        print(
            f"B={batch}: on-device rel err {rel:.2e}; "
            f"xla[0,:3]={np.asarray(x3)}, pallas[0,:3]={np.asarray(p3)}",
            flush=True,
        )
        # f32-input matmuls execute as single-pass bf16 on the MXU by
        # default, so ~1e-3-relative disagreement between op orders is
        # expected on TPU; strict f32 equivalence is pinned in interpret
        # mode (tests/test_pallas.py)
        tol = 2e-2 if on_tpu else 1e-3
        if rel > tol:
            print(f"HEAD A/B FAIL: numerics diverge at B={batch}")
            ok = False
            continue

        def timeit(loop):
            jax.block_until_ready(loop(pool))  # compile + warmup
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(loop(pool))
                times.append((time.perf_counter() - t0) * 1e3)
            return float(np.median(times)) / args.iters

        ms_x = timeit(loop_x)
        ms_p = timeit(loop_p)
        speedup = ms_x / ms_p
        print(
            f"B={batch}: XLA head {ms_x * 1e3:.2f} us/iter, fused head "
            f"{ms_p * 1e3:.2f} us/iter ({speedup:.2f}x), "
            f"{batch / ms_p * 1e3:,.0f} windows/s through the fused head",
            flush=True,
        )
        rows.append(
            {
                "metric": "hybrid head-only latency A/B (scan-amortized)",
                "value": round(ms_p, 5),
                "unit": "ms/batch",
                "model": "hybrid-head-only",
                "batch": batch,
                "xla_ms": round(ms_x, 5),
                "pallas_fused_ms": round(ms_p, 5),
                "speedup_vs_xla": round(speedup, 3),
                "rel_err_on_device": rel,
                "iters": args.iters,
                "note": (
                    "head-only A/B (VERDICT r3 #4): ops/pallas_fusion.py "
                    "fused 12-pair hybrid head vs XLA HybridFusion graph on "
                    "pooled embeddings, lax.scan-amortized inside one jit "
                    "(per-call tunnel dispatch ~24 ms would otherwise "
                    "swamp a sub-ms kernel)"
                ),
            }
        )
    if on_tpu and not args.no_append and rows:
        with Path(args.bench_out).open("a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        print(f"appended {len(rows)} rows to {args.bench_out}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
