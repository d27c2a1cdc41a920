#!/usr/bin/env python
"""On-chip validation of the HW-PRNG dropout-mask generator
(``training.dropout_rng: kernel``; ops/pallas_mlp.py::dropout_keep_mask).

The interpret-mode TPU PRNG is a zero stub, so CPU tests can only cover the
plumbing — this script proves the REAL-Mosaic stream on the chip
(CLAUDE.md: only the TPU tells the truth):

1. Stream properties: keep-rate ~= keep_prob (several probs), deterministic
   per seed, purpose-separated, seed-sensitive, rows decorrelated.
2. Consumption: fused_mlp_residual_ln fed a generated mask equals the plain
   XLA math fed the SAME mask (fwd + grads) — the mask is an ordinary u8
   input on the proven external-mask path, so this pins the end-to-end wire.
3. Encoder level: a transformer SequenceEncoder with dropout_rng="kernel"
   trains deterministically per rng and differs from the "xla" stream.

Exits non-zero on any failure.

    python scripts/validate_kernel_rng.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (  # noqa: E402
    SequenceEncoder,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (  # noqa: E402
    _RNG_P_ATT,
    _RNG_P_HIDDEN,
    _RNG_P_RES,
    dropout_keep_mask,
    fused_mlp_residual_ln,
    kernel_rng_seed,
)

FAILURES = []


def check(name: str, ok: bool, detail: str = ""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def close(a, b, tol=2e-2):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = max(1e-6, float(np.abs(b).max()))
    return float(np.abs(a - b).max()) / scale < tol


def main():
    if jax.default_backend() != "tpu":
        print("needs a real TPU backend", file=sys.stderr)
        return 2
    N, D, F = 1000, 256, 2048  # N deliberately not a block multiple (pad path)
    seed = kernel_rng_seed(jax.random.key(7))

    # --- 1. stream properties -------------------------------------------
    for keep in (0.5, 0.8, 0.9, 0.95):
        m = dropout_keep_mask(seed, 4096, F, keep)
        rate = float(jnp.mean(m.astype(jnp.float32)))
        check(
            f"keep-rate ~= {keep}", abs(rate - keep) < 0.01, f"rate={rate:.4f}"
        )
    KEEP = 0.9
    fmask = dropout_keep_mask(seed, N, F, KEEP, purpose=_RNG_P_HIDDEN)
    rmask = dropout_keep_mask(seed, N, D, KEEP, purpose=_RNG_P_RES)
    amask = dropout_keep_mask(seed, N, D, KEEP, purpose=_RNG_P_ATT)
    check(
        "deterministic",
        bool((fmask == dropout_keep_mask(seed, N, F, KEEP, purpose=_RNG_P_HIDDEN)).all()),
    )
    check("purposes separate (hidden/res)", not bool((fmask[:, :D] == rmask).all()))
    check("purposes separate (res/att)", not bool((amask == rmask).all()))
    other = dropout_keep_mask(
        kernel_rng_seed(jax.random.key(8)), N, F, KEEP, purpose=_RNG_P_HIDDEN
    )
    check("seed-sensitive", not bool((fmask == other).all()))
    check("rows differ", not bool((fmask[0] == fmask[1]).all()))

    # --- 2. consumption through the proven external-mask kernel ---------
    kx, kw1, kw2, kg = jax.random.split(jax.random.key(1), 4)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    w1 = jax.random.normal(kw1, (D, F), jnp.float32) * 0.05
    b1 = jnp.linspace(-0.1, 0.1, F, dtype=jnp.float32)
    w2 = jax.random.normal(kw2, (F, D), jnp.float32) * 0.05
    b2 = jnp.linspace(-0.1, 0.1, D, dtype=jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(kg, (D,), jnp.float32)
    beta = jnp.linspace(-0.2, 0.2, D, dtype=jnp.float32)
    fscale = fmask.astype(jnp.float32) / KEEP
    rscale = rmask.astype(jnp.float32) / KEEP

    def xla_ref(x, w1, b1, w2, b2, gamma, beta):
        h = jnp.maximum(x @ w1 + b1, 0.0) * fscale
        y = (h @ w2 + b2) * rscale
        r = x + y
        mu = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu, 0.0)
        return ((r - mu) * jax.lax.rsqrt(var + 1e-6)) * gamma + beta

    out_k = fused_mlp_residual_ln(
        x, w1, b1, w2, b2, gamma, beta,
        ffw_mask=fmask, res_mask=rmask, keep_prob=KEEP,
    )
    check("fused(genmask) fwd == XLA(genmask)", close(out_k, xla_ref(x, w1, b1, w2, b2, gamma, beta)))
    cot = jax.random.normal(jax.random.key(3), out_k.shape, jnp.float32)
    gk = jax.grad(
        lambda *a: jnp.sum(
            fused_mlp_residual_ln(
                *a, ffw_mask=fmask, res_mask=rmask, keep_prob=KEEP
            ) * cot
        ),
        argnums=tuple(range(7)),
    )(x, w1, b1, w2, b2, gamma, beta)
    gr = jax.grad(
        lambda *a: jnp.sum(xla_ref(*a) * cot), argnums=tuple(range(7))
    )(x, w1, b1, w2, b2, gamma, beta)
    for name, a, b in zip(
        ("dx", "dw1", "db1", "dw2", "db2", "dgamma", "dbeta"), gk, gr
    ):
        check(f"fused(genmask) grad {name}", close(a, b))

    # --- 3. encoder level ------------------------------------------------
    common = dict(
        hidden_dim=256, output_dim=128, num_layers=1,
        encoder_type="transformer", dropout=0.1,
        flash_attention=True, fused_mlp=True, fused_mlp_ln=True,
    )
    enc_k = SequenceEncoder(dropout_rng="kernel", **common)
    enc_x = SequenceEncoder(dropout_rng="xla", **common)
    data = jax.random.normal(jax.random.key(5), (8, 128, 17), jnp.float32)
    variables = enc_x.init(jax.random.key(0), data)
    drop = jax.random.PRNGKey(42)
    out_k1 = enc_k.apply(variables, data, train=True, rngs={"dropout": drop})
    out_k2 = enc_k.apply(variables, data, train=True, rngs={"dropout": drop})
    out_x = enc_x.apply(variables, data, train=True, rngs={"dropout": drop})
    check("encoder kernel-rng finite", bool(jnp.isfinite(out_k1).all()))
    check("encoder kernel-rng deterministic", bool((out_k1 == out_k2).all()))
    check("encoder kernel-rng stream != xla stream", not bool((out_k1 == out_x).all()))
    # same magnitude scale (dropout applied, not dead/doubled)
    check(
        "encoder kernel-rng magnitude sane",
        close(float(jnp.abs(out_k1).mean()), float(jnp.abs(out_x).mean()), tol=0.2),
    )

    print(f"\n{len(FAILURES)} failures" if FAILURES else "\nALL PASS")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
