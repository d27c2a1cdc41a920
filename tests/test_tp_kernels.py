"""Pallas kernels under tensor parallelism (parallel/tp_kernels.py).

Runs on the virtual 8-device CPU mesh (conftest sets
``--xla_force_host_platform_device_count=8``); the kernel executes in
interpret mode inside each model shard. Equivalence target: the
single-device XLA feed-forward path (``ops.pallas_mlp.transformer_ffw``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.ops.pallas_mlp import (
    transformer_ffw,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.mesh import (
    make_mesh,
)
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.parallel.tp_kernels import (
    tp_fused_mlp,
)


def _mesh_2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, model_parallel=2)


def _setup(n=32, d_in=16, d_ff=64, d_out=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    p1 = {
        "kernel": jnp.asarray(rng.standard_normal((d_in, d_ff)) * 0.1, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(d_ff) * 0.1, jnp.float32),
    }
    p2 = {
        "kernel": jnp.asarray(rng.standard_normal((d_ff, d_out)) * 0.1, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(d_out) * 0.1, jnp.float32),
    }
    return x, p1, p2


def _reference(x, p1, p2, mask=None, keep=1.0):
    return transformer_ffw(
        x[None], p1, p2,
        keep_mask=None if mask is None else mask[None],
        keep_prob=keep, use_fused=False,
    )[0]


class TestTPFusedMLP:
    def test_matches_single_device(self):
        mesh = _mesh_2d()
        x, p1, p2 = _setup()
        got = tp_fused_mlp(
            mesh, x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
            interpret=True,
        )
        ref = _reference(x, p1, p2)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_matches_with_global_dropout_mask(self):
        """One globally drawn mask, sliced by shard_map: realised dropout
        pattern identical to the single-device path."""
        mesh = _mesh_2d()
        x, p1, p2 = _setup(seed=1)
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (32, 64))
        got = tp_fused_mlp(
            mesh, x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
            keep_mask=mask.astype(jnp.uint8), keep_prob=0.8, interpret=True,
        )
        ref = _reference(x, p1, p2, mask=mask, keep=0.8)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_gradients_match_and_stay_sharded(self):
        mesh = _mesh_2d()
        x, p1, p2 = _setup(seed=2)

        def loss_tp(params, x):
            w1, b1, w2, b2 = params
            out = tp_fused_mlp(mesh, x, w1, b1, w2, b2, interpret=True)
            return jnp.sum(out**2)

        def loss_ref(params, x):
            w1, b1, w2, b2 = params
            out = _reference(x, {"kernel": w1, "bias": b1},
                             {"kernel": w2, "bias": b2})
            return jnp.sum(out**2)

        params = (p1["kernel"], p1["bias"], p2["kernel"], p2["bias"])
        got = jax.grad(loss_tp)(params, x)
        ref = jax.grad(loss_ref)(params, x)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, atol=1e-4, rtol=1e-4)

    def test_jit_with_sharded_params(self):
        """Under jit with explicitly TP-sharded weight placements, the
        composition runs without resharding surprises and still matches."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = _mesh_2d()
        x, p1, p2 = _setup(seed=3)
        w1 = jax.device_put(p1["kernel"], NamedSharding(mesh, P(None, "model")))
        b1 = jax.device_put(p1["bias"], NamedSharding(mesh, P("model")))
        w2 = jax.device_put(p2["kernel"], NamedSharding(mesh, P("model", None)))
        b2 = jax.device_put(p2["bias"], NamedSharding(mesh, P()))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

        fn = jax.jit(
            lambda x, w1, b1, w2, b2: tp_fused_mlp(
                mesh, x, w1, b1, w2, b2, interpret=True
            )
        )
        got = fn(xs, w1, b1, w2, b2)
        ref = _reference(x, p1, p2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)
