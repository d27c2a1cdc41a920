"""Serving path: pre-compiled inference functions for deployment.

The reference has no serving layer — its latency story is an eager torch loop
(``src/eval.py:166-228``). Here inference is packaged as a single jitted
function over device-resident weights, optionally routing the hybrid head
through the fused Pallas kernel (``ops/pallas_fusion.py``): encoders run as
XLA (they dominate FLOPs and fuse well), the 12-pair fusion head runs as one
kernel with weights resident in VMEM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .models.module import MultimodalFusionModel


def make_serving_fn(
    model: MultimodalFusionModel,
    variables: Dict,
    use_pallas_head: bool = True,
    interpret: bool = False,
):
    """Build ``fn(features, mask, lengths) -> logits``, jitted.

    ``use_pallas_head`` routes HybridFusion's head through the fused Pallas
    kernel (TPU only unless ``interpret``); other fusion types and training
    always use the XLA graph.
    """
    modalities = tuple(model.modalities)
    # the fused head kernel covers the cross-modal pair structure, which only
    # exists for >= 2 modalities; single-modality hybrid runs the XLA graph
    pallas_ok = (
        use_pallas_head and model.fusion_type == "hybrid" and len(modalities) >= 2
    )

    if not pallas_ok:

        @jax.jit
        def serve(features, mask=None, lengths=None):
            return model.apply(variables, features, mask, lengths, train=False)

        return serve

    from .ops.pallas_fusion import hybrid_fused_inference

    @jax.jit
    def serve(features, mask=None, lengths=None):
        batch = next(iter(features.values())).shape[0]
        if mask is None:
            mask = jnp.ones((batch, len(modalities)), jnp.float32)
        encoded = model.apply(
            variables, features, lengths,
            method=MultimodalFusionModel.encode,
        )
        # a modality absent from the batch dict contributes a zero embedding
        # (the mask governs its weight) — same contract as the XLA head,
        # which tolerates missing keys
        for name in modalities:
            if name not in encoded:
                encoded = dict(encoded)
                encoded[name] = jnp.zeros(
                    (batch, model.output_dim), jnp.float32
                )
        return hybrid_fused_inference(
            variables, encoded, mask, modalities, interpret=interpret
        )

    return serve
