"""Serving path: pre-compiled inference functions for deployment.

The reference has no serving layer — its latency story is an eager torch loop
(``src/eval.py:166-228``). Here inference is packaged as a single jitted
function over device-resident weights, optionally routing the hybrid head
through the fused Pallas kernel (``ops/pallas_fusion.py``): encoders run as
XLA (they dominate FLOPs and fuse well), the 12-pair fusion head runs as one
kernel with weights resident in VMEM.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------------------
# AOT deployment bundles (jax.export / StableHLO)
# ---------------------------------------------------------------------------
#
# The reference's deployment story ends at a torch checkpoint; serving it
# requires the full Python model stack at inference time. Here the serving
# function is additionally exportable as a self-describing AOT bundle:
# portable serialized StableHLO (jax.export) + the params as a flat .npz +
# a JSON manifest of the input signature. A consumer needs jax (any backend
# the bundle was lowered for) but NONE of this framework's model code.

_BUNDLE_GRAPH = "serving.stablehlo"
_BUNDLE_PARAMS = "params.npz"
_BUNDLE_META = "bundle.json"
_PATH_SEP = "//"


def _flatten_params(variables) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = _PATH_SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def export_serving_bundle(
    model: MultimodalFusionModel,
    variables: Dict,
    out_dir: str | Path,
    batch_size: int,
    chunk_size: int,
    feature_dims: Dict[str, int],
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Export an AOT serving bundle for fixed ``[B, T, D_m]`` shapes.

    ``platforms`` lowers for specific backends (e.g. ``("tpu", "cpu")``);
    default = the current default backend only. The exported graph is the
    pure-XLA serving path (portable across the listed platforms — Pallas
    kernels are deliberately not baked into a multi-platform artifact).
    Returns the bundle directory.
    """
    from jax import export as jax_export

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    modalities = tuple(model.modalities)

    def serve(params, features, mask, lengths):
        return model.apply(params, features, mask, lengths, train=False)

    feature_specs = {
        m: jax.ShapeDtypeStruct(
            (batch_size, chunk_size, int(feature_dims[m])), jnp.float32
        )
        for m in modalities
    }
    mask_spec = jax.ShapeDtypeStruct((batch_size, len(modalities)), jnp.float32)
    len_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        variables,
    )
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(serve), **kwargs)(
        var_specs, feature_specs, mask_spec, len_spec
    )
    (out_dir / _BUNDLE_GRAPH).write_bytes(exported.serialize())
    np.savez(out_dir / _BUNDLE_PARAMS, **_flatten_params(variables))
    meta = {
        "modalities": list(modalities),
        "batch_size": int(batch_size),
        "chunk_size": int(chunk_size),
        "feature_dims": {m: int(feature_dims[m]) for m in modalities},
        "num_classes": int(model.num_classes),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    (out_dir / _BUNDLE_META).write_text(json.dumps(meta, indent=2))
    return out_dir


def load_serving_bundle(bundle_dir: str | Path):
    """Load an AOT bundle -> ``(fn(features, mask=None, lengths=None), meta)``.

    Rebuilds the param pytree from the flat ``.npz`` (the graph was exported
    against the matching tree structure) and closes over it; no model code
    runs — just the deserialized StableHLO executable.
    """
    from jax import export as jax_export

    bundle_dir = Path(bundle_dir)
    exported = jax_export.deserialize((bundle_dir / _BUNDLE_GRAPH).read_bytes())
    meta = json.loads((bundle_dir / _BUNDLE_META).read_text())

    with np.load(bundle_dir / _BUNDLE_PARAMS) as npz:
        nested: Dict = {}
        for key in npz.files:
            node = nested
            parts = key.split(_PATH_SEP)
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(npz[key])
    modalities = meta["modalities"]

    def fn(features, mask=None, lengths=None):
        batch = np.shape(next(iter(features.values())))[0]
        if mask is None:
            mask = jnp.ones((batch, len(modalities)), jnp.float32)
        if lengths is None:
            lengths = jnp.full((batch,), meta["chunk_size"], jnp.int32)
        features = {m: jnp.asarray(features[m], jnp.float32) for m in modalities}
        return exported.call(nested, features, mask, lengths)

    return fn, meta
