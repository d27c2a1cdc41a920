"""Model layer: encoders, attention, fusion heads, flagship module."""

from .encoders import (  # noqa: F401
    SequenceEncoder,
    FrameEncoder,
    SimpleMLPEncoder,
    build_encoder,
)
from .attention import (  # noqa: F401
    CrossModalAttention,
    TemporalAttention,
    PairwiseModalityAttention,
)
from .fusion import (  # noqa: F401
    EarlyFusion,
    LateFusion,
    HybridFusion,
    UncertaintyFusion,
    build_fusion_model,
)
from .module import MultimodalFusionModel  # noqa: F401
