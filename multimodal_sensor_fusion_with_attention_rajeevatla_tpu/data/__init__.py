"""Data layer: offline ETL, windowed datasets, device-resident batching."""

from .preprocess import (  # noqa: F401
    PAMAP2_COLUMNS,
    merge_raw_files,
    import_reference_shards,
)
from .dataset import (  # noqa: F401
    MultimodalDataset,
    SyntheticMultimodalDataset,
    WindowedSplit,
    collate_multimodal,
    create_dataloaders,
    create_datasets,
    resolve_modality_columns,
    simulate_missing_modalities,
)
from .device import (  # noqa: F401
    DeviceSplit,
    StreamingDeviceLoader,
    device_put_split,
)
