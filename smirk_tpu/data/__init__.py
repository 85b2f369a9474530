from smirk_tpu.data.base import prepare_sample  # noqa: F401
from smirk_tpu.data.pipeline import (  # noqa: F401
    ConcatDataset,
    DataLoader,
    MixedDatasetSampler,
    SimpleBatchSampler,
    collate,
    load_dataloaders,
)
