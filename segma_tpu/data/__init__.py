from segma_tpu.data.file_dataset import (
    DatasetNotLoadedError,
    DatasetSubset,
    SegmaFileDataset,
    URISubsetLeakageError,
)
from segma_tpu.data.intervals import IntervalIndex
from segma_tpu.data.loaders import (
    AudioSegmentationSampler,
    PrefetchingLoader,
    SegmentationDataLoader,
    generate_frames,
    windows_to_targets,
)

__all__ = [
    "AudioSegmentationSampler",
    "DatasetNotLoadedError",
    "DatasetSubset",
    "IntervalIndex",
    "PrefetchingLoader",
    "SegmaFileDataset",
    "SegmentationDataLoader",
    "URISubsetLeakageError",
    "generate_frames",
    "windows_to_targets",
]
