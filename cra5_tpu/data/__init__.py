from .era5 import ERA5EvalDataset, ERA5NpyDataset, ERA5NcDataset, timestamp_range
from .image import (
    ImageFolder,
    PreGeneratedMemmapDataset,
    RawVideoSequence,
    VideoFolder,
    Vimeo90kDataset,
)
from .prefetch import PrefetchLoader, batch_iterator
from .transforms import rgb2ycbcr, ycbcr2rgb, yuv_444_to_420, yuv_420_to_444

__all__ = [
    "ERA5EvalDataset",
    "ERA5NpyDataset",
    "ERA5NcDataset",
    "timestamp_range",
    "ImageFolder",
    "PreGeneratedMemmapDataset",
    "VideoFolder",
    "RawVideoSequence",
    "Vimeo90kDataset",
    "PrefetchLoader",
    "batch_iterator",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "yuv_444_to_420",
    "yuv_420_to_444",
]
