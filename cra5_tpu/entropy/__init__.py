from .ops import lower_bound, quantize_ste, quantize, dequantize, compute_padding
from .cdf import pmf_to_quantized_cdf, build_cdf_table, CdfTable
from .entropy_bottleneck import EntropyBottleneck, eb_update
from .gaussian_conditional import (
    GaussianConditional,
    gc_update,
    get_scale_table,
    build_indexes,
    SCALES_MIN,
    SCALES_MAX,
    SCALES_LEVELS,
)

__all__ = [
    "lower_bound",
    "quantize_ste",
    "quantize",
    "dequantize",
    "compute_padding",
    "pmf_to_quantized_cdf",
    "build_cdf_table",
    "CdfTable",
    "EntropyBottleneck",
    "eb_update",
    "GaussianConditional",
    "gc_update",
    "get_scale_table",
    "build_indexes",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
]
