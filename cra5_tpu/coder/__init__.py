from .rans_py import RansEncoder, RansDecoder, BufferedRansEncoder
from .native import (
    native_available,
    encode_with_indexes,
    decode_with_indexes,
)
from .rans_tpu import LaneCoder, lane_encode, lane_decode

__all__ = [
    "RansEncoder",
    "RansDecoder",
    "BufferedRansEncoder",
    "native_available",
    "encode_with_indexes",
    "decode_with_indexes",
    "LaneCoder",
    "lane_encode",
    "lane_decode",
]
