from .bitstream import write_uints, write_bytes, read_uints, read_bytes, filesize
from .cra5_api import cra5_api

__all__ = [
    "write_uints",
    "write_bytes",
    "read_uints",
    "read_bytes",
    "filesize",
    "cra5_api",
]
