from .config import Config, ConfigDict, LazyObject, read_base
from .registry import Registry

__all__ = ["Config", "ConfigDict", "LazyObject", "Registry", "read_base"]
