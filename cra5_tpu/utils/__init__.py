from .config import Config, ConfigDict
from .registry import Registry

__all__ = ["Config", "ConfigDict", "Registry"]
