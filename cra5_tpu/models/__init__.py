from .vaeformer import (
    VAEformer,
    VAEformerConfig,
    vaeformer_268,
    vaeformer_159,
    vaeformer_tiny,
    VAEformerCodec,
)

__all__ = [
    "VAEformer",
    "VAEformerConfig",
    "vaeformer_268",
    "vaeformer_159",
    "vaeformer_tiny",
    "VAEformerCodec",
]
