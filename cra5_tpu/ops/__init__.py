from .attention import flash_attention
from .ring_attention import ring_attention_shard, ring_attention_sharded
from .rdoq import rdoq

__all__ = ["flash_attention", "ring_attention_shard", "ring_attention_sharded", "rdoq"]
