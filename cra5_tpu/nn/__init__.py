from .pos_embed import get_2d_sincos_pos_embed
from .blocks import Mlp, Attention, WindowAttention, Block, DropPath
from .patch_embed import PatchEmbed, PatchUnembed
from .vit import ViTEncoder, ViTDecoder, HyperEncoder, HyperDecoder
from .gdn import GDN, GDN1
from .conv import conv2d, deconv2d, MaskedConv2d, CheckerboardMaskedConv2d, ResidualBlock, AttentionBlock, subpel_conv3x3

__all__ = [
    "get_2d_sincos_pos_embed",
    "Mlp",
    "Attention",
    "WindowAttention",
    "Block",
    "DropPath",
    "PatchEmbed",
    "PatchUnembed",
    "ViTEncoder",
    "ViTDecoder",
    "HyperEncoder",
    "HyperDecoder",
    "GDN",
    "GDN1",
    "conv2d",
    "deconv2d",
    "MaskedConv2d",
    "CheckerboardMaskedConv2d",
    "ResidualBlock",
    "AttentionBlock",
    "subpel_conv3x3",
]
