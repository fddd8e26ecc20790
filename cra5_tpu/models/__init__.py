from .vaeformer import (
    VAEformer,
    VAEformerConfig,
    vaeformer_268,
    vaeformer_159,
    vaeformer_tiny,
    VAEformerCodec,
)
from .google import (
    FactorizedPrior,
    FactorizedPriorReLU,
    ScaleHyperprior,
    MeanScaleHyperprior,
    JointAutoregressiveHierarchicalPriors,
    SampledYInBmshj2018,
)
from .waseda import Cheng2020Anchor, Cheng2020Attention
from .codec import ImageCodec, AutoregressiveCodec, make_codec
from .zoo import (
    cfgs,
    create_model,
    init_model,
    load_model,
    model_architectures,
    ssf2020,
)

__all__ = [
    "VAEformer",
    "VAEformerConfig",
    "vaeformer_268",
    "vaeformer_159",
    "vaeformer_tiny",
    "VAEformerCodec",
    "FactorizedPrior",
    "FactorizedPriorReLU",
    "ScaleHyperprior",
    "MeanScaleHyperprior",
    "JointAutoregressiveHierarchicalPriors",
    "SampledYInBmshj2018",
    "Cheng2020Anchor",
    "Cheng2020Attention",
    "ImageCodec",
    "AutoregressiveCodec",
    "make_codec",
    "create_model",
    "init_model",
    "load_model",
    "model_architectures",
    "cfgs",
]
