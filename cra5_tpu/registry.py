"""Central registry population (reference registry/torch.py:44-121 keeps
MODELS/DATASETS/CRITERIONS/OPTIMIZERS registries; here one import wires
every built-in into them so config-driven builds work)."""

from __future__ import annotations

from .utils.registry import CRITERIONS, DATASETS, MODELS, OPTIMIZERS, SCHEDULERS


def _register_all() -> None:
    from . import models as m
    from .data import (
        ERA5NcDataset,
        ERA5NpyDataset,
        ImageFolder,
        PreGeneratedMemmapDataset,
        VideoFolder,
        Vimeo90kDataset,
    )
    from .models.google import SampledYInBmshj2018
    from .models.elic2022 import ELIC2022
    from .models.inv2021 import InvCompress
    from .models.stf2022 import SymmetricalTransFormer2022
    from .models.tcm2023 import TCM2023
    from .models.video import ScaleSpaceFlow
    from .models.vit_vae import VITAutoencoderKL
    from .models.baseline import VariationCNNPrior
    from .train.loss import RateDistortionLoss
    from .train.optim import make_net_aux_optimizers

    entries = {
        "VAEformer": m.VAEformer,
        "FactorizedPrior": m.FactorizedPrior,
        "FactorizedPriorReLU": m.FactorizedPriorReLU,
        "ScaleHyperprior": m.ScaleHyperprior,
        "MeanScaleHyperprior": m.MeanScaleHyperprior,
        "JointAutoregressiveHierarchicalPriors": m.JointAutoregressiveHierarchicalPriors,
        "SampledYInBmshj2018": SampledYInBmshj2018,
        "Cheng2020Anchor": m.Cheng2020Anchor,
        "Cheng2020Attention": m.Cheng2020Attention,
        "ELIC2022": ELIC2022,
        "SymmetricalTransFormer2022": SymmetricalTransFormer2022,
        "TCM2023": TCM2023,
        "InvCompress": InvCompress,
        "ScaleSpaceFlow": ScaleSpaceFlow,
        "VITAutoencoderKL": VITAutoencoderKL,
        "VariationCNNPrior": VariationCNNPrior,
    }
    for name, cls in entries.items():
        if name not in MODELS:
            MODELS.register(name)(cls)

    for name, cls in {
        "ERA5NpyDataset": ERA5NpyDataset,
        "ERA5NcDataset": ERA5NcDataset,
        "ImageFolder": ImageFolder,
        "PreGeneratedMemmapDataset": PreGeneratedMemmapDataset,
        "VideoFolder": VideoFolder,
        "Vimeo90kDataset": Vimeo90kDataset,
    }.items():
        if name not in DATASETS:
            DATASETS.register(name)(cls)

    if "RateDistortionLoss" not in CRITERIONS:
        CRITERIONS.register("RateDistortionLoss")(RateDistortionLoss)
    if "net_aux" not in OPTIMIZERS:
        OPTIMIZERS.register("net_aux")(make_net_aux_optimizers)


_register_all()

__all__ = ["MODELS", "DATASETS", "CRITERIONS", "OPTIMIZERS", "SCHEDULERS"]
