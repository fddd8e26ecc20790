"""Model zoo: quality-indexed builders for every architecture.

Capability parity with the reference zoo
(/root/reference/cra5/models/compressai/zoo/image.py:202-305): the same
architecture names, the same quality -> (N, M) tables, and a
``vaeformer_pretrained``-style entry for the ERA5 production model.
``pretrained=True`` loads a converted reference checkpoint from a local
path (this build is offline; conversion via
``cra5_tpu.tools.convert_checkpoint``).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .codec import make_codec
from .elic2022 import ELIC2022
from .google import (
    FactorizedPrior,
    FactorizedPriorReLU,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    SampledYInBmshj2018,
    ScaleHyperprior,
)
from .inv2021 import InvCompress
from .stf2022 import SymmetricalTransFormer2022
from .tcm2023 import TCM2023
from .vaeformer import VAEformer, vaeformer_268
from .waseda import Cheng2020Anchor, Cheng2020Attention

model_architectures: Dict[str, Any] = {
    "bmshj2018-factorized": FactorizedPrior,
    "bmshj2018-factorized-relu": FactorizedPriorReLU,
    "bmshj2018-hyperprior": ScaleHyperprior,
    "mbt2018-mean": MeanScaleHyperprior,
    "mbt2018": JointAutoregressiveHierarchicalPriors,
    "cheng2020-anchor": Cheng2020Anchor,
    "cheng2020-attn": Cheng2020Attention,
    "elic2022": ELIC2022,
    "stf": SymmetricalTransFormer2022,
    "tcm2023": TCM2023,
    "invcompress": InvCompress,
    "sampled-y-bmshj2018": SampledYInBmshj2018,
}

# quality -> constructor args (reference zoo/image.py:202-270)
_NM8_SPLIT6 = {q: (128, 192) if q <= 5 else (192, 320) for q in range(1, 9)}
_NM8_SPLIT5 = {q: (128, 192) if q <= 4 else (192, 320) for q in range(1, 9)}
_NM8_MBT = {q: (192, 192) if q <= 4 else (192, 320) for q in range(1, 9)}
_N6_CHENG = {q: (128,) if q <= 3 else (192,) for q in range(1, 7)}

cfgs: Dict[str, Dict[int, Tuple[int, ...]]] = {
    "bmshj2018-factorized": _NM8_SPLIT6,
    "bmshj2018-factorized-relu": _NM8_SPLIT6,
    "bmshj2018-hyperprior": _NM8_SPLIT6,
    "mbt2018-mean": _NM8_SPLIT5,
    "mbt2018": _NM8_MBT,
    "cheng2020-anchor": _N6_CHENG,
    "cheng2020-attn": _N6_CHENG,
    "elic2022": {q: (192, 320) for q in range(1, 7)},
    "stf": {q: (48,) for q in range(1, 7)},  # embed_dim
    "tcm2023": {q: (128, 320) for q in range(1, 7)},
    "invcompress": {q: (128,) if q <= 3 else (192,) for q in range(1, 7)},
    "sampled-y-bmshj2018": {q: (192, 320) for q in range(1, 7)},
    "vaeformer-pretrained": {268: (268,)},
}


def create_model(
    architecture: str,
    quality: int,
    in_channel: int = 3,
    **kwargs,
):
    """Instantiate an (uninitialized) zoo model for a quality level."""
    if architecture == "vaeformer-pretrained":
        return VAEformer(vaeformer_268())
    if architecture not in model_architectures:
        raise ValueError(f'Invalid architecture name "{architecture}"')
    if quality not in cfgs[architecture]:
        raise ValueError(f'Invalid quality value "{quality}"')
    args = cfgs[architecture][quality]
    cls = model_architectures[architecture]
    if architecture.startswith("cheng2020") or architecture == "invcompress":
        return cls(N=args[0], M=args[0], in_channel=in_channel, **kwargs)
    if architecture == "stf":
        return cls(embed_dim=args[0], in_channel=in_channel, **kwargs)
    return cls(N=args[0], M=args[1], in_channel=in_channel, **kwargs)


def init_model(model, input_shape: Tuple[int, ...], seed: int = 0):
    """Initialize variables for a zoo model with a dummy batch."""
    x = jnp.zeros(input_shape, jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)


def load_model(
    architecture: str,
    quality: int,
    *,
    in_channel: int = 3,
    input_shape: Optional[Tuple[int, ...]] = None,
    pretrained: bool = False,
    checkpoint_path: Optional[str] = None,
    coder: str = "v2",
    seed: int = 0,
):
    """Build (model, variables, codec). With ``pretrained=True`` the
    variables come from a converted checkpoint (msgpack produced by
    ``tools.convert_checkpoint``) at ``checkpoint_path`` or
    ``$CRA5_TPU_CKPT_DIR/<architecture>-<quality>.msgpack``."""
    model = create_model(architecture, quality, in_channel=in_channel)
    if pretrained:
        path = checkpoint_path or os.path.join(
            os.environ.get("CRA5_TPU_CKPT_DIR", "checkpoints"),
            f"{architecture}-{quality}.msgpack",
        )
        from ..train.checkpoints import load_variables

        variables = load_variables(path)
    else:
        if input_shape is None:
            if hasattr(model, "cfg"):  # VAEformer-family: fixed geometry
                input_shape = (1, model.cfg.in_chans, *model.cfg.img_size)
            else:
                down = getattr(model, "downsampling_factor", 64)
                input_shape = (1, in_channel, down, down)
        variables = init_model(model, input_shape, seed)
    codec = make_codec(model, variables, coder=coder)
    return model, variables, codec


# thin named builders mirroring the reference's functions (zoo/image.py:300+)
def _named(arch: str) -> Callable:
    def build(quality: int, **kwargs):
        return load_model(arch, quality, **kwargs)

    build.__name__ = arch.replace("-", "_")
    return build


bmshj2018_factorized = _named("bmshj2018-factorized")
bmshj2018_factorized_relu = _named("bmshj2018-factorized-relu")
bmshj2018_hyperprior = _named("bmshj2018-hyperprior")
mbt2018_mean = _named("mbt2018-mean")
mbt2018 = _named("mbt2018")
cheng2020_anchor = _named("cheng2020-anchor")
cheng2020_attn = _named("cheng2020-attn")


def ssf2020(
    quality: int,
    metric: str = "mse",
    *,
    pretrained: bool = False,
    checkpoint_path: Optional[str] = None,
    input_shape: Tuple[int, ...] = (3, 1, 3, 128, 128),
    seed: int = 0,
    **kwargs,
):
    """ScaleSpaceFlow video-zoo builder (reference zoo/video.py:96-107).

    Same surface as the reference: quality 1-9 and metric mse/ms-ssim
    select a checkpoint; the architecture itself is quality-independent.
    Offline build: ``pretrained=True`` loads a converted msgpack from
    ``checkpoint_path`` or ``$CRA5_TPU_CKPT_DIR/ssf2020-<metric>-<q>.msgpack``.
    Returns (model, variables, codec) like :func:`load_model`.
    """
    if metric not in ("mse", "ms-ssim"):
        raise ValueError(f'Invalid metric "{metric}"')
    if quality < 1 or quality > 9:
        raise ValueError(f'Invalid quality "{quality}", should be between (1, 9)')
    from .video import ScaleSpaceFlow, ScaleSpaceFlowCodec

    model = ScaleSpaceFlow(**kwargs)
    if pretrained:
        path = checkpoint_path or os.path.join(
            os.environ.get("CRA5_TPU_CKPT_DIR", "checkpoints"),
            f"ssf2020-{metric}-{quality}.msgpack",
        )
        from ..train.checkpoints import load_variables

        variables = load_variables(path)
    else:
        frames = jnp.zeros(input_shape, jnp.float32)
        variables = model.init(jax.random.PRNGKey(seed), frames)
    return model, variables, ScaleSpaceFlowCodec(model, variables)
