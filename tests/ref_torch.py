"""Load the reference (torch) CRA5 implementation for parity testing.

The reference depends on the external ``compressai`` wheel for its
compiled modules and on ``pytorch_msssim``/``timm``/
``dict_recursive_update``, none of which exist in this image
(SURVEY.md §0). This loader makes the reference importable *unmodified*:

- ``compressai._CXX.pmf_to_quantized_cdf`` -> our integer-exact builder
  (cra5_tpu.entropy.cdf, golden-locked against the reference algorithm);
- ``compressai.ans`` -> our pure-python rANS oracle (cra5_tpu.coder.rans_py,
  byte-identical to reference-built streams, tests/test_ref_cross.py);
- every other ``compressai.X`` import -> the reference's own vendored
  ``cra5.models.compressai.X`` sources (the reference states these are
  identical in role to the wheel, setup.py:163/177);
- tiny stubs for pytorch_msssim / timm.models.layers / dict_recursive_update
  (the reference only uses drop_path/to_2tuple/trunc_normal_/recursive_update).

Used by the RD-parity harness (tools/rd_parity.py) and conversion tests.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


class _WheelAlias(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Redirect ``compressai.X`` imports to ``cra5.models.compressai.X``."""

    SKIP = ("compressai._CXX", "compressai.ans")

    def find_spec(self, fullname, path=None, target=None):
        if (
            fullname.startswith("compressai.")
            and fullname not in self.SKIP
            and fullname not in sys.modules
        ):
            return importlib.util.spec_from_loader(fullname, self)
        return None

    def create_module(self, spec):
        return types.ModuleType(spec.name)

    def exec_module(self, module):
        real = importlib.import_module(
            "cra5.models." + module.__name__
        )
        module.__dict__.update(
            {k: v for k, v in real.__dict__.items() if k not in module.__dict__}
        )
        module.__path__ = getattr(real, "__path__", [])


def _install_stubs():
    import torch

    from cra5_tpu.coder import rans_py
    from cra5_tpu.entropy import cdf as cdf_mod

    # top-level compressai: the entropy-coder registry only
    compressai = types.ModuleType("compressai")
    compressai.__path__ = []  # mark as package so submodule imports work
    compressai.available_entropy_coders = lambda: ["ans"]
    compressai.get_entropy_coder = lambda: "ans"
    compressai.set_entropy_coder = lambda c: None

    cxx = types.ModuleType("compressai._CXX")
    cxx.pmf_to_quantized_cdf = lambda pmf, prec: [
        int(v) for v in cdf_mod.pmf_to_quantized_cdf(np.asarray(pmf, np.float64), prec)
    ]

    ans = types.ModuleType("compressai.ans")
    ans.BufferedRansEncoder = rans_py.BufferedRansEncoder
    ans.RansEncoder = rans_py.RansEncoder
    ans.RansDecoder = rans_py.RansDecoder

    msssim = types.ModuleType("pytorch_msssim")

    def _no_msssim(*a, **k):
        raise RuntimeError("pytorch_msssim is stubbed; use metric='mse'")

    msssim.ms_ssim = _no_msssim
    msssim.MS_SSIM = type("MS_SSIM", (torch.nn.Module,), {"forward": _no_msssim})

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm_layers.drop_path = drop_path
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm.models = timm_models
    timm_models.layers = timm_layers

    # torchvision: the vendored registry only harvests transforms.__dict__
    # for capitalized callables (registry/torchvision.py:32-36)
    torchvision = types.ModuleType("torchvision")
    tv_transforms = types.ModuleType("torchvision.transforms")
    torchvision.transforms = tv_transforms

    dru = types.ModuleType("dict_recursive_update")

    def recursive_update(d, u):
        for k, v in (u or {}).items():
            if isinstance(v, dict) and isinstance(d.get(k), dict):
                recursive_update(d[k], v)
            else:
                d[k] = v
        return d

    dru.recursive_update = recursive_update

    for name, mod in [
        ("compressai", compressai),
        ("compressai._CXX", cxx),
        ("compressai.ans", ans),
        ("pytorch_msssim", msssim),
        ("timm", timm),
        ("timm.models", timm_models),
        ("timm.models.layers", timm_layers),
        ("torchvision", torchvision),
        ("torchvision.transforms", tv_transforms),
        ("dict_recursive_update", dru),
    ]:
        sys.modules.setdefault(name, mod)

    if not any(isinstance(f, _WheelAlias) for f in sys.meta_path):
        sys.meta_path.insert(0, _WheelAlias())


_loaded = None


def load_reference():
    """Import and return the reference ``cra5`` package (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    import os

    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "cra5")):
        raise FileNotFoundError(f"reference not present at {REFERENCE_ROOT}")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # compressai first: its zoo import of cra5.models.vaeformer closes the
    # reference's vaeformer<->compressai import cycle in the resolvable order
    importlib.import_module("cra5.models.compressai")
    _loaded = importlib.import_module("cra5")
    return _loaded


def build_tiny_ref_vaeformer(seed: int = 0):
    """The reference VAEformer at the tiny parity geometry: 8ch 40x40
    input, patch == stride (10,10) -> 4x4 tokens (the reference decoder's
    Linear un-patchify path, exact at this geometry; its ConvTranspose
    branch is hardcoded to img_size == (721,1440), vit_nlc.py:628-633);
    hyper 2x2 patches on the 4x4 y grid."""
    import torch

    load_reference()
    from cra5.models.vaeformer.vaeformer import VAEformer as RefVAEformer

    torch.manual_seed(seed)
    ddconfig = dict(
        arch="vit_base",
        pretrained_model="",
        patch_size=(10, 10),
        patch_stride=(10, 10),
        in_chans=8,
        out_chans=8,
        kwargs=dict(
            z_dim=None,
            embed_dim=16,
            depth=4,
            num_heads=2,
            learnable_pos=True,
            window=True,
            window_size=[(2, 2), (1, 4), (4, 1)],
            interval=2,
            drop_path_rate=0.0,
            round_padding=True,
            pad_attn_mask=True,
            test_pos_mode=False,
            lms_checkpoint_train=False,
            img_size=(40, 40),
        ),
    )
    priorconfig = dict(
        pretrained_model="",
        patch_size=(2, 2),
        in_chans=8,
        out_chans=8,
        kwargs=dict(
            z_dim=8,
            embed_dim=12,
            depth=2,
            num_heads=2,
            interval=1,
            learnable_pos=True,
            window=False,
            drop_path_rate=0.0,
            round_padding=True,
            pad_attn_mask=True,
            test_pos_mode=False,
            lms_checkpoint_train=False,
            img_size=(4, 4),
        ),
    )
    model = RefVAEformer(
        model_version="tiny",
        embed_dim=8,
        z_channels=8,
        y_channels=16,
        sample_posterior=False,
        frozen_encoder=False,
        lower_dim=True,
        ddconfig=ddconfig,
        priorconfig=priorconfig,
    )
    return model
