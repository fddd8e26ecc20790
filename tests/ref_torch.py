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


def _make_buffered_encoder(rans_py):
    """Reference-interface BufferedRansEncoder backed by the native C
    coder (byte-identical to rans_py, tests/test_rans.py) — the pure
    Python oracle is minutes-per-megasymbol, which makes full-268v-
    geometry parity (2.65M y symbols) untestable. Falls back to the
    oracle when the shared library is unavailable."""
    from cra5_tpu.coder import native

    if not native.native_available():
        return rans_py.BufferedRansEncoder

    class BufferedRansEncoder:
        def __init__(self):
            self._syms, self._idxs = [], []
            self._tables = None

        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
            self._syms.append(np.asarray(symbols, np.int32))
            self._idxs.append(np.asarray(indexes, np.int32))
            self._tables = (cdfs, cdf_sizes, offsets)

        def flush(self):
            cdfs, sizes, offs = self._tables
            data = native.encode_with_indexes(
                np.concatenate(self._syms), np.concatenate(self._idxs),
                cdfs, sizes, offs,
            )
            self._syms, self._idxs = [], []
            return data

    return BufferedRansEncoder


def _make_encoder(rans_py):
    from cra5_tpu.coder import native

    if not native.native_available():
        return rans_py.RansEncoder

    class RansEncoder:
        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
            return native.encode_with_indexes(symbols, indexes, cdfs, cdf_sizes, offsets)

    return RansEncoder


def _make_decoder(rans_py):
    from cra5_tpu.coder import native

    if not native.native_available():
        return rans_py.RansDecoder

    class RansDecoder:
        def __init__(self):
            self._stream = None

        def set_stream(self, encoded):
            self._stream = native.StreamingDecoder(bytes(encoded))

        def decode_stream(self, indexes, cdfs, cdf_sizes, offsets):
            return self._stream.decode(indexes, cdfs, cdf_sizes, offsets).tolist()

        def decode_with_indexes(self, encoded, indexes, cdfs, cdf_sizes, offsets):
            return native.decode_with_indexes(
                bytes(encoded), indexes, cdfs, cdf_sizes, offsets
            ).tolist()

    return RansDecoder


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
    ans.BufferedRansEncoder = _make_buffered_encoder(rans_py)
    ans.RansEncoder = _make_encoder(rans_py)
    ans.RansDecoder = _make_decoder(rans_py)

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


def build_268_ref_vaeformer(seed: int = 0):
    """The reference VAEformer at the FULL production geometry — the
    hardcoded model_version==268 branch (vaeformer.py:93-142): ViT-L
    towers on 721x1440/268ch, (11,10)/(10,10) patches, window cycle
    (24,24)/(12,48)/(48,12) with the pad-exercising 72%48!=0 grid,
    depth-24 dual final block, learnable_simple_interpolate pos mode,
    exact-721 ConvTranspose decode. Random init (the published .pth is
    unreachable offline) — byte-level parity of the coded streams is
    checkpoint-independent evidence that the converted graph computes
    the same function."""
    import torch

    load_reference()
    from cra5.models.vaeformer.vaeformer import VAEformer as RefVAEformer

    torch.manual_seed(seed)
    return RefVAEformer(model_version=268)
