"""User-facing facade — method-for-method parity with the reference
``cra5_api`` (/root/reference/cra5/api/cra5_api.py:22-342):

  encode_to_latent / latent_to_bin / encode_era5_as_bin / bin_to_latent /
  latent_to_reconstruction / decode_from_bin / read_data_from_nc /
  get_mean_std / normalization / de_normalization / show_image /
  show_latent / download_era5_data

Differences by design (TPU-first):
  - the model is a jitted flax VAEformer behind VAEformerCodec; the first
    call per shape compiles (~tens of seconds), subsequent calls are fast;
  - ``coder="v2"`` (default) writes this framework's TPU-lane rANS streams
    into the same .bin framing; ``coder="v1"`` writes/reads
    reference-compatible serial rANS streams;
  - pretrained weights load from a local checkpoint path (orbax/msgpack or
    a converted torch .pth via cra5_tpu.tools.convert_torch) — there is no
    implicit network download.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import VAEformer, VAEformerCodec, vaeformer_268, vaeformer_tiny
from ..utils.config import Config
from . import era5
from .bitstream import load_bin, save_bin

_HERE = os.path.dirname(os.path.abspath(__file__))


class cra5_api:
    def __init__(
        self,
        config: Optional[str] = None,
        local_root: Optional[str] = None,
        weights: Optional[str] = None,
        model_version: int = 268,
        coder: str = "v2",
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.cfg = Config.fromfile(config or os.path.join(_HERE, "configs", "cra5_268v.py"))
        self.local_root = local_root or os.path.join(os.getcwd(), "data")

        self.mean, self.std = era5.load_mean_std(self.cfg)
        self.channels_to_vname, self.vname_to_channels = era5.channel_vname_mapping(self.cfg)

        if model_version == 268:
            model_cfg = vaeformer_268()
        elif model_version == -1:  # tiny, for tests
            model_cfg = vaeformer_tiny()
        else:
            raise ValueError(f"unknown model_version {model_version}")
        self.model_cfg = model_cfg
        if model_cfg.in_chans != self.mean.shape[0]:
            # reduced-channel variants (e.g. the tiny test model) use the
            # leading channels' statistics
            self.mean = self.mean[: model_cfg.in_chans]
            self.std = self.std[: model_cfg.in_chans]
        self.net = VAEformer(model_cfg, dtype=dtype)

        tables = None
        if weights is not None:
            variables = self._load_weights(weights)
            # converted reference checkpoints carry their trained CDF
            # buffers (models/base.py:69-89) — install them so archives
            # decode without an update() pass
            tables = variables.pop("_cdf_tables", None) if isinstance(variables, dict) else None
        else:
            x0 = jnp.zeros((1, model_cfg.in_chans, *model_cfg.img_size), dtype)
            variables = self.net.init(jax.random.PRNGKey(seed), x0)
        self.codec = VAEformerCodec(self.net, variables, coder=coder)
        if tables and "eb" in tables and "gc" in tables:
            if "scale_table" in tables:
                self.codec.scale_table = np.asarray(tables["scale_table"], np.float32)
            self.codec.set_tables(tables["eb"], tables["gc"])

        self._downloader = None

    # -- weights -----------------------------------------------------------
    def _load_weights(self, path: str):
        from ..train.checkpoints import load_variables

        return load_variables(path)

    # -- data acquisition --------------------------------------------------
    def download_era5_data(self, time_stamp: str, save_root: Optional[str] = None):
        from .downloader import era5_downloader

        if self._downloader is None:
            self._downloader = era5_downloader()
        return self._downloader.get_form_timestamp(
            time_stamp=time_stamp, local_root=save_root or self.local_root
        )

    def read_data_from_nc(self, time_stamp: str) -> np.ndarray:
        return era5.read_data_from_nc(self.cfg, self.local_root, time_stamp)

    def _read_or_synthesize(self, time_stamp: str) -> np.ndarray:
        try:
            return self.read_data_from_nc(time_stamp)
        except (RuntimeError, FileNotFoundError):
            # No NetCDF stack / no downloaded file: deterministic synthetic
            # field keyed by the timestamp (tests, benchmarks, demos).
            seed = abs(hash(time_stamp)) % (2**31)
            rng = np.random.default_rng(seed)
            x = rng.standard_normal(
                (self.mean.shape[0], *self.model_cfg.img_size), dtype=np.float32
            )
            return x * self.std[:, None, None] + self.mean[:, None, None]

    # -- normalization -----------------------------------------------------
    def get_mean_std(self):
        return self.mean, self.std

    def normalization(self, data: np.ndarray) -> np.ndarray:
        return era5.normalize(data, self.mean, self.std)

    def de_normalization(self, data: np.ndarray) -> np.ndarray:
        return era5.denormalize(np.asarray(data), self.mean, self.std)

    # -- encode ------------------------------------------------------------
    def encode_to_latent(
        self, time_stamp: str, save_root: Optional[str] = None, latent_type: str = "float"
    ):
        data = self._read_or_synthesize(time_stamp)
        x = self.normalization(data)[None]
        y = self.codec.encode_latent(x)
        if latent_type == "float":
            return y
        if latent_type == "quantized":
            sym = self.codec._symbols_from_latent(self.codec.variables, y, self.codec._scale_table_dev)
            return sym["y_sym"].astype(jnp.float32) + sym["means"]
        raise ValueError(f"unknown latent_type {latent_type!r}")

    def latent_to_bin(self, y) -> Dict[str, Any]:
        return self.codec.compress_from_latent(y)

    def encode_era5_as_bin(
        self,
        time_stamp: str,
        save_root: Optional[str] = None,
        return_format: str = "bin",
    ) -> Dict[str, Any]:
        save_root = save_root or self.local_root
        st1 = time.time()
        data = self._read_or_synthesize(time_stamp)
        x = self.normalization(data)[None]
        st2 = time.time()

        if return_format == "latent":
            return self.codec.encode_latent(x)
        if return_format == "quantized":
            y = self.codec.encode_latent(x)
            sym = self.codec._symbols_from_latent(self.codec.variables, y, self.codec._scale_table_dev)
            return sym["y_sym"].astype(jnp.float32) + sym["means"]

        output = self.codec.compress(x)
        st3 = time.time()

        year = time_stamp.split("-")[0]
        file_url = f"{save_root}/CRA5/{year}/{time_stamp}.bin"
        strings = [output["strings"][0][0], output["strings"][1][0]]
        save_bin(file_url, strings, output["z_shape"])
        st4 = time.time()
        return dict(
            output=output,
            reading_time=st2 - st1,
            encoding_time=st3 - st2,
            saving_time=st4 - st3,
            save_path=file_url,
        )

    # -- decode ------------------------------------------------------------
    def _bin_path(self, time_stamp: Optional[str], custom_path: Optional[str]) -> str:
        if custom_path is not None:
            return custom_path
        assert time_stamp is not None
        return f"{self.local_root}/CRA5/{time_stamp[:4]}/{time_stamp}.bin"

    def bin_to_latent(self, bin_path: Optional[str] = None, time_stamp: Optional[str] = None):
        strings, shape = load_bin(self._bin_path(time_stamp, bin_path))
        return self.codec.decompress(strings, shape, return_format="latent")

    def latent_to_reconstruction(self, y_hat):
        return self.codec.decode_latent(y_hat)

    def decode_from_bin(
        self,
        time_stamp: Optional[str] = None,
        custom_path: Optional[str] = None,
        return_format: str = "de_normalized",
    ):
        path = self._bin_path(time_stamp, custom_path)
        t0 = time.time()
        strings, shape = load_bin(path)
        if return_format == "latent":
            return self.codec.decompress(strings, shape, return_format="latent")
        out = self.codec.decompress(strings, shape)
        decoding_time = time.time() - t0
        if return_format == "normalized":
            return dict(x_hat=out["x_hat"], decoding_time=decoding_time)
        x_hat = self.de_normalization(np.asarray(out["x_hat"])[0])
        return dict(x_hat=x_hat, decoding_time=decoding_time)

    # -- visualization -----------------------------------------------------
    def show_image(
        self,
        reconstruct_data,
        time_stamp: str,
        show_variables=("z_500", "q_500", "u_500", "v_500", "t_500", "w_500"),
        save_images: bool = True,
        save_path: Optional[str] = None,
    ):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        input_data = self._read_or_synthesize(time_stamp)
        reconstruct_data = np.asarray(reconstruct_data)
        fig, axs = plt.subplots(len(show_variables), 3, figsize=(20, 3 * len(show_variables)))
        if len(show_variables) == 1:
            axs = axs[None, :]
        for i, vname in enumerate(show_variables):
            ch = self.vname_to_channels[vname]
            ori, rec = input_data[ch], reconstruct_data[ch]
            diff = np.abs(ori - rec)
            for j, (img, tag) in enumerate(
                [(ori, "Original"), (rec, "Reconstructed"), (diff, "Difference")]
            ):
                im = axs[i, j].imshow(img, cmap="jet")
                axs[i, j].set_title(f"{vname}_{tag}")
                fig.colorbar(im, ax=axs[i, j])
        plt.tight_layout()
        fig_path = (
            f"{save_path}/{time_stamp}_reconstruction.png"
            if save_path
            else f"{self.local_root}/CRA5_vis/{time_stamp[:4]}/{time_stamp}_reconstruction.png"
        )
        os.makedirs(os.path.dirname(fig_path), exist_ok=True)
        if save_images:
            plt.savefig(fig_path)
        plt.close(fig)
        return fig_path

    def show_latent(
        self,
        latent,
        time_stamp: str,
        show_channels=(0, 10, 20, 30, 40, 50, 60, 70),
        save_images: bool = True,
        save_path: Optional[str] = None,
    ):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        latent = np.asarray(latent)
        if latent.ndim == 4:
            latent = latent[0]
        rows = max(1, len(show_channels) // 4)
        fig, axs = plt.subplots(rows, 4, figsize=(24, 3 * rows))
        axs = np.atleast_1d(axs).flatten()
        for i, ch in enumerate(show_channels):
            im = axs[i].imshow(latent[ch], cmap="jet")
            axs[i].set_title(f"Channel_{ch}")
            fig.colorbar(im, ax=axs[i])
        plt.tight_layout()
        fig_path = (
            f"{save_path}/{time_stamp}_latent.png"
            if save_path
            else f"{self.local_root}/CRA5_vis/{time_stamp[:4]}/{time_stamp}_latent.png"
        )
        os.makedirs(os.path.dirname(fig_path), exist_ok=True)
        if save_images:
            plt.savefig(fig_path)
        plt.close(fig)
        return fig_path
