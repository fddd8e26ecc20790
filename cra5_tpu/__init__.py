"""cra5_tpu — a TPU-native (JAX/XLA/Pallas) neural compression framework for
ERA5 atmospheric reanalysis data, with the capabilities of taohan10200/CRA5.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

  L7  tools/      eval_model, update_model, plot, bench, torch->jax converter
  L6  api/        cra5_api facade (encode_to_latent / latent_to_bin / ...)
  L5  data/       ERA5 ingest (NetCDF/npy), mean/std normalization, downloader
  L4  models/     VAEformer (159v/268v), conv hyperprior + factorized baselines
  L3  nn/         ViT blocks, window/global attention, patch embed, GDN
  L2  entropy/    EntropyBottleneck, GaussianConditional, quantize, CDF build
  L1  coder/      rANS64 host C++ (v1 bit-compat) + TPU interleaved-lane rANS (v2)
  L0  utils/      Config (python-file configs with _base_), registry

The compute path is JAX/flax; the host-side native layer is C++ exposed via
ctypes (no external wheels). Multi-chip scaling goes through
``cra5_tpu.parallel`` (jax.sharding.Mesh + pjit/shard_map).
"""

__version__ = "0.1.0"
