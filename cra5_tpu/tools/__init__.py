"""L7 CLI tools (parity with /root/reference/cra5/models/compressai/utils/):

  python -m cra5_tpu.tools.eval_model   — dataset sweep: compress/decompress
                                          PSNR/MS-SSIM/bpp/times, or
                                          --entropy-estimation oracle mode
  python -m cra5_tpu.tools.bench        — classical-codec baselines
                                          (JPEG/WebP/JPEG2000 via PIL)
  python -m cra5_tpu.tools.plot         — RD-curve plotting from result JSONs
  python -m cra5_tpu.tools.update_model — post-training CDF rebuild +
                                          SHA-stamped checkpoint export
  python -m cra5_tpu.tools.find_close   — find codec quality matching a
                                          target metric
  python -m cra5_tpu.tools.convert_checkpoint — torch .pth -> flax msgpack
"""
