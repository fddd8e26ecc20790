"""Zoo smoke test — the cra5_tpu equivalent of the reference
``examples/test_model.py`` (build a named zoo model + the VAEformer
flagship and run a compress/decompress roundtrip on random data; the
reference only instantiates because it needs a proxy+download, we can
actually roundtrip offline).

  python examples/test_model.py --cpu
"""

import argparse
import os
import sys

# runnable straight from a checkout: python examples/test_model.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (leave the TPU alone)")
    parser.add_argument("--quality", type=int, default=2)
    parser.add_argument("--full", action="store_true",
                        help="also build the full 268v VAEformer "
                        "(minutes of compile) instead of the tiny variant")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from cra5_tpu.models.zoo import bmshj2018_factorized

    # named builder, same shape as the reference zoo call
    # (pretrained=True requires a converted checkpoint — see
    # tools/convert_torch.py and MIGRATING.md)
    model, variables, codec = bmshj2018_factorized(quality=args.quality)
    codec.update()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64), jnp.float32)
    out = codec.compress(x)
    dec = codec.decompress(out["strings"], out["shape"])
    nbytes = sum(len(s) for grp in out["strings"] for s in grp)
    print(f"bmshj2018-factorized q={args.quality}: {nbytes} bytes, "
          f"x_hat {tuple(dec['x_hat'].shape)}")

    # the flagship weather model (reference: vaeformer_pretrained(268))
    from cra5_tpu.models import VAEformer, vaeformer_268, vaeformer_tiny
    from cra5_tpu.models.vaeformer import VAEformerCodec

    cfg = vaeformer_268() if args.full else vaeformer_tiny()
    net = VAEformer(cfg)
    xw = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.in_chans, *cfg.img_size), jnp.float32
    )
    vw = net.init(jax.random.PRNGKey(0), xw)
    wcodec = VAEformerCodec(net, vw)
    wcodec.update()
    ow = wcodec.compress(xw)
    dw = wcodec.decompress(ow["strings"], ow["z_shape"])
    nb = sum(len(s[0]) for s in ow["strings"])
    print(f"VAEformer({cfg.in_chans}v): {nb} bytes, "
          f"x_hat {tuple(dw['x_hat'].shape)}")


if __name__ == "__main__":
    main()
