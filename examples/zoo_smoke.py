"""Zoo smoke test (reference examples/test_model.py:1-11 equivalent):
build a factorized-prior model and the flagship VAEformer, run a tiny
forward on each."""

import jax
import jax.numpy as jnp

from cra5_tpu.models import VAEformer, load_model, vaeformer_tiny


def main():
    _, _, codec = load_model("bmshj2018-factorized", quality=2, input_shape=(1, 3, 64, 64))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    out = codec.forward(x)
    print("bmshj2018-factorized:", out["x_hat"].shape)

    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    print("vaeformer:", out["x_hat"].shape)


if __name__ == "__main__":
    main()
