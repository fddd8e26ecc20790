"""Config-driven training CLI.

The reference's training harness lives in the external mmengine 'nwp'
package (SURVEY.md §0); this is the in-repo, first-class equivalent:
a Python-file config (utils/config.py, same _base_/env-substitution
semantics as the reference's vendored mmengine Config) selects the
model, dataset, loss weights, and mesh; training runs through
``train.loop.Trainer`` (jitted step, dp/tp sharding, EMA, checkpoints).

Usage:
  python -m cra5_tpu.tools.train CONFIG.py [--steps N] [--ckpt-dir DIR]

Config keys (all optional except model):
  model      = dict(type="VAEformer", cfg="tiny")  # or zoo arch name
  dataset    = dict(type="ERA5NpyDataset", ...) | dict(type="synthetic",
               shape=(B, C, H, W), num=...)
  trainer    = dict(learning_rate=..., lmbda=..., use_ema=..., ...)
  mesh       = dict(dp=-1) | dict(dp=4, tp=2)
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def build_model(model_cfg):
    from ..models.vaeformer import (
        VAEformer,
        vaeformer_159,
        vaeformer_268,
        vaeformer_tiny,
    )
    from ..registry import MODELS

    cfg = dict(model_cfg)
    kind = cfg.pop("type")
    if kind == "VAEformer":
        named = {"tiny": vaeformer_tiny, "268": vaeformer_268, "159": vaeformer_159}
        vcfg = cfg.pop("cfg", "tiny")
        vcfg = named[vcfg]() if isinstance(vcfg, str) else vcfg
        return VAEformer(vcfg, **cfg)
    return MODELS.build({"type": kind, **cfg})


def build_data(data_cfg, seed: int = 0):
    from ..data import PrefetchLoader, batch_iterator
    from ..registry import DATASETS

    cfg = dict(data_cfg or {"type": "synthetic"})
    kind = cfg.pop("type")
    batch_size = cfg.pop("batch_size", 2)
    epochs = cfg.pop("epochs", None)
    if kind == "synthetic":
        shape = tuple(cfg.get("shape", (batch_size, 8, 41, 40)))
        num = int(cfg.get("num", 64))
        rng = np.random.default_rng(seed)

        def gen():
            while True:
                yield rng.normal(size=shape).astype(np.float32) * 0.5

        return gen()
    ds = DATASETS.build({"type": kind, **cfg})
    return PrefetchLoader(
        batch_iterator(ds, batch_size, shuffle=True, seed=seed, epochs=epochs)
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", type=str)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--ckpt-dir", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from ..parallel import make_mesh
    from ..train import Trainer, TrainerConfig
    from ..utils.config import Config

    from ..parallel import init_distributed

    init_distributed()  # no-op unless a multi-host cluster is configured
    cfg = Config.fromfile(args.config)
    model = build_model(cfg["model"])
    trainer_cfg = dict(cfg.get("trainer", {}))
    if "scheduler" in trainer_cfg and trainer_cfg["scheduler"] is not None:
        trainer_cfg["scheduler"] = dict(trainer_cfg["scheduler"])
    tc = TrainerConfig(**trainer_cfg)
    # The LR-schedule horizon is the run's FULL configured step budget
    # (cfg["steps"]), never this invocation's --steps: a resumed run
    # passes the remaining count via --steps but must keep decaying on
    # the original horizon (the restored opt_state schedule count picks
    # up where it left off). --steps sets the horizon only when the
    # config carries no budget of its own.
    if tc.total_steps is None:
        cfg_steps = cfg.get("steps")
        tc.total_steps = cfg_steps if cfg_steps is not None else args.steps
    if args.ckpt_dir:
        tc.ckpt_dir = args.ckpt_dir

    mesh = None
    if "mesh" in cfg:
        mesh = make_mesh(dict(cfg["mesh"]))

    trainer = Trainer(model, tc, mesh=mesh, seed=args.seed)
    data = build_data(cfg.get("dataset"), seed=args.seed)

    state = None
    if args.resume:
        import itertools
        import os

        from ..train.checkpoints import load_variables

        # peek ONE batch from the single live iterator and chain it back —
        # a second iter(data) would race a fresh producer thread against
        # the same underlying generator and drop the peeked batch
        it = iter(data)
        first = next(it)
        data = itertools.chain([first], it)
        resume = args.resume
        if os.path.isdir(resume) and os.path.exists(
            os.path.join(resume, "last_state")
        ):
            from ..train.checkpoints import resolve_last_checkpoint

            state = trainer.restore(  # full state: moments + EMA + step
                first, path=resolve_last_checkpoint(resume, "last_state")
            )
        elif os.path.basename(resume).startswith("state_"):
            state = trainer.restore(first, path=resume)
        else:
            # params-only checkpoint (e.g. a converted reference .pth):
            # optimizer/EMA restart fresh
            variables = load_variables(resume)
            state = trainer.init_state(trainer.shard_batch(first))
            state.params = variables["params"] if "params" in variables else variables

    steps = args.steps if args.steps is not None else cfg.get("steps", 100)
    state = trainer.fit(data, state=state, num_steps=steps)
    path = trainer.save(state)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
