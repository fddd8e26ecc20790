"""Config-driven training CLI + registry population."""

import jax
import numpy as np
import pytest


def test_registries_populated():
    from cra5_tpu.registry import CRITERIONS, DATASETS, MODELS, OPTIMIZERS

    assert "VAEformer" in MODELS
    assert "ELIC2022" in MODELS and "TCM2023" in MODELS
    assert "ERA5NpyDataset" in DATASETS and "ImageFolder" in DATASETS
    assert "RateDistortionLoss" in CRITERIONS
    assert "net_aux" in OPTIMIZERS
    # idempotent re-import
    import importlib

    import cra5_tpu.registry as r

    importlib.reload(r)


def test_registry_build():
    from cra5_tpu.registry import MODELS

    model = MODELS.build({"type": "FactorizedPrior", "N": 8, "M": 12})
    assert model.N == 8
    with pytest.raises(KeyError):
        MODELS.get("nope")


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path, capsys):
    from cra5_tpu.tools import train as train_cli

    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "model = dict(type='VAEformer', cfg='tiny')\n"
        "dataset = dict(type='synthetic', shape=(2, 8, 41, 40), batch_size=2)\n"
        "trainer = dict(use_ema=False, log_every=2, ckpt_every=10**9,\n"
        "               scheduler=dict(type='WarmupCosineLR', warmup_steps=2))\n"
        "steps = 3\n"
    )
    rc = train_cli.main([str(cfg), "--ckpt-dir", str(tmp_path / "ckpt")])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.endswith(".msgpack")
    import os

    assert os.path.exists(out)


def test_train_cli_config_mesh(tmp_path):
    from cra5_tpu.tools.train import build_model
    from cra5_tpu.utils.config import Config

    cfg = tmp_path / "cfg.py"
    cfg.write_text("model = dict(type='FactorizedPrior', N=8, M=12)\n")
    c = Config.fromfile(str(cfg))
    model = build_model(c["model"])
    assert model.M == 12


@pytest.mark.parametrize(
    "name,n_channels,cfg_name",
    [("train_era5_268v_1h.py", 268, "268"),
     ("train_era5_159v_1h.py", 159, "159")],
)
def test_shipped_train_configs(name, n_channels, cfg_name):
    """The reference-parity train configs (_base_ inheritance, env-var
    data root) load, describe the right channel counts, and build."""
    import os

    from cra5_tpu.tools.train import build_model
    from cra5_tpu.train.loop import TrainerConfig
    from cra5_tpu.utils.config import Config

    root = os.path.join(
        os.path.dirname(__file__), "..", "cra5_tpu", "api", "configs", name
    )
    c = Config.fromfile(root)
    v = c["vnames"]
    total = len(v["pressure"]) * len(c["pressure_level"]) + len(v["single"])
    assert total == n_channels
    assert c["model"] == {"type": "VAEformer", "cfg": cfg_name}
    # base keys merged under the child's vnames/levels
    ds = c["dataset"]
    assert ds["type"] == "ERA5NpyDataset" and ds["vnames"] == v
    assert ds["years"] == ("1998-05-04", "2017-12-31")
    assert c["val_dataset"]["years"][0].startswith("2018")
    assert c["evaluator"]["metric_name"] == ["WRMSE", "MSE"]
    TrainerConfig(**c["trainer"])  # every key is a real trainer field
    model = build_model(c["model"])
    assert model.cfg.in_chans == n_channels
