"""Lazy-import config mode (reference utils/config.py:986): imports named
in config files become LazyObject placeholders without being executed;
``with read_base():`` inherits other config files by module-ish path."""

import textwrap

import pytest

from cra5_tpu.utils import Config, LazyObject, read_base


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_lazy_imports_are_not_executed(tmp_path):
    cfg_file = _write(
        tmp_path,
        "cfg.py",
        """
        import nonexistent_heavy_dep
        from also_missing.optim import AdamW

        model = dict(type=nonexistent_heavy_dep.Model, depth=4)
        optimizer = dict(type=AdamW, lr=1e-3)
        """,
    )
    cfg = Config.fromfile(cfg_file, lazy_import=True)
    assert cfg.model["depth"] == 4
    assert isinstance(cfg.model["type"], LazyObject)
    assert cfg.model["type"].dotted == "nonexistent_heavy_dep.Model"
    assert cfg.optimizer["type"].dotted == "also_missing.optim.AdamW"
    with pytest.raises(ImportError):
        cfg.optimizer["type"].build()


def test_lazy_object_build_resolves(tmp_path):
    cfg_file = _write(
        tmp_path,
        "cfg.py",
        """
        import numpy as np
        from numpy import pi

        tau = dict(fn=np.hypot, half=pi)
        """,
    )
    cfg = Config.fromfile(cfg_file, lazy_import=True)
    import numpy

    assert cfg.tau["fn"].build() is numpy.hypot
    assert cfg.tau["half"].build() == numpy.pi


def test_read_base_inheritance_autodetected(tmp_path):
    _write(tmp_path, "base_cfg.py", "lr = 0.1\nmodel = dict(depth=2, width=8)\n")
    child = _write(
        tmp_path,
        "child.py",
        """
        with read_base():
            from base_cfg import *

        model = dict(depth=4, width=model['width'])
        """,
    )
    cfg = Config.fromfile(child)  # auto-detects lazy mode via read_base
    assert cfg.lr == 0.1
    assert cfg.model["depth"] == 4 and cfg.model["width"] == 8


def test_read_base_named_import_and_dump_filter(tmp_path):
    _write(tmp_path, "base_cfg.py", "a = 1\nb = 2\n")
    child = _write(
        tmp_path,
        "child.py",
        """
        import torch

        with read_base():
            from base_cfg import a

        c = a + 10
        head = dict(act=torch.nn.ReLU)
        """,
    )
    cfg = Config.fromfile(child, lazy_import=True)
    assert cfg.c == 11
    assert cfg.head["act"].dotted == "torch.nn.ReLU"
    # imported names stay accessible but are excluded from dumps
    assert isinstance(cfg.torch, LazyObject)
    assert "'torch':" not in cfg.pretty_text  # no top-level dumped entry


def test_read_base_is_runtime_noop():
    with read_base():
        pass


def test_dotted_import_without_alias(tmp_path):
    cfg_file = _write(
        tmp_path,
        "cfg.py",
        """
        import concurrent.futures

        pool = dict(type=concurrent.futures.ThreadPoolExecutor)
        """,
    )
    cfg = Config.fromfile(cfg_file, lazy_import=True)
    import concurrent.futures as cf

    assert cfg.pool["type"].build() is cf.ThreadPoolExecutor


def test_read_base_mention_in_comment_stays_eager(tmp_path):
    cfg_file = _write(
        tmp_path,
        "cfg.py",
        """
        # TODO: migrate to read_base style some day
        import math

        lr = math.sqrt(4)
        """,
    )
    cfg = Config.fromfile(cfg_file)  # must NOT flip to lazy mode
    assert cfg.lr == 2.0


def test_star_import_outside_read_base_raises(tmp_path):
    cfg_file = _write(tmp_path, "cfg.py", "from os.path import *\np = 1\n")
    with pytest.raises(SyntaxError, match="read_base"):
        Config.fromfile(cfg_file, lazy_import=True)


def test_relative_import_outside_read_base_raises(tmp_path):
    cfg_file = _write(tmp_path, "cfg.py", "from .base import x\n")
    with pytest.raises(SyntaxError, match="read_base"):
        Config.fromfile(cfg_file, lazy_import=True)


def test_named_read_base_import_propagates_lazy_status(tmp_path):
    _write(tmp_path, "base_cfg.py", "import torch\nx = 1\n")
    child = _write(
        tmp_path,
        "child.py",
        """
        with read_base():
            from base_cfg import torch, x

        y = x + 1
        """,
    )
    cfg = Config.fromfile(child, lazy_import=True)
    assert cfg.y == 2
    assert "'torch':" not in cfg.pretty_text
