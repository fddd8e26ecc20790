"""Checkpoint save/load: orbax directories or single-file msgpack.

Capability parity with the reference's checkpoint machinery
(/root/reference/cra5/models/vaeformer/vaeformer.py:168-239 from_state_dict
/ init_from_ckpt, zoo/pretrained.py:36-64 key surgery) re-based on flax
serialization + orbax for sharded/async training checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]) -> str:
    """Save a flax variables tree. ``path`` ending in .msgpack -> single
    file; otherwise an orbax checkpoint directory."""
    variables = jax.tree.map(np.asarray, variables)
    if path.endswith(".msgpack"):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(variables))
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()
    return path


def load_variables(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load a variables tree saved by ``save_variables`` (or a torch .pth
    converted via cra5_tpu.tools.convert_torch)."""
    if path.endswith(".pth"):
        from ..tools.convert_torch import convert_checkpoint

        return convert_checkpoint(path)
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            data = f.read()
        if target is not None:
            return serialization.from_bytes(target, data)
        return serialization.msgpack_restore(data)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def resolve_last_checkpoint(ckpt_dir: str) -> str:
    """Follow a ``last_checkpoint`` pointer file (reference
    vaeformer.py:187-201 init_from_ckpt)."""
    pointer = os.path.join(ckpt_dir, "last_checkpoint")
    if os.path.exists(pointer):
        with open(pointer) as f:
            return f.read().strip()
    raise ValueError(f"no last_checkpoint pointer under {ckpt_dir}")


def write_last_checkpoint(ckpt_dir: str, path: str) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "last_checkpoint"), "w") as f:
        f.write(path)
