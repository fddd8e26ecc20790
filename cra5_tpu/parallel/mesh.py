"""Device-mesh construction — the single communication abstraction.

The reference has no distributed runtime (SURVEY.md §2.5); here the mesh
is first-class: every multi-chip path (data-parallel training, archive
recompression fan-out, tensor-parallel ViT) goes through one
``jax.sharding.Mesh`` whose axes ride ICI within a slice and DCN across
slices. XLA collectives (psum/all_gather/reduce_scatter) are inserted by
GSPMD from sharding annotations — no hand-written NCCL/MPI analogue.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh from an axis-name -> size dict, e.g. {"dp": 4, "tp": 2}.

    Defaults to pure data parallelism over all visible devices. Axis sizes
    must multiply to at most the device count (the first prod(axes) devices
    are used); use -1 for one inferred axis over all visible devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {"dp": n}
    axes = dict(axes)
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
        axes = dict(zip(axes.keys(), sizes))
    need = int(np.prod(list(axes.values())))
    if need > n:
        raise ValueError(f"mesh {axes} needs {need} devices, only {n} visible")
    dev_array = np.asarray(devices[:need]).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))
