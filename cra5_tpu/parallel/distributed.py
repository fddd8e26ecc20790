"""Multi-process (multi-host) runtime: jax.distributed wiring + helpers.

The reference has no distributed runtime at all (SURVEY.md §2.5 — its
only DP artifact is stripping ``module.`` prefixes from DataParallel
checkpoints, reference zoo/pretrained.py:39-41; training DP lives in the
external mmengine runner). Here multi-host is first-class: a v5e-16 or
multi-pod topology runs one Python process per host, all joined into a
single ``jax.sharding.Mesh`` whose dp/tp axes span every chip — ICI
within a slice, DCN across slices — with GSPMD inserting the
collectives.

Division of labour (matches how the workloads actually communicate):

* **Training** uses the GLOBAL mesh: each process feeds its local batch
  shard (``make_global_batch``) and the jitted step's gradient psum
  rides ICI/DCN across all processes.
* **Archive recompression** (BASELINE config 5) is embarrassingly
  parallel: timesteps are partitioned across processes
  (``local_work_slice``) and each host entropy-codes its own shard — no
  cross-host traffic at all.

Everything here is a no-op in single-process mode, so the same Trainer /
tools code runs unchanged from one chip to a multi-pod fleet.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Join (or skip joining) a multi-process JAX cluster.

    Resolution order: explicit args > ``CRA5_TPU_COORDINATOR`` /
    ``CRA5_TPU_NUM_PROCESSES`` / ``CRA5_TPU_PROCESS_ID`` env vars > the
    Cloud-TPU auto-detection built into ``jax.distributed.initialize``
    (used when ``CRA5_TPU_DISTRIBUTED=1`` with no explicit coordinator).
    A no-op when nothing is configured (single-process mode) or when the
    cluster is already joined. Must run before the backend initializes.

    Returns the process index (0 in single-process mode).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()
    coordinator = coordinator or os.environ.get("CRA5_TPU_COORDINATOR")
    num_processes = (
        num_processes
        if num_processes is not None
        else _env_int("CRA5_TPU_NUM_PROCESSES")
    )
    process_id = (
        process_id if process_id is not None else _env_int("CRA5_TPU_PROCESS_ID")
    )
    auto = os.environ.get("CRA5_TPU_DISTRIBUTED") == "1"
    if coordinator is None and not auto:
        return 0  # single-process mode
    if coordinator is not None:
        if num_processes is None or process_id is None:
            raise ValueError(
                "init_distributed: coordinator set but num_processes/"
                "process_id missing (args or CRA5_TPU_NUM_PROCESSES/"
                "CRA5_TPU_PROCESS_ID)"
            )
        if num_processes == 1:
            return 0
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    else:  # Cloud TPU pod: everything auto-detected from metadata
        jax.distributed.initialize()
    _INITIALIZED = True
    return jax.process_index()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoint writes,
    logging, bench JSON)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def kv_barrier(name: str, timeout_s: float = 600.0) -> None:
    """Barrier through the coordination service's key-value store — unlike
    :func:`barrier` this dispatches NO device computation, so it is safe to
    use for aligning processes BEFORE the first collective. The CPU gloo
    backend hard-codes a 30s rendezvous timeout on context setup
    (``GetKeyValue() timed out``): if compile times skew processes by more
    than that, the first psum dies. Compile AOT, ``kv_barrier``, then
    dispatch. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:  # pragma: no cover - initialize() always sets it
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def make_global_batch(mesh: Mesh, local_batch, spec: P = P("dp")) -> jax.Array:
    """Assemble a global array from this process's LOCAL batch shard.

    ``local_batch``'s leading dim is the per-process batch; the global
    batch dim is ``local * process_count`` laid out over ``spec``'s first
    axis in process order. Single-process this is just a device_put."""
    sharding = NamedSharding(mesh, spec)
    local_batch = np.asarray(local_batch)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def put_tree(mesh: Mesh, tree: Any, specs: Any = None) -> Any:
    """Place a host pytree on the mesh under per-leaf PartitionSpecs
    (default: fully replicated). Works in BOTH single- and multi-process
    mode: each process materializes only its addressable shards from its
    full host copy (all processes must hold identical host values, which
    deterministic ``model.init`` guarantees)."""
    if specs is None:
        specs = jax.tree.map(lambda _: P(), tree)

    def place(leaf, spec):
        arr = np.asarray(leaf)
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(arr, sharding)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(place, tree, specs, is_leaf=lambda x: x is None)


def fetch_tree(tree: Any) -> Any:
    """Full host copy of a (possibly multi-process-sharded) pytree.
    Fully-replicated/addressable leaves copy directly; cross-process
    shards are allgathered (DCN) first."""

    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            if leaf.is_fully_replicated:
                return np.asarray(leaf)
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
        return np.asarray(leaf)

    return jax.tree.map(fetch, tree)


def local_work_slice(n_items: int) -> slice:
    """Contiguous [start, stop) of a length-``n_items`` work list owned by
    this process (recompression fan-out: each host codes its own shard)."""
    pi, pc = jax.process_index(), jax.process_count()
    return slice(pi * n_items // pc, (pi + 1) * n_items // pc)
