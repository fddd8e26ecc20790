"""Training loop: optax/jit train step with mesh sharding, EMA, and
checkpointed resume. First-class replacement for the external mmengine
'nwp' runner the reference depends on (SURVEY.md §0).

The step is a single jitted function; under a mesh, batches are sharded
over 'dp' and params over 'tp' (parallel/sharding.py) and GSPMD inserts
the gradient all-reduces. The net/aux optimizer split follows the
reference (optimizers/net_aux.py:39): aux trains only EB quantiles.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vaeformer import VAEformer
from .checkpoints import (
    load_train_state,
    resolve_last_checkpoint,
    save_train_state,
    save_variables,
    write_last_checkpoint,
)
from .ema import EmaState, ema_init, ema_update
from .loss import RateDistortionLoss, kl_weighted_loss
from .optim import make_net_aux_optimizers


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]
    opt_state: Any
    ema: Optional[EmaState] = None


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    aux_learning_rate: float = 1e-3
    lmbda: float = 0.01
    bpp_weight: float = 0.01
    kl_weight: float = 1e-6
    use_kl: bool = False
    use_ema: bool = True
    ema_decay: float = 0.9999
    max_grad_norm: float = 1.0
    log_every: int = 50
    ckpt_every: int = 1000
    ckpt_dir: str = "checkpoints"
    # keep only the newest N step_/state_ checkpoints (0 = keep all);
    # long runs with full train states (params + adam moments + EMA)
    # otherwise accumulate multi-GB files every ckpt_every steps
    ckpt_keep: int = 0
    # SCHEDULERS config dict for the net LR, e.g.
    # dict(type="WarmupCosineLR", warmup_steps=1000, min_lr_ratio=0.1);
    # None = constant learning_rate
    scheduler: Optional[Dict[str, Any]] = None
    total_steps: Optional[int] = None


def make_train_step(
    model: VAEformer,
    tx: optax.GradientTransformation,
    cfg: TrainerConfig,
) -> Callable:
    rd = RateDistortionLoss(lmbda=cfg.lmbda, bpp_weight=cfg.bpp_weight)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch, training=True, rng=rng)
        losses = rd(out, batch)
        aux = model.apply({"params": params}, method=VAEformer.aux_loss)
        total = losses["loss"] + aux
        metrics = {**losses, "aux_loss": aux}
        if cfg.use_kl:
            klo = kl_weighted_loss(out, batch, kl_weight=cfg.kl_weight)
            total = total + klo["vae_loss"]
            metrics.update(klo)
        metrics["total_loss"] = total
        return total, metrics

    def train_step(state: TrainState, batch: jax.Array, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            ema = ema_update(ema, params, cfg.ema_decay)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state, ema=ema),
            metrics,
        )

    return train_step


class Trainer:
    """Orchestrates init/resume, the jitted step, logging, checkpoints."""

    def __init__(
        self,
        model: VAEformer,
        cfg: TrainerConfig = TrainerConfig(),
        mesh: Optional[Mesh] = None,
        seed: int = 0,
    ):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.seed = seed
        self.tx = make_net_aux_optimizers(
            cfg.learning_rate, cfg.aux_learning_rate, cfg.max_grad_norm,
            scheduler=cfg.scheduler, total_steps=cfg.total_steps,
        )
        self._step_fn = jax.jit(make_train_step(model, self.tx, cfg), donate_argnums=(0,))

    def init_state(self, example_batch: jax.Array) -> TrainState:
        multiproc = jax.process_count() > 1
        if multiproc and self.mesh is None:
            raise ValueError(
                "multi-process training requires a mesh: pass one to "
                "Trainer(..., mesh=...) (e.g. data_parallel_mesh()) so "
                "global params/batches have a sharding to live on"
            )
        if multiproc:
            # Multi-process: init on a HOST example (identical values on
            # every process — deterministic PRNG), place globally, and
            # derive opt/EMA state under jit so GSPMD owns the shardings.
            host_example = jnp.zeros(example_batch.shape, example_batch.dtype)
            variables = self.model.init(jax.random.PRNGKey(self.seed), host_example)
            params = jax.device_get(variables["params"])
            from ..parallel.distributed import put_tree
            from ..parallel.sharding import mesh_param_specs

            specs = mesh_param_specs(self.mesh, params)
            params = put_tree(self.mesh, params, specs)
            with self.mesh:
                opt_state = jax.jit(self.tx.init)(params)
                ema = jax.jit(ema_init)(params) if self.cfg.use_ema else None
            step = put_tree(self.mesh, jnp.int32(0))
            return TrainState(step=step, params=params, opt_state=opt_state, ema=ema)
        variables = self.model.init(jax.random.PRNGKey(self.seed), example_batch)
        params = variables["params"]
        if self.mesh is not None:
            from ..parallel.sharding import shard_variables

            params = shard_variables(self.mesh, params)
        opt_state = self.tx.init(params)
        ema = ema_init(params) if self.cfg.use_ema else None
        return TrainState(step=jnp.int32(0), params=params, opt_state=opt_state, ema=ema)

    def shard_batch(self, batch: jax.Array) -> jax.Array:
        """Place a batch for the step. Single-process: the full batch,
        dp-sharded when a mesh is set. Multi-process: ``batch`` is this
        process's LOCAL shard (global batch = local x process_count),
        assembled into one global array over the mesh dp axis."""
        if self.mesh is None or "dp" not in self.mesh.axis_names:
            return jnp.asarray(batch)
        if jax.process_count() > 1:
            from ..parallel.distributed import make_global_batch

            return make_global_batch(self.mesh, batch, P("dp"))
        return jax.device_put(
            jnp.asarray(batch), NamedSharding(self.mesh, P("dp"))
        )

    def fit(
        self,
        data: Iterable,
        state: Optional[TrainState] = None,
        num_steps: Optional[int] = None,
        log_fn: Callable[[int, Dict[str, float]], None] = None,
    ) -> TrainState:
        # host-side key: implicitly replicated, safe to pass into a jit
        # whose other inputs are global multi-process arrays
        rng = np.asarray(jax.random.PRNGKey(self.seed + 1))
        it = iter(data)
        if state is None:
            first = next(it)
            state = self.init_state(self.shard_batch(first))
            data_iter = _chain_first(first, it)
        else:
            data_iter = it

        # one blocking fetch up front, then a host-side counter: int() on
        # state.step every iteration would sync the device each step (a
        # ~27ms tunnel RTT here; a pipeline bubble anywhere) — the jitted
        # step increments it by exactly 1, so the count is deterministic
        step0 = int(jax.device_get(state.step))
        last_log_step = step0  # first interval after a resume can be < log_every
        t0 = time.time()
        for i, batch in enumerate(data_iter):
            if num_steps is not None and i >= num_steps:
                break
            batch = self.shard_batch(batch)
            state, metrics = self._step_fn(state, batch, rng)
            step = step0 + i + 1
            if step % self.cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (step - last_log_step) / max(time.time() - t0, 1e-9)
                last_log_step = step
                t0 = time.time()
                if log_fn is not None:
                    log_fn(step, m)
                else:
                    print(f"step {step}: " + " ".join(f"{k}={v:.4g}" for k, v in m.items()))
            if step % self.cfg.ckpt_every == 0:
                self.save(state)
        return state

    def save(self, state: TrainState) -> str:
        """Write both a params-only model checkpoint (export/eval surface,
        reference .pth equivalent) and the full resumable train state
        (adam moments + EMA shadow + step; SURVEY §5). Multi-host safe:
        every process gathers (cross-process shards ride an allgather),
        only the primary writes, and a barrier keeps the cluster in step
        so no process races ahead and re-donates buffers mid-write."""
        from ..parallel.distributed import barrier, fetch_tree, is_primary

        host_state = fetch_tree(state)
        step = int(host_state.step)
        path = os.path.join(self.cfg.ckpt_dir, f"step_{step}.msgpack")
        state_path = os.path.join(self.cfg.ckpt_dir, f"state_{step}.msgpack")
        if is_primary():
            save_variables(path, {"params": host_state.params})
            write_last_checkpoint(self.cfg.ckpt_dir, path)
            save_train_state(state_path, host_state)
            write_last_checkpoint(self.cfg.ckpt_dir, state_path, "last_state")
            if self.cfg.ckpt_keep > 0:
                self._prune_checkpoints()
        barrier("ckpt_save")
        return path

    def _prune_checkpoints(self) -> None:
        # never delete what the pointer files reference: a reused dir with
        # stale higher-step checkpoints would otherwise out-sort (and so
        # delete) the just-written one, leaving dangling pointers
        protected = set()
        for pointer in ("last_checkpoint", "last_state"):
            p = os.path.join(self.cfg.ckpt_dir, pointer)
            if os.path.exists(p):
                with open(p) as f:
                    protected.add(os.path.basename(f.read().strip()))
        for prefix in ("step_", "state_"):
            suffix = ".msgpack"
            files = sorted(
                (
                    f
                    for f in os.listdir(self.cfg.ckpt_dir)
                    if f.startswith(prefix)
                    and f.endswith(suffix)
                    and f[len(prefix) : -len(suffix)].isdigit()
                ),
                key=lambda f: int(f[len(prefix) : -len(suffix)]),
            )
            for old in files[: -self.cfg.ckpt_keep]:
                if old not in protected:
                    os.remove(os.path.join(self.cfg.ckpt_dir, old))

    def restore(self, example_batch: jax.Array, path: Optional[str] = None) -> TrainState:
        """Resume from a full train-state checkpoint. ``path`` defaults to
        the ``last_state`` pointer under ``cfg.ckpt_dir``; the example
        batch (re)builds the state template with the right shapes and
        shardings."""
        if path is None:
            path = resolve_last_checkpoint(self.cfg.ckpt_dir, "last_state")
        template = self.init_state(self.shard_batch(example_batch))
        return load_train_state(path, template, donate_template=True)


def _chain_first(first, rest):
    yield first
    yield from rest
