"""LR schedules, registered into the SCHEDULERS registry and selectable
from config files (``trainer = dict(scheduler=dict(type=..., ...))``).

The reference trains through mmengine schedulers living in its external
``nwp`` package (its shipped configs carry none — SURVEY.md §0: "the
external trainer ... must provide its own first-class training loop");
here schedules are first-class optax schedule fns consumed by
``make_net_aux_optimizers`` (the aux/quantile optimizer deliberately
stays at a constant LR, matching the reference net/aux split semantics,
reference optimizers/net_aux.py:39-74).
"""

from __future__ import annotations

import inspect
from typing import Any, Dict, Optional, Sequence, Union

import optax

from ..utils.registry import SCHEDULERS

Schedule = Union[float, optax.Schedule]


@SCHEDULERS.register("ConstantLR")
def constant_lr(base_lr: float) -> optax.Schedule:
    return optax.constant_schedule(base_lr)


@SCHEDULERS.register("WarmupCosineLR")
def warmup_cosine_lr(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 1000,
    min_lr_ratio: float = 0.0,
) -> optax.Schedule:
    """Linear warmup 0 -> base_lr over ``warmup_steps``, then cosine decay
    to ``base_lr * min_lr_ratio`` at ``total_steps``."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(int(warmup_steps), 1),
        decay_steps=max(int(total_steps), int(warmup_steps) + 1),
        end_value=base_lr * min_lr_ratio,
    )


@SCHEDULERS.register("MultiStepLR")
def multistep_lr(
    base_lr: float,
    milestones: Sequence[int] = (),
    gamma: float = 0.1,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Step decay: LR multiplied by ``gamma`` at each milestone step
    (ABSOLUTE step numbers, torch/mmengine MultiStepLR semantics — not
    offset by the warmup), with an optional linear warmup prefix."""
    import jax.numpy as jnp

    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.int32)
    w = int(warmup_steps)

    def schedule(count):
        c = jnp.asarray(count, jnp.int32)
        lr = base_lr * gamma ** jnp.sum(ms <= c) if ms.size else jnp.float32(base_lr)
        if w:
            lr = lr * jnp.clip(c / w, 0.0, 1.0)
        return lr

    return schedule


@SCHEDULERS.register("LinearWarmupLR")
def linear_warmup_lr(
    base_lr: float, warmup_steps: int = 1000
) -> optax.Schedule:
    warm = optax.linear_schedule(0.0, base_lr, int(warmup_steps))
    return optax.join_schedules(
        [warm, optax.constant_schedule(base_lr)], [int(warmup_steps)]
    )


def build_schedule(
    cfg: Optional[Dict[str, Any]],
    base_lr: float,
    total_steps: Optional[int] = None,
) -> Schedule:
    """Resolve a config dict ``{"type": <registered name>, ...}`` into an
    optax schedule (``None`` -> constant ``base_lr``). ``total_steps`` is
    injected for schedules that need a horizon unless the dict pins one."""
    if cfg is None:
        return base_lr
    cfg = dict(cfg)
    name = cfg.pop("type")
    builder = SCHEDULERS.get(name)
    accepted = set(inspect.signature(builder).parameters)
    unknown = set(cfg) - accepted
    if unknown:
        raise ValueError(
            f"scheduler {name!r} got unknown option(s) {sorted(unknown)}; "
            f"accepted: {sorted(accepted - {'base_lr'})}"
        )
    kwargs = {"base_lr": base_lr, **cfg}
    if "total_steps" in accepted and "total_steps" not in kwargs:
        if total_steps is None:
            params = inspect.signature(builder).parameters
            if params["total_steps"].default is inspect.Parameter.empty:
                raise ValueError(
                    f"scheduler {name!r} needs a horizon: set "
                    f"TrainerConfig.total_steps (train CLI: the config's "
                    f"'steps' or --steps) or pass total_steps in the "
                    f"scheduler dict"
                )
        else:
            kwargs["total_steps"] = total_steps
    return builder(**kwargs)
