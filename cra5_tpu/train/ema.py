"""Exponential moving average of parameters with warmup decay.

Capability parity with the reference LitEma
(/root/reference/cra5/models/vaeformer/modules/ema.py:6-81): effective
decay min(decay, (1+steps)/(10+steps)); store/copy/restore maps to
keeping the EMA tree alongside the live params (pure-functional JAX).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EmaState:
    params: Dict[str, Any]
    steps: jax.Array  # int32 scalar


def ema_init(params: Dict[str, Any]) -> EmaState:
    # Real copies, not aliases: the train step donates its TrainState, and
    # aliased ema/params buffers would be donated twice.
    return EmaState(
        params=jax.tree.map(lambda x: jnp.asarray(x).copy(), params),
        steps=jnp.int32(0),
    )


def ema_update(state: EmaState, new_params: Dict[str, Any], decay: float = 0.9999) -> EmaState:
    steps = state.steps + 1
    d = jnp.minimum(decay, (1.0 + steps) / (10.0 + steps))
    new_ema = jax.tree.map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)), state.params, new_params
    )
    return EmaState(params=new_ema, steps=steps)
