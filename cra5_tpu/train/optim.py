"""Optimizer construction with the net/aux parameter split.

Capability parity with the reference net/aux optimizers
(/root/reference/cra5/models/compressai/optimizers/net_aux.py:39-74): the
aux optimizer trains only the EntropyBottleneck ``quantiles`` parameters;
the net optimizer trains everything else. Implemented with
optax.multi_transform over a label tree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import optax


def _label_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """'aux' for */quantiles under an entropy bottleneck, 'net' otherwise."""

    def label(path: Tuple, leaf) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        return "aux" if keys and keys[-1] == "quantiles" else "net"

    return jax.tree_util.tree_map_with_path(label, params)


def split_net_aux_params(params: Dict[str, Any]) -> Dict[str, Any]:
    return _label_tree(params)


def make_net_aux_optimizers(
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    max_grad_norm: float = 1.0,
    scheduler: Dict[str, Any] = None,
    total_steps: int = None,
) -> optax.GradientTransformation:
    """``scheduler``: optional SCHEDULERS config dict (e.g.
    ``dict(type="WarmupCosineLR", warmup_steps=1000)``) applied to the
    NET optimizer; the aux/quantile optimizer stays constant-LR (its
    quantile fit is a running target, not a converging loss)."""
    from .schedulers import build_schedule

    net_lr = build_schedule(scheduler, learning_rate, total_steps)
    net_tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(net_lr),
    )
    aux_tx = optax.adam(aux_learning_rate)
    return optax.multi_transform(
        {"net": net_tx, "aux": aux_tx}, param_labels=_label_tree
    )
