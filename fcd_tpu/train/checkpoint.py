"""Checkpointing: single-file msgpack snapshots of the full train state.

Functional equivalent of the reference's torch.save dict
{model, optimizer, lr_scheduler, scaler, epoch} (train.py:113-146),
including tolerance for params-only checkpoints on load.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from typing import Any, Dict, Optional

import jax
from flax import serialization

LATEST_NAME = "latest_model.msgpack"
BEST_NAME = "best_model.msgpack"


def save_checkpoint(
    path: str,
    state,
    *,
    epoch: Optional[int] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": -1 if epoch is None else epoch,
        "extra": extra or {},
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, state, *, with_optimizer: bool = True):
    """Restore into `state` (template for pytree structure).

    Returns (state, epoch, extra). Params-only checkpoints (no opt_state)
    restore just the model the way train.py:133-136 tolerates bare
    state dicts.
    """
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if "params" not in raw:
        # params-only checkpoint (bare state dict)
        params = serialization.from_state_dict(state.params, raw)
        return state.replace(params=params), None, {}

    new_state = state.replace(
        params=serialization.from_state_dict(state.params, raw["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats, raw["batch_stats"]),
        step=jnp.asarray(raw["step"]),
    )
    if with_optimizer and "opt_state" in raw:
        new_state = new_state.replace(
            opt_state=serialization.from_state_dict(state.opt_state, raw["opt_state"])
        )
    epoch = int(raw["epoch"])
    return new_state, (None if epoch < 0 else epoch), raw.get("extra", {})
