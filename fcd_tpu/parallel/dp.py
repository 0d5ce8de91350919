"""Data-parallel training and patch-sharded inference over a device mesh.

TPU-native replacement for what would be DDP in torch land: the train
step is jitted with explicit NamedShardings — batch sharded over the
'data' axis, train state replicated — and XLA inserts the gradient
all-reduce over ICI. Sliding-window inference shards the *patch grid*
over the same axis (the in-domain analogue of sequence parallelism,
SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fcd_tpu.train.state import make_train_step


def make_dp_train_step(
    model,
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    *,
    model_returns_vaeloss: bool = False,
    loss_vae_weight: float = 0.2,
    donate: bool = True,
    s2d_loss: bool = False,
    with_mask: bool = False,
    grad_norms: bool = False,
) -> Callable:
    """Jitted mesh-sharded train step: (state, image, label, lr, rng) ->
    (state, loss). Batch dims of image/label shard over 'data'; the state
    is replicated; XLA emits psum for the gradients.

    with_mask=True builds the RAGGED-batch variant
    (state, image, label, lr, rng, sample_mask) -> (state, loss): the
    batch arrives padded to a mesh multiple (cyclic repeats) with a 0/1
    validity mask, also sharded over 'data'; the loss excludes padded
    samples exactly (losses/combined.py sample_mask), so the step always
    shards instead of falling back to a fully replicated program."""
    raw_step = make_train_step(
        model,
        loss_fn,
        tx,
        model_returns_vaeloss=model_returns_vaeloss,
        loss_vae_weight=loss_vae_weight,
        wrap_jit=False,
        s2d_loss=s2d_loss,
        grad_norms=grad_norms,
    )
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    # shardings: state replicated, image/label batch-sharded, lr/rng replicated
    # (single shardings broadcast over pytree args)
    in_shardings = (rep, batch_sh, batch_sh, rep, rep)
    if with_mask:
        # thickness (unused: None) + sample_mask
        in_shardings = in_shardings + (rep, batch_sh)
    out_shardings = (rep, rep, rep) if grad_norms else (rep, rep)
    donate_argnums = (0,) if donate else ()
    return jax.jit(
        raw_step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=donate_argnums,
    )


def replicate_state(state, mesh: Mesh):
    """Place the train state replicated on every mesh device."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, rep)
