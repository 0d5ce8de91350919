"""Tensor-parallel (channel-sharded) training and inference over a 2-D mesh.

The reference is single-GPU, so TP has no counterpart there (SURVEY.md
§2.2 marks it optional at this model scale); this module is the TPU-native
scaling story for models or feature multipliers that outgrow one chip's
HBM: a ("data", "model") mesh where the batch shards over 'data' and the
channel dimension of the wide weights shards over 'model'.

Design: GSPMD does the heavy lifting. We annotate PARAMETER shardings with
a Megatron-style pairing — the first conv of every residual block is
column-parallel (output channels sharded), the second conv and the
attention input projections are row-parallel (input channels sharded, XLA
inserts the psum over 'model') — place the train state accordingly, and
jit with computation-follows-data so XLA propagates activation shardings
and inserts the collectives over ICI. No manual collective appears in the
model code; the same flax modules serve 1-device, DP and TP execution.

Pairing rules (see tp_spec_for):
- UnetResBlock Conv3d_0 (conv1) and the 1x1 projection shortcut Conv3d_2:
  column-parallel, kernel sharded on the output-channel axis.
- UnetResBlock Conv3d_1 (conv2): row-parallel, sharded on input channels —
  its input is already channel-sharded by conv1, so the only collective in
  the block is the psum that completes conv2.
- DSA qkvv (C, 4C): row-parallel on the input axis. The packed 4C output
  axis interleaves q/k/v/v2 head boundaries, so sharding it would split
  heads unevenly; row-parallel needs no knowledge of the packing.
- TransformerBlock Conv3d_0 (the attention out-projection): row-parallel.
- Everything 1-D (biases, norm affines, gamma, temperatures) and the tiny
  tensors (pos_embed, EF, segmentation head with chans_out=2): replicated —
  they are bytes, and GSPMD reshards them for free where needed.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fcd_tpu.train.state import make_train_step


def make_tp_mesh(n_data: int, n_model: int) -> Mesh:
    """("data", "model") mesh over the first n_data*n_model devices."""
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(jax.devices())}"
    )
    return Mesh(np.asarray(devices).reshape(n_data, n_model), ("data", "model"))


def tp_spec_for(path_names: Tuple[str, ...], shape: Tuple[int, ...],
                n_model: int) -> P:
    """PartitionSpec for one parameter leaf (Megatron pairing, see module
    docstring). Falls back to replicated whenever the preferred axis does
    not divide by the model-axis size."""
    if len(shape) < 2 or n_model <= 1:
        return P()
    name = path_names[-1]
    parent = path_names[-2] if len(path_names) >= 2 else ""
    cin, cout = shape[-2], shape[-1]

    def col():  # output channels sharded
        if cout % n_model == 0 and cout >= 2 * n_model:
            return P(*([None] * (len(shape) - 1) + ["model"]))
        return P()

    def row():  # input channels sharded (psum completes the contraction)
        if cin % n_model == 0 and cin >= 2 * n_model:
            return P(*([None] * (len(shape) - 2) + ["model", None]))
        return P()

    if name == "qkvv":
        return row()
    if name != "kernel":
        return P()
    in_transformer = any(p.startswith("TransformerBlock") for p in path_names)
    if parent == "Conv3d_1":          # UnetResBlock conv2
        return row()
    if parent == "Conv3d_0" and in_transformer:   # attention out-projection
        return row()
    return col()                       # conv1 / shortcut / up-blocks / embeds


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        else:
            out.append(str(k))
    return tuple(out)


def tp_tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for any pytree whose leaf paths end with flax
    parameter names (works for the params tree AND the optimizer state,
    whose mu/nu subtrees mirror the param paths)."""
    n_model = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = tp_spec_for(_path_names(path), tuple(shape), n_model)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_state_tp(state, mesh: Mesh):
    """Place a TrainState with Megatron-paired param (and mirrored
    optimizer-state) shardings; scalars and non-matching leaves replicate."""
    return jax.device_put(state, tp_tree_shardings(state, mesh))


def shard_variables_tp(variables, mesh: Mesh):
    """Place an inference variables dict with TP shardings."""
    return jax.device_put(variables, tp_tree_shardings(variables, mesh))


def make_tp_train_step(
    model,
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    *,
    model_returns_vaeloss: bool = False,
    loss_vae_weight: float = 0.2,
    donate: bool = True,
) -> Callable:
    """Jitted TP+DP train step: (state, image, label, lr, rng) ->
    (state, loss). The state must be placed by shard_state_tp (computation
    follows the argument shardings, so the weight layouts annotated there
    drive GSPMD's propagation); batch tensors shard over 'data'."""
    raw_step = make_train_step(
        model,
        loss_fn,
        tx,
        model_returns_vaeloss=model_returns_vaeloss,
        loss_vae_weight=loss_vae_weight,
        donate=False,
        wrap_jit=False,
    )
    donate_argnums = (0,) if donate else ()
    # No in_shardings: jit consumes the shardings the arguments carry
    # (state from shard_state_tp, batch from shard_batch_tp) and GSPMD
    # propagates through the step. Loss comes back fully replicated.
    return jax.jit(
        raw_step,
        out_shardings=(None, NamedSharding(mesh, P())),
        donate_argnums=donate_argnums,
    )


def shard_batch_tp(mesh: Mesh, batch):
    """Batch leading axis over 'data', spatial/channel axes replicated."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))
