"""Train state and the jitted train/eval step factory.

Re-design of the reference's AMP train loop body (train.py:365-392):
bf16 forward, f32 master params and loss, AdamW via optax with the LR
injected per epoch (no GradScaler — bf16 on TPU needs no loss scaling),
gradient accumulation via optax.MultiSteps, VAE aux-loss mixing
(train.py:376-380).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from fcd_tpu import flags as _fcd_flags


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(params_cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """AdamW over all parameters (train_utils.py:63-71), LR injectable."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=params_cfg["lr"],
        weight_decay=params_cfg.get("weight_decay", 1e-5),
    )
    accum = params_cfg.get("gradient_accumulation_steps", 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(model, variables, params_cfg: Dict[str, Any]) -> TrainState:
    tx = make_optimizer(params_cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _set_lr(opt_state, lr):
    """Functionally set the injected learning_rate hyperparameter."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state._replace(inner_opt_state=_set_lr(opt_state.inner_opt_state, lr))
    raise ValueError("Could not locate injected learning_rate in optimizer state")


def make_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    model_returns_vaeloss: bool = False,
    loss_vae_weight: float = 0.2,
    donate: bool = True,
    wrap_jit: bool = True,
    s2d_loss: bool = False,
    s2d_input: bool = False,
    grad_norms: bool = False,
) -> Callable:
    """Build the train step (jitted unless wrap_jit=False, e.g. when the
    caller jits with explicit mesh shardings):

    (state, image, label, lr, rng[, thickness]) -> (state, loss)

    With grad_norms=True the step returns (state, loss, norms) where
    norms maps each top-level parameter group (module) to the global L2
    norm of its gradients — the wandb.watch analogue (train.py:336),
    computed in-step at negligible cost.

    With s2d_loss the model emits s2d logits (emit_s2d_logits=True) and
    the labels are space-to-depth'd once in-step, so the loss runs on
    lane-dense tensors and the full-resolution head exit (plus its
    backward adjoint) never happens; loss_fn must then be the s2d
    variant (make_combined_loss(params, s2d=True)). Same math (voxel
    sums reassociated).

    With s2d_input the jit wrapper additionally casts + space-to-depth's
    the IMAGE in its own tiny jit and the model consumes x_is_s2d
    patches: inside the step program XLA relayouts the raw image
    parameter around the entry transform (~5 ms/step at batch 4x128^3,
    profile_train_step copy.6981/6982/6984); decoupled it compiles to
    the cheap form — the same layout-domain lesson as _label_s2d_jit.
    Requires wrap_jit (the mesh path shards the raw image; keep its
    entry in-step). s2d is a pure permutation, so numerics are
    bit-identical to the in-step entry.
    """
    assert not (s2d_input and not wrap_jit)
    import os as _os

    if s2d_input and _fcd_flags.get("FCD_IMAGE_PREJIT") == "0":
        s2d_input = False

    def step_fn(state: TrainState, image, label, lr, rng, thickness=None,
                sample_mask=None):
        # sample_mask (B,): ragged-batch DP pad-and-mask — the loss
        # excludes padded samples exactly (losses/combined.py). Caveats:
        # train-mode batch-norm statistics and the VAE regularizer are
        # batch means that still see padded samples (pads are cyclic
        # repeats of real samples, so they stay in-distribution).
        def compute_loss(p):
            outputs, mutated = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                image,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **({"emit_s2d_logits": True} if s2d_loss else {}),
                **({"x_is_s2d": True} if s2d_input else {}),
            )
            vae_loss = 0.0
            if model_returns_vaeloss:
                outputs, vae_loss = outputs
            tgt = label
            if s2d_loss and label.shape[-1] == 1:
                # fallback for callers passing raw (B, D, H, W, 1) labels
                # (e.g. the mesh path); the jit wrapper below pre-s2d's
                # them in a separate program instead
                tgt = _label_s2d(label)
            main = (loss_fn(outputs, tgt, thickness) if sample_mask is None
                    else loss_fn(outputs, tgt, thickness, sample_mask))
            loss = main + loss_vae_weight * (
                vae_loss if model_returns_vaeloss else 0.0
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        if grad_norms:
            return new_state, loss, group_norms(grads)
        return new_state, loss

    if not wrap_jit:
        return step_fn
    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(step_fn, donate_argnums=donate_argnums)
    import os

    pre_label = s2d_loss and _fcd_flags.get("FCD_LABEL_PREJIT") != "0"
    pre_image = s2d_input
    if not (pre_label or pre_image):
        return jitted

    # label/image s2d as their OWN jits: inside the step program XLA
    # assigns the one-hot-conv transform transfer-oriented
    # T(1,128)/T(4,128) layouts and relayouts the parameters
    # (profile_train_step: ~8 ms labels + ~5 ms image of a 186 ms step);
    # decoupled, they compile to the cheap form — the same layout-domain
    # lesson as sliding_window._entry_s2d
    dtype = getattr(model, "dtype", None)

    def wrapped(state, image, label, lr, rng, thickness=None,
                sample_mask=None):
        tgt = (_label_s2d_jit(label)
               if pre_label and label.shape[-1] == 1 else label)
        img = _image_s2d_jit(image, dtype) if pre_image else image
        return jitted(state, img, tgt, lr, rng, thickness, sample_mask)

    return wrapped


def group_norms(tree) -> dict:
    """Per-top-level-group global L2 norms of a parameter/gradient pytree
    (the wandb.watch analogue, reference train.py:336). Jit-friendly:
    returns {group_name: scalar}."""
    out = {}
    for key, sub in dict(tree).items():
        leaves = jax.tree_util.tree_leaves(sub)
        out[str(key)] = jnp.sqrt(
            sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
    return out


def _label_s2d(label):
    """(B, D, H, W, 1) labels -> (B, D/2, H/2, W/2, 8) s2d labels."""
    from fcd_tpu.kernels.block_conv import space_to_depth_fast

    return space_to_depth_fast(label)


@jax.jit
def _label_s2d_jit(label):
    return _label_s2d(label)


# NOTE (round-5 measured dead end): forcing the standard major-to-minor
# output layout on this program via jax.experimental.layout Format
# (to remove the consumer step's 0.85 ms relayout copy, copy.5308) makes
# jax treat the committed-Format array as layout-incompatible with the
# step's compiled signature and RELAYOUT THROUGH THE HOST on the relay
# backend (~13 s/step). The in-step device copy is the cheap form.
@functools.partial(jax.jit, static_argnums=(1,))
def _image_s2d_jit(image, dtype):
    """(B, D, H, W, C) image -> compute-dtype (B, D/2, H/2, W/2, 8C) s2d,
    in its own jit (see make_train_step's s2d_input). Uses the Pallas
    entry kernel where supported (batch folded into depth — s2d pairs
    stay within samples since D is even); bit-identical to the conv
    form."""
    import os

    from fcd_tpu.kernels.block_conv import space_to_depth_fast
    from fcd_tpu.kernels.s2d_entry import s2d_entry, s2d_entry_supported

    b, d, h, w, c = (int(v) for v in image.shape)
    if (jax.default_backend() == "tpu" and dtype == jnp.bfloat16
            and _fcd_flags.get("FCD_ENTRY_KERNEL") == "1"
            and s2d_entry_supported(d, h, w, c)):
        out = s2d_entry(image.reshape(b * d, h, w, c), out_dtype=dtype)
        return out.reshape(b, d // 2, h // 2, w // 2, 8 * c)
    if dtype is not None:
        image = image.astype(dtype)
    out = space_to_depth_fast(image)
    if _fcd_flags.get("FCD_PAD_CHAIN") != "0":
        # padded-chain patch: the depth halo rides this program's s2d
        # chain; the model consumes it directly (inferred from the patch
        # shape) or slices the interior — never worse than the pad the
        # conv kernel would otherwise run
        out = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return out


def make_eval_fn(model, *, model_returns_vaeloss: bool = False,
                 x_is_s2d: bool = False, s2d_logits: bool = False) -> Callable:
    """Parameter-bound jittable predictor (B,...,C_in)->(B,...,C_out) logits,
    for direct eval and as the sliding-window predictor. With x_is_s2d the
    model consumes space-to-depth patches (models with supports_s2d_input);
    with s2d_logits it also emits s2d logits (B,...,8*C_out) for engines
    that blend in s2d space."""

    def predict(variables, image):
        kwargs = {"x_is_s2d": True} if x_is_s2d else {}
        if s2d_logits:
            kwargs["emit_s2d_logits"] = True
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", FrozenDict())},
            image,
            train=False,
            **kwargs,
        )
        if model_returns_vaeloss and isinstance(out, tuple):
            out = out[0]
        return out

    return jax.jit(predict)
