"""Train-state, schedule, and checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from fcd_tpu.config import get_default_params
from fcd_tpu.losses.combined import make_combined_loss
from fcd_tpu.models.factory import count_params, get_model, init_model
from fcd_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from fcd_tpu.train.schedule import epoch_lr
from fcd_tpu.train.state import (
    create_train_state,
    make_eval_fn,
    make_optimizer,
    make_train_step,
)


def test_epoch_lr_matches_torch_sequential_schedule():
    params = get_default_params()
    params.update(lr=1e-4, warmup_epochs=10, max_epochs=50, min_lr=1e-6)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=params["lr"])
    warm = torch.optim.lr_scheduler.LinearLR(opt, start_factor=0.1, total_iters=10)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=40, eta_min=1e-6)
    sched = torch.optim.lr_scheduler.SequentialLR(opt, [warm, cos], milestones=[10])
    for epoch in range(50):
        torch_lr = opt.param_groups[0]["lr"]
        ours = epoch_lr(params, epoch)
        assert ours == pytest.approx(torch_lr, rel=1e-6), f"epoch {epoch}"
        sched.step()


def _tiny_setup(model_type="BASEUNET", accum=1):
    params = get_default_params()
    params.update(
        model_type=model_type, patch_size=16, feature_size=4, project_size=8,
        chans_in=2, chans_out=2, use_amp=False, loss="DiceCELoss",
        gradient_accumulation_steps=accum,
    )
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    tx = make_optimizer(params)
    loss_fn = make_combined_loss(params)
    step = make_train_step(
        model, loss_fn, tx,
        model_returns_vaeloss=params["model_returns_vaeloss"],
        loss_vae_weight=params["loss_vae_weight"],
        donate=False,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 2).astype(np.float32))
    y = jnp.zeros((1, 16, 16, 16, 1)).at[0, 4:10, 4:10, 4:10, 0].set(1.0)
    return params, model, state, step, x, y


def test_train_step_decreases_loss():
    params, model, state, step, x, y = _tiny_setup()
    losses = []
    for i in range(5):
        state, loss = step(state, x, y, 1e-3, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_s2d_loss_path_matches_dense():
    # the lane-dense training-loss fast path (s2d logits + s2d labels) is
    # the same math with voxel sums reassociated; the step loss must match
    params = get_default_params()
    params.update(
        model_type="MS_DSA_NET", patch_size=32, feature_size=4,
        project_size=8, chans_in=2, chans_out=2, use_amp=False,
        loss="DiceCELoss", gradient_accumulation_steps=1,
    )
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    tx = make_optimizer(params)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 32, 32, 2).astype(np.float32))
    y = jnp.zeros((1, 32, 32, 32, 1)).at[0, 8:20, 8:20, 8:20, 0].set(1.0)

    losses = {}
    for s2d in (False, True):
        state = create_train_state(model, variables, params)
        loss_fn = make_combined_loss(params, s2d=s2d)
        step = make_train_step(model, loss_fn, tx, donate=False,
                               s2d_loss=s2d)
        _, loss = step(state, x, y, 1e-3, jax.random.PRNGKey(0))
        losses[s2d] = float(loss)
    assert losses[True] == pytest.approx(losses[False], rel=1e-4)


def test_gradient_accumulation_steps_every_k():
    params, model, state, step, x, y = _tiny_setup(accum=2)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, x, y, 1e-3, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # no update yet
    state, _ = step(state, x, y, 1e-3, jax.random.PRNGKey(1))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))  # updated at k=2


def test_checkpoint_roundtrip(tmp_path):
    params, model, state, step, x, y = _tiny_setup()
    state, _ = step(state, x, y, 1e-3, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, epoch=7, extra={"best_val_loss": 0.5})

    _, _, fresh, _, _, _ = _tiny_setup()
    restored, epoch, extra = load_checkpoint(path, fresh)
    assert epoch == 7
    assert extra["best_val_loss"] == pytest.approx(0.5)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_fn_shapes_and_vae_unwrap():
    params, model, state, step, x, y = _tiny_setup()
    predict = make_eval_fn(model)
    out = predict({"params": state.params, "batch_stats": state.batch_stats}, x)
    assert out.shape == (1, 16, 16, 16, 2)


def test_factory_sets_vae_flag():
    params = get_default_params()
    params.update(model_type="MS_DSA_NET", patch_size=32)
    _, params = get_model(params, return_model=False)
    assert params["model_returns_vaeloss"] is False


def test_grad_norms_step_returns_group_norms():
    """grad_norms=True: the step returns {top-level group: grad L2 norm}
    (the wandb.watch analogue, VERDICT r2 item 8)."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.losses.combined import make_combined_loss
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import (
        create_train_state, make_optimizer, make_train_step,
    )

    params = get_default_params()
    params.update(model_type="BASEUNET", patch_size=16, feature_size=4,
                  chans_in=2, chans_out=2, use_amp=False, loss="DiceCELoss")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    step = make_train_step(model, make_combined_loss(params),
                           make_optimizer(params), donate=False,
                           grad_norms=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 16, 2), jnp.float32)
    y = jnp.asarray((rng.rand(2, 16, 16, 16, 1) > 0.7), jnp.float32)
    new_state, loss, norms = step(state, x, y, 1e-3, jax.random.PRNGKey(0))
    assert set(norms) == set(dict(state.params))
    assert all(np.isfinite(float(v)) for v in norms.values())
    assert any(float(v) > 0 for v in norms.values())
    assert np.isfinite(float(loss))
