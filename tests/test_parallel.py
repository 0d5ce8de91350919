"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.config import get_default_params
from fcd_tpu.losses.combined import make_combined_loss
from fcd_tpu.models.factory import get_model, init_model
from fcd_tpu.parallel.dp import make_dp_train_step, replicate_state
from fcd_tpu.parallel.mesh import make_mesh, shard_batch
from fcd_tpu.train.state import create_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8, ("data",))


def test_dp_train_step_runs_and_matches_single_device(mesh):
    params = get_default_params()
    params.update(
        model_type="BASEUNET", patch_size=16, feature_size=4,
        chans_in=2, chans_out=2, use_amp=False, loss="DiceLoss",
    )
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    state = create_train_state(model, variables, params)
    tx = make_optimizer(params)
    loss_fn = make_combined_loss(params)

    rng = np.random.RandomState(0)
    x = rng.rand(8, 16, 16, 16, 2).astype(np.float32)
    y = (rng.rand(8, 16, 16, 16, 1) > 0.7).astype(np.float32)

    # single-device reference step
    step1 = make_train_step(model, loss_fn, tx, donate=False)
    sd_state, sd_loss = step1(state, jnp.asarray(x), jnp.asarray(y), 1e-3,
                              jax.random.PRNGKey(0))

    # data-parallel step over the 8-device mesh
    dp_step = make_dp_train_step(model, loss_fn, tx, mesh, donate=False)
    dstate = replicate_state(state, mesh)
    xb = shard_batch(mesh, jnp.asarray(x))
    yb = shard_batch(mesh, jnp.asarray(y))
    dp_state, dp_loss = dp_step(dstate, xb, yb, 1e-3, jax.random.PRNGKey(0))

    assert float(dp_loss) == pytest.approx(float(sd_loss), rel=1e-5)
    a = jax.tree_util.tree_leaves(sd_state.params)[0]
    b = jax.tree_util.tree_leaves(dp_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_batch_sharding_layout(mesh):
    x = jnp.zeros((8, 4, 4, 4, 2))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 4, 4, 4, 2)
