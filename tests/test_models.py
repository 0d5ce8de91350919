"""Model zoo smoke + behavior tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.config import get_default_params
from fcd_tpu.models.factory import count_params, get_model, init_model

TINY = dict(patch_size=32, feature_size=4, project_size=8, chans_in=2,
            chans_out=2, use_amp=False)

# heavy zoo members run in the slow tier; the fast tier keeps one
# representative per architecture family (resnet, DSA, VAE, PS-decoder)
_SLOW = pytest.mark.slow
MODELS_READY = [
    pytest.param("MS_DSA_NET", marks=_SLOW),
    "MS_DSA_NET_PS",
    "BASEUNET",
    "SEGRESNET",
    "SEGRESNETVAE",
    "SEGRESNET_DSA",
    "SEGRESNETVAE_DSA",
    pytest.param("UNETRPP", marks=_SLOW),
    pytest.param("UNET", marks=_SLOW),
    pytest.param("VNET", marks=_SLOW),
    pytest.param("UNETR", marks=_SLOW),
    pytest.param("SWINUNETR", marks=_SLOW),
]


def _build(model_type, **over):
    params = get_default_params()
    params.update(TINY)
    params.update(model_type=model_type, **over)
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    return model, variables, params


@pytest.mark.parametrize("model_type", MODELS_READY)
def test_forward_shapes_and_train_mode(model_type):
    model, variables, params = _build(model_type)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 32, 2), jnp.float32)
    out = model.apply(variables, x, train=False)
    if params["model_returns_vaeloss"]:
        out, aux = out
        assert aux is None
    assert out.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()

    res, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    if params["model_returns_vaeloss"]:
        logits, vae_loss = res
        assert np.isfinite(float(vae_loss)) and float(vae_loss) > 0
    else:
        logits = res
    assert logits.shape == (1, 32, 32, 32, 2)


@pytest.mark.parametrize("sa_type", ["parallel", "serial", "spatial", "channel"])
def test_dsa_sa_type_variants(sa_type):
    model, variables, params = _build("MS_DSA_NET", sa_type=sa_type)
    x = jnp.ones((1, 32, 32, 32, 2))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)


def test_segresnet_upsample_modes():
    for mode in ["pixelshuffle", "deconv", "nontrainable"]:
        model, variables, params = _build("SEGRESNET", segresnet_upsample_mode=mode)
        x = jnp.ones((1, 32, 32, 32, 2))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 32, 32, 32, 2), mode


def test_segresnet_deeper():
    model, variables, params = _build("SEGRESNET_DSA", segresnet_deeper=True)
    x = jnp.ones((1, 32, 32, 32, 2))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)


def test_param_count_scales_with_feature_size():
    _, v1, _ = _build("BASEUNET", feature_size=4)
    _, v2, _ = _build("BASEUNET", feature_size=8)
    assert count_params(v2) > 3 * count_params(v1)


def test_dropout_is_stochastic_in_train():
    model, variables, params = _build("MS_DSA_NET")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 32, 2), jnp.float32)
    o1, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
    o2, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # eval is deterministic
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
