"""Fused DSA Pallas kernel: parity with the einsum formulation (CPU,
interpret mode), all four sa_types."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fcd_tpu.ops.attention as attn_mod
from fcd_tpu.ops.attention import DSA


def _randomized_variables(m, x):
    """Init then perturb temperatures/EF so parity isn't trivially identity."""
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params = jax.tree_util.tree_map(lambda a: a, v["params"])
    rng = np.random.RandomState(42)
    params = dict(params)
    params["temperature"] = jnp.asarray(
        rng.rand(*v["params"]["temperature"].shape) + 0.5, jnp.float32)
    params["temperature2"] = jnp.asarray(
        rng.rand(*v["params"]["temperature2"].shape) + 0.5, jnp.float32)
    return {"params": params}


@pytest.mark.parametrize("sa_type", ["parallel", "serial", "spatial", "channel"])
def test_dsa_fused_matches_einsum(sa_type, monkeypatch):
    B, N, C, h, P = 2, 64, 32, 4, 16
    m = DSA(input_size=N, hidden_size=C, proj_size=P, num_heads=h,
            channel_attn_drop=0.0, spatial_attn_drop=0.0, sa_type=sa_type)
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, C), jnp.float32)
    v = _randomized_variables(m, x)

    monkeypatch.setattr(attn_mod, "_fused_dsa_enabled", lambda: False)
    want = np.asarray(m.apply(v, x, train=False,
                              rngs={"dropout": jax.random.PRNGKey(2)}))
    monkeypatch.setattr(attn_mod, "_fused_dsa_enabled", lambda: True)
    got = np.asarray(m.apply(v, x, train=False,
                             rngs={"dropout": jax.random.PRNGKey(2)}))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1e-3))


def test_dsa_fused_multi_tile(monkeypatch):
    """N spanning several token tiles (grid accumulation correctness)."""
    from fcd_tpu.kernels import dsa_attention as dk

    monkeypatch.setattr(dk, "_pick_tile", lambda n: 16)
    B, N, C, h, P = 1, 128, 16, 2, 8
    m = DSA(input_size=N, hidden_size=C, proj_size=P, num_heads=h,
            channel_attn_drop=0.0, spatial_attn_drop=0.0, sa_type="parallel")
    x = jnp.asarray(np.random.RandomState(3).randn(B, N, C), jnp.float32)
    v = _randomized_variables(m, x)
    monkeypatch.setattr(attn_mod, "_fused_dsa_enabled", lambda: False)
    want = np.asarray(m.apply(v, x, train=False))
    monkeypatch.setattr(attn_mod, "_fused_dsa_enabled", lambda: True)
    got = np.asarray(m.apply(v, x, train=False))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1e-3))


def test_dsa_train_path_keeps_einsum_and_grads(monkeypatch):
    """Training must stay on the differentiable einsum path even when the
    fused gate is force-enabled."""
    monkeypatch.setattr(attn_mod, "_fused_dsa_enabled", lambda: True)
    B, N, C, h, P = 1, 32, 16, 2, 8
    m = DSA(input_size=N, hidden_size=C, proj_size=P, num_heads=h,
            channel_attn_drop=0.1, spatial_attn_drop=0.1, sa_type="parallel")
    x = jnp.asarray(np.random.RandomState(4).randn(B, N, C), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)

    def loss(p):
        y = m.apply({"params": p}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(jnp.square(y))

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


def test_dsa_v2_matches_v1_all_modes():
    """The tokens-resident (v2) einsum formulation is a reassociation of
    the per-head (v1) path — f32 forward agreement to ~1e-6."""
    import os

    import numpy as np

    from fcd_tpu.ops.attention import DSA

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
    for sa in ["parallel", "serial", "spatial", "channel"]:
        m = DSA(input_size=64, hidden_size=32, proj_size=16, num_heads=4,
                sa_type=sa, channel_attn_drop=0.0, spatial_attn_drop=0.0)
        v = m.init(jax.random.PRNGKey(0), x)
        old = os.environ.get("FCD_DSA_V2")
        try:
            os.environ["FCD_DSA_V2"] = "0"
            y1 = m.apply(v, x)
            os.environ["FCD_DSA_V2"] = "1"
            y2 = m.apply(v, x)
        finally:
            if old is None:
                os.environ.pop("FCD_DSA_V2", None)
            else:
                os.environ["FCD_DSA_V2"] = old
        assert float(jnp.max(jnp.abs(y1 - y2))) < 2e-6, sa
