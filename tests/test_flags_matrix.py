"""Both-settings parity for the performance gates (fcd_tpu/flags.py).

Every LIVE gate changes a formulation, never semantics: flipping it must
reproduce the default path's numerics. The dead-end gates each have their
own parity tests next to the kernels; this file covers the live gates
that previously had no coverage at their non-default setting, in
interpret mode on CPU (validating the indexing/math of both forms — the
Mosaic lowering is exercised by the hardware benches).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fcd_tpu import flags


def test_registry_covers_every_gate_in_tree():
    """Every FCD_* read in the package goes through the registry (so the
    knob table is complete by construction)."""
    import pathlib
    import re

    root = pathlib.Path(flags.__file__).parent
    pat = re.compile(r"environ\.get\(\"(FCD_[A-Z0-9_]+)\"")
    offenders = []
    for p in root.rglob("*.py"):
        if p.name == "flags.py":
            continue
        for m in pat.finditer(p.read_text()):
            offenders.append((str(p), m.group(1)))
    assert not offenders, f"raw env reads bypass the registry: {offenders}"
    # and the registry documents a default + description for each gate
    for name, f in flags.FLAGS.items():
        assert name.startswith("FCD_")
        assert f.desc


def _a2o_case():
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o,
        make_blocked_weights_8tap,
    )

    rng = np.random.RandomState(0)
    c = 16
    xs = jnp.asarray(rng.randn(1, 8, 8, 8, 8 * c).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, c, c).astype(np.float32) * 0.1)
    wblk = make_blocked_weights_8tap(w).astype(jnp.bfloat16)
    return xs, wblk


@pytest.mark.parametrize("gate,value", [
    ("FCD_CONV8_VPAIR", "0"),
    ("FCD_CONV8_KD", "0"),
    ("FCD_A2O_PAD", "pad"),
])
def test_a2o_gate_off_parity(monkeypatch, gate, value):
    from fcd_tpu.kernels.block_conv import blocked_conv_a2o

    xs, wblk = _a2o_case()
    ref = blocked_conv_a2o(xs, wblk, want_stats=True, interpret=True)
    monkeypatch.setenv(gate, value)
    got = blocked_conv_a2o(xs, wblk, want_stats=True, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-2, atol=1e-3)


def test_pool_fwd_kernel_off_parity(monkeypatch):
    from fcd_tpu.ops.s2d_ops import max_pool_2x_s2d_exit

    rng = np.random.RandomState(1)
    c = 16
    xs = jnp.asarray(rng.randn(1, 4, 4, 4, 8 * c), jnp.float32)
    ref = np.asarray(max_pool_2x_s2d_exit(xs, c))
    monkeypatch.setenv("FCD_POOL_FWD_KERNEL", "0")
    got = np.asarray(max_pool_2x_s2d_exit(xs, c))
    np.testing.assert_array_equal(got, ref)


def test_conv8_stats_gate_train_parity(monkeypatch):
    """FCD_CONV8_STATS=0 (XLA reductions instead of kernel-emitted norm
    stats) reproduces the training loss and gradients."""
    from fcd_tpu.ops.blocks import UnetResBlock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4), jnp.float32)
    block = UnetResBlock(out_channels=4, kernel_size=3, stride=1,
                         norm_name="instance")
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def loss(v, x):
        return jnp.sum(jnp.square(block.apply(v, x, train=True)))

    ref_l, ref_g = jax.value_and_grad(loss)(variables, x)
    monkeypatch.setenv("FCD_CONV8_STATS", "0")
    got_l, got_g = jax.value_and_grad(loss)(variables, x)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-4)


def test_prejit_gates_off_parity(monkeypatch):
    """FCD_IMAGE_PREJIT=0 / FCD_LABEL_PREJIT=0 (entry transforms traced
    inside the step instead of their own jits) reproduce the loss."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.losses.combined import make_combined_loss, s2d_loss_supported
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    params = get_default_params()
    params.update(model_type="MS_DSA_NET", patch_size=32, feature_size=4,
                  project_size=8, chans_in=2, chans_out=2, use_amp=False,
                  loss="DiceCELoss")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    tx = make_optimizer(params)
    loss_fn = make_combined_loss(params)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 32, 32, 32, 2), jnp.float32)
    y = jnp.asarray((rng.rand(1, 32, 32, 32, 1) > 0.8), jnp.float32)

    def one_loss():
        step = make_train_step(model, loss_fn, tx, donate=False)
        _, loss = step(create_train_state(model, variables, params), x, y,
                       1e-4, jax.random.PRNGKey(0))
        return float(loss)

    ref = one_loss()
    monkeypatch.setenv("FCD_IMAGE_PREJIT", "0")
    monkeypatch.setenv("FCD_LABEL_PREJIT", "0")
    got = one_loss()
    assert got == pytest.approx(ref, rel=1e-5)


def test_sw_dynamic_vs_static_gate(monkeypatch):
    """FCD_SW_STATIC=0 (the dynamic-grid program) reproduces the static
    pad-tree engine's blended output."""
    from fcd_tpu.infer.sliding_window import sliding_window_inference

    rng = np.random.RandomState(4)
    vol = jnp.asarray(rng.rand(12, 14, 12, 2), jnp.float32)

    def predictor(p):
        return jnp.concatenate([p * 2.0, p * -1.0], axis=-1)[..., :2]

    kw = dict(roi_size=(8, 8, 8), out_channels=2, sw_batch=2, overlap=0.25,
              blend="constant", compute_dtype=jnp.float32)
    ref = np.asarray(sliding_window_inference(vol, predictor, **kw))
    monkeypatch.setenv("FCD_SW_STATIC", "0")
    got = np.asarray(sliding_window_inference(vol, predictor, **kw))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_block_entry_s2d_conv_parity(monkeypatch):
    """'conv' and 'reshape' block-entry s2d forms are bit-identical."""
    from fcd_tpu.kernels.block_conv import space_to_depth, space_to_depth_fast

    x = jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 16, 16),
                    jnp.bfloat16)
    a = np.asarray(space_to_depth(x), np.float32)
    b = np.asarray(space_to_depth_fast(x), np.float32)
    np.testing.assert_array_equal(a, b)
