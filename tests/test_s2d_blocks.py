"""s2d-resident block execution: parity with the standard path (CPU,
Pallas interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcd_tpu.ops.blocks import UnetResBlock, UnetrUpBlock
from fcd_tpu.ops.s2d_ops import (
    conv1x1_s2d,
    from_s2d,
    instance_norm_s2d,
    max_pool_2x_s2d_exit,
    reinterleave_to_padded,
    to_s2d,
    upsample2x_into_s2d,
)
from fcd_tpu.kernels.block_conv import space_to_depth


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8, 4), jnp.float32)
    np.testing.assert_array_equal(np.asarray(from_s2d(to_s2d(x), 4)), np.asarray(x))


def test_reinterleave_matches_pad_then_s2d():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 8, 4), jnp.float32)
    xs = to_s2d(x)
    got = reinterleave_to_padded(xs, 4)
    want = space_to_depth(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_instance_norm_s2d_matches_dense():
    x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 8, 4) * 5 + 3, jnp.float32)
    xs = to_s2d(x)
    got = from_s2d(instance_norm_s2d(xs, 4), 4)
    mean = np.asarray(x).mean(axis=(1, 2, 3), keepdims=True)
    var = np.asarray(x).var(axis=(1, 2, 3), keepdims=True)
    want = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conv1x1_s2d_matches_dense():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.rand(4, 6), jnp.float32)
    got = from_s2d(conv1x1_s2d(to_s2d(x), w), 6)
    want = np.einsum("bdhwc,ck->bdhwk", np.asarray(x), np.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_maxpool_s2d_exit_matches_dense():
    x = jnp.asarray(np.random.RandomState(4).rand(1, 8, 8, 8, 4), jnp.float32)
    from flax import linen as nn

    want = nn.max_pool(x, (2, 2, 2), (2, 2, 2))
    got = max_pool_2x_s2d_exit(to_s2d(x), 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_upsample2x_into_s2d_matches_conv_transpose():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 4, 4, 4, 6), jnp.float32)
    w = jnp.asarray(rng.rand(2, 2, 2, 6, 3).astype(np.float32))
    want = jax.lax.conv_transpose(
        x, w, (2, 2, 2), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    got = from_s2d(upsample2x_into_s2d(x, w), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_upsample2x_s2d_to_s2d_matches_dense_entry():
    from fcd_tpu.ops.s2d_ops import upsample2x_s2d_to_s2d

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 4, 6, 4, 5).astype(np.float32))
    w = jnp.asarray(rng.rand(2, 2, 2, 5, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(3).astype(np.float32))
    want = upsample2x_into_s2d(x, w, b)
    got = upsample2x_s2d_to_s2d(to_s2d(x), 5, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_resblock_s2d_path_matches_standard():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 16).astype(np.float32))
    block = UnetResBlock(out_channels=16, dtype=None)
    v = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = np.asarray(block.apply(v, x, train=False))
    got = np.asarray(
        block.apply(v, train=False, s2d_parts=[(to_s2d(x), 16)])
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


@pytest.mark.slow
def test_resblock_conv8_train_pair_matches_composed():
    """The differentiable half-offset pair (FCD_CONV8_TRAIN) must match the
    padded-27 composed path in value and gradients (both run bf16; per-
    element max deviations are bf16 jitter, so compare relative L2)."""
    import os

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 16).astype(np.float32))
    block = UnetResBlock(out_channels=16, dtype=None)
    v = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(variables, xin, pair):
        os.environ["FCD_CONV8_TRAIN"] = "1" if pair else "0"
        # isolate the conv-pair formulation: the fused train finale is a
        # further (independently rounded) formulation whose own parity is
        # owned by test_finale_train; stacking both drifts here would
        # compare two rounding changes at once
        os.environ["FCD_FINALE_TRAIN"] = "0"
        out = block.apply(variables, train=True,
                          s2d_parts=[(to_s2d(xin), 16)])
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    try:
        v0, (g0v, g0x) = jax.value_and_grad(loss, argnums=(0, 1))(v, x, False)
        v1, (g1v, g1x) = jax.value_and_grad(loss, argnums=(0, 1))(v, x, True)
    finally:
        os.environ.pop("FCD_CONV8_TRAIN", None)
        os.environ.pop("FCD_FINALE_TRAIN", None)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    assert abs(float(v1) - float(v0)) < 0.02 * abs(float(v0)) + 1e-3
    assert rel(g1x, g0x) < 0.03
    for l0, l1 in zip(jax.tree_util.tree_leaves(g0v),
                      jax.tree_util.tree_leaves(g1v)):
        assert rel(l1, l0) < 0.03


def test_resblock_s2d_cat_parts_match_standard_cat():
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.rand(1, 16, 16, 16, 16).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 16, 16, 16, 16).astype(np.float32))
    cat = jnp.concatenate([a, b], axis=-1)
    block = UnetResBlock(out_channels=16, dtype=None)
    v = block.init({"params": jax.random.PRNGKey(1)}, cat, train=False)
    want = np.asarray(block.apply(v, cat, train=False))
    got = np.asarray(
        block.apply(v, train=False, s2d_parts=[(to_s2d(a), 16), (to_s2d(b), 16)])
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def test_s2d_path_disabled_on_cpu():
    # eligibility must be False on the CPU test backend
    from fcd_tpu.ops.blocks import _s2d_block_eligible

    assert not _s2d_block_eligible((128, 128, 128), 16, 16, 3, 1, "instance",
                                   ("leakyrelu", {"negative_slope": 0.01}),
                                   jnp.bfloat16)


@pytest.mark.parametrize("fuse", ["cat", "sum", "cross"])
def test_dsa_up_block_variants(fuse):
    from fcd_tpu.ops.blocks import DsaUpBlock

    m = DsaUpBlock(out_channels=8, input_size=8 ** 3, fuse=fuse, proj_size=4,
                   drop_rate=0.1)
    x = jnp.ones((1, 4, 4, 4, 16))
    skip = jnp.ones((1, 8, 8, 8, 8))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, skip, train=False)
    y = m.apply(v, x, skip, train=False)
    assert y.shape == (1, 8, 8, 8, 8)


@pytest.mark.slow
def test_ms_dsa_net_s2d_residency_matches_standard(monkeypatch):
    """Force s2d eligibility on CPU (interpret kernels) and check the fully
    s2d-wired MS_DSA_NET matches the standard path."""
    import fcd_tpu.ops.blocks as blocks_mod
    from fcd_tpu.models.ms_dsa_net import MS_DSA_NET

    model = MS_DSA_NET(out_channels=2, img_size=(32, 32, 32), feature_size=8,
                       project_size=8, dropout_rate=0.0, dtype=None)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 32, 2), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = np.asarray(model.apply(v, x, train=False))

    def permissive(dims, cin, cout, k, s, norm, act, dtype,
                   part_channels=None, **kw):
        from fcd_tpu.ops.s2d_ops import s2d_supported

        parts = list(part_channels) if part_channels is not None else [cin]
        return (k == 3 and s == 1 and norm == "instance"
                and all(s2d_supported(dims, c, cout) for c in parts))

    monkeypatch.setattr(blocks_mod, "_s2d_block_eligible", permissive)
    got = np.asarray(model.apply(v, x, train=False))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.06 * scale)


def test_conv3x3_s2d_gradients_match_reference():
    from fcd_tpu.kernels.block_conv import reference_conv3x3
    from fcd_tpu.ops.s2d_ops import conv3x3_s2d

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 8, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 16, 16), jnp.float32) * 0.1
    t = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8, 16), jnp.float32)

    def loss_s2d(x, w):
        return jnp.sum(from_s2d(conv3x3_s2d(to_s2d(x), w, jnp.float32), 16) * t)

    def loss_ref(x, w):
        return jnp.sum(reference_conv3x3(x, w) * t)

    gx_f, gw_f = jax.grad(loss_s2d, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=0.05 * float(jnp.abs(gx_r).max()))
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               atol=0.05 * float(jnp.abs(gw_r).max()))


def test_ms_dsa_net_s2d_input_matches_dense_input():
    from fcd_tpu.models.ms_dsa_net import MS_DSA_NET

    model = MS_DSA_NET(out_channels=2, img_size=(32, 32, 32), feature_size=8,
                       project_size=8, dropout_rate=0.0, dtype=None)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 32, 2), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = np.asarray(model.apply(v, x, train=False))
    got = np.asarray(model.apply(v, to_s2d(x), train=False, x_is_s2d=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segresnet_resblock_s2d_matches_standard(monkeypatch):
    import fcd_tpu.models.segresnet as seg_mod
    from fcd_tpu.models.segresnet import ResBlock

    block = ResBlock(channels=16, norm="instance", act=("relu", {}), dtype=None)
    x = jnp.asarray(np.random.RandomState(8).rand(1, 16, 16, 16, 16), jnp.float32)
    v = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = np.asarray(block.apply(v, x, train=False))

    import fcd_tpu.ops.blocks as blocks_mod

    def permissive(dims, cin, cout, k, s, norm, act, dtype,
                   part_channels=None, **kw):
        from fcd_tpu.ops.s2d_ops import s2d_supported

        parts = list(part_channels) if part_channels is not None else [cin]
        return (k == 3 and s == 1 and norm == "instance"
                and all(s2d_supported(dims, c, cout) for c in parts))

    monkeypatch.setattr(blocks_mod, "_s2d_block_eligible", permissive)
    got = np.asarray(block.apply(v, x, train=False))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def _permissive_any_norm(dims, cin, cout, k, s, norm, act, dtype,
                         part_channels=None, **kw):
    from fcd_tpu.ops.s2d_ops import s2d_supported

    parts = list(part_channels) if part_channels is not None else [cin]
    return (k == 3 and s == 1 and norm in ("instance", "batch")
            and all(s2d_supported(dims, c, cout) for c in parts))


def test_batchnorm_s2d_matches_dense_train_and_eval():
    from fcd_tpu.ops.layers import BatchNorm

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 8, 8, 8, 4) * 3 - 1, jnp.float32)
    bn_train = BatchNorm(use_running_average=False)
    v = bn_train.init({"params": jax.random.PRNGKey(0)}, x)

    want, vars_dense = bn_train.apply(v, x, mutable=["batch_stats"])
    got_s2d, vars_s2d = bn_train.apply(v, to_s2d(x), s2d_channels=4,
                                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(from_s2d(got_s2d, 4)),
                               np.asarray(want), atol=1e-5)
    # running stats must update identically through either layout
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(vars_s2d["batch_stats"][k]),
            np.asarray(vars_dense["batch_stats"][k]), atol=1e-6)

    # eval mode: scale/shift with stored stats
    v_eval = {"params": v["params"], "batch_stats": vars_dense["batch_stats"]}
    bn_eval = BatchNorm(use_running_average=True)
    want_e = bn_eval.apply(v_eval, x)
    got_e = from_s2d(bn_eval.apply(v_eval, to_s2d(x), s2d_channels=4), 4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e), atol=1e-5)


def test_resblock_batchnorm_s2d_path_matches_standard():
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 16).astype(np.float32))
    block = UnetResBlock(out_channels=16, norm_name="batch", dtype=None)
    v = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    want = np.asarray(block.apply(v, x, train=False))
    got = np.asarray(
        block.apply(v, train=False, s2d_parts=[(to_s2d(x), 16)])
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)

    # train mode: batch_stats must update identically
    _, m_dense = block.apply(v, x, train=True, mutable=["batch_stats"])
    _, m_s2d = block.apply(v, train=True, s2d_parts=[(to_s2d(x), 16)],
                           mutable=["batch_stats"])
    d_flat = jax.tree_util.tree_leaves(m_dense["batch_stats"])
    s_flat = jax.tree_util.tree_leaves(m_s2d["batch_stats"])
    assert len(d_flat) == len(s_flat) == 4
    for a, b in zip(d_flat, s_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_transformer_conv_branch_s2d_matches_standard(monkeypatch):
    from fcd_tpu.ops.attention import TransformerBlock
    import fcd_tpu.ops.blocks as blocks_mod
    import fcd_tpu.ops.attention as attn_mod

    m = TransformerBlock(input_size=16 ** 3, hidden_size=16, proj_size=8,
                         dropout_rate=0.0, dtype=None)
    x = jnp.asarray(np.random.RandomState(11).rand(1, 16, 16, 16, 16),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    want = np.asarray(m.apply(v, x, train=False))
    monkeypatch.setattr(blocks_mod, "_s2d_block_eligible", _permissive_any_norm)
    got = np.asarray(m.apply(v, x, train=False))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


@pytest.mark.parametrize("form", ["padded27", "aligned", "8tap"])
def test_conv3x3_s2d_forms_match_reference(form, monkeypatch):
    from fcd_tpu.kernels.block_conv import reference_conv3x3
    from fcd_tpu.ops.s2d_ops import conv3x3_s2d

    monkeypatch.setenv("FCD_S2D_CONV", form)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 16, 8).astype(np.float32) * 0.2)
    got = np.asarray(from_s2d(conv3x3_s2d(to_s2d(x), w, jnp.float32), 8))
    want = np.asarray(reference_conv3x3(x, w))
    np.testing.assert_allclose(got, want, atol=0.02 * np.abs(want).max())


def _composed_resblock_ref(x, w1, w2, wres, slope=0.01):
    """f32 oracle: conv-inorm-act -> conv-inorm (+ inorm'd 1x1 residual) -> act."""
    from fcd_tpu.kernels.block_conv import reference_conv3x3

    def inorm(y):
        m = y.mean(axis=(1, 2, 3), keepdims=True)
        v = y.var(axis=(1, 2, 3), keepdims=True)
        return (y - m) / np.sqrt(v + 1e-5)

    def act(y):
        return jnp.where(y >= 0, y, slope * y)

    t = act(inorm(jnp.asarray(reference_conv3x3(x, w1), jnp.float32)))
    y2 = inorm(jnp.asarray(reference_conv3x3(t, w2), jnp.float32))
    if wres is not None:
        r = inorm(jnp.einsum("bdhwc,co->bdhwo", x, wres).astype(jnp.float32))
    else:
        r = x
    return act(y2 + r)


@pytest.mark.parametrize("conv8", ["1", "0"])
@pytest.mark.parametrize(
    "shape,cin", [((8, 8, 8), 16), ((8, 16, 24), 16), ((8, 8, 8), 2)]
)
def test_fused_resblock_eval_matches_composed(monkeypatch, conv8, shape, cin):
    """Both kernel-fused eval forms (8-tap half-offset pair and 27-tap) match
    the composed f32 reference at bf16 tolerance, incl. non-cubic shapes and
    the lane-padded stem (cin=2)."""
    from fcd_tpu.ops.s2d_ops import fused_resblock_eval

    monkeypatch.setenv("FCD_CONV8", conv8)
    rng = np.random.RandomState(11)
    oc = 16
    d, h, w = shape
    x = jnp.asarray(rng.rand(1, d, h, w, cin).astype(np.float32)) - 0.5
    w1 = jnp.asarray(rng.rand(3, 3, 3, cin, oc).astype(np.float32)) * 0.4 - 0.2
    w2 = jnp.asarray(rng.rand(3, 3, 3, oc, oc).astype(np.float32)) * 0.4 - 0.2
    wres = jnp.asarray(rng.rand(cin, oc).astype(np.float32)) * 0.4 - 0.2
    want = np.asarray(_composed_resblock_ref(x, w1, w2, wres))
    got = np.asarray(from_s2d(
        fused_resblock_eval([(to_s2d(x), cin)], w1, w2, wres, oc, 0.01,
                            out_dtype=jnp.float32), oc))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def test_fused_resblock_eval_cat_parts(monkeypatch):
    from fcd_tpu.ops.s2d_ops import fused_resblock_eval

    monkeypatch.setenv("FCD_CONV8", "1")
    rng = np.random.RandomState(12)
    oc = 16
    a = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    b = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    w1 = jnp.asarray(rng.rand(3, 3, 3, 32, oc).astype(np.float32)) * 0.4 - 0.2
    w2 = jnp.asarray(rng.rand(3, 3, 3, oc, oc).astype(np.float32)) * 0.4 - 0.2
    wres = jnp.asarray(rng.rand(32, oc).astype(np.float32)) * 0.4 - 0.2
    want = np.asarray(
        _composed_resblock_ref(jnp.concatenate([a, b], -1), w1, w2, wres))
    got = np.asarray(from_s2d(
        fused_resblock_eval([(to_s2d(a), 16), (to_s2d(b), 16)], w1, w2, wres,
                            oc, 0.01, out_dtype=jnp.float32), oc))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def test_fused_resblock_eval_with_head(monkeypatch):
    """Head-fused finale (one Pallas pass: norm2 + residual norm + add +
    act + 1x1 head) matches the composed reference + separate head."""
    from fcd_tpu.ops.s2d_ops import fused_resblock_eval

    monkeypatch.setenv("FCD_CONV8", "1")
    rng = np.random.RandomState(21)
    oc, out_ch = 16, 2
    a = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    b = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    w1 = jnp.asarray(rng.rand(3, 3, 3, 32, oc).astype(np.float32)) * 0.4 - 0.2
    w2 = jnp.asarray(rng.rand(3, 3, 3, oc, oc).astype(np.float32)) * 0.4 - 0.2
    wres = jnp.asarray(rng.rand(32, oc).astype(np.float32)) * 0.4 - 0.2
    wh = jnp.asarray(rng.rand(oc, out_ch).astype(np.float32)) * 0.4 - 0.2
    bh = jnp.asarray(rng.rand(out_ch).astype(np.float32)) * 0.1
    feats = np.asarray(
        _composed_resblock_ref(jnp.concatenate([a, b], -1), w1, w2, wres))
    want = np.asarray(jnp.einsum("bdhwc,co->bdhwo", feats, wh) + bh)
    got = np.asarray(from_s2d(
        fused_resblock_eval([(to_s2d(a), 16), (to_s2d(b), 16)], w1, w2, wres,
                            oc, 0.01, out_dtype=jnp.float32,
                            head=(wh, bh)), out_ch))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def test_blocked_conv_8tap_pair_matches_reference_conv():
    """a2o then o2a (identity prologue) == two chained 3x3x3 'same' convs."""
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o,
        blocked_conv_o2a,
        make_blocked_weights_8tap,
        reference_conv3x3,
    )

    rng = np.random.RandomState(13)
    c = 16
    x = jnp.asarray(rng.rand(1, 8, 12, 16, c).astype(np.float32)) - 0.5
    wa = jnp.asarray(rng.rand(3, 3, 3, c, c).astype(np.float32)) * 0.4 - 0.2
    wb = jnp.asarray(rng.rand(3, 3, 3, c, c).astype(np.float32)) * 0.4 - 0.2
    y1 = blocked_conv_a2o(
        to_s2d(x).astype(jnp.bfloat16),
        make_blocked_weights_8tap(wa).astype(jnp.bfloat16),
        out_dtype=jnp.float32, interpret=True)[0]
    y2 = blocked_conv_o2a(
        y1.astype(jnp.bfloat16),
        make_blocked_weights_8tap(wb).astype(jnp.bfloat16),
        x.shape[3] // 2, out_dtype=jnp.float32, interpret=True)[0]
    got = np.asarray(from_s2d(y2, c))
    want = np.asarray(reference_conv3x3(
        jnp.asarray(reference_conv3x3(x, wa), jnp.float32), wb))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)


def test_pad_chain_parity(monkeypatch):
    """Padded-chain convention (FCD_PAD_CHAIN): padded parts + emit_pad
    reproduce the unpadded fused block exactly, with zero depth edges."""
    from fcd_tpu.ops.s2d_ops import fused_resblock_eval

    monkeypatch.setenv("FCD_CONV8", "1")
    rng = np.random.RandomState(31)
    oc = 16
    a = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    b = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32)) - 0.5
    w1 = jnp.asarray(rng.rand(3, 3, 3, 32, oc).astype(np.float32)) * 0.4 - 0.2
    w2 = jnp.asarray(rng.rand(3, 3, 3, oc, oc).astype(np.float32)) * 0.4 - 0.2
    wres = jnp.asarray(rng.rand(32, oc).astype(np.float32)) * 0.4 - 0.2
    ref = np.asarray(
        fused_resblock_eval([(to_s2d(a), 16), (to_s2d(b), 16)], w1, w2,
                            wres, oc, 0.01, out_dtype=jnp.float32))
    dp = ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0))
    ap = jnp.pad(to_s2d(a), dp)
    bp = jnp.pad(to_s2d(b), dp)
    got = np.asarray(
        fused_resblock_eval([(ap, 16, True), (bp, 16, True)], w1, w2,
                            wres, oc, 0.01, out_dtype=jnp.float32,
                            emit_pad=True))
    assert got.shape[1] == ref.shape[1] + 2
    np.testing.assert_array_equal(got[:, 0], 0.0)
    np.testing.assert_array_equal(got[:, -1], 0.0)
    np.testing.assert_allclose(got[:, 1:-1], ref, rtol=0, atol=0)
    # mixed padded/unpadded parts
    got2 = np.asarray(
        fused_resblock_eval([(ap, 16, True), (to_s2d(b), 16)], w1, w2,
                            wres, oc, 0.01, out_dtype=jnp.float32))
    np.testing.assert_allclose(got2, ref, rtol=0, atol=0)


def test_pad_chain_model_parity(monkeypatch):
    """MS_DSA_NET eval output is identical with the padded chain on/off."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model, init_model

    params = get_default_params()
    params.update(patch_size=32, feature_size=4, project_size=8,
                  chans_in=2, chans_out=2, use_amp=False,
                  model_type="MS_DSA_NET")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 32, 32, 32, 2),
                    jnp.float32)
    # isolate the pad chain: the finale+pool kernel (its own parity test)
    # differs from the XLA finale by fma rounding
    monkeypatch.setenv("FCD_FINALE_POOL", "0")
    monkeypatch.setenv("FCD_PAD_CHAIN", "0")
    ref = np.asarray(model.apply(variables, x, train=False))
    monkeypatch.setenv("FCD_PAD_CHAIN", "1")
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_pool_exit_pad_parity():
    from fcd_tpu.ops.s2d_ops import (
        max_pool_2x_s2d_exit,
        max_pool_2x_s2d_exit_pad,
    )

    rng = np.random.RandomState(32)
    xs = jnp.asarray(rng.randn(2, 4, 4, 4, 8 * 16).astype(np.float32))
    xsp = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    ref = np.asarray(max_pool_2x_s2d_exit(xs, 16))
    got = np.asarray(max_pool_2x_s2d_exit_pad(xsp, 16))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_conv8_a2o_stats_prepadded_primal():
    """Forward-only (no value_and_grad) call of the conv8_a2o_stats
    custom_vjp with a pre-padded part matches the unpadded call: the
    PRIMAL must honor pre_padded exactly like the fwd rule (regression
    for the primal dropping the flag — wrong output depth D+3 vs D+1
    on any non-differentiated call, e.g. validation loss without grad)."""
    from fcd_tpu.ops.s2d_ops import conv8_a2o_stats

    rng = np.random.RandomState(7)
    c = 16
    x = jnp.asarray(rng.rand(1, 6, 8, 8, 8 * c).astype(np.float32) - 0.5)
    w = jnp.asarray(rng.rand(3, 3, 3, c, c).astype(np.float32) * 0.4 - 0.2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

    ref_y, ref_s1, ref_s2 = conv8_a2o_stats(
        (x.astype(jnp.bfloat16),), (w,))
    y, s1, s2 = conv8_a2o_stats(
        (xp.astype(jnp.bfloat16),), (w,), jnp.bfloat16, (True,))
    assert y.shape == ref_y.shape, (y.shape, ref_y.shape)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_s1),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2),
                               rtol=0, atol=0)


def test_conv8_prologue_grad_parity(monkeypatch):
    """conv8_o2a_act_stats (norm1+act fused into conv2's prologue, custom
    VJP) matches the composed instance_norm_act_offset + conv8_o2a_stats
    path in value and grads at bf16 tolerance."""
    from fcd_tpu.ops.s2d_ops import (
        conv8_a2o_stats,
        conv8_o2a_act_stats,
        conv8_o2a_stats,
        instance_norm_act_offset,
        instance_norm_s2d,
    )

    rng = np.random.RandomState(41)
    c = 16
    d2 = h2 = w2 = 8
    x = jnp.asarray(rng.rand(2, d2, h2, w2, 8 * c).astype(np.float32) - 0.5)
    w1 = jnp.asarray(rng.rand(3, 3, 3, c, c).astype(np.float32) * 0.4 - 0.2)
    w2k = jnp.asarray(rng.rand(3, 3, 3, c, c).astype(np.float32) * 0.4 - 0.2)
    slope = 0.01

    def fused(x_, w1_, w2_):
        y1o, s1, s2 = conv8_a2o_stats((x_.astype(jnp.bfloat16),), (w1_,))
        ys, o1, o2 = conv8_o2a_act_stats(y1o, s1, s2, w2_, w2, slope)
        out = instance_norm_s2d(ys, c, stats=(o1, o2))
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def composed(x_, w1_, w2_):
        y1o, s1, s2 = conv8_a2o_stats((x_.astype(jnp.bfloat16),), (w1_,))
        y1o = instance_norm_act_offset(y1o, c, d2 * h2 * w2 * 8, slope,
                                       h2, w2, stats=(s1, s2))
        ys, o1, o2 = conv8_o2a_stats(y1o, w2_, w2)
        out = instance_norm_s2d(ys, c, stats=(o1, o2))
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(x, w1, w2k)
    v_c, g_c = jax.value_and_grad(composed, argnums=(0, 1, 2))(x, w1, w2k)
    assert abs(float(v_f) - float(v_c)) < 2e-2 * (abs(float(v_c)) + 1)
    for a, r in zip(g_f, g_c):
        a, r = np.asarray(a, np.float64), np.asarray(r, np.float64)
        rel = np.linalg.norm(a - r) / (np.linalg.norm(r) + 1e-9)
        assert rel < 2e-2, rel


def test_pad_chain_train_grad_parity(monkeypatch):
    """Training grads through MS_DSA_NET are identical with the padded
    chain on/off (the conv kernels see the same interior rows; padded
    cotangents' edge rows are discarded by the producer pads' VJPs)."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model, init_model

    params = get_default_params()
    params.update(patch_size=32, feature_size=4, project_size=8,
                  chans_in=2, chans_out=2, use_amp=False,
                  model_type="MS_DSA_NET")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    x = jnp.asarray(np.random.RandomState(6).rand(1, 32, 32, 32, 2),
                    jnp.float32)

    def loss(v, flag):
        monkeypatch.setenv("FCD_PAD_CHAIN", flag)
        out, _ = model.apply(
            v, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    v0, g0 = jax.value_and_grad(lambda v: loss(v, "0"))(variables)
    v1, g1 = jax.value_and_grad(lambda v: loss(v, "1"))(variables)
    assert float(v0) == float(v1), (float(v0), float(v1))
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, r in zip(flat1, flat0):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(r, np.float64),
                                   rtol=0, atol=0)


def test_pool_exit_pad_grad_parity():
    from fcd_tpu.ops.s2d_ops import (
        max_pool_2x_s2d_exit,
        max_pool_2x_s2d_exit_pad,
    )

    rng = np.random.RandomState(33)
    xs = jnp.asarray(rng.randn(1, 4, 4, 4, 8 * 16).astype(np.float32))
    xsp = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

    def f_ref(x):
        return jnp.sum(jnp.sin(max_pool_2x_s2d_exit(x, 16)))

    def f_pad(xp):
        return jnp.sum(jnp.sin(max_pool_2x_s2d_exit_pad(xp, 16)))

    g_ref = np.asarray(jax.grad(f_ref)(xs))
    g_pad = np.asarray(jax.grad(f_pad)(xsp))
    np.testing.assert_array_equal(g_pad[:, 0], 0.0)
    np.testing.assert_array_equal(g_pad[:, -1], 0.0)
    np.testing.assert_allclose(g_pad[:, 1:-1], g_ref, rtol=0, atol=0)


def test_finale_pool_parity(monkeypatch):
    """The fused finale+pad+pool kernel (FCD_FINALE_POOL) reproduces the
    separate finale + pool exactly, and the model output is unchanged."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.ops.s2d_ops import fused_resblock_eval, max_pool_2x_s2d_exit

    monkeypatch.setenv("FCD_CONV8", "1")
    rng = np.random.RandomState(51)
    oc = 16
    a = jnp.asarray(rng.rand(1, 8, 8, 8, 8).astype(np.float32)) - 0.5
    w1 = jnp.asarray(rng.rand(3, 3, 3, 8, oc).astype(np.float32)) * 0.4 - 0.2
    w2 = jnp.asarray(rng.rand(3, 3, 3, oc, oc).astype(np.float32)) * 0.4 - 0.2
    wres = jnp.asarray(rng.rand(8, oc).astype(np.float32)) * 0.4 - 0.2
    ref = fused_resblock_eval([(to_s2d(a), 8)], w1, w2, wres, oc, 0.01,
                              out_dtype=jnp.bfloat16, emit_pad=True)
    ref_pool = max_pool_2x_s2d_exit(ref[:, 1:-1], oc)
    got, got_pool = fused_resblock_eval(
        [(to_s2d(a), 8)], w1, w2, wres, oc, 0.01, out_dtype=jnp.bfloat16,
        emit_pad=True, emit_pool=True)
    # bf16-ulp tolerance: the interpret-mode kernel and the XLA CPU
    # fusion contract the same f32 expression with different fma rounding
    scale = np.abs(np.asarray(ref, np.float32)).max()
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=0.01 * scale)
    np.testing.assert_allclose(np.asarray(got_pool, np.float32),
                               np.asarray(ref_pool, np.float32),
                               rtol=0, atol=0.01 * scale)

    # model-level: FCD_FINALE_POOL off == on
    params = get_default_params()
    params.update(patch_size=32, feature_size=4, project_size=8,
                  chans_in=2, chans_out=2, use_amp=False,
                  model_type="MS_DSA_NET")
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    x = jnp.asarray(np.random.RandomState(8).rand(1, 32, 32, 32, 2),
                    jnp.float32)
    monkeypatch.setenv("FCD_FINALE_POOL", "0")
    r0 = np.asarray(model.apply(variables, x, train=False))
    monkeypatch.setenv("FCD_FINALE_POOL", "1")
    r1 = np.asarray(model.apply(variables, x, train=False))
    scale = np.abs(r0).max()
    np.testing.assert_allclose(r1, r0, rtol=0, atol=0.02 * scale)
