"""Differentiable fused train finale (kernels/finale.py via
s2d_ops.finale_s2d_train): Pallas interpret-mode parity vs the XLA
fallback for values and every cotangent, across the pad/pool variants,
plus end-to-end block parity (FCD_FINALE_TRAIN on vs off) including
gradients.

Parity target: the reference UnetResBlock epilogue under autograd
(conv_blocks.py:362-452 norm2 + projected residual + act)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcd_tpu.ops import s2d_ops
from fcd_tpu.ops.s2d_ops import _finale_train_impl, finale_s2d_train


def _mk(b=2, d2=4, h2=4, w2=4, c=16, seed=0):
    rng = np.random.RandomState(seed)
    c8 = 8 * c
    ys = jnp.asarray(rng.randn(b, d2, h2, w2, c8).astype(np.float32)
                     ).astype(jnp.bfloat16)
    rs = jnp.asarray(rng.randn(b, d2, h2, w2, c8).astype(np.float32)
                     ).astype(jnp.bfloat16)
    s2 = jnp.asarray(rng.rand(b, c8).astype(np.float32) + 0.5)
    sh2 = jnp.asarray(rng.randn(b, c8).astype(np.float32))
    sr = jnp.asarray(rng.rand(b, c8).astype(np.float32) + 0.5)
    shr = jnp.asarray(rng.randn(b, c8).astype(np.float32))
    return ys, rs, s2, sh2, sr, shr


@pytest.mark.parametrize("emit_pad,emit_pool", [
    (False, False), (True, False), (True, True), (False, True)])
def test_pallas_matches_xla_fallback(emit_pad, emit_pool, monkeypatch):
    """Value + all six cotangents: the interpret-mode kernel vs the
    XLA reference expression (identical f32 math, exact match)."""
    c, slope = 16, 0.01
    ys, rs, s2, sh2, sr, shr = _mk(c=c)

    def run(use_pallas):
        monkeypatch.setattr(
            s2d_ops, "_finale_train_use_pallas",
            lambda *a: use_pallas)

        def f(ys_, rs_, s2_, sh2_, sr_, shr_):
            out = finale_s2d_train(ys_, rs_, s2_, sh2_, sr_, shr_,
                                   c, slope, emit_pad, emit_pool)
            tot = jnp.sum(out[0].astype(jnp.float32) ** 2)
            if emit_pool:
                tot = tot + jnp.sum(jnp.sin(out[1].astype(jnp.float32)))
            return tot

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            ys, rs, s2, sh2, sr, shr)
        fwd = _finale_train_impl(ys, rs, s2, sh2, sr, shr, c, slope,
                                 emit_pad, emit_pool)
        return val, grads, fwd

    val_p, grads_p, fwd_p = run(True)
    val_x, grads_x, fwd_x = run(False)

    for a, b in zip(fwd_p, fwd_x):
        # 1-bf16-ulp budget: XLA contracts mul+add to FMA under jit (the
        # interpret-mode kernel body) but not in the eager fallback, so a
        # preactivation landing exactly on a bf16 rounding tie can flip
        # one step. Identical math otherwise.
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2 ** -8, atol=2 ** -14)
    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-6)
    # the same FMA/bf16 rounding tie flows into the test loss's grads at
    # the tied element; ~1e-2 relative covers 1 bf16 ulp compounded once
    for gp, gx, name in zip(grads_p, grads_x,
                            ["ys", "rs", "s2", "sh2", "sr", "shr"]):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gx, np.float32),
            rtol=1e-2, atol=1e-3, err_msg=name)


def test_padded_output_edges_are_zero():
    c = 8
    ys, rs, s2, sh2, sr, shr = _mk(c=c, seed=3)
    out = finale_s2d_train(ys, rs, s2, sh2, sr, shr, c, 0.01, True, True)
    o = np.asarray(out[0], np.float32)
    assert o.shape[1] == ys.shape[1] + 2
    np.testing.assert_array_equal(o[:, 0], 0.0)
    np.testing.assert_array_equal(o[:, -1], 0.0)


def test_block_parity_fused_vs_composed(monkeypatch):
    """UnetResBlock pair branch end-to-end: FCD_FINALE_TRAIN on vs off —
    same params, close outputs AND close parameter grads (the two
    formulations differ only in bf16 rounding order)."""
    from fcd_tpu.ops.blocks import UnetResBlock
    from fcd_tpu.ops.s2d_ops import to_s2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4).astype(np.float32)
                    ).astype(jnp.bfloat16)
    xs = to_s2d(x)

    def build_and_run(flag):
        monkeypatch.setenv("FCD_FINALE_TRAIN", flag)
        blk = UnetResBlock(out_channels=16, kernel_size=3, stride=1,
                           norm_name="instance", dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(0), xs[:, 1:-1] if False else xs,
                     train=True, s2d_parts=[(xs, 4)], emit_s2d=True,
                     emit_pad=True, emit_pool=True)

        def f(params):
            out, pooled = blk.apply(
                {"params": params}, None, train=True,
                s2d_parts=[(xs, 4)], emit_s2d=True, emit_pad=True,
                emit_pool=True)
            return (jnp.sum(out.astype(jnp.float32) ** 2)
                    + jnp.sum(pooled.astype(jnp.float32) ** 2)), out

        (val, out), grads = jax.value_and_grad(f, has_aux=True)(v["params"])
        return val, out, grads, v

    val_a, out_a, grads_a, v_a = build_and_run("1")
    val_b, out_b, grads_b, v_b = build_and_run("0")

    # identical param trees across the gate
    assert (jax.tree_util.tree_structure(v_a)
            == jax.tree_util.tree_structure(v_b))
    np.testing.assert_allclose(
        np.asarray(out_a, np.float32), np.asarray(out_b, np.float32),
        rtol=0, atol=0.05)
    np.testing.assert_allclose(float(val_a), float(val_b), rtol=2e-2)
    fa = jax.tree_util.tree_leaves(grads_a)
    fb = jax.tree_util.tree_leaves(grads_b)
    for ga, gb in zip(fa, fb):
        ga = np.asarray(ga, np.float32)
        gb = np.asarray(gb, np.float32)
        denom = np.maximum(np.abs(gb).max(), 1e-3)
        assert np.abs(ga - gb).max() / denom < 0.08
