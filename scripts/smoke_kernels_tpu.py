"""Real-TPU smoke test for every Pallas kernel entry point.

Interpret mode (the CPU test tier) accepts programs Mosaic rejects — the
dw kernel's rank-3 contraction passed every interpret test and crashed
the 128^3 train step on hardware ('lhs contracting dims must be of size
1'). This script compiles + runs each kernel at representative shapes on
the real chip so lowering regressions surface before a training run does.

Usage: python scripts/smoke_kernels_tpu.py   (exits nonzero on failure)
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

FAILURES = []


def check(name, fn):
    try:
        out = fn()
        jax.tree_util.tree_map(
            lambda t: np.asarray(t).reshape(-1)[:1], out)
        print(f"ok   {name}")
    except Exception:
        FAILURES.append(name)
        print(f"FAIL {name}")
        traceback.print_exc(limit=3)


def main():
    from fcd_tpu.kernels import block_conv as bc
    from fcd_tpu.kernels.dsa_attention import dsa_fused

    rng = np.random.RandomState(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.rand(*shape).astype(np.float32) - 0.5, dtype)

    # --- 8-tap half-offset pair (the eval fast path), several widths ---
    for c8, cout8, dims in [(128, 128, (16, 16, 16)), (256, 512, (8, 8, 8)),
                            (1024, 1024, (4, 4, 4))]:
        d2, h2, w2 = dims
        xs = arr(1, d2, h2, w2, c8)
        w8 = arr(8, c8, cout8)
        name = f"a2o/o2a c8={c8}->{cout8} {dims}"

        def pair(xs=xs, w8=w8, c8=c8, cout8=cout8, w2=w2):
            y, s1, s2 = bc.blocked_conv_a2o(xs, w8, want_stats=True)
            w8b = arr(8, cout8, cout8)
            sc = jnp.ones((1, cout8), jnp.float32)
            sh = jnp.zeros((1, cout8), jnp.float32)
            return bc.blocked_conv_o2a(y, w8b, w2, in_scale=sc, in_shift=sh,
                                       neg_slope=0.01, want_stats=True)

        check(name, pair)

    # --- multi-part a2o with in-kernel residual + stats (decoder form) ---
    def multi():
        xs1, xs2 = arr(1, 8, 8, 8, 128), arr(1, 8, 8, 8, 128)
        w1, w2 = arr(8, 128, 128), arr(8, 128, 128)
        r1, r2 = arr(128, 128), arr(128, 128)
        return bc.blocked_conv_a2o_multi(
            [xs1, xs2], [w1, w2], want_stats=True,
            res_wblk_list=[r1, r2], want_res_stats=True)

    check("a2o_multi 2-part + res + stats", multi)

    # --- 27-tap aligned forms ---
    def aligned27():
        xs = arr(1, 8, 8, 8, 128)
        w = arr(3, 3, 3, 16, 16, dtype=jnp.float32)
        wblk = bc.make_blocked_weights_aligned(w).astype(jnp.bfloat16)
        return bc.blocked_conv_s2d_aligned(xs, wblk, 16, 128,
                                           jnp.bfloat16, False)

    check("blocked_conv_s2d_aligned 27-tap", aligned27)

    def fused27():
        xs = arr(1, 8, 8, 8, 128)
        w = arr(3, 3, 3, 16, 16, dtype=jnp.float32)
        wblk = bc.make_blocked_weights_aligned(w).astype(jnp.bfloat16)
        return bc.blocked_conv_s2d_fused(xs, wblk, want_stats=True,
                                         out_dtype=jnp.bfloat16,
                                         interpret=False)

    check("blocked_conv_s2d_fused 27-tap + stats", fused27)

    def padded27():
        xs = arr(1, 8, 8, 8, 128)
        w = arr(3, 3, 3, 16, 16, dtype=jnp.float32)
        wblk = bc.make_blocked_weights_aligned(w).astype(jnp.bfloat16)
        return bc.blocked_conv_s2d_padded27(xs, wblk, 16, 128,
                                            jnp.bfloat16, False)

    check("blocked_conv_s2d_padded27", padded27)

    # --- dense blocked conv (training fast path) fwd + grads ---
    def conv3x3_grads():
        x = arr(1, 16, 16, 16, 16)
        w = arr(3, 3, 3, 16, 16, dtype=jnp.float32)

        def f(x, w):
            return jnp.sum(bc.blocked_conv3x3(x, w.astype(jnp.bfloat16),
                                              jnp.bfloat16).astype(jnp.float32))

        return jax.grad(f, argnums=(0, 1))(x, w)

    check("blocked_conv3x3 fwd+dx+dw", conv3x3_grads)

    # --- dw kernel at train shapes (the regression that crashed) ---
    for dims, c8, co8 in [((8, 8, 8), 128, 128), ((16, 16, 16), 256, 256)]:
        d2, h2, w2 = dims

        def dw(d2=d2, h2=h2, w2=w2, c8=c8, co8=co8):
            xs = arr(1, d2, h2, w2, c8)
            g = arr(1, d2, h2, w2, co8)
            return bc.blocked_conv_s2d_dw(xs, g, interpret=False)

        check(f"blocked_conv_s2d_dw {dims} c8={c8}", dw)

    # --- differentiable half-offset pair: fwd + dx + dw (new dw8 kernels) ---
    def conv8_pair_grads():
        from fcd_tpu.ops.s2d_ops import (
            conv8_a2o,
            conv8_o2a,
            instance_norm_act_offset,
        )

        xs = arr(1, 16, 16, 16, 128)
        w1 = arr(3, 3, 3, 16, 16, dtype=jnp.float32)
        w2 = arr(3, 3, 3, 16, 16, dtype=jnp.float32)

        def f(xs, w1, w2):
            y = conv8_a2o((xs,), (w1,))
            y = instance_norm_act_offset(y, 16, 16 * 16 * 16 * 8, 0.01,
                                         16, 16)
            out = conv8_o2a(y, w2, 16)
            return jnp.sum(out.astype(jnp.float32))

        return jax.grad(f, argnums=(0, 1, 2))(xs, w1, w2)

    check("conv8 pair fwd+dx+dw (train path)", conv8_pair_grads)

    # --- fused DSA with the LN/pos-embed/residual prologue ---
    def dsa_ln_res():
        x = arr(1, 4096, 32)
        wqkvv = arr(4, 32, 32)
        ef = arr(4096, 64)
        temp = jnp.ones((4,), jnp.float32)
        return dsa_fused(
            x, wqkvv, ef, temp, temp, num_heads=4, sa_type="parallel",
            ln_scale=jnp.ones((32,), jnp.float32),
            ln_bias=jnp.zeros((32,), jnp.float32),
            pos_embed=arr(4096, 32, dtype=jnp.float32),
            res_gamma=jnp.full((32,), 1e-6, jnp.float32))

    check("dsa_fused ln/pe/residual prologue", dsa_ln_res)

    # --- fused finale + head ---
    def finale_head():
        y2, r = arr(1, 8, 8, 8, 128), arr(1, 8, 8, 8, 128)
        sc = jnp.ones((1, 128), jnp.float32)
        sh = jnp.zeros((1, 128), jnp.float32)
        wh = arr(128, 16)
        b8 = jnp.zeros((16,), jnp.float32)
        return bc.fused_finale_head(y2, r, sc, sh, sc, sh, wh, b8,
                                    neg_slope=0.01)

    check("fused_finale_head", finale_head)

    # --- fused DSA attention, all four sa_types ---
    n_slots = {"parallel": 4, "spatial": 3, "channel": 3, "serial": 3}
    for sa in ("parallel", "spatial", "channel", "serial"):
        def dsa(sa=sa):
            x = arr(1, 4096, 32)
            wqkvv = arr(n_slots[sa], 32, 32)
            ef = arr(4096, 64)
            temp = jnp.ones((4,), jnp.float32)
            return dsa_fused(x, wqkvv, ef, temp, temp,
                             num_heads=4, sa_type=sa)

        check(f"dsa_fused {sa}", dsa)

    print(f"\n{len(FAILURES)} failures" + (f": {FAILURES}" if FAILURES else ""))
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
