"""Isolate why the level-1 a2o kernel runs at ~17 TF/s (8.25 ms for the
dec1 multi-part call, profiled in-context) when its GEMMs should fill the
MXU: A/B stats / masking / multi-part / row count against the plain call.

Carry-dependent loop, n >= 32 (relay dispatch ~30 ms amortized).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.kernels.block_conv import (  # noqa: E402
    blocked_conv_a2o,
    blocked_conv_a2o_multi,
    blocked_conv_o2a,
    make_blocked_weights_1x1,
    make_blocked_weights_8tap,
)

N = 32


def timeit(name, fn, *args, flops=0.0):
    @jax.jit
    def loop(c, *a):
        def body(c, _):
            o = fn(a[0] * (1 + c * 1e-12).astype(a[0].dtype), *a[1:])
            leaf = jax.tree.leaves(o)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, c, None, length=N)
        return c

    c = loop(jnp.float32(0.0), *args)
    np.asarray(c)
    t0 = time.perf_counter()
    c = loop(c, *args)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / N
    util = flops / dt / 197e12 * 100 if flops else 0.0
    print(f"{name:52s} {dt * 1e3:7.3f} ms  {util:5.1f}% MXU", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    c = 16
    d2 = h2 = w2 = 64
    xs = jnp.asarray(rng.randn(1, d2, h2, w2, 8 * c).astype(np.float32)).astype(jnp.bfloat16)
    w = rng.randn(3, 3, 3, c, c).astype(np.float32) * 0.1
    wblk = make_blocked_weights_8tap(jnp.asarray(w)).astype(jnp.bfloat16)
    wres = make_blocked_weights_1x1(
        jnp.asarray(rng.randn(c, c).astype(np.float32))).astype(jnp.bfloat16)

    # 8 taps x (65*72, 128)x(128,128) x 65 rows
    gf = 8 * (d2 + 1) * ((h2 + 1) * 72) * (8 * c) * (8 * c) * 2 / 1e9

    timeit("a2o 16ch, stats", lambda x: blocked_conv_a2o(
        x, wblk, want_stats=True), xs, flops=gf * 1e9)
    timeit("a2o 16ch, no stats", lambda x: blocked_conv_a2o(
        x, wblk, want_stats=False), xs, flops=gf * 1e9)
    timeit("a2o multi 2 parts + res + stats (dec1 shape)",
           lambda x: blocked_conv_a2o_multi(
               [x, x], [wblk, wblk], want_stats=True,
               res_wblk_list=[wres, wres], want_res_stats=True),
           xs, flops=2 * gf * 1e9)
    timeit("a2o multi 2 parts, no res, stats",
           lambda x: blocked_conv_a2o_multi(
               [x, x], [wblk, wblk], want_stats=True),
           xs, flops=2 * gf * 1e9)

    ys = blocked_conv_a2o(xs, wblk, want_stats=False)[0]
    sc = jnp.ones((1, 8 * c), jnp.float32)
    sh = jnp.zeros((1, 8 * c), jnp.float32)
    timeit("o2a prologue+stats", lambda y: blocked_conv_o2a(
        y, wblk, w2, in_scale=sc, in_shift=sh, neg_slope=0.01,
        want_stats=True), ys, flops=gf * 1e9)
    timeit("o2a bare", lambda y: blocked_conv_o2a(
        y, wblk, w2, want_stats=False), ys, flops=gf * 1e9)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
