"""Isolate the a2o kernel's cost components at the level-1 shape:
time the halo-pad pass alone, pad+pair, and the full a2o call in both
forms — differences give kernel-only time, separating the pairing-pass
cost from the kernel win/loss (the end-to-end A/B alone can't tell).

Carry-dependent loop, n >= 32 (relay dispatch ~30 ms amortized)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.kernels.block_conv import (  # noqa: E402
    _halo_pad,
    _pad8,
    blocked_conv_a2o,
    make_blocked_weights_8tap,
    pair_w_lanes,
)

N = 32


def timeit(name, fn, *args):
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
    print(f"{name:46s} {dt * 1e3:7.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    c = 16
    d2 = h2 = w2 = 64
    xs = jnp.asarray(
        rng.randn(1, d2, h2, w2, 8 * c).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = rng.randn(3, 3, 3, c, c).astype(np.float32) * 0.1
    wblk = make_blocked_weights_8tap(jnp.asarray(w)).astype(jnp.bfloat16)
    w_in = _pad8(_pad8(w2 + 1) + 1)

    import os

    timeit("halo_pad alone", lambda x: _halo_pad(x, w_in), xs)
    timeit("halo_pad + pair_w_lanes",
           lambda x: pair_w_lanes(_halo_pad(x, w_in)), xs)

    os.environ["FCD_CONV8_PAIRED"] = "0"
    timeit("a2o full (unpaired)", lambda x: blocked_conv_a2o(
        x, wblk, want_stats=False), xs)
    os.environ["FCD_CONV8_PAIRED"] = "1"
    timeit("a2o full (paired)", lambda x: blocked_conv_a2o(
        x, wblk, want_stats=False), xs)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
