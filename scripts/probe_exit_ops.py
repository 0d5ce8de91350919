"""Probe: cheapest formulation of (a) the SW volume-exit depth-to-space
and (b) the s2d head 1x1 conv.

The SW profile (round 2) shows the f32 reshape-based exit d2s costs
~13.1 ms/volume (copy.766 5.8 + squeeze.137 7.3) and the head's
block-diag einsum lowers to pad+reduce (~3 ms/volume). Small isolated
graphs compile in seconds, so A/B here and wire the winner.

Timing: carry-dependent loop, n >= 32 (relay dispatch ~30 ms amortized).
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 32


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[0]), out)  # sync

    @jax.jit
    def loop(c, *a):
        def body(c, _):
            o = fn(a[0] * (1 + c * 1e-12), *a[1:])
            leaf = jax.tree.leaves(o)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, c, None, length=N)
        return c

    c = loop(jnp.float32(0.0), *args)
    np.asarray(c)
    t0 = time.perf_counter()
    c = loop(c, *args)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:42s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    from fcd_tpu.kernels.block_conv import depth_to_space, depth_to_space_fast

    rng = np.random.RandomState(0)

    # ---- (a) volume exit d2s: (91,109,91,16) f32 -> (182,218,182,2).
    # In the real SW graph acc comes out of a dynamic-update-slice scan
    # (which pins its layout) and the 13 ms measured in-context is layout
    # transitions, not the d2s math (isolated reshape: 1.07 ms). Reproduce
    # the dus-scan producer here so XLA faces the same layout problem.
    patch = jnp.asarray(rng.rand(64, 64, 64, 16).astype(np.float32))
    inv_cnt = jnp.asarray(rng.rand(91, 109, 91, 8).astype(np.float32) + 0.5)
    starts = jnp.asarray(
        np.array([[0, 0, 0], [27, 0, 0], [0, 45, 0], [27, 45, 0],
                  [0, 0, 27], [27, 0, 27], [0, 45, 27], [27, 45, 27]],
                 np.int32))

    def make_acc(p):
        acc = jnp.zeros((91, 109, 91, 16), jnp.float32)

        def body(acc, s):
            cur = jax.lax.dynamic_slice(acc, (s[0], s[1], s[2], 0),
                                        (64, 64, 64, 16))
            return jax.lax.dynamic_update_slice(
                acc, cur + p, (s[0], s[1], s[2], 0)), None

        acc, _ = jax.lax.scan(body, acc, starts)
        return acc

    def exit_reshape(p, ic):
        out = make_acc(p) * jnp.repeat(ic, 2, axis=-1)
        return depth_to_space(out[None], 2)[0]

    def exit_conv(p, ic):
        out = make_acc(p) * jnp.repeat(ic, 2, axis=-1)
        return depth_to_space_fast(out[None], 2)[0]

    def exit_slices(p, ic):
        out = make_acc(p) * jnp.repeat(ic, 2, axis=-1)
        o = jnp.zeros((182, 218, 182, 2), jnp.float32)
        for g in range(8):
            bz, by, bx = (g >> 2) & 1, (g >> 1) & 1, g & 1
            o = o.at[bz::2, by::2, bx::2, :].set(out[..., g * 2:(g + 1) * 2])
        return o

    timeit("exit d2s reshape (current)", exit_reshape, patch, inv_cnt)
    timeit("exit d2s one-hot conv", exit_conv, patch, inv_cnt)
    timeit("exit d2s strided-slice writes", exit_slices, patch, inv_cnt)

    # ---- (b) head 1x1 conv in s2d: (1,64,64,64,128) bf16 -> (..,16)
    xs = jnp.asarray(rng.rand(1, 64, 64, 64, 128).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(16, 2).astype(np.float32))

    def head_blockdiag(x, w):
        from fcd_tpu.ops.s2d_ops import conv1x1_s2d

        return conv1x1_s2d(x, w)

    def head_grouped(x, w):
        b, d, h, ww, c8 = x.shape
        v = x.reshape(b, d, h, ww, 8, c8 // 8)
        out = jnp.einsum("bdhwgc,co->bdhwgo", v, w.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return out.reshape(b, d, h, ww, -1).astype(x.dtype)

    def head_fullmat(x, w):
        # materialize the block-diagonal weight but keep the contraction as
        # a single (n,128)x(128,16) matmul
        c = w.shape[0]
        wbig = jnp.zeros((8 * c, 8 * w.shape[1]), jnp.bfloat16)
        for g in range(8):
            wbig = wbig.at[g * c:(g + 1) * c,
                           g * w.shape[1]:(g + 1) * w.shape[1]].set(
                               w.astype(jnp.bfloat16))
        b, d, h, ww, c8 = x.shape
        flat = x.reshape(-1, c8)
        out = jax.lax.dot_general(flat, wbig, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.reshape(b, d, h, ww, -1).astype(x.dtype)

    timeit("head block-diag einsum (current)", head_blockdiag, xs, w)
    timeit("head grouped matmul", head_grouped, xs, w)
    timeit("head full matmul via dot_general", head_fullmat, xs, w)


if __name__ == "__main__":
    main()
