"""Decide the conv strategy: XLA direct conv (dense and with s2d
round-trip) vs the blocked Pallas kernel, plus the elementwise-chain cost
that motivated s2d residency. All with n=64 to bury the ~30ms relay
dispatch overhead."""

import time

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.kernels.block_conv import depth_to_space, space_to_depth  # noqa: E402
from fcd_tpu.ops.s2d_ops import conv3x3_s2d, instance_norm_s2d  # noqa: E402


def timed(fn, x, n=64):
    @jax.jit
    def run(x):
        def body(c, _):
            xv = x * (1 + c * 1e-12).astype(x.dtype)
            y = fn(xv)
            return y.reshape(-1)[0].astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / n * 1000


def main():
    d, c = 128, 16
    key = jax.random.PRNGKey(0)
    xd = jax.random.normal(key, (1, d, d, d, c), jnp.bfloat16)
    xs = space_to_depth(xd)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, c),
                          jnp.float32) * 0.1
    wb = w.astype(jnp.bfloat16)

    def direct(x):
        return jax.lax.conv_general_dilated(
            x, wb, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    print(f"a) XLA direct conv dense 16->16 @128^3: {timed(direct, xd):.3f} ms",
          flush=True)

    def sandwich(x_s2d):
        xdense = depth_to_space(x_s2d, c)
        y = direct(xdense)
        return space_to_depth(y)

    print(f"b) d2s + XLA conv + s2d (s2d-resident swap-in): "
          f"{timed(sandwich, xs):.3f} ms", flush=True)

    print(f"c) blocked padded27 conv3x3_s2d: "
          f"{timed(lambda x: conv3x3_s2d(x, w), xs):.3f} ms", flush=True)

    def in_act_dense(x):
        m = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
        v = jnp.mean(jnp.square(x.astype(jnp.float32) - m), axis=(1, 2, 3),
                     keepdims=True)
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        return jax.nn.leaky_relu(y, 0.01).astype(x.dtype)

    print(f"d) instance-norm+act DENSE @128^3 C16: {timed(in_act_dense, xd):.3f} ms",
          flush=True)

    def in_act_s2d(x):
        return jax.nn.leaky_relu(instance_norm_s2d(x, c), 0.01)

    print(f"e) instance-norm+act S2D @128^3 C16: {timed(in_act_s2d, xs):.3f} ms",
          flush=True)

    def to_s2d_only(x):
        return space_to_depth(x)

    print(f"f) s2d transpose alone: {timed(to_s2d_only, xd):.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
