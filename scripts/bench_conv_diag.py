"""Diagnose the blocked-conv kernel floor: value-accumulation variant,
n-scaling (fixed-overhead detection), and XLA direct conv reference."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.kernels.block_conv import make_blocked_weights_aligned  # noqa: E402


def timed(fn, x, n):
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


def make_valueacc_conv(cin, cout):
    def kernel(x_m1_ref, x_0_ref, x_p1_ref, w_ref, out_ref):
        h2 = out_ref.shape[2]
        w2 = out_ref.shape[3]
        rows = (x_m1_ref[0, 0], x_0_ref[0, 0], x_p1_ref[0, 0])
        acc = None
        tap = 0
        for r in range(3):
            base = rows[r]
            for u in range(3):
                su = base[u:u + h2]
                for v in range(3):
                    sl = su[:, v:v + w2, :]
                    d = jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                    tap += 1
        out_ref[0, 0] = acc.astype(out_ref.dtype)

    def conv(xs, wblk):
        bsz, d2, h2, w2, c8 = xs.shape
        xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(bsz, d2),
            in_specs=[
                pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                             lambda b, z: (b, z, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                             lambda b, z: (b, z + 1, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                             lambda b, z: (b, z + 2, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((27, c8, 8 * cout), lambda b, z: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, h2, w2, 8 * cout),
                                   lambda b, z: (b, z, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, 8 * cout),
                                           jnp.bfloat16),
        )(xp, xp, xp, wblk)

    return conv


def main():
    d, cin, cout = 128, 16, 16
    xs = jax.random.normal(jax.random.PRNGKey(0),
                           (1, d // 2, d // 2, d // 2, 8 * cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                          jnp.float32) * 0.1
    wblk = make_blocked_weights_aligned(w).astype(jnp.bfloat16)
    conv = make_valueacc_conv(cin, cout)

    for n in (8, 32):
        ms = timed(lambda x: conv(x, wblk), xs, n)
        print(f"valueacc padded27 16->16 @128^3 n={n}: {ms:.2f} ms", flush=True)

    # XLA direct conv reference at the same shape (dense NDHWC bf16)
    xd = jax.random.normal(jax.random.PRNGKey(2), (1, d, d, d, cin), jnp.bfloat16)
    wd = w.astype(jnp.bfloat16)

    def direct(x):
        return jax.lax.conv_general_dilated(
            x, wd, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    print(f"XLA direct 16->16 @128^3 n=8: {timed(direct, xd, 8):.2f} ms", flush=True)

    # pure GEMM floor reference: same dense FLOPs in one big matmul
    m = (d // 2) ** 3 * 27  # rows equivalent
    a = jax.random.normal(jax.random.PRNGKey(3), (m, 8 * cin), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(4), (8 * cin, 8 * cout), jnp.bfloat16)

    def gemm(a):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    print(f"XLA GEMM ({m}x128x128) n=8: {timed(gemm, a, 8):.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
