"""Isolated blocked-conv kernel timing vs its dense-GEMM floor.

Carry-dependent loop (see profile_levels.py) on conv3x3_s2d at the
production level shapes. Prints measured ms, dense-GEMM FLOPs, and the
implied MXU utilization so we know whether the kernel is compute- or
memory-bound before optimizing.
"""

import time

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.ops.s2d_ops import conv3x3_s2d, to_s2d  # noqa: E402

PEAK_BF16 = 197e12  # v5e


def bench(d, c_in, c_out, n=16):
    xs = jax.random.normal(jax.random.PRNGKey(0),
                           (1, d // 2, d // 2, d // 2, 8 * c_in), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (3, 3, 3, c_in, c_out), jnp.float32) * 0.1

    @jax.jit
    def run(xs):
        def body(carry, _):
            xv = xs * (1 + carry * 1e-12).astype(xs.dtype)
            y = conv3x3_s2d(xv, w)
            return y.reshape(-1)[0].astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    float(run(xs))
    t0 = time.perf_counter()
    float(run(xs))
    dt = (time.perf_counter() - t0) / n
    import os

    taps = 8 if os.environ.get("FCD_S2D_CONV", "") == "8tap" else 27
    rows = (d // 2) ** 3
    dense_flops = taps * rows * (8 * c_in) * (8 * c_out) * 2
    logical_flops = d ** 3 * 27 * c_in * c_out * 2
    util = dense_flops / dt / PEAK_BF16
    print(f"conv {c_in}->{c_out} @{d}^3: {dt * 1e3:.2f} ms | "
          f"dense {dense_flops / 1e9:.0f} GF (logical {logical_flops / 1e9:.0f}) | "
          f"MXU util {util * 100:.0f}%", flush=True)


def main():
    import os

    for form in ("padded27",):
        os.environ["FCD_S2D_CONV"] = form
        print(f"== form {form} ==", flush=True)
        bench(128, 16, 16)   # level 1 body conv
        bench(128, 2, 16)    # stem (padded to cin 16)
        bench(64, 32, 32)    # level 2 body conv
        bench(64, 16, 32)
        bench(32, 64, 64)    # level 3 body conv
        bench(32, 32, 64)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
