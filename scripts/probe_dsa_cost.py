"""Where does the fused DSA kernel's time go at the level-3 shape?

N=32768, C=32, P=64, h=4 — phase B measures 0.91 ms and phase A 0.41 ms
in the sw profile for ~0.7 GF of logical work. This probe times the full
kernel and ablated variants (no softmax / no spatial / no channel /
fp32 vs bf16 exp) with carry-dependent loops (n>=32) on the TPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, N, C, P, H = 1, 32768, 32, 64, 4


def timeit(fn, x, n=32):
    """Device-busy ms/iter from the profiler's XLA Modules line."""
    import tempfile

    y = fn(x)
    _ = np.asarray(y.reshape(-1)[0])  # sync through relay
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                x = fn(x)
            _ = np.asarray(x.reshape(-1)[0])
        import glob

        path = glob.glob(os.path.join(td, "**", "*.xplane.pb"),
                         recursive=True)[0]
        data = jax.profiler.ProfileData.from_serialized_xspace(
            open(path, "rb").read())
        module_ms = 0.0
        for plane in data.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    module_ms += sum(
                        (ev.end_ns - ev.start_ns) / 1e6 for ev in line.events)
    return module_ms / n


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, C, C).astype(np.float32) * 0.1)
    ef = jnp.asarray(rng.randn(N, P).astype(np.float32) * 0.1)
    t1 = jnp.ones((H,), jnp.float32)
    t2 = jnp.ones((H,), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    pe = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.01)
    gamma = jnp.full((C,), 1e-6, jnp.float32)

    from fcd_tpu.kernels.dsa_attention import dsa_fused

    @jax.jit
    def full(x):
        return dsa_fused(x, w, ef, t1, t2, num_heads=H, sa_type="parallel",
                         ln_scale=lns, ln_bias=lnb, pos_embed=pe,
                         res_gamma=gamma)

    @jax.jit
    def chan_only(x):
        return dsa_fused(x, w, ef, t1, t2, num_heads=H, sa_type="channel",
                         ln_scale=lns, ln_bias=lnb, pos_embed=pe,
                         res_gamma=gamma)

    @jax.jit
    def spat_only(x):
        return dsa_fused(x, w, ef, t1, t2, num_heads=H, sa_type="spatial",
                         ln_scale=lns, ln_bias=lnb, pos_embed=pe,
                         res_gamma=gamma)

    # pure LN pass baseline (the prologue alone, same tile structure)
    @jax.jit
    def ln_only(x):
        t = x.astype(jnp.float32) + pe[None]
        mu = jnp.mean(t, axis=-1, keepdims=True)
        va = jnp.mean(jnp.square(t), axis=-1, keepdims=True) - jnp.square(mu)
        return ((t - mu) * jax.lax.rsqrt(va + 1e-5) * lns + lnb).astype(x.dtype)

    print(f"full parallel : {timeit(full, x):.3f} ms")
    print(f"channel only  : {timeit(chan_only, x):.3f} ms")
    print(f"spatial only  : {timeit(spat_only, x):.3f} ms")
    print(f"xla ln pass   : {timeit(ln_only, x):.3f} ms")


if __name__ == "__main__":
    main()
