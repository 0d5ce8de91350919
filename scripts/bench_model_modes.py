"""Full-model and block-level A/B: s2d-resident vs pure-XLA dense paths.

Usage: bench_model_modes.py [blocks|model] [s2d|dense|dense_nofuseddsa]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timed_apply(mod, v, xs, n):
    @jax.jit
    def run(*xs):
        def body(c, _):
            xv = [x * (1 + c * 1e-12).astype(x.dtype) for x in xs]
            y = mod.apply(v, *xv, train=False)
            return y.reshape(-1)[0].astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    float(run(*xs))
    t0 = time.perf_counter()
    float(run(*xs))
    return (time.perf_counter() - t0) / n * 1000


def bench_blocks():
    from fcd_tpu.ops.blocks import UnetrBasicBlock, UnetrUpBlock

    L = ("leakyrelu", {"negative_slope": 0.01})
    K = jax.random.PRNGKey(0)
    specs = [
        ("enc1 2->16 @128^3", UnetrBasicBlock(out_channels=16, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(1, 128, 128, 128, 2)], 32),
        ("enc2 16->32 @64^3", UnetrBasicBlock(out_channels=32, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(1, 64, 64, 64, 16)], 32),
        ("dec1 up 32->16 @128^3", UnetrUpBlock(out_channels=16, norm_name="instance",
                                               act_name=L, res_block=True,
                                               use_bias=False, dtype=jnp.bfloat16),
         [(1, 64, 64, 64, 32), (1, 128, 128, 128, 16)], 16),
    ]
    for name, mod, shapes, n in specs:
        xs = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.bfloat16)
              for i, s in enumerate(shapes)]
        v = mod.init({"params": K, "dropout": K}, *xs, train=False)
        print(f"{name}: {timed_apply(mod, v, xs, n):.3f} ms", flush=True)


def bench_model():
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model, init_model

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    model, params = get_model(params)
    v = init_model(model, params, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 128, 2),
                          jnp.bfloat16)
    print(f"MS_DSA_NET fwd @128^3: {timed_apply(model, v, [x], 8):.2f} ms",
          flush=True)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    mode = sys.argv[2] if len(sys.argv) > 2 else "s2d"
    if mode == "dense":
        os.environ["FCD_S2D"] = "0"
        os.environ["FCD_FAST_CONV"] = "0"
    elif mode == "dense_nofuseddsa":
        os.environ["FCD_S2D"] = "0"
        os.environ["FCD_FAST_CONV"] = "0"
        os.environ["FCD_FUSED_DSA"] = "0"
    print(f"== {what} mode={mode} ==", flush=True)
    if what == "blocks":
        bench_blocks()
    else:
        bench_model()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
