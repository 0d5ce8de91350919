"""Per-level TPU timing of MS_DSA_NET components with a carry-dependent
harness (loop-invariant scan bodies get hoisted by XLA and measure nothing;
see .claude/skills/verify/SKILL.md)."""

import time

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.ops.attention import TransformerBlock  # noqa: E402
from fcd_tpu.ops.blocks import UnetrBasicBlock, UnetrUpBlock  # noqa: E402
from fcd_tpu.ops.layers import Conv3d, GroupNorm  # noqa: E402

K = jax.random.PRNGKey(0)
L = ("leakyrelu", {"negative_slope": 0.01})
B = 1   # match sw_batch=1 production config


def dep_bench_apply(mod, shapes, n=8):
    xs = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.bfloat16)
          for i, s in enumerate(shapes)]
    v = mod.init({"params": K, "dropout": K}, *xs, train=False)

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


def main():
    fs = 16
    specs = [
        ("enc1 2->16 @128^3", UnetrBasicBlock(out_channels=fs, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(B, 128, 128, 128, 2)]),
        ("enc2 16->32 @64^3", UnetrBasicBlock(out_channels=fs * 2, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(B, 64, 64, 64, fs)]),
        ("enc3 32->64 @32^3", UnetrBasicBlock(out_channels=fs * 4, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(B, 32, 32, 32, fs * 2)]),
        ("enc4 64->128 @16^3", UnetrBasicBlock(out_channels=fs * 8, norm_name="instance",
                                               act_name=L, res_block=True,
                                               use_bias=False, dtype=jnp.bfloat16),
         [(B, 16, 16, 16, fs * 4)]),
        ("enc5+6 proxy 128->256 @8^3", UnetrBasicBlock(out_channels=fs * 16,
                                                       norm_name="instance", act_name=L,
                                                       res_block=True, use_bias=False,
                                                       dtype=jnp.bfloat16),
         [(B, 8, 8, 8, fs * 8)]),
        ("trans3 x1 C32 N32768", TransformerBlock(input_size=32768, hidden_size=32,
                                                  proj_size=64, dropout_rate=0.1,
                                                  dtype=jnp.bfloat16),
         [(B, 32, 32, 32, 32)]),
        ("trans4 x1 C64 N4096", TransformerBlock(input_size=4096, hidden_size=64,
                                                 proj_size=64, dropout_rate=0.1,
                                                 dtype=jnp.bfloat16),
         [(B, 16, 16, 16, 64)]),
        ("trans5 x1 C128 N512", TransformerBlock(input_size=512, hidden_size=128,
                                                 proj_size=64, dropout_rate=0.1,
                                                 dtype=jnp.bfloat16),
         [(B, 8, 8, 8, 128)]),
        ("trans6 x1 C256 N64", TransformerBlock(input_size=64, hidden_size=256,
                                                proj_size=32, dropout_rate=0.1,
                                                dtype=jnp.bfloat16),
         [(B, 4, 4, 4, 256)]),
        ("dec1 up 32->16 @128^3", UnetrUpBlock(out_channels=fs, norm_name="instance",
                                               act_name=L, res_block=True,
                                               use_bias=False, dtype=jnp.bfloat16),
         [(B, 64, 64, 64, fs * 2), (B, 128, 128, 128, fs)]),
        ("dec2 up 32->32 @64^3", UnetrUpBlock(out_channels=fs * 2, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(B, 32, 32, 32, fs * 2), (B, 64, 64, 64, fs * 2)]),
    ]
    for name, mod, shp in specs:
        try:
            print(f"{name}: {dep_bench_apply(mod, shp):.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
