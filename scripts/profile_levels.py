"""Per-level TPU timing of MS_DSA_NET components with a carry-dependent
harness (loop-invariant scan bodies get hoisted by XLA and measure nothing;
see .claude/skills/verify/SKILL.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from fcd_tpu.ops.attention import DSA
    from flax import linen as nn

    class _DSAOnly(nn.Module):
        """LN + DSA at a level's token shape (attention cost w/o conv branch)."""
        n: int
        c: int
        p: int

        @nn.compact
        def __call__(self, x, *, train: bool = False):
            from fcd_tpu.ops.layers import LayerNorm

            b, d, h, w, cc = x.shape
            t = x.reshape(b, self.n, cc)
            a = DSA(input_size=self.n, hidden_size=self.c, proj_size=self.p,
                    num_heads=4, dtype=jnp.bfloat16)(LayerNorm()(t), train=train)
            return a.reshape(x.shape)

    class _ConvBranchOnly(nn.Module):
        """The transformer conv residual alone (batch-norm res block path)."""
        c: int

        @nn.compact
        def __call__(self, x, *, train: bool = False):
            from fcd_tpu.ops.attention import _conv_residual_branch

            return _conv_residual_branch(x, self.c, "batch", jnp.bfloat16,
                                         train=train)

    class _EmbedOnly(nn.Module):
        """1x1 patch embed + GroupNorm (level entry into the transformer)."""
        c: int
        groups: int

        @nn.compact
        def __call__(self, x, *, train: bool = False):
            t = Conv3d(self.c, kernel_size=1, use_bias=False,
                       dtype=jnp.bfloat16)(x)
            return GroupNorm(num_groups=self.groups)(t)

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
        ("dsa3 LN+attn C32 N32768", _DSAOnly(n=32 ** 3, c=32, p=64),
         [(B, 32, 32, 32, 32)]),
        ("dsa4 LN+attn C64 N4096", _DSAOnly(n=16 ** 3, c=64, p=64),
         [(B, 16, 16, 16, 64)]),
        ("convbr3 batchnorm C32 @32^3", _ConvBranchOnly(c=32),
         [(B, 32, 32, 32, 32)]),
        ("convbr4 batchnorm C64 @16^3", _ConvBranchOnly(c=64),
         [(B, 16, 16, 16, 64)]),
        ("embed3 1x1+GN 64->32 @32^3", _EmbedOnly(c=32, groups=16),
         [(B, 32, 32, 32, 64)]),
        ("dec1 up 32->16 @128^3", UnetrUpBlock(out_channels=fs, norm_name="instance",
                                               act_name=L, res_block=True,
                                               use_bias=False, dtype=jnp.bfloat16),
         [(B, 64, 64, 64, fs * 2), (B, 128, 128, 128, fs)]),
        ("dec2 up 32->32 @64^3", UnetrUpBlock(out_channels=fs * 2, norm_name="instance",
                                              act_name=L, res_block=True,
                                              use_bias=False, dtype=jnp.bfloat16),
         [(B, 32, 32, 32, fs * 2), (B, 64, 64, 64, fs * 2)]),
    ]
    import sys

    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, mod, shp in specs:
        if only and only not in name:
            continue
        try:
            print(f"{name}: {dep_bench_apply(mod, shp):.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
