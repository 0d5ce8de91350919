"""Compile-probe blocked_conv_s2d_fused at production shapes to map the
real Mosaic scoped-VMEM limits (estimates from buffer math are unreliable)."""

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.kernels.block_conv import (  # noqa: E402
    blocked_conv_s2d_fused,
    make_blocked_weights_1x1,
    make_blocked_weights_aligned,
)


def probe(name, g, cin, cout, *, prologue, res, stats):
    d2 = h2 = w2 = g // 2
    xs = jax.ShapeDtypeStruct((1, d2, h2, w2, 8 * cin), jnp.bfloat16)
    w = jnp.zeros((3, 3, 3, cin, cout), jnp.float32)
    wblk = make_blocked_weights_aligned(w).astype(jnp.bfloat16)
    res_wblk = (make_blocked_weights_1x1(jnp.zeros((cin, cout), jnp.float32))
                .astype(jnp.bfloat16) if res else None)
    sc = jax.ShapeDtypeStruct((1, 8 * cin), jnp.float32) if prologue else None

    def f(x, *args):
        scale = args[0] if prologue else None
        shift = args[1] if prologue else None
        return blocked_conv_s2d_fused(
            x, wblk, in_scale=scale, in_shift=shift,
            neg_slope=0.01 if prologue else 1.0,
            res_wblk=res_wblk, want_stats=stats,
            out_dtype=jnp.bfloat16, interpret=False)

    shapes = (xs,) + ((sc, sc) if prologue else ())
    try:
        jax.jit(f).lower(*shapes).compile()
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        tag = "VMEM-OOM" if "vmem" in msg.lower() else type(e).__name__
        size = ""
        import re

        m = re.search(r"size ([0-9.]+)M", msg)
        if m:
            size = f" ({m.group(1)}M)"
        print(f"{name}: {tag}{size}", flush=True)


def main():
    # level 1 (128^3 grid)
    probe("L1 conv1 2->16 res+stats", 128, 2, 16, prologue=False, res=True, stats=True)
    probe("L1 conv2 16->16 prologue+stats", 128, 16, 16, prologue=True, res=False, stats=True)
    probe("L1 dec conv1 16->16 res+stats", 128, 16, 16, prologue=False, res=True, stats=True)
    probe("L1 dec conv1 16->16 res only", 128, 16, 16, prologue=False, res=True, stats=False)
    # level 2 (64^3)
    probe("L2 conv1 16->32 res+stats", 64, 16, 32, prologue=False, res=True, stats=True)
    probe("L2 conv2 32->32 prologue+stats", 64, 32, 32, prologue=True, res=False, stats=True)
    probe("L2 dec conv1 32->32 res", 64, 32, 32, prologue=False, res=True, stats=True)
    # level 3 (32^3)
    probe("L3 conv1 32->64 res+stats", 32, 32, 64, prologue=False, res=True, stats=True)
    probe("L3 conv2 64->64 prologue+stats", 32, 64, 64, prologue=True, res=False, stats=True)
    # transformer branches
    probe("T3 conv 32->32 @32^3 prologue", 32, 32, 32, prologue=True, res=False, stats=False)
    probe("T4 conv 64->64 @16^3 prologue", 16, 64, 64, prologue=True, res=False, stats=False)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
