"""Pallas volume-entry kernel for the s2d sliding-window path.

The volume enters the device as a raw (D, H, W, C) f32 array and must
become the (D/2, H/2, W/2, 8C) bf16 space-to-depth volume that the
patch gathers slice. The one-hot stride-2 conv form of this transform
(block_conv.space_to_depth_fast) costs ~3.6 ms/volume on v5e — an input
relayout copy plus a convolution fusion, both ~30x over the bandwidth
floor (profile: copy.11 + fusion.8 in scripts -> /tmp/prof_sw.txt).

STATUS: A/B'd SLOWER on v5e (29.3 vs 5.2 ms/volume at the bench shape,
n=64 amortized) — the W-minor form's 91-lane GEMM outputs underfill the
MXU, the 16-way sublane stack is VPU-bound, and the std-layout
transpose outside is a real copy (the lanes->sublane shape cast needed
to emit std layout directly is unsupported by Mosaic). Kept env-gated
(FCD_ENTRY_KERNEL=1) with bit-parity tests as the basis for a future
retiling form; the one-hot-conv entry stays the default.

This kernel is the mirror image of kernels/d2s_exit.py: per output
depth row z it reads the two input rows 2z / 2z+1 as (2, H, W*C) f32
slabs — the FLAT (D, H, W*C) input view is byte-identical to the
C-order (D, H, W, C) host array, so no reshape ever materializes — and
emits the row's (H/2, W/2, 8C) s2d block via 4 exact 0/1
lane-permutation GEMMs (one per (pz, py) parity pair; the px/c lane
interleave rides inside the matrices).

Applicability: W*C and W/2*8C within a few lane tiles and VMEM-fitting
slabs; the MNI152-1mm bench volume (182, 218, 182, 2) gives W*C = 364
and 8C = 16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=8)
def _gather_mats(w: int, c: int) -> np.ndarray:
    """(2C, W*C, W/2) 0/1 selection matrices, one per (px, ch):
    B[px*C+ch][(2x+px)*C + ch, x] = 1 — a GEMM against one pulls the
    (px, ch) lane comb of an (h2, W*C) row into (h2, w2) with W/2 lanes.
    Cached as numpy (a cached jnp array would leak tracers across
    traces)."""
    w2 = w // 2
    mats = np.zeros((2 * c, w * c, w2), np.float32)
    for px in range(2):
        for ch in range(c):
            for x in range(w2):
                mats[px * c + ch, (2 * x + px) * c + ch, x] = 1.0
    return mats


def _make_entry_kernel(h: int, w: int, c: int, out_dtype):
    """Emits the W-MINOR s2d row (h2, 8C, w2): per (g, ch) output lane
    group one (h2, W*C) x (W*C, w2) selection GEMM, stacked on the
    SUBLANE axis (supported by Mosaic; the lanes->sublane shape cast of
    the std-layout form is not). The caller transposes to (h2, w2, 8C)
    outside — XLA lowers that as the layout assignment of the result."""
    h2, w2 = h // 2, w // 2
    c8 = 8 * c

    def kernel(v_ref, p_ref, out_ref):
        v = v_ref[...]                            # (2, H, W*C)
        v = v.reshape(2, h2, 2, w * c)            # split y parity
        rows = []
        for pz in range(2):
            for py in range(2):
                a = v[pz, :, py, :]               # (h2, W*C)
                for px in range(2):
                    for ch in range(c):
                        t = jax.lax.dot_general(
                            a, p_ref[px * c + ch],
                            (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )                          # (h2, w2)
                        rows.append(t)
        # rows are ordered g-major/ch-minor: g = 4pz + 2py + px
        out = jnp.stack(rows, axis=1)              # (h2, 8C, w2)
        out_ref[0] = out.astype(out_dtype)

    return kernel


def s2d_entry(volume: jnp.ndarray, *, out_dtype=jnp.bfloat16,
              interpret: bool = False) -> jnp.ndarray:
    """(D, H, W, C) float volume -> (D/2, H/2, W/2, 8C) s2d, parity-major
    lanes (g = 4*pz + 2*py + px), one Pallas pass. Bit-exact: the GEMMs
    are 0/1 selections at HIGHEST precision; only the final out_dtype cast
    rounds (same as the one-hot-conv form)."""
    d, h, w, c = volume.shape
    assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0, volume.shape
    d2, h2, w2 = d // 2, h // 2, w // 2
    flat = volume.reshape(d, h, w * c)            # free view (C-order)
    mats = jnp.asarray(_gather_mats(int(w), int(c)))

    out = pl.pallas_call(
        _make_entry_kernel(h, w, c, out_dtype),
        grid=(d2,),
        in_specs=[
            pl.BlockSpec((2, h, w * c), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, w * c, w2), lambda z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2, 8 * c, w2), lambda z: (z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d2, h2, 8 * c, w2), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flat, mats)
    # (d2, h2, 8C, w2) -> (d2, h2, w2, 8C): the kernel's W-minor output is
    # the {2,3,1,0} layout of the std-shape result — XLA realizes this
    # transpose as the result's layout assignment (or one copy at worst)
    return jnp.transpose(out, (0, 1, 3, 2))


def s2d_entry_supported(d: int, h: int, w: int, c: int) -> bool:
    if d % 2 or h % 2 or w % 2:
        return False
    if w * c > 512 or c > 4:
        return False

    def lanes(v):
        return (v + 127) // 128 * 128

    slab = 2 * h * lanes(w * c) * 4
    mats = 4 * w * c * lanes(w // 2 * 8 * c) * 4
    outb = (h // 2) * w // 2 * lanes(8 * c) * 2
    return 4 * slab + mats + 2 * outb < 80 * 1024 * 1024
