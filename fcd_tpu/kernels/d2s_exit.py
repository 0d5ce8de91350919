"""Pallas volume-exit kernel for the s2d sliding-window path.

The blend accumulator lives on the s2d grid: (d2, h2, w2, 8*O) f32 with
parity-major lanes (g = 4*pz + 2*py + px). Producing the final native
(D, H, W, O) f32 volume from it via depth_to_space costs ~12 ms/volume
on v5e — not in the lane-permutation matmul (1.5 ms) but in the two XLA
layout copies that follow it (a minor-dim transpose at ~20 GB/s and the
T(2,128) boundary-layout production; profiled in
scripts/profile_patch.py sw_top as copy.604 + reshape.11213).

This kernel replaces the whole tail (coverage multiply + d2s + layout)
with one pass that writes the volume as a (D, H, W*O) f32 array in the
STANDARD layout — byte-for-byte the C-order (D, H, W, O) volume, so the
host-side reshape to 4-D is a free numpy view and no boundary-layout
copy ever happens on device.

Input convention: the accumulator is passed TRANSPOSED, (d2, h2, 8*O,
w2), so its Pallas-required standard layout is a BITCAST of the
{2,3,1,0} (W-minor) layout XLA naturally assigns the blend accumulator
— no relayout on entry either.

Per depth-row z the rearrangement out[pz, 2y+py, (2x+px)*O + c] =
v[y, g*O + c, x] is done as 4*O small (h2, w2) x (w2, 2*w2*O) GEMMs
against constant 0/1 lane-spread matrices (exact at HIGHEST precision)
plus one VMEM (y, py) riffle — the data never leaves VMEM between the
coverage multiply and the final store.

Applicability: w2 <= 128 (single lane tile) — the MNI152-1mm bench
volume (182, 218, 182) gives w2 = 91. Callers fall back to the
matmul-based depth_to_space_mm exit otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=8)
def _spread_mats(w2: int, o: int) -> np.ndarray:
    """(2*O, w2, 2*w2*O) 0/1 matrices: B[px*O + c][x, (2x+px)*O + c] = 1.
    Cached as numpy (a cached jnp array would leak tracers across traces).
    """
    n = 2 * w2 * o
    b = np.zeros((2 * o, w2, n), np.float32)
    for px in range(2):
        for c in range(o):
            for x in range(w2):
                b[px * o + c, x, (2 * x + px) * o + c] = 1.0
    return b


def _make_exit_kernel(h2: int, w2: int, o: int):
    n_lanes = 2 * w2 * o

    def kernel(acc_ref, invc_ref, b_ref, out_ref):
        v = acc_ref[0] * invc_ref[0]            # (h2, 8*O, w2) f32
        halves = []
        for pz in range(2):
            quads = []
            for py in range(2):
                d = None
                for px in range(2):
                    for c in range(o):
                        g = 4 * pz + 2 * py + px
                        row = v[:, g * o + c, :]            # (h2, w2)
                        t = jax.lax.dot_general(
                            row, b_ref[px * o + c],
                            (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )
                        d = t if d is None else d + t
                quads.append(d)                              # (h2, n)
            halves.append(jnp.stack(quads, axis=1))          # (h2, 2, n)
        t = jnp.stack(halves, axis=0)                        # (2, h2, 2, n)
        out_ref[0] = t.reshape(2, 2 * h2, n_lanes).astype(out_ref.dtype)

    return kernel


def d2s_exit_flat(acc_t: jnp.ndarray, invc_t: jnp.ndarray,
                  out_channels: int, *, interpret: bool = False
                  ) -> jnp.ndarray:
    """acc_t, invc_t: (d2, h2, 8*O, w2) f32 (the W-minor transpose of the
    s2d blend accumulator / reciprocal coverage). Returns the blended
    volume as (2*d2, 2*h2, 2*w2*O) f32, standard layout — the C-order
    bytes of the final (D, H, W, O) volume."""
    d2, h2, c8, w2 = acc_t.shape
    o = int(out_channels)
    assert c8 == 8 * o, (acc_t.shape, o)
    n_lanes = 2 * w2 * o
    b = jnp.asarray(_spread_mats(int(w2), o))

    out = pl.pallas_call(
        _make_exit_kernel(h2, w2, o),
        grid=(d2,),
        in_specs=[
            pl.BlockSpec((1, h2, c8, w2), lambda z: (z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, c8, w2), lambda z: (z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * o, w2, n_lanes), lambda z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * h2, n_lanes),
                               lambda z: (z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d2, 2, 2 * h2, n_lanes),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(acc_t, invc_t, b)
    return out.reshape(2 * d2, 2 * h2, n_lanes)


def d2s_exit_supported(d2: int, h2: int, w2: int, o: int) -> bool:
    """Single-lane-tile W and a VMEM-fitting slab pair."""
    if w2 > 128:
        return False
    slab = h2 * 8 * o * max(w2, 128) * 4
    outb = 2 * 2 * h2 * ((2 * w2 * o + 127) // 128 * 128) * 4
    bmat = 2 * o * max(w2, 8) * ((2 * w2 * o + 127) // 128 * 128) * 4
    return 4 * slab + 2 * outb + bmat < 80 * 1024 * 1024
