"""Probe: decompose the bench's ~30 ms/volume host gap (wall - device).

Three timings over the exact bench workload:
  A. synced loop (bench.py protocol): dispatch -> wait -> tiny fetch
  B. dispatch-only loop: issue N volumes back-to-back, one final sync
     (host-bound if this is ~wall; device-bound if ~device-busy)
  C. lagged-sync loop: fetch volume i-1's element while i runs
     (hides one relay round-trip per volume if the gap is sync latency)
  D. tip-slice stream (bench.py headline protocol): per-volume on-device
     scalar slice (frees the big output buffer), one final stacked fetch
     — avoids the live-buffer pathology that slows variant B

Measured 2026-08-18 (v5e, post-d2s-exit build): A 103.6 / B 104.9 /
C 103.0 / D ~81 ms/vol. Timeline evidence (probe_timeline.py --stream):
the device runs volumes back-to-back at 75.7 ms with zero inter-module
gaps under protocol D; A/C show a ~27 ms inter-volume gap (the relay
round-trip — lagged sync does NOT hide it because the relay orders
fetches behind the execution queue), and B's held outputs trigger the
relay live-buffer slowdown.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fcd_tpu.config import get_default_params
from fcd_tpu.infer.sliding_window import (
    patch_s2d_compatible,
    sliding_window_inference,
)
from fcd_tpu.models.factory import get_model, init_model
from fcd_tpu.train.state import make_eval_fn

VOL_SHAPE = (182, 218, 182, 2)
N = 10


def main():
    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    use_s2d = (getattr(model, "supports_s2d_input", False)
               and jax.default_backend() == "tpu"
               and patch_s2d_compatible(VOL_SHAPE[:3], (128, 128, 128),
                                        params["sw_overlap"]))
    predict_v = make_eval_fn(model, x_is_s2d=use_s2d, s2d_logits=use_s2d)

    def predictor(patches):
        return predict_v(variables, patches)

    rng = np.random.RandomState(0)
    vols = [jnp.asarray(rng.rand(*VOL_SHAPE).astype(np.float32))
            for _ in range(2)]

    def run(vol):
        return sliding_window_inference(
            vol, predictor, roi_size=(128, 128, 128),
            out_channels=params["chans_out"], sw_batch=params["sw_batch_size"],
            overlap=params["sw_overlap"], blend=params["sw_blend"],
            compute_dtype=jnp.bfloat16, patch_s2d=use_s2d,
            s2d_logits=use_s2d, flat_output=True)

    def sync(out):
        np.asarray(out[(0,) * out.ndim])

    sync(run(vols[0]))
    sync(run(vols[1]))

    # A: synced (bench protocol)
    t0 = time.perf_counter()
    for i in range(N):
        sync(run(vols[i % 2]))
    a = (time.perf_counter() - t0) / N * 1e3

    # B: dispatch-only, one final sync
    t0 = time.perf_counter()
    outs = [run(vols[i % 2]) for i in range(N)]
    t_disp = (time.perf_counter() - t0) / N * 1e3
    for o in outs:
        sync(o)
    b = (time.perf_counter() - t0) / N * 1e3

    # C: lagged sync (pipeline depth 1)
    t0 = time.perf_counter()
    prev = None
    for i in range(N):
        out = run(vols[i % 2])
        if prev is not None:
            sync(prev)
        prev = out
    sync(prev)
    c = (time.perf_counter() - t0) / N * 1e3

    # D: tip-slice stream (bench.py headline protocol)
    def tip(out):
        return out[(0,) * out.ndim]

    sync(jnp.stack([tip(run(vols[0])), tip(run(vols[1]))]).sum())
    t0 = time.perf_counter()
    tips = [tip(run(vols[i % 2])) for i in range(N)]
    np.asarray(jnp.stack(tips).sum())
    d = (time.perf_counter() - t0) / N * 1e3

    print(f"A synced        : {a:7.1f} ms/vol ({1e3/a:.2f} vol/s)")
    print(f"B streamed      : {b:7.1f} ms/vol ({1e3/b:.2f} vol/s)"
          f"  [dispatch-only {t_disp:.1f} ms/vol]")
    print(f"C lagged sync   : {c:7.1f} ms/vol ({1e3/c:.2f} vol/s)")
    print(f"D tip stream    : {d:7.1f} ms/vol ({1e3/d:.2f} vol/s)")


if __name__ == "__main__":
    main()
