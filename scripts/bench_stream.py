"""Streamed sliding-window throughput probe.

bench.py's default loop syncs the host after every volume, so each volume
pays the axon-relay dispatch+sync overhead (~30 ms) on top of the ~111 ms
device time. A serving pipeline (like the reference's eval loop over 17
test subjects, train.py:236-249) processes a queue of volumes; the honest
throughput number lets dispatch of volume i+1 overlap execution of volume
i. This probe measures both:

  latency mode:  sync after each volume (bench.py's current number)
  streamed mode: dispatch all volumes, sync once at the end

Usage: bench_stream.py [n_volumes]
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

VOL_SHAPE = (182, 218, 182, 2)


def build():
    from fcd_tpu.config import get_default_params
    from fcd_tpu.infer.sliding_window import (
        patch_s2d_compatible,
        sliding_window_inference,
    )
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import make_eval_fn

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    use_s2d = (getattr(model, "supports_s2d_input", False)
               and jax.default_backend() == "tpu"
               and patch_s2d_compatible(VOL_SHAPE[:3], (128,) * 3,
                                        params["sw_overlap"]))
    predict = make_eval_fn(model, x_is_s2d=use_s2d, s2d_logits=use_s2d)

    def predictor(p):
        return predict(variables, p)

    def run(vol):
        return sliding_window_inference(
            vol, predictor, roi_size=(128,) * 3,
            out_channels=2, sw_batch=params["sw_batch_size"],
            overlap=params["sw_overlap"], blend=params["sw_blend"],
            compute_dtype=jnp.bfloat16, patch_s2d=use_s2d,
            s2d_logits=use_s2d,
            flat_output=os.environ.get("FCD_STREAM_FLAT", "1") != "0")

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)

    run = build()
    log("model built + initialized")
    rng = np.random.RandomState(0)
    vols = [jnp.asarray(rng.rand(*VOL_SHAPE).astype(np.float32))
            for _ in range(2)]

    # warmup / compile
    out = run(vols[0])
    np.asarray(out[(0,) * out.ndim])
    log("warmup done (compile included)")

    # latency mode: sync per volume
    t0 = time.perf_counter()
    for i in range(n):
        out = run(vols[i % 2])
        np.asarray(out[(0,) * out.ndim])
    lat = (time.perf_counter() - t0) / n
    print(f"latency mode : {lat * 1e3:7.1f} ms/vol  {1 / lat:6.3f} vol/s")

    # streamed mode: dispatch all, sync at the end
    t0 = time.perf_counter()
    outs = [run(vols[i % 2]) for i in range(n)]
    for o in outs:
        np.asarray(o[(0,) * o.ndim])
    st = (time.perf_counter() - t0) / n
    print(f"streamed mode: {st * 1e3:7.1f} ms/vol  {1 / st:6.3f} vol/s")


if __name__ == "__main__":
    main()
