"""Op-level TPU profile of one sliding-window patch forward.

Runs the bench's exact predictor (MS_DSA_NET fs16, 128^3 patch, bf16,
s2d input when supported) under jax.profiler and aggregates XLA op
durations from the trace via jax.profiler.ProfileData — evidence for
which components own the patch time (no microbenchmark dispatch skew).

Usage: profile_patch.py [n_iters] [group]
  group = 'op' (default: aggregate by op category) | 'top' (top 40 ops)
"""

import collections
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fcd_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def build_predictor():
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model, init_model
    from fcd_tpu.train.state import make_eval_fn

    params = get_default_params()
    params.update(patch_size=128, chans_in=2, chans_out=2, use_amp=True)
    model, params = get_model(params)
    variables = init_model(model, params, seed=0)
    use_s2d = (getattr(model, "supports_s2d_input", False)
               and jax.default_backend() == "tpu")
    predict = make_eval_fn(model, x_is_s2d=use_s2d, s2d_logits=use_s2d)
    if use_s2d:
        x = jnp.zeros((1, 64, 64, 64, 16), jnp.bfloat16)
    else:
        x = jnp.zeros((1, 128, 128, 128, 2), jnp.bfloat16)

    @jax.jit
    def step(x):
        return predict(variables, x)

    return step, x


def collect(trace_dir):
    """(module_ms, op_rows): device-busy time from the 'XLA Modules' line
    (authoritative) and per-op durations from the 'XLA Ops' line (sync ops
    only — 'Async XLA Ops' overlap compute and double-count)."""
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(_find_xspace(trace_dir), "rb").read())
    rows = []
    module_ms = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms += sum(
                    (ev.end_ns - ev.start_ns) / 1e6 for ev in line.events)
            elif line.name == "XLA Ops":
                for ev in line.events:
                    dur = (ev.end_ns - ev.start_ns) / 1e6
                    rows.append((ev.name, dur))
    return module_ms, rows


def _find_xspace(trace_dir):
    import glob
    import os

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    return paths[0]


CATEGORIES = [
    ("pallas_conv8", re.compile(r"fused8|a2o|o2a", re.I)),
    ("pallas_conv27", re.compile(r"padded27|aligned|fused_kernel|conv_kernel", re.I)),
    ("pallas_dsa", re.compile(r"dsa", re.I)),
    ("fusion", re.compile(r"^(loop_)?fusion", re.I)),
    ("conv", re.compile(r"convolution|conv_general", re.I)),
    ("dot", re.compile(r"dot", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("dynamic-slice/update", re.compile(r"dynamic", re.I)),
    ("allreduce/etc", re.compile(r"all-|reduce-scatter", re.I)),
]


def build_sw():
    """The bench's full sliding-window volume call (8 patches, blending)."""
    import numpy as np

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
               and patch_s2d_compatible((182, 218, 182), (128,) * 3, 0.25))
    predict = make_eval_fn(model, x_is_s2d=use_s2d, s2d_logits=use_s2d)
    vol = jnp.asarray(np.random.RandomState(0)
                      .rand(182, 218, 182, 2).astype(np.float32))

    def predictor(p):  # stable identity: one jit cache entry across calls
        return predict(variables, p)

    flat = os.environ.get("FCD_PROFILE_FLAT", "1") != "0"

    def step(_):
        out = sliding_window_inference(
            vol, predictor, roi_size=(128,) * 3,
            out_channels=2, sw_batch=1, overlap=0.25, blend="constant",
            compute_dtype=jnp.bfloat16, patch_s2d=use_s2d,
            s2d_logits=use_s2d, flat_output=flat)
        return out

    return step, jnp.zeros(())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = sys.argv[2] if len(sys.argv) > 2 else "op"
    if mode.startswith("sw"):
        step, x = build_sw()
        mode = mode[2:].lstrip("_") or "top"
    else:
        step, x = build_predictor()
    y = step(x)
    _ = jnp.asarray(y)[(0,) * jnp.ndim(y)]  # sync through the relay

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                y = step(x)
            _ = jnp.asarray(y.reshape(-1)[0])
        module_ms, rows = collect(td)

    total = sum(d for _, d in rows)
    print(f"device-busy (XLA Modules): {module_ms / n:.2f} ms/iter; "
          f"sync-op sum: {total / n:.2f} ms/iter, {len(rows)} events")
    if mode == "top":
        agg = collections.Counter()
        cnt = collections.Counter()
        for name, d in rows:
            agg[name] += d
            cnt[name] += 1
        for name, d in agg.most_common(40):
            print(f"{d / n:8.3f} ms  x{cnt[name] // max(n,1):3d}  {name[:110]}")
    else:
        agg = collections.Counter()
        for name, d in rows:
            for cat, rx in CATEGORIES:
                if rx.search(name):
                    agg[cat] += d
                    break
            else:
                agg["other"] += d
        for cat, d in agg.most_common():
            print(f"{d / n:8.3f} ms/patch  {cat}")


if __name__ == "__main__":
    main()
