"""Timeline probe: per-module start/end events across a few synced volume
runs, to locate the ~27 ms/volume of device wall time that the XLA Modules
duration sum does not explain (module launch gaps vs in-module time).

Prints every XLA Modules event (name, start ms relative, duration ms) and
the gaps between consecutive module executions.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from scripts.profile_patch import build_sw, _find_xspace  # noqa: E402


def main():
    stream = "--stream" in sys.argv
    step, x = build_sw()

    def sync(out):
        np.asarray(out[(0,) * out.ndim])

    sync(step(x))
    sync(step(x))

    trace_dir = tempfile.mkdtemp(prefix="fcd_timeline_")
    n = 4
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        if stream:
            # bench.py streamed protocol: per-volume on-device tip slice
            # (frees the big output), one final fetch syncs everything
            import jax.numpy as jnp

            tips = []
            for _ in range(n):
                out = step(x)
                tips.append(out[(0,) * out.ndim])
            np.asarray(jnp.stack(tips).sum())
        else:
            for _ in range(n):
                sync(step(x))
        wall = (time.perf_counter() - t0) / n * 1e3
    print(f"wall ({'streamed' if stream else 'synced'}): {wall:.1f} ms/vol")

    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(_find_xspace(trace_dir), "rb").read())
    events = []
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    events.append((ev.start_ns, ev.end_ns, ev.name))
    events.sort()
    if not events:
        print("no module events found; planes:")
        for plane in data.planes:
            print(" ", plane.name, [ln.name for ln in plane.lines])
        return
    t0 = events[0][0]
    prev_end = None
    for s, e, name in events:
        gap = (s - prev_end) / 1e6 if prev_end is not None else 0.0
        print(f"  +{(s - t0) / 1e6:9.2f} ms  dur {(e - s) / 1e6:7.2f} ms  "
              f"gap {gap:7.2f} ms  {name[:60]}")
        prev_end = e


if __name__ == "__main__":
    main()
