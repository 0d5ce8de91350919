"""Profiling utilities: FLOPs counting, step timing, MFU, device traces.

TPU-native replacement for the reference's thop/fvcore FLOP counters
(get_model.py:251-271) and per-epoch wall-time logging (train.py:351,413):
XLA's own cost analysis gives exact compiled FLOPs, jax.profiler captures
device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# bf16 peak per chip (dense) for MFU accounting
PEAK_FLOPS = {
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v4": 275e12,
    "cpu": 1e12,
}


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def compiled_cost(fn, *example_args) -> Dict[str, float]:
    """FLOPs / bytes accessed of the compiled computation (XLA cost
    analysis; the fvcore/thop-equivalent measurement)."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


def get_model_flops(model, params: Dict[str, Any], variables=None) -> Tuple[float, int]:
    """(forward FLOPs at the training patch size, parameter count) —
    get_model.py:251-271 parity via XLA instead of thop."""
    from fcd_tpu.models.factory import count_params, init_model

    if variables is None:
        variables = init_model(model, params)
    patch = params["patch_size"]
    patch = tuple(patch) if isinstance(patch, (tuple, list)) else (patch,) * 3
    x = jax.ShapeDtypeStruct(
        (params.get("batch_size", 1), *patch, params["chans_in"]), jnp.float32
    )

    def fwd(xv):
        out = model.apply(variables, xv, train=False)
        return out[0] if isinstance(out, tuple) else out

    cost = compiled_cost(fwd, x)
    n_params = count_params(variables)
    print(f"FLOPs: {cost['flops']:.3e}, Parameters: {n_params}")
    return cost["flops"], n_params


class StepTimer:
    """Accumulates step wall times and reports throughput + MFU."""

    def __init__(self, flops_per_step: Optional[float] = None):
        self.flops_per_step = flops_per_step
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        mean = sum(self.times) / len(self.times)
        out = {"mean_step_s": mean, "steps_per_s": 1.0 / mean}
        if self.flops_per_step:
            out["mfu"] = self.flops_per_step / mean / device_peak_flops()
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fcd_tpu_trace"):
    """jax.profiler trace context (open in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
