"""Profiling, energy, and cache utility tests."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcd_tpu.utils.energy import EmissionsTracker
from fcd_tpu.utils.profiling import StepTimer, compiled_cost, device_peak_flops


def test_compiled_cost_counts_matmul_flops():
    def f(x):
        return x @ x

    cost = compiled_cost(f, jax.ShapeDtypeStruct((64, 64), jnp.float32))
    # 2 * 64^3 FLOPs expected (allow backend variation)
    assert cost["flops"] >= 2 * 64 ** 3 * 0.5


def test_step_timer_mfu():
    t = StepTimer(flops_per_step=1e9)
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["mean_step_s"] >= 0.01
    assert 0 < s["mfu"] < 1
    assert device_peak_flops() > 0


def test_emissions_tracker_writes_csv(tmp_path):
    with EmissionsTracker(output_dir=str(tmp_path), output_file="e.csv",
                          power_w=100.0) as tr:
        time.sleep(0.05)
    assert tr.final_emissions > 0
    lines = (tmp_path / "e.csv").read_text().strip().splitlines()
    assert lines[0].startswith("timestamp")
    # the CSV must separate the estimated device envelope from the host
    # component, and declare whether the host was RAPL-measured
    assert "device_energy_kwh_estimated" in lines[0]
    assert "host_measurement" in lines[0]
    assert "assumed_device_power_w" in lines[0]
    assert "estimation_method" in lines[0]
    assert "100.0W envelope" in lines[1]
    assert tr.host_method in ("rapl_measured", "estimated")
    assert tr.host_method in lines[1]
    assert len(lines) == 2


def test_rapl_probe_helpers():
    """read_rapl_uj returns None gracefully when powercap is absent; the
    wraparound-corrected delta sums per-package joules."""
    from fcd_tpu.utils.energy import rapl_delta_joules, read_rapl_uj

    r = read_rapl_uj()
    assert r is None or (isinstance(r, dict) and all(
        isinstance(v, int) for v in r.values()))
    before = {"intel-rapl:0": 1_000_000, "intel-rapl:1": 5_000_000}
    after = {"intel-rapl:0": 3_500_000, "intel-rapl:1": 6_000_000}
    assert rapl_delta_joules(before, after) == 3.5


def test_get_model_flops_runs():
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model
    from fcd_tpu.utils.profiling import get_model_flops

    params = get_default_params()
    params.update(model_type="BASEUNET", patch_size=16, feature_size=4,
                  chans_in=2, chans_out=2, use_amp=False)
    model, params = get_model(params)
    flops, n_params = get_model_flops(model, params)
    assert flops > 0 and n_params > 0
