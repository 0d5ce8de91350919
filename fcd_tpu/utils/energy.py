"""Energy / carbon estimation (CodeCarbon-equivalent capability).

The reference wraps training in a CodeCarbon EmissionsTracker and writes
an emissions CSV (train.py:470-485). CodeCarbon is not available in this
environment, so this tracker estimates energy from wall-clock time and a
configurable device power envelope (TPU v5e chip TDP default), and writes
the same style of CSV artifact.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional

# conservative board-level power envelopes (watts)
DEVICE_POWER_W = {
    "tpu-v5e": 200.0,
    "tpu-v4": 275.0,
    "cpu": 65.0,
}
# world-average grid carbon intensity, kg CO2eq per kWh
CARBON_INTENSITY_KG_PER_KWH = 0.475


class EmissionsTracker:
    """Context manager mirroring the reference's tracker contract:
    .final_emissions (kg CO2eq) after exit, CSV written to output_dir."""

    def __init__(
        self,
        project_name: str = "fcd_detection",
        output_dir: str = ".",
        output_file: str = "emissions.csv",
        device: str = "tpu-v5e",
        power_w: Optional[float] = None,
        save_to_file: bool = True,
        log_level: str = "critical",
    ):
        self.project_name = project_name
        self.output_dir = output_dir
        self.output_file = output_file
        self.power_w = power_w if power_w is not None else DEVICE_POWER_W.get(device, 200.0)
        self.save_to_file = save_to_file
        self.final_emissions: Optional[float] = None
        self.final_energy_kwh: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        duration_s = time.time() - self._t0
        self.final_energy_kwh = self.power_w * duration_s / 3600.0 / 1000.0
        self.final_emissions = self.final_energy_kwh * CARBON_INTENSITY_KG_PER_KWH
        if self.save_to_file:
            os.makedirs(self.output_dir, exist_ok=True)
            path = os.path.join(self.output_dir, self.output_file)
            exists = os.path.exists(path)
            with open(path, "a", newline="") as f:
                w = csv.writer(f)
                if not exists:
                    # columns are explicitly *_estimated: this tracker does
                    # not measure power, it multiplies wall time by an
                    # assumed device envelope (unlike CodeCarbon's RAPL/NVML
                    # readings in the reference, train.py:470-485)
                    w.writerow(
                        ["timestamp", "project_name", "duration_s",
                         "assumed_power_w", "energy_kwh_estimated",
                         "emissions_kg_estimated", "estimation_method"]
                    )
                w.writerow(
                    [time.strftime("%Y-%m-%dT%H:%M:%S"), self.project_name,
                     f"{duration_s:.2f}", self.power_w,
                     f"{self.final_energy_kwh:.6f}", f"{self.final_emissions:.6f}",
                     f"wall_time x {self.power_w}W device envelope x "
                     f"{CARBON_INTENSITY_KG_PER_KWH} kgCO2eq/kWh world-avg grid"]
                )
        return False
