"""Top-level synthetic-data SLAM driver.

TPU-native equivalent of the reference driver ``run_synth``
(/root/reference/src/main.cpp:1075-1322): loads the datasets, builds the
per-step input schedule (timestamp-driven interleaving of controls and
measurements, main.cpp:1187-1237), runs the jitted filter step over the
device-resident state, and writes ``state_estimateXXXXX.log`` +
``loopTime.log`` compatible outputs.

Unlike the reference — which copies the full particle set host<->device every
step (SURVEY.md §2.4-P7) — the state lives on device for the whole run; the
host only receives the small extracted estimates it writes to disk.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .filters.phd import make_step_fn
from .runtime import io
from .types import FilterState, init_state


@dataclass
class StepPlan:
    """One entry of the input schedule (main.cpp:1187-1237)."""
    z_idx: int          # measurement set index, -1 if none
    c_idx: int          # control index, -1 if none
    dt: float
    do_predict: bool


def build_schedule(n_measure_steps: int, n_controls: int,
                   measurement_times: np.ndarray, control_times: np.ndarray,
                   dt_default: float, n_steps_limit: int) -> List[StepPlan]:
    """Interleave measurement/control inputs by timestamp (main.cpp:1187-1237).

    Without timestamps: one measurement set + previous control per step.
    """
    plans: List[StepPlan] = []
    if len(measurement_times) == 0:
        for n in range(n_measure_steps):
            plans.append(StepPlan(z_idx=n, c_idx=min(n - 1, n_controls - 1)
                                  if n > 0 else -1,
                                  dt=dt_default, do_predict=n > 0))
    else:
        z_idx = c_idx = 0
        current_time = 0.0
        while z_idx < len(measurement_times) and c_idx < len(control_times):
            if measurement_times[z_idx] < control_times[c_idx]:
                t = float(control_times[c_idx])  # sic: ref uses control time
                plans.append(StepPlan(z_idx=z_idx, c_idx=-1,
                                      dt=t - current_time, do_predict=True))
                current_time = t
                z_idx += 1
            elif measurement_times[z_idx] == control_times[c_idx]:
                t = float(control_times[c_idx])
                plans.append(StepPlan(z_idx=z_idx, c_idx=c_idx,
                                      dt=t - current_time, do_predict=True))
                current_time = t
                z_idx += 1
                c_idx += 1
            else:
                t = float(control_times[c_idx])
                plans.append(StepPlan(z_idx=-1, c_idx=c_idx,
                                      dt=t - current_time, do_predict=True))
                current_time = t
                c_idx += 1
    if n_steps_limit > 0:
        plans = plans[:n_steps_limit]
    return plans


class SynthSLAMRunner:
    """End-to-end filter runner on a dataset directory."""

    def __init__(self, cfg: SlamConfig, data_dir: Optional[str] = None,
                 m_max: Optional[int] = None):
        self.cfg = cfg
        data_dir = data_dir or cfg.data_directory
        measurements = io.load_measurements(
            os.path.join(data_dir, "measurements.txt"),
            labeled=cfg.labeled_measurements)
        controls_path = os.path.join(data_dir, "controls.txt")
        self.controls = (io.load_controls(controls_path)
                         if os.path.exists(controls_path)
                         else np.zeros((0, 2), np.float32))
        mt = io.load_timestamps(os.path.join(data_dir,
                                             "measurement_times.txt"))
        ct = io.load_timestamps(os.path.join(data_dir, "control_times.txt"))

        if m_max is None:
            longest = max((len(z) for z in measurements), default=1)
            m_max = min(max(8, int(np.ceil(longest / 8.0)) * 8),
                        cfg.max_measurements)
        self.m_max = m_max
        self.z, self.z_mask = io.pad_measurements(measurements, m_max)
        self.n_truncated = sum(
            max(0, len(z) - m_max) for z in measurements)

        self.schedule = build_schedule(
            len(measurements), len(self.controls), mt, ct, cfg.dt,
            cfg.n_steps)

        self.step_fn = make_step_fn(cfg)
        self.state = init_state(cfg)

        # device-resident dataset
        self.z_dev = jnp.asarray(self.z)
        self.mask_dev = jnp.asarray(self.z_mask)
        self.controls_dev = (jnp.asarray(self.controls)
                             if len(self.controls) else
                             jnp.zeros((1, 2), jnp.float32))

    def run(self, out_dir: Optional[str] = None, log_every: int = 1,
            verbose: bool = False):
        """Run the full sequence. Returns a results dict with the estimated
        trajectory, per-step wall-clock and diagnostic counters."""
        cfg = self.cfg
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        est_poses = []
        n_effs = []
        loop_times = []
        overflow_total = 0
        last_control = jnp.zeros((2,), jnp.float32)
        zeros_z = jnp.zeros((self.m_max, 2), jnp.float32)
        zeros_mask = jnp.zeros((self.m_max,), bool)

        for n, plan in enumerate(self.schedule):
            t0 = time.perf_counter()
            if plan.c_idx >= 0:
                last_control = self.controls_dev[plan.c_idx]
            if plan.z_idx >= 0:
                z = self.z_dev[plan.z_idx]
                zm = self.mask_dev[plan.z_idx]
            else:
                z, zm = zeros_z, zeros_mask
            self.state, out = self.step_fn(
                self.state, z, zm, last_control,
                jnp.float32(plan.dt), plan.do_predict)
            # host sync for timing parity with loopTime.log
            ep = np.asarray(out.expected_pose)
            loop_times.append((time.perf_counter() - t0) * 1000.0)
            est_poses.append(ep)
            n_effs.append(float(out.n_eff))
            overflow_total += int(out.overflow)

            if np.isnan(float(out.n_eff)):
                print("nan weights detected! exiting...")  # main.cpp:1307
                break

            if out_dir and (n % log_every == 0):
                st = self.state
                static_map = ((out.map_weight, out.map_mean, out.map_cov)
                              if cfg.feature_model == 0 else None)
                dynamic_map = ((out.map_weight, out.map_mean, out.map_cov)
                               if cfg.feature_model == 1 else None)
                io.write_state_log(
                    out_dir, n, ep, static_map, dynamic_map,
                    np.asarray(st.log_weight), np.asarray(st.pose),
                    np.asarray(st.resample_idx), None,
                    cfg.max_cardinality, cfg.filter_type)
            if verbose and n % 50 == 0:
                print(f"step {n}/{len(self.schedule)} "
                      f"nEff={float(out.n_eff):.3f} "
                      f"t={loop_times[-1]:.1f}ms")

        if out_dir:
            with open(os.path.join(out_dir, "loopTime.log"), "w") as fh:
                fh.write("\n".join("%g" % t for t in loop_times) + "\n")
        return {
            "est_poses": np.asarray(est_poses),
            "n_eff": np.asarray(n_effs),
            "loop_ms": np.asarray(loop_times),
            "overflow": overflow_total,
            "truncated_measurements": self.n_truncated,
        }
