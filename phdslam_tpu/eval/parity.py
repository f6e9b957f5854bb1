"""Accuracy parity evaluation on the reference's canonical datasets.

Implements the reference's acceptance protocol (SURVEY.md §4,
python/batch_analyze.py): per-step XY pose error and OSPA(p=1, c=5) between
the extracted map estimate and the ground-truth landmark set, on the
``measurements_synth_cv`` and ``measurements_synth_ackerman`` sequences.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import load_config
from ..eval.ospa import extract_map_estimate, ospa_distance
from ..slam import SynthSLAMRunner


def evaluate_dataset(cfg_path: str, repo_root: str = ".",
                     n_steps: Optional[int] = None,
                     overrides: Optional[dict] = None):
    """Run the filter on a dataset and score against its ground truth.

    Returns dict with pose_err [T], ospa [T] (sampled), loop_ms [T], etc.
    """
    cfg = load_config(cfg_path, overrides)
    data_dir = os.path.join(repo_root, cfg.data_directory)
    if n_steps:
        cfg.n_steps = n_steps

    gt = np.load(os.path.join(data_dir, "groundtruth.npz"))
    traj, landmarks = gt["traj"], gt["landmarks"]
    # true map at step k = landmarks observed up to k (batch_analyze.py
    # scores vs the per-step true map, true_maps[k])
    cum_counts = gt.get("cumulative_counts",
                        np.full(len(traj), len(landmarks)))

    runner = SynthSLAMRunner(cfg, data_dir)
    # collect per-step MAP map estimates for OSPA
    ospa_every = max(1, len(runner.schedule) // 64)
    pose_errs = []
    ospas = []
    import jax.numpy as jnp
    import time
    est_poses = []
    loop_ms = []
    last_control = jnp.zeros((2,), jnp.float32)
    zeros_z = jnp.zeros((runner.m_max, 2), jnp.float32)
    zeros_mask = jnp.zeros((runner.m_max,), bool)
    z_step = 0  # index into ground-truth trajectory (measurement steps)
    for n, plan in enumerate(runner.schedule):
        t0 = time.perf_counter()
        if plan.c_idx >= 0:
            last_control = runner.controls_dev[plan.c_idx]
        if plan.z_idx >= 0:
            z, zm = runner.z_dev[plan.z_idx], runner.mask_dev[plan.z_idx]
        else:
            z, zm = zeros_z, zeros_mask
        runner.state, out = runner.step_fn(
            runner.state, z, zm, last_control, jnp.float32(plan.dt),
            plan.do_predict)
        ep = np.asarray(out.expected_pose)
        loop_ms.append((time.perf_counter() - t0) * 1000.0)
        if plan.z_idx >= 0:
            k = plan.z_idx
            if k < len(traj):
                pose_errs.append(float(np.linalg.norm(ep[:2] - traj[k, :2])))
                if k % ospa_every == 0:
                    est_map = extract_map_estimate(
                        np.asarray(out.map_weight), np.asarray(out.map_mean))
                    true_map = landmarks[: cum_counts[min(k,
                                                          len(cum_counts) - 1)]]
                    o, loc, cn = ospa_distance(true_map, est_map, p=1, c=5)
                    ospas.append(o)
            z_step += 1
        est_poses.append(ep)
        if np.isnan(float(out.n_eff)):
            break

    return {
        "pose_err": np.asarray(pose_errs),
        "ospa": np.asarray(ospas),
        "loop_ms": np.asarray(loop_ms),
        "est_poses": np.asarray(est_poses),
        "final_pose_err": pose_errs[-1] if pose_errs else float("nan"),
        "mean_pose_err": float(np.mean(pose_errs)) if pose_errs else float("nan"),
        "final_ospa": ospas[-1] if ospas else float("nan"),
        "mean_ospa": float(np.mean(ospas)) if ospas else float("nan"),
        "mean_loop_ms": float(np.mean(loop_ms[10:])) if len(loop_ms) > 10
        else float(np.mean(loop_ms)),
    }


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="path to config file (cfg/cv.cfg, ...)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--particles", type=int, default=None)
    args = ap.parse_args()
    ov = {}
    if args.particles:
        ov["n_particles"] = args.particles
    res = evaluate_dataset(args.config, n_steps=args.steps, overrides=ov)
    print(f"mean_pose_err={res['mean_pose_err']:.3f} m  "
          f"mean_ospa={res['mean_ospa']:.3f}  "
          f"final_ospa={res['final_ospa']:.3f}  "
          f"mean_loop_ms={res['mean_loop_ms']:.2f}")
