"""Accuracy parity evaluation on the reference's canonical datasets.

Implements the reference's acceptance protocol (SURVEY.md §4,
python/batch_analyze.py): per-step XY pose error and OSPA(p=1, c=5) between
the extracted map estimate and the ground-truth landmark set, on the
``simData2_cv`` and ``simData2_ackerman`` sequences.
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
                     overrides: Optional[dict] = None,
                     ospa_samples: int = 32):
    """Run the filter on a dataset (single on-device scan) and score against
    its ground truth.

    Returns dict with pose_err [T], ospa (sampled), throughput, etc.
    """
    cfg = load_config(cfg_path, overrides)
    data_dir = os.path.join(repo_root, cfg.data_directory)
    if n_steps:
        cfg.n_steps = n_steps

    gt = np.load(os.path.join(data_dir, "groundtruth.npz"))
    traj, landmarks = gt["traj"], gt["landmarks"]
    # true map at step k = landmarks observed up to k (batch_analyze.py
    # scores vs the per-step true map)
    cum_counts = (gt["cumulative_counts"] if "cumulative_counts" in gt.files
                  else np.full(len(traj), len(landmarks)))

    runner = SynthSLAMRunner(cfg, data_dir)
    res = runner.run_scanned(collect_maps=True)

    midx = [i for i, p in enumerate(runner.schedule) if p.z_idx >= 0]
    zidx = [p.z_idx for p in runner.schedule if p.z_idx >= 0]
    est = res["est_poses"][midx]
    T = min(len(est), len(traj))
    pose_err = np.linalg.norm(est[:T, :2] - traj[np.asarray(zidx[:T]), :2],
                              axis=1)

    ospa_every = max(1, T // ospa_samples)
    ospas = []
    for j in range(0, T, ospa_every):
        est_map = extract_map_estimate(res["map_weights"][midx[j]],
                                       res["map_means"][midx[j]])
        true_map = landmarks[: cum_counts[min(zidx[j], len(cum_counts) - 1)]]
        o, loc, cn = ospa_distance(true_map, est_map, p=1, c=5)
        ospas.append(o)

    return {
        "pose_err": pose_err,
        "ospa": np.asarray(ospas),
        "est_poses": est,
        "final_pose_err": float(pose_err[-1]),
        "mean_pose_err": float(pose_err.mean()),
        "max_pose_err": float(pose_err.max()),
        "final_ospa": float(ospas[-1]),
        "mean_ospa": float(np.mean(ospas)),
        "steps_per_s": res["steps_per_s"],
        "mean_loop_ms": 1000.0 / max(res["steps_per_s"], 1e-9),
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
          f"max_pose_err={res['max_pose_err']:.3f} m  "
          f"mean_ospa={res['mean_ospa']:.3f}  "
          f"final_ospa={res['final_ospa']:.3f}  "
          f"steps_per_s={res['steps_per_s']:.2f}")
