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
                     ospa_samples: int = 32, runner: str = "scanned"):
    """Run the filter on a dataset and score against its ground truth.

    ``runner``: "scanned" = the whole sequence as one on-device lax.scan;
    "chunked" = fixed-size scan chunks (use for very large configs — a
    single long dispatch over the axon tunnel can hit the relay timeout).
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

    r = SynthSLAMRunner(cfg, data_dir)
    if runner == "chunked":
        res = r.run_chunked(chunk=32, collect_maps=True)
    else:
        res = r.run_scanned(collect_maps=True)

    midx = [i for i, p in enumerate(r.schedule) if p.z_idx >= 0]
    zidx = [p.z_idx for p in r.schedule if p.z_idx >= 0]
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


def evaluate_disparity(cfg_path: str = "cfg/disparity.cfg",
                       n_landmarks: int = 25, n_steps: int = 60,
                       seed: int = 0, follow_trajectory: bool = True,
                       ospa_c: float = 1.0, work_dir: Optional[str] = None):
    """Mapping accuracy of the monocular SC-PHD pipeline.

    Generates a synthetic camera world (simdata.generate_disparity_world,
    intrinsics taken from ``cfg_path``), runs the disparity filter — by
    default in known-pose mapping mode (follow_trajectory, main.cpp:1335-1339),
    which isolates MAP accuracy from pose drift — and scores the extracted 3D
    landmark estimate with OSPA(1, c=``ospa_c`` m) against the landmarks that
    were ever visible in the image during the sequence.
    """
    import tempfile

    from ..slam_disparity import run_disparity
    from . import simdata

    cfg = load_config(cfg_path)
    cfg.follow_trajectory = follow_trajectory
    cfg.n_steps = n_steps

    landmarks, traj, measurements = simdata.generate_disparity_world(
        n_landmarks=n_landmarks, n_steps=n_steps, dt=cfg.dt, seed=seed,
        fx=cfg.fx, fy=cfg.fy, u0=cfg.u0, v0=cfg.v0,
        width=int(cfg.image_width), height=int(cfg.image_height),
        std_uv=cfg.std_u, pd=cfg.pd, clutter_rate=cfg.clutter_rate,
        vx=cfg.vx0)

    # landmarks ever inside the image and in front of the camera
    observed = np.zeros(len(landmarks), bool)
    for t in range(n_steps):
        R = simdata.camera_rotation_np(*traj[t, 3:6])
        pc = (landmarks - traj[t, :3]) @ R
        zc = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = cfg.u0 - cfg.fx * pc[:, 0] / zc
            v = cfg.v0 - cfg.fy * pc[:, 1] / zc
        observed |= ((zc < -0.5) & (u > 0) & (u < cfg.image_width)
                     & (v > 0) & (v < cfg.image_height))

    import contextlib
    ctx = (contextlib.nullcontext(work_dir) if work_dir
           else tempfile.TemporaryDirectory(prefix="disparity_eval_"))
    with ctx as tmp:
        simdata.write_disparity_run_dir(tmp, measurements)
        np.savetxt(os.path.join(tmp, "traj.txt"), traj)
        res = run_disparity(cfg, data_dir=tmp)
    st = res["final_state"]
    best = int(np.argmax(np.asarray(st.log_weight)))
    feat_means = np.asarray(st.cloud[best]).mean(axis=1)       # [K, 3]
    feat_w = np.asarray(st.feat_weight[best])
    est_map = extract_map_estimate(feat_w, feat_means)
    o, loc, cn = ospa_distance(landmarks[observed], est_map, p=1, c=ospa_c)
    return {
        "ospa": float(o), "ospa_loc": float(loc), "ospa_cn": float(cn),
        "n_true": int(observed.sum()), "n_est": len(est_map),
        "steps_per_s": res["steps_per_s"], "n_eff": res["n_eff"],
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
