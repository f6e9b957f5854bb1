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


def evaluate_mixed(n_landmarks: int = 30, n_movers: int = 2,
                   n_steps: int = 100, dt: float = 0.15, seed: int = 0,
                   n_particles: int = 256, ospa_c: float = 5.0):
    """End-to-end accuracy of the mixed (jump-Markov) model on a world with
    BOTH static landmarks and moving targets — a configuration the
    reference implements (phdUpdateKernelMixed, phdfilter.cu:2323-2635) but
    ships no dataset for.

    CV vehicle (controls-free), unlabeled range-bearing measurements of
    landmarks + constant-velocity movers. Scores the final static-map OSPA
    vs the landmarks and the final dynamic-map positions vs the movers'
    final true positions.
    """
    import jax
    import jax.numpy as jnp

    from ..config import SlamConfig
    from ..filters.phd import make_step_fn
    from ..types import init_state
    from . import simdata

    rng = np.random.default_rng(seed)
    sp = simdata.SensorParams(max_range=12.0, std_range=0.5,
                              std_bearing=0.02, pd=0.95, clutter_rate=5.0)
    # yaw_rate 0.2 at v 1.5 -> a 7.5 m-radius loop that stays inside the
    # +-12 m landmark field (a wider loop leaves the field and the filter
    # runs open-loop)
    landmarks, traj = simdata.generate_world_cv(
        n_landmarks=n_landmarks, extent=12.0, n_steps=n_steps, dt=dt,
        seed=seed, v0=1.5, yaw_rate=0.2)
    movers = rng.uniform(-8.0, 8.0, size=(n_movers, 2))
    mover_v = rng.uniform(-0.5, 0.5, size=(n_movers, 2))

    cfg = SlamConfig(
        n_particles=n_particles, max_features=24, max_measurements=32,
        motion_type=0, feature_model=2, filter_type=0,
        vx0=1.5, vyaw0=0.2, ax=0.3, ayaw=0.03,
        max_range=sp.max_range, std_range=sp.std_range,
        std_bearing=sp.std_bearing, clutter_rate=sp.clutter_rate, pd=sp.pd,
        birth_weight=0.05, min_separation=2.0, resample_threshold=0.5,
        # cluster-process weighting (scheme 0): without odometry the pose
        # is anchored ONLY by the particle weights, and scheme 1 (Vo
        # empty-map, a cardinality-balance heuristic) is nearly flat across
        # particles here (nEff stays ~0.9, no resampling signal, the pose
        # random-walks 20-40 m); scheme 0 sums the log normalizers — the
        # actual measurement likelihood — and tracks at the 0.1 m level.
        particle_weighting=0, tau=0.2, cov_vx_birth=0.25, cov_vy_birth=0.25,
        std_ax_map=0.05, std_ay_map=0.05, seed=seed)

    step = make_step_fn(cfg, donate=False)
    state = init_state(cfg)
    ctrl = jnp.zeros((2,), jnp.float32)
    mv = movers.copy()
    for n in range(n_steps):
        targets = np.vstack([landmarks, mv])
        zs = simdata.noisy_measurements(traj[n], targets, sp, rng)
        z = np.zeros((cfg.max_measurements, 2), np.float32)
        mask = np.zeros((cfg.max_measurements,), bool)
        m = min(len(zs), cfg.max_measurements)
        z[:m] = zs[:m]
        mask[:m] = True
        state, out = step(state, jnp.asarray(z), jnp.asarray(mask), ctrl,
                          jnp.float32(dt), jnp.asarray(n > 0))
        if n < n_steps - 1:         # keep mv at the last-measured positions
            mv = mv + mover_v * dt

    est_pose_err = float(np.linalg.norm(
        np.asarray(out.expected_pose)[:2] - traj[-1, :2]))
    best = int(np.argmax(np.asarray(state.log_weight)))
    s_w = np.asarray(state.map_static.weight[best])
    s_m = np.asarray(state.map_static.mean[best])
    est_static = extract_map_estimate(s_w, s_m)
    # score vs landmarks ever within sensor range of the trajectory
    seen = np.zeros(len(landmarks), bool)
    for t in range(n_steps):
        seen |= np.linalg.norm(landmarks - traj[t, :2], axis=1) <= sp.max_range
    o_s, _, _ = ospa_distance(landmarks[seen], est_static, p=1, c=ospa_c)

    d_w = np.asarray(state.map_dynamic.weight[best])
    d_m = np.asarray(state.map_dynamic.mean[best])[:, :2]
    est_dyn = extract_map_estimate(d_w, d_m)
    o_d, _, _ = ospa_distance(mv, est_dyn, p=1, c=ospa_c)
    return {
        "static_ospa": float(o_s), "dynamic_ospa": float(o_d),
        "n_static_true": int(seen.sum()), "n_static_est": len(est_static),
        "n_dyn_est": len(est_dyn), "final_pose_err": est_pose_err,
        "n_eff": float(out.n_eff),
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
