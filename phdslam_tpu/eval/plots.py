"""Result visualization.

Rebuild of the reference's plotting layer (SURVEY.md §2.2/§2.3):
``python/plot_results.py`` (error curves with error bars over Monte-Carlo
batches), ``python/plot_phdslam.py`` / ``matlab/plotPhdSlam.m`` (map +
trajectory replay with covariance ellipses, particle scatter, cardinality),
and ``matlab/makeCovEllipses.m`` (3-sigma ellipse polylines).

Matplotlib (Agg) instead of the reference's Qt4 animation; ``animate_run``
writes per-frame PNGs or an animated artifact.
"""

from __future__ import annotations

import os
from typing import Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def cov_ellipse(mean, cov, n_sigma=3.0, n_points=32):
    """3-sigma ellipse polyline for a 2x2 covariance
    (makeCovEllipses.m)."""
    vals, vecs = np.linalg.eigh(cov[:2, :2])
    vals = np.maximum(vals, 0.0)
    t = np.linspace(0, 2 * np.pi, n_points)
    circle = np.stack([np.cos(t), np.sin(t)])
    pts = vecs @ (n_sigma * np.sqrt(vals)[:, None] * circle)
    return pts[0] + mean[0], pts[1] + mean[1]


def plot_errors(batch_result, out_path: str, title: str = ""):
    """Mean +/- std error curves over runs (plot_results.py:7-80)."""
    pe, ospa = batch_result.pose_err, batch_result.ospa
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    t = np.arange(pe.shape[1])
    m, s = np.nanmean(pe, axis=0), np.nanstd(pe, axis=0)
    axes[0].plot(t, m, lw=1.5)
    axes[0].fill_between(t, m - s, m + s, alpha=0.3)
    axes[0].set_xlabel("time step")
    axes[0].set_ylabel("XY pose error [m]")
    axes[0].set_title("trajectory error")
    ts = np.arange(ospa.shape[1])
    m, s = np.nanmean(ospa, axis=0), np.nanstd(ospa, axis=0)
    axes[1].plot(ts, m, lw=1.5, color="tab:orange")
    axes[1].fill_between(ts, m - s, m + s, alpha=0.3, color="tab:orange")
    axes[1].set_xlabel("sample")
    axes[1].set_ylabel("OSPA(p=1, c=5)")
    axes[1].set_title("map error")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_slam_snapshot(ax, est_pose, map_weights, map_means, map_covs=None,
                       true_traj=None, est_traj=None, landmarks=None,
                       particle_poses=None, min_weight=0.25):
    """One frame of the plotPhdSlam-style view."""
    if landmarks is not None:
        ax.plot(landmarks[:, 0], landmarks[:, 1], "k*", ms=8, mew=0.5,
                label="true landmarks", alpha=0.6)
    if true_traj is not None:
        ax.plot(true_traj[:, 0], true_traj[:, 1], "k-", lw=1,
                label="true trajectory", alpha=0.6)
    if est_traj is not None:
        ax.plot(est_traj[:, 0], est_traj[:, 1], "b-", lw=1.2,
                label="estimated trajectory")
    if particle_poses is not None:
        ax.plot(particle_poses[:, 0], particle_poses[:, 1], ".",
                color="tab:green", ms=2, alpha=0.4, label="particles")
    live = map_weights > min_weight
    ax.plot(map_means[live, 0], map_means[live, 1], "r+", ms=8, mew=1.5,
            label="map estimate")
    if map_covs is not None:
        for i in np.flatnonzero(live):
            ex, ey = cov_ellipse(map_means[i], map_covs[i])
            ax.plot(ex, ey, "r-", lw=0.5, alpha=0.5)
    ax.plot([est_pose[0]], [est_pose[1]], "b^", ms=10, label="vehicle")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=7)


def plot_run(res: dict, out_path: str, gt: Optional[dict] = None,
             step: int = -1):
    """Final-state SLAM plot from a runner result dict
    (plot_phdslam.py-style single frame)."""
    fig, ax = plt.subplots(figsize=(7, 7))
    est_traj = res["est_poses"][:, :2]
    k = step if step >= 0 else len(est_traj) - 1
    plot_slam_snapshot(
        ax,
        est_pose=res["est_poses"][k],
        map_weights=res["map_weights"][k] if "map_weights" in res
        else np.zeros(1),
        map_means=res["map_means"][k] if "map_means" in res
        else np.zeros((1, 2)),
        map_covs=res.get("map_covs", [None] * (k + 1))[k]
        if "map_covs" in res else None,
        true_traj=gt.get("traj")[:, :2] if gt else None,
        landmarks=gt.get("landmarks") if gt else None,
        est_traj=est_traj[: k + 1],
        particle_poses=res["poses"][k] if "poses" in res else None)
    ax.set_title(f"step {k}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def animate_run(res: dict, out_dir: str, gt: Optional[dict] = None,
                every: int = 10):
    """Write per-frame PNGs (the reference's Qt replay, offline)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for k in range(0, len(res["est_poses"]), every):
        p = os.path.join(out_dir, f"frame{k:05d}.png")
        plot_run(res, p, gt=gt, step=k)
        paths.append(p)
    return paths
