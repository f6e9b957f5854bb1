"""Monte-Carlo batch validation harness.

Rebuild of the reference's acceptance-test layer (SURVEY.md §4):
``python/batch_run.py`` (run the filter over N noise realizations) and
``python/batch_analyze.py`` (per-step pose error + OSPA(p=1, c=5) against
ground truth, aggregated mean/std over runs).

Unlike the reference — which shells out to the CUDA binary per run and
re-parses text logs — runs execute in-process on the device-resident engine,
and scoring consumes the in-memory estimates directly (the text-log path
stays available for drop-in compatibility via runtime.io.write_state_log).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..config import SlamConfig
from ..eval import simdata
from ..eval.ospa import extract_map_estimate, ospa_distance
from ..slam import SynthSLAMRunner


@dataclass
class BatchResult:
    pose_err: np.ndarray      # [R, T] per-run per-step XY error
    ospa: np.ndarray          # [R, S] per-run sampled OSPA
    n_eff: np.ndarray         # [R, T]
    steps_per_s: np.ndarray   # [R]

    def summary(self) -> dict:
        return {
            "mean_pose_err": float(np.nanmean(self.pose_err)),
            "std_pose_err": float(np.nanstd(np.nanmean(self.pose_err,
                                                       axis=1))),
            "final_pose_err": float(np.nanmean(self.pose_err[:, -1])),
            "mean_ospa": float(np.nanmean(self.ospa)),
            "std_ospa": float(np.nanstd(np.nanmean(self.ospa, axis=1))),
            "final_ospa": float(np.nanmean(self.ospa[:, -1])),
            "mean_steps_per_s": float(np.mean(self.steps_per_s)),
            "n_runs": int(len(self.pose_err)),
        }


def generate_batch_datasets(out_root: str, n_runs: int = 10,
                            n_landmarks: int = 40, n_steps: int = 150,
                            dt: float = 0.1, seed: int = 0,
                            sp: Optional[simdata.SensorParams] = None,
                            mp: Optional[simdata.AckermanParams] = None,
                            motion: str = "ackerman"):
    """Generate ground truth + N Monte-Carlo input dirs
    (generate_simdata.py:34-73). Returns the ground-truth npz path.

    ``motion``: "ackerman" (controls + measurements per run) or "cv"
    (constant-velocity vehicle, measurements only — the
    measurements_synth_cv protocol).
    """
    sp = sp or simdata.SensorParams()
    mp = mp or simdata.AckermanParams()
    if motion == "cv":
        landmarks, traj = simdata.generate_world_cv(
            n_landmarks=n_landmarks, n_steps=n_steps, dt=dt, seed=seed)
        controls = np.zeros((0, 2))
    else:
        landmarks, traj, controls = simdata.generate_world(
            n_landmarks=n_landmarks, n_steps=n_steps, dt=dt, seed=seed,
            mp=mp)
    # order landmarks by first observation so landmarks[:cum[t]] is the true
    # map at step t (batch_analyze.py scores vs the per-step true map)
    first_seen = np.full(len(landmarks), n_steps)
    for t in range(n_steps - 1, -1, -1):
        d = np.linalg.norm(landmarks - traj[t, :2], axis=1)
        first_seen[d <= sp.max_range] = t
    order = np.argsort(first_seen, kind="stable")
    landmarks = landmarks[order]
    cum = np.searchsorted(first_seen[order], np.arange(n_steps),
                          side="right")
    os.makedirs(out_root, exist_ok=True)
    gt_path = os.path.join(out_root, "groundtruth.npz")
    np.savez(gt_path, landmarks=landmarks, traj=traj, controls=controls,
             cumulative_counts=cum)
    for r in range(n_runs):
        run_dir = os.path.join(out_root, f"run{r:03d}")
        if motion == "cv":
            rng = np.random.default_rng(seed + 1000 + r)
            measurements = [simdata.noisy_measurements(traj[t], landmarks,
                                                       sp, rng)
                            for t in range(len(traj))]
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, "measurements.txt"), "w") as fh:
                fh.write("% measurements, one step per line, "
                         "range/bearing pairs\n")
                for Z in measurements:
                    fh.write(" ".join("%g %g" % (z[0], z[1]) for z in Z)
                             + " \n")
        else:
            noisy_controls, measurements = simdata.generate_run(
                landmarks, traj, controls, sp, mp, seed=seed + 1000 + r)
            simdata.write_run_dir(run_dir, noisy_controls, measurements)
    return gt_path


def run_batch(cfg: SlamConfig, data_root: str, n_runs: Optional[int] = None,
              ospa_every: int = 1, runner_mode: str = "async",
              verbose: bool = False) -> BatchResult:
    """Run the filter over every run directory under ``data_root`` and score
    against ``groundtruth.npz`` (batch_run.py + batch_analyze.py).

    OSPA is scored on every step by default — the reference's protocol
    (batch_analyze.py:29-33); raise ``ospa_every`` to subsample."""
    gt = np.load(os.path.join(data_root, "groundtruth.npz"))
    traj, landmarks = gt["traj"], gt["landmarks"]
    cum = (gt["cumulative_counts"] if "cumulative_counts" in gt.files
           else np.full(len(traj), len(landmarks)))
    run_dirs = sorted(d for d in os.listdir(data_root)
                      if d.startswith("run"))
    if n_runs:
        run_dirs = run_dirs[:n_runs]

    all_pe, all_ospa, all_neff, all_sps = [], [], [], []
    for rd in run_dirs:
        runner = SynthSLAMRunner(cfg, os.path.join(data_root, rd))
        if runner_mode == "chunked":
            res = runner.run_chunked(collect_maps=True)
        else:
            res = runner.run()
            res["map_weights"] = np.asarray(
                [np.asarray(o.map_weight) for o in res["outs"]])
            res["map_means"] = np.asarray(
                [np.asarray(o.map_mean) for o in res["outs"]])
        est = res["est_poses"]
        T = min(len(est), len(traj))
        pe = np.linalg.norm(est[:T, :2] - traj[:T, :2], axis=1)
        ospas = []
        for k in range(0, T, ospa_every):
            est_map = extract_map_estimate(res["map_weights"][k],
                                           res["map_means"][k])
            true_map = landmarks[:cum[min(k, len(cum) - 1)]]
            o, _, _ = ospa_distance(true_map, est_map, p=1, c=5)
            ospas.append(o)
        all_pe.append(pe)
        all_ospa.append(ospas)
        all_neff.append(res["n_eff"][:T])
        all_sps.append(res["steps_per_s"])
        if verbose:
            print(f"{rd}: mean_pose_err={pe.mean():.3f} "
                  f"mean_ospa={np.mean(ospas):.3f} "
                  f"{res['steps_per_s']:.1f} steps/s")

    L = min(map(len, all_pe))
    S = min(map(len, all_ospa))
    return BatchResult(
        pose_err=np.asarray([p[:L] for p in all_pe]),
        ospa=np.asarray([o[:S] for o in all_ospa]),
        n_eff=np.asarray([n[:L] for n in all_neff]),
        steps_per_s=np.asarray(all_sps))


if __name__ == "__main__":
    import argparse

    from ..config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("data_root")
    ap.add_argument("--generate", type=int, metavar="N_RUNS", default=0)
    ap.add_argument("--runs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--motion", choices=("ackerman", "cv"),
                    default="ackerman")
    args = ap.parse_args()
    cfg = load_config(args.config)
    if args.generate:
        generate_batch_datasets(args.data_root, n_runs=args.generate,
                                n_steps=args.steps, motion=args.motion)
    res = run_batch(cfg, args.data_root, n_runs=args.runs, verbose=True)
    print(res.summary())


# ----------------------------------------------------------------------------
# Log-file analysis — drop-in equivalent of batch_analyze.py (parses the
# state_estimateXXXXX.log text format instead of in-memory results).
# ----------------------------------------------------------------------------

def parse_state_log(path: str) -> dict:
    """Parse one state_estimateXXXXX.log (6/7-line format, main.cpp:848-954).

    Returns dict with est_pose, static map (w, mean) arrays, particle log
    weights and nEff. Map extraction follows batch_analyze.py:21-28: the
    top-round(sum w) features by weight.
    """
    with open(path) as fh:
        lines = fh.read().splitlines()
    pose = np.fromstring(lines[0], sep=" ")
    static = np.fromstring(lines[1], sep=" ") if len(lines) > 1 else np.empty(0)
    w = static[0::7]
    mx = static[1::7]
    my = static[2::7]
    means = np.column_stack([mx, my]) if w.size else np.zeros((0, 2))
    log_w = np.fromstring(lines[3], sep=" ") if len(lines) > 3 else np.empty(0)
    n_eff = (1.0 / np.sum(np.exp(log_w) ** 2) / max(1, len(log_w))
             if log_w.size else float("nan"))
    # top-round(sum(w)) extraction (batch_analyze.py:25-28)
    if w.size:
        n_est = int(round(w.sum()))
        order = np.argsort(w)[::-1]
        est_map = means[order[:n_est]]
    else:
        est_map = means
    return {"est_pose": pose[:3], "map_weights": w, "map_means": means,
            "est_map": est_map, "log_weights": log_w, "n_eff": n_eff}


def analyze_log_dir(log_dir: str, true_traj, landmarks,
                    ospa_every: int = 10) -> dict:
    """Score a directory of state logs against ground truth
    (compute_error, batch_analyze.py:44-97)."""
    files = sorted(f for f in os.listdir(log_dir)
                   if f.startswith("state_estimate"))
    pose_err, ospas, n_effs = [], [], []
    for i, f in enumerate(files):
        rec = parse_state_log(os.path.join(log_dir, f))
        k = int(f[len("state_estimate"):-len(".log")])
        if k < len(true_traj):
            pose_err.append(float(np.linalg.norm(
                rec["est_pose"][:2] - true_traj[k, :2])))
        if i % ospa_every == 0:
            o, loc, cn = ospa_distance(landmarks, rec["est_map"], p=1, c=5)
            ospas.append(o)
        n_effs.append(rec["n_eff"])
    return {"pose_err": np.asarray(pose_err), "ospa": np.asarray(ospas),
            "n_eff": np.asarray(n_effs),
            "mean_pose_err": float(np.mean(pose_err)) if pose_err else
            float("nan"),
            "mean_ospa": float(np.mean(ospas)) if ospas else float("nan")}
