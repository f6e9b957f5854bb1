"""Monte-Carlo acceptance at particle SCALE (round-5 verdict item 4).

The reference's MC protocol (python/batch_run.py: 50 fresh noise/world
realizations, batch_analyze.py scoring) was pinned at P=256 in round 3;
this campaign re-runs it for the PHD and CPHD variants at P = 256 / 1024 /
4096 on the SAME 50 worlds — does the engine's headline particle scale
buy accuracy under the reference's own acceptance test?

World/filter protocol = the round-3 campaign (40-landmark ackerman world,
150 steps, dt 0.1, noisy odometry sigma_enc 2.0; filter cfg as in
tools/ab_gated_births.py). OSPA scored EVERY step (round-5 protocol).

Usage: python tools/mc_scale.py [n_runs] [phd|cphd|both] [P ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses

import numpy as np

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.eval.batch import generate_batch_datasets, run_batch

ROOT = "/tmp/mc_scale_worlds"


def base_cfg(gt, filter_type):
    return SlamConfig(
        n_particles=256, max_features=64, max_measurements=64,
        motion_type=1, feature_model=0, filter_type=filter_type,
        max_cardinality=64,
        l=2.83, h=0.76, a=3.78, b=0.5, std_encoder=2.0, std_alpha=0.0873,
        max_range=10.0, std_range=1.0, std_bearing=0.0349,
        clutter_rate=5.0, pd=0.95, birth_weight=0.05, min_separation=5.0,
        particle_weighting=0, resample_threshold=0.15, dt=0.1, seed=9,
        x0=float(gt["traj"][0, 0]), y0=float(gt["traj"][0, 1]))


def main(n_runs=50, which="both", particle_counts=(256, 1024, 4096)):
    if not os.path.isdir(ROOT) or \
            len([d for d in os.listdir(ROOT)
                 if d.startswith("run")]) < n_runs:
        generate_batch_datasets(ROOT, n_runs=n_runs, n_landmarks=40,
                                n_steps=150, dt=0.1, seed=11)
    gt = np.load(os.path.join(ROOT, "groundtruth.npz"))

    variants = {"phd": 0, "cphd": 1}
    if which != "both":
        variants = {which: variants[which]}
    for name, ft in variants.items():
        cfg0 = base_cfg(gt, ft)
        for P in particle_counts:
            c = dataclasses.replace(cfg0, n_particles=int(P))
            res = run_batch(c, ROOT, n_runs=n_runs, ospa_every=1)
            s = res.summary()
            print(f"{name} P={P}: pose {s['mean_pose_err']:.2f} +/- "
                  f"{s['std_pose_err']:.2f} m, OSPA {s['mean_ospa']:.2f} "
                  f"+/- {s['std_ospa']:.2f}, nEff "
                  f"{np.nanmean(res.n_eff):.2f}, "
                  f"{np.mean(res.steps_per_s):.1f} steps/s", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    ps = tuple(int(p) for p in sys.argv[3:]) or (256, 1024, 4096)
    main(n, which, ps)
