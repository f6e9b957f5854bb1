"""MC A/B: gated vs ungated births on the CPHD filter.

Generates N Monte-Carlo worlds (the reference's batch_run protocol),
runs the CPHD filter on each with cfg.gate_births on and off, and reports
pose error / OSPA / cardinality-error deltas — the acceptance evidence
for the gated-birth path (phdfilter.cu.bak:794-900).

Usage: python tools/ab_gated_births.py [n_runs] (default 10)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses
import tempfile

import numpy as np

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.eval.batch import generate_batch_datasets, run_batch


def main(n_runs=10):
    root = tempfile.mkdtemp(prefix="gated_ab_")
    generate_batch_datasets(root, n_runs=n_runs, n_landmarks=40,
                            n_steps=150, dt=0.1, seed=11)
    gt = np.load(os.path.join(root, "groundtruth.npz"))
    cfg = SlamConfig(
        n_particles=256, max_features=64, max_measurements=64,
        motion_type=1, feature_model=0, filter_type=1, max_cardinality=64,
        l=2.83, h=0.76, a=3.78, b=0.5, std_encoder=2.0, std_alpha=0.0873,
        max_range=10.0, std_range=1.0, std_bearing=0.0349,
        clutter_rate=5.0, pd=0.95, birth_weight=0.05, min_separation=5.0,
        particle_weighting=0, resample_threshold=0.15, dt=0.1, seed=9,
        x0=float(gt["traj"][0, 0]), y0=float(gt["traj"][0, 1]))

    for gated in (False, True):
        c = dataclasses.replace(cfg, gate_births=gated)
        res = run_batch(c, root, ospa_every=10)
        s = res.summary()
        print(f"gate_births={gated}: pose {s['mean_pose_err']:.2f} "
              f"+/- {s['std_pose_err']:.2f} m, OSPA {s['mean_ospa']:.2f} "
              f"+/- {s['std_ospa']:.2f}, nEff {np.nanmean(res.n_eff):.2f}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
