"""Disparity SC-PHD benchmarks at REFERENCE particle scale (real TPU).

The reference ships n_particles=200 (cfg/config.cfg:141) with a default of
512 (main.cpp:991). Round-2 benched only 32 particles; this measures the
chunked disparity runner at 200/512 particles and the full-SLAM
(filtered-pose) accuracy at 200.

Usage: python tools/bench_disparity.py [throughput|accuracy|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def throughput(particles_list=(32, 200, 512), n_steps=60):
    import copy
    import tempfile

    from phdslam_tpu.config import load_config
    from phdslam_tpu.eval import simdata
    from phdslam_tpu.slam_disparity import run_disparity

    cfg0 = load_config("cfg/disparity.cfg")
    _, traj, measurements = simdata.generate_disparity_world(
        n_landmarks=24, n_steps=n_steps, dt=cfg0.dt, seed=0,
        fx=cfg0.fx, fy=cfg0.fy, u0=cfg0.u0, v0=cfg0.v0,
        width=int(cfg0.image_width), height=int(cfg0.image_height),
        std_uv=cfg0.std_u, pd=cfg0.pd, clutter_rate=cfg0.clutter_rate,
        vx=cfg0.vx0)
    with tempfile.TemporaryDirectory() as tmp:
        simdata.write_disparity_run_dir(tmp, measurements)
        for P in particles_list:
            cfg = copy.deepcopy(cfg0)
            cfg.n_particles = P
            cfg.n_steps = n_steps
            chunk = 20 if P >= 200 else 0
            run_disparity(copy.deepcopy(cfg), data_dir=tmp,
                          chunk=chunk)                # warm/compile
            best = 0.0
            for rep in range(3):
                # distinct seed per rep: identical re-runs can be served
                # by relay-level caching (BENCH.md); the traced program is
                # shared across seeds (seed excluded from the scan cache
                # key — it only enters init_disparity_state)
                cfg2 = copy.deepcopy(cfg)
                cfg2.seed = 1000 + rep
                res = run_disparity(cfg2, data_dir=tmp, chunk=chunk)
                best = max(best, res["steps_per_s"])
            print(f"disparity P={P} (K={cfg.max_features}, "
                  f"N={cfg.particles_per_feature}): {best:.1f} steps/s",
                  flush=True)


def accuracy(P=200, n_runs=5):
    from phdslam_tpu.eval.parity import evaluate_disparity

    rows = []
    for s in range(n_runs):
        r = evaluate_disparity(n_landmarks=25, n_steps=60, seed=s,
                               follow_trajectory=False, ospa_c=1.0,
                               cfg_overrides={"n_particles": P})
        rows.append(r)
        print(f"run {s}: pose {r['mean_pose_err']:.3f} m "
              f"(final {r['final_pose_err']:.3f}) OSPA {r['ospa']:.2f} "
              f"n_est {r['n_est']}/{r['n_true']}", flush=True)
    pe = np.array([r["mean_pose_err"] for r in rows])
    oo = np.array([r["ospa"] for r in rows])
    print(f"FULL-SLAM disparity P={P}: pose {pe.mean():.3f}+-{pe.std():.3f} m"
          f"  OSPA(1,1) {oo.mean():.2f}+-{oo.std():.2f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("throughput", "all"):
        throughput()
    if mode in ("accuracy", "all"):
        accuracy()
