"""Mixed jump-Markov Monte-Carlo campaign / velocity-prior sweep (real TPU).

Usage:
  python tools/mc_mixed.py sweep          # 10-run sweep over velocity priors
  python tools/mc_mixed.py full [KEY=V..] # 50-run campaign (optional cfg overrides)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phdslam_tpu.eval.parity import evaluate_mixed_mc


def show(tag, r):
    print(f"{tag}: pose {r['pose'][0]:.2f}+-{r['pose'][1]:.2f}  "
          f"static {r['static_ospa'][0]:.2f}+-{r['static_ospa'][1]:.2f}  "
          f"dyn {r['dynamic_ospa'][0]:.2f}+-{r['dynamic_ospa'][1]:.2f}  "
          f"det {r['dyn_detected_frac'][0]:.2f}  "
          f"trk {r['dyn_track_err'][0]:.2f}  "
          f"vel {r['vel_err'][0]:.2f}+-{r['vel_err'][1]:.2f}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "sweep":
        grids = [
            ("base cov_v=0.25", {}),
            ("bw=0.02", {"birth_weight": 0.02}),
            ("bw=0.02 cov_v=1.0", {"birth_weight": 0.02,
                                   "cov_vx_birth": 1.0,
                                   "cov_vy_birth": 1.0}),
            ("bw=0.02 qmap=0.01", {"birth_weight": 0.02,
                                   "std_ax_map": 0.01,
                                   "std_ay_map": 0.01}),
        ]
        for tag, ov in grids:
            r = evaluate_mixed_mc(n_runs=10, cfg_overrides=ov)
            show(tag, r)
    else:
        ov = {}
        for a in sys.argv[2:]:
            k, v = a.split("=")
            ov[k] = float(v)
        r = evaluate_mixed_mc(n_runs=50, cfg_overrides=ov or None,
                              verbose=True)
        show("FULL 50-run", r)


if __name__ == "__main__":
    main()
