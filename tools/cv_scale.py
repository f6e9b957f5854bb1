"""CV full-sequence accuracy at particle scale (round-4 verdict item 7).

The 1000-step CV dataset has an information desert at steps ~300-500 (one
landmark in range at k=400); the float64 reference-semantics oracle drifts
36 m through it at P=64 and the engine matches at P=512 (16.9-37 m band,
BENCH.md). Particle scale is the engine's unique capability vs the
reference — measure whether P=10240 shrinks the desert drift.

Usage: python tools/cv_scale.py [P ...]   (default 512 2048 10240)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from phdslam_tpu.eval.parity import evaluate_dataset


def main(particle_counts):
    for P in particle_counts:
        r = evaluate_dataset("cfg/cv.cfg", ".", overrides={
            "n_particles": int(P)}, runner="chunked")
        pe = np.asarray(r["pose_err"])
        n = len(pe)
        pre = pe[: int(0.3 * n)]
        print(f"CV P={P}: full ATE {pe.mean():.2f} m (max {pe.max():.1f}) "
              f"steps 0-300 {pre.mean():.2f} m  "
              f"OSPA {np.mean(r['ospa']):.2f}  "
              f"[{r.get('steps_per_s', 0):.1f} steps/s]", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [512, 2048, 10240])
