"""A/B the width-switch fractions on the P=512 scanned bench.

Usage: python tools/ab_widths.py V0 V1 V2 V3   (any subset)
  V0: shipped defaults
  V1: merge WIDTH_FRACS=(4, 2)   -- drop the quarter-step 1.3333 variant
  V2: merge WIDTH_FRACS=()      -- no merge width switching
  V3: detect M_FRACS=()         -- no detection M-width switching
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

from phdslam_tpu.config import load_config
from phdslam_tpu.ops import gm_merge, pallas_detect
from phdslam_tpu.slam import SynthSLAMRunner

VARIANTS = {
    "V0": {},
    "V1": {"WIDTH_FRACS": (4, 2)},
    "V2": {"WIDTH_FRACS": ()},
    "V3": {"M_FRACS": ()},
}


def measure(name, overrides, reps=3):
    old_w, old_m = gm_merge.WIDTH_FRACS, pallas_detect.M_FRACS
    gm_merge.WIDTH_FRACS = overrides.get("WIDTH_FRACS", old_w)
    pallas_detect.M_FRACS = overrides.get("M_FRACS", old_m)
    try:
        cfg = load_config("cfg/ackerman.cfg")
        cfg.n_particles = 512
        SynthSLAMRunner(cfg, "data/ackerman").run_scanned(collect_maps=False)
        best = None
        for _ in range(reps):
            r = SynthSLAMRunner(cfg, "data/ackerman")
            t0 = time.perf_counter()
            r.run_scanned(collect_maps=False)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        n = len(SynthSLAMRunner(cfg, "data/ackerman").schedule)
        print(f"{name}: best {n/best:.1f} steps/s ({best:.2f}s)", flush=True)
    finally:
        gm_merge.WIDTH_FRACS = old_w
        pallas_detect.M_FRACS = old_m


for v in sys.argv[1:] or ["V0"]:
    measure(v, VARIANTS[v])
