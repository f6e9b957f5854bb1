"""Headline benchmark: filter steps/s on the canonical Ackerman sequence.

Runs the full Rao-Blackwellized GM-PHD SLAM filter (predict + GM-PHD update +
extraction + resampling) over the synthetic Ackerman dataset
(/root/reference/matlab/measurements_synth_ackerman.txt protocol, 331
measurement steps + 999 controls interleaved by timestamp) at the reference's
default particle count (512, main.cpp:991).

Baseline: the reference publishes no numbers (BASELINE.md); its implied
target is real-time operation at the dataset rate dt=0.1 s -> 10 filter
steps/s. ``vs_baseline`` is the measured multiple of that real-time rate.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compile cache: remote-compiles over the axon tunnel take
    # minutes; the cache makes warm runs start in seconds
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from phdslam_tpu.config import load_config
    from phdslam_tpu.slam import SynthSLAMRunner

    cfg = load_config("cfg/ackerman.cfg")
    cfg.n_particles = 512

    def fresh_runner():
        return SynthSLAMRunner(cfg, "data/ackerman")

    runner = fresh_runner()
    n_steps = len(runner.schedule)

    def timed(run_once, reps=3):
        # best-of-3: throughput over the axon tunnel swings +-15% run to
        # run (relay scheduling); a single timed run under-reports by up
        # to 33% (round-1 driver artifact vs the best-of-3 anchor)
        run_once(fresh_runner())          # compile + warm caches
        best = None
        for _ in range(reps):
            r = fresh_runner()
            t0 = time.perf_counter()
            run_once(r)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    try:
        wall = timed(lambda r: r.run_scanned(collect_maps=False))
        mode = "scanned"
    except Exception as e:  # pragma: no cover - TPU runtime fallback
        print(f"scanned path failed ({type(e).__name__}: {e}); "
              "falling back to async per-step", file=sys.stderr)
        wall = timed(lambda r: r.run())
        mode = "async"

    steps_per_s = n_steps / wall
    print(json.dumps({
        "metric": f"ackerman_512p_filter_steps_per_s_{mode}",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
