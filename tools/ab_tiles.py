"""A/B: merge_spatial_tiles (spatially-tiled greedy merge) on cfg/dense.cfg.

The dense P=10240/K=1024 frontier is the Pallas merge's sequential
cluster loop (trips x lane-width cost — BENCH.md dense roofline); 2x2
quadrant tiling divides both factors. Usage:

    python tools/ab_tiles.py [P] [tiles0] [tiles1]

Times the chunked dense run (distinct rng per rep, relay-cache safe) at
each merge_spatial_tiles setting and prints steps/s for both.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def bench(P, tiles, reps=2, chunk=16):
    from phdslam_tpu.config import load_config
    from phdslam_tpu.slam import SynthSLAMRunner

    cfg = load_config("cfg/dense.cfg")
    cfg.n_particles = P
    cfg.merge_spatial_tiles = tiles
    if P >= 4096:
        chunk = 4

    def make():
        return SynthSLAMRunner(cfg, "data/dense")

    r = make()
    n_steps = len(r.schedule)
    r.run_chunked(chunk=chunk, collect_maps=False)      # warm
    best = None
    for rep in range(reps):
        r = make()
        r.state = r.state.replace(rng=jax.random.PRNGKey(1000 + rep))
        t0 = time.perf_counter()
        r.run_chunked(chunk=chunk, collect_maps=False)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(n_steps / best, 2)


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    settings = [int(a) for a in sys.argv[2:]] or [0, 4]
    out = {}
    for t in settings:
        out[f"tiles{t}"] = bench(P, t)
        print(f"P={P} tiles={t}: {out[f'tiles{t}']} steps/s",
              file=sys.stderr, flush=True)
    print(json.dumps({"P": P, **out}))


if __name__ == "__main__":
    main()


