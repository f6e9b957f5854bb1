"""CPHD throughput measurement on the real TPU (round-3 psi1d factorization).

Usage: python tools/bench_cphd.py [P ...]   (defaults: 512 10240)
Prints steps/s per particle count, chunked runner, warm jax cache.
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
from phdslam_tpu.slam import SynthSLAMRunner


def main():
    ps = [int(a) for a in sys.argv[1:]] or [512, 10240]
    for P in ps:
        cfg = load_config("cfg/ackerman_cphd.cfg")
        cfg.n_particles = P
        chunk = 64 if P <= 2048 else 16
        r = SynthSLAMRunner(cfg, "data/ackerman")
        r.run_chunked(chunk=chunk, collect_maps=False)  # warm/compile
        best = 0.0
        for rep in range(3):
            # distinct rng per rep: identical re-runs can be served by
            # relay-level caching (measured 2.4x inflation — BENCH.md)
            r = SynthSLAMRunner(cfg, "data/ackerman")
            r.state = r.state.replace(rng=jax.random.PRNGKey(1000 + rep))
            res = r.run_chunked(chunk=chunk, collect_maps=False)
            best = max(best, res["steps_per_s"])
        print(f"CPHD P={P}: {best:.2f} steps/s "
              f"(overflow={res['overflow']})", flush=True)


if __name__ == "__main__":
    main()
