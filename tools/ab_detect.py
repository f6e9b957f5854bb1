"""A/B: detect_adaptive (adaptive top-T trips in the fused detect kernel).

Times full runs at a given config/particle count with the adaptive
while_loop on and off (exact-equivalent outputs; see config.py).

    python tools/ab_detect.py cfg/dense.cfg data/dense 1024
    python tools/ab_detect.py cfg/ackerman.cfg data/ackerman 10240
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def bench(cfg_path, data_dir, P, adaptive, reps=2):
    from phdslam_tpu.config import load_config
    from phdslam_tpu.slam import SynthSLAMRunner

    cfg = load_config(cfg_path)
    cfg.n_particles = P
    cfg.detect_adaptive = adaptive
    chunk = 4 if (P >= 4096 and "dense" in cfg_path) else 16

    def make():
        return SynthSLAMRunner(cfg, data_dir)

    r = make()
    n_steps = len(r.schedule)
    r.run_chunked(chunk=chunk, collect_maps=False)      # warm
    best = None
    for rep in range(reps):
        r = make()
        r.state = r.state.replace(rng=jax.random.PRNGKey(2000 + rep))
        t0 = time.perf_counter()
        r.run_chunked(chunk=chunk, collect_maps=False)
        best_t = time.perf_counter() - t0
        best = best_t if best is None else min(best, best_t)
    return round(n_steps / best, 2)


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "cfg/dense.cfg"
    data_dir = sys.argv[2] if len(sys.argv) > 2 else "data/dense"
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    out = {}
    for a in (0, 1):
        out[f"adaptive{a}"] = bench(cfg_path, data_dir, P, a)
        print(f"{cfg_path} P={P} adaptive={a}: {out[f'adaptive{a}']} "
              "steps/s", file=sys.stderr, flush=True)
    print(json.dumps({"cfg": cfg_path, "P": P, **out}))


if __name__ == "__main__":
    main()
