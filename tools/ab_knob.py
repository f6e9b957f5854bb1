"""Generic config-knob A/B on a full driver run (real TPU).

    python tools/ab_knob.py <cfg> <data_dir> <P> <knob> <v0> <v1> [...]

Times the chunked run at each knob value (distinct rng per rep — relay
caching serves bit-identical re-runs; BENCH.md protocol).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def bench(cfg_path, data_dir, P, knob, value, reps=2):
    from phdslam_tpu.config import load_config
    from phdslam_tpu.slam import SynthSLAMRunner

    cfg = load_config(cfg_path)
    cfg.n_particles = P
    setattr(cfg, knob, value)
    chunk = 4 if (P >= 4096 and "dense" in cfg_path) else 16

    def make():
        return SynthSLAMRunner(cfg, data_dir)

    r = make()
    n_steps = len(r.schedule)
    r.run_chunked(chunk=chunk, collect_maps=False)      # warm
    best = None
    for rep in range(reps):
        r = make()
        r.state = r.state.replace(rng=jax.random.PRNGKey(3000 + rep))
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

    cfg_path, data_dir, P, knob = sys.argv[1:5]
    values = [int(v) for v in sys.argv[5:]]
    out = {}
    for v in values:
        out[f"{knob}={v}"] = bench(cfg_path, data_dir, int(P), knob, v)
        print(f"{cfg_path} P={P} {knob}={v}: {out[f'{knob}={v}']} steps/s",
              file=sys.stderr, flush=True)
    print(json.dumps({"cfg": cfg_path, "P": int(P), **out}))


if __name__ == "__main__":
    main()
