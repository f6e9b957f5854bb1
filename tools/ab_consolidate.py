"""A/B the same-source pre-consolidation (cfg.premerge_consolidate).

Throughput (chunked, distinct-rng honest protocol) and accuracy
(evaluate_dataset ATE/OSPA) with consolidation off vs on, at the dense
BASELINE shape and the P=10240 ackerman shape — the acceptance gate for
shipping the knob (round-4 verdict item 1: OSPA-neutral or it stays off).

Usage: python tools/ab_consolidate.py [dense|dense10k|ackerman|accuracy]...
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


def throughput(cfg_path, data_dir, particles, chunk=16, reps=2):
    for cons in (0, 1):
        cfg = load_config(cfg_path)
        cfg.n_particles = particles
        cfg.premerge_consolidate = cons
        r = SynthSLAMRunner(cfg, data_dir)
        n = len(r.schedule)
        r.run_chunked(chunk=chunk, collect_maps=False)       # warm
        best = None
        for rep in range(reps):
            r2 = SynthSLAMRunner(cfg, data_dir)
            r2.state = r2.state.replace(rng=jax.random.PRNGKey(1000 + rep))
            t0 = time.perf_counter()
            r2.run_chunked(chunk=chunk, collect_maps=False)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{os.path.basename(cfg_path)} P={particles} "
              f"consolidate={cons}: {n/best:.2f} steps/s", flush=True)


def accuracy(cfg_path, particles, runner="chunked"):
    from phdslam_tpu.eval.parity import evaluate_dataset
    for cons in (0, 1):
        r = evaluate_dataset(cfg_path, ".", overrides={
            "n_particles": particles, "premerge_consolidate": cons},
            runner=runner)
        import numpy as np
        print(f"{os.path.basename(cfg_path)} P={particles} "
              f"consolidate={cons}: ATE {np.mean(r['pose_err']):.3f} m "
              f"(max {np.max(r['pose_err']):.2f}) OSPA {r['ospa']:.2f}",
              flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["dense", "accuracy"]
    if "dense" in modes:
        throughput("cfg/dense.cfg", "data/dense", 1024)
    if "dense10k" in modes:
        throughput("cfg/dense.cfg", "data/dense", 10240, chunk=4, reps=1)
    if "ackerman" in modes:
        throughput("cfg/ackerman.cfg", "data/ackerman", 10240)
    if "accuracy" in modes:
        accuracy("cfg/dense.cfg", 1024)
        accuracy("cfg/ackerman.cfg", 512)
