"""EAP extraction at scale (real TPU): tree cost + full-run EAP-on rows.

Round-2 measured ~630 ms/extraction at P=10240/K=1024 (unsorted tree) and
no full-run EAP-on number. This measures the round-3 sorted tree and the
dense full-sequence throughput with map_estimate=2 at eap_every 1 and 5.

Usage: python tools/bench_eap.py [tree|run|all]
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

import jax.numpy as jnp
import numpy as np


def tree_time(P=10240, K=1024, live=260, sites=300):
    """One eap_expected_map call on a realistic weight-sorted map."""
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filters.extras import eap_expected_map
    from phdslam_tpu.types import GMState

    cfg = load_config("cfg/dense.cfg")
    rng = np.random.default_rng(0)
    centers = rng.uniform(-40, 40, (sites, 2)).astype(np.float32)
    idx = rng.integers(0, sites, (P, K))
    mean = centers[idx] + rng.normal(0, 0.3, (P, K, 2)).astype(np.float32)
    w = np.zeros((P, K), np.float32)
    w[:, :live] = np.sort(
        rng.uniform(0.1, 1.0, (P, live)).astype(np.float32), axis=1)[:, ::-1]
    mean[:, live:] = 0.0
    gm = GMState(mean=jnp.asarray(mean),
                 cov=jnp.broadcast_to(
                     jnp.eye(2, dtype=jnp.float32) * 0.1, (P, K, 2, 2)),
                 weight=jnp.asarray(w))
    lw = jnp.full((P,), -np.log(P), jnp.float32)

    # direct per-call timing with a forced scalar fetch per call and
    # distinct input values per dispatch. NB: wrapping reps extractions in
    # one lax.scan and timing the scan measured ~0.1 ms total over the
    # tunnel (returned before the work completed / relay-cached) — a
    # fetched output scalar is the only sync this relay honors reliably.
    fn = jax.jit(lambda g, l: eap_expected_map(g, l, cfg))
    m, c, wt = fn(gm, lw)
    jax.block_until_ready(wt)
    best = None
    for r in range(3):
        lw_r = lw + 0.001 * (r + 1)       # distinct values per dispatch
        t0 = time.perf_counter()
        m, c, wt = fn(gm, lw_r)
        float(jnp.sum(wt))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"eap tree P={P} K={K} live~{live}: {best*1000:.0f} ms/extraction "
          f"(round-2 unsorted: ~630 ms)", flush=True)


def full_run(variants=((1, 1), (2, 1), (2, 5))):
    """(map_estimate, eap_every) variants; 3 timed runs each (best)."""
    from phdslam_tpu.config import load_config
    from phdslam_tpu.slam import SynthSLAMRunner

    for me, ee in variants:
        cfg = load_config("cfg/dense.cfg")
        cfg.n_particles = 10240
        cfg.map_estimate = me
        cfg.eap_every = ee
        r = SynthSLAMRunner(cfg, "data/dense")
        r.run_chunked(chunk=10, collect_maps=False)         # warm/compile
        best = 0.0
        for rep in range(3):
            r = SynthSLAMRunner(cfg, "data/dense")
            r.state = r.state.replace(rng=jax.random.PRNGKey(1000 + rep))
            res = r.run_chunked(chunk=10, collect_maps=False)
            best = max(best, res["steps_per_s"])
        tag = "MAP" if me == 1 else f"EAP eap_every={ee}"
        print(f"dense P=10240 K=1024 {tag}: {best:.2f} steps/s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("tree", "all"):
        tree_time()
    if mode in ("run", "all"):
        full_run()
