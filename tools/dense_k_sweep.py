"""Dense K-capacity sweep (round-5 verdict item 5).

At dense P=10240 the live feature count is ~300 of the K=1024 capacity
(the reference's own MAXGAUSSIANS cap is 100, slamparams.h:51) — but the
merge width, post sort and detect grid all scale with K. Does K=512/768
hold the documented accuracy band (ATE ~0.31 m, OSPA ~1.23) while moving
the throughput row?

Runs the full dense sequence (chunked) at each K with every-step OSPA
(round-5 protocol). merge_candidate_cap stays 1536 (it budgets the
K*(M+1)+M candidate stream, not the map capacity).

Usage: python tools/dense_k_sweep.py [P] [K ...]   (default 10240, 1024 768 512)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phdslam_tpu.eval.parity import evaluate_dataset


def main(P=10240, ks=(1024, 768, 512)):
    for K in ks:
        r = evaluate_dataset(
            "cfg/dense.cfg", ".", runner="chunked",
            overrides={"n_particles": int(P), "max_features": int(K)})
        print(f"dense P={P} K={K}: ATE {r['mean_pose_err']:.3f} m "
              f"(max {r['max_pose_err']:.2f}) OSPA {r['mean_ospa']:.3f} "
              f"(final {r['final_ospa']:.2f}) "
              f"{r['steps_per_s']:.2f} steps/s", flush=True)


if __name__ == "__main__":
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    ks = tuple(int(k) for k in sys.argv[2:]) or (1024, 768, 512)
    main(P, ks)
