"""Micro-profile of the candidate-selection pipeline at large P.

Breaks the update pre-half (48 ms at P=10240 per tools/roofline.py) into
its sub-stages: detection grid, stage-1 select_live_topT (cumsum rank
compaction + payload sort), stage-2 topcap_sort, and the MXU one-hot
candidate gather.

Usage: python tools/probe_select.py [P]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phdslam_tpu.config import load_config
from phdslam_tpu.ops import ekf
from phdslam_tpu.ops.gm_merge import select_live_topT, topcap_sort


def measure(fn, *args, n=20):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, r


def main(P=10240):
    cfg = load_config("cfg/ackerman.cfg")
    K, M, cap, T = (cfg.max_features, cfg.max_measurements,
                    cfg.merge_candidate_cap, cfg.detection_topk)
    print(f"P={P} K={K} M={M} cap={cap} T={T}")
    key = jax.random.PRNGKey(0)
    mean = jax.random.uniform(key, (P, K, 2), minval=-20, maxval=20)
    weight = jnp.broadcast_to(jnp.where(jnp.arange(K) < 50, 0.5, 0.0),
                              (P, K))
    cov = jnp.broadcast_to(jnp.eye(2) * 0.5, (P, K, 2, 2))
    pose = jnp.zeros((P, 6))
    z = jax.random.uniform(jax.random.PRNGKey(1), (M, 2), minval=0, maxval=8)

    pre_fn = lambda p_, m_, c_: jax.vmap(
        lambda p, m, c: ekf.ekf_preupdate(p, m, c, cfg))(p_, m_, c_)
    pre = jax.jit(pre_fn)(pose, mean, cov)

    det_fn = lambda pre_, w_: jax.vmap(
        lambda pr, w: ekf.ekf_detection_linear(pr, w, z))(pre_, w_)
    t, pdw = measure(det_fn, pre, weight)
    print(f"detection grid [P,M,K]      {t*1e3:8.2f} ms")

    thr = jnp.full((P, M), 1e-6)

    s1 = lambda g, th: jax.vmap(
        lambda gg, tt: select_live_topT(gg, tt, T))(g, th)
    t, s1_out = measure(s1, pdw, thr)
    print(f"stage1 select_live_topT     {t*1e3:8.2f} ms")
    vals_d, idx_d, _, _ = s1_out

    # assemble reduced lane set like _update_single_pre
    def reduced(vals_d, idx_d, w_):
        def one(vd, id_, w):
            flat_d = (K + jnp.arange(M, dtype=jnp.int32)[:, None] * K + id_)
            red_w = jnp.concatenate([w, vd.reshape(M * T),
                                     jnp.full((M,), 1e-4)], axis=0)
            red_act = jnp.concatenate([w > 0, (vd > 0).reshape(M * T),
                                       jnp.ones((M,), bool)], axis=0)
            red_flat = jnp.concatenate(
                [jnp.arange(K, dtype=jnp.int32), flat_d.reshape(M * T),
                 K + M * K + jnp.arange(M, dtype=jnp.int32)], axis=0)
            return red_w, red_act, red_flat
        return jax.vmap(one)(vals_d, idx_d, w_)

    red_w, red_act, red_flat = jax.jit(reduced)(vals_d, idx_d, weight)
    print(f"reduced lane count N_red = {red_w.shape[1]}")

    s2 = lambda a, b, c: jax.vmap(
        lambda x, y, z_: topcap_sort(x, y, z_, cap))(a, b, c)
    t, s2_out = measure(s2, red_w, red_act, red_flat)
    print(f"stage2 topcap_sort          {t*1e3:8.2f} ms")
    idx, cand_w, sel_act, _ = s2_out

    b_mean = jnp.zeros((P, M, 2))
    b_cov = jnp.broadcast_to(jnp.eye(2), (P, M, 2, 2))
    g = lambda i_, a_, m_, c_, p_, bm_, bc_: jax.vmap(
        lambda i, a, m, c, pr, bm, bc: ekf.select_compact_candidates(
            i, a, m, c, pr, z, bm, bc))(i_, a_, m_, c_, p_, bm_, bc_)
    t, _ = measure(g, idx, sel_act, mean, cov, pre, b_mean, b_cov)
    print(f"candidate gather (one-hot)  {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10240)
