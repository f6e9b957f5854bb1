"""Roofline verification of the hot filter stages (BASELINE.md target:
"GM-update and prune/merge kernels at speed-of-light per chip").

For each hot stage of the GM-PHD update at the benchmark shapes, this tool
computes the analytic MINIMUM HBM traffic (inputs read once + outputs
written once) and FLOP count, measures on-device time, and reports achieved
bandwidth/compute against the chip's roofline: time_bound = max(bytes / BW,
flops / peak). Stages whose measured time approaches the bound are at
speed-of-light; the report states which resource bounds each stage.

Peak numbers are the public TPU v5e specs (197 TFLOP/s bf16 MXU — f32
matmul runs as multi-pass, modeled at 1/4 peak; ~819 GB/s HBM). The VPU
elementwise bound is modeled as 8x128 lanes x 4 ALUs at ~0.94 GHz ≈ 3.8
Tops/s f32.

Usage: python tools/roofline.py [P] [cfg_path] — prints a table + one
JSON line. cfg_path defaults to cfg/ackerman.cfg; pass cfg/dense.cfg to
roofline the dense (K=1024) shapes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBS = 819e9
MXU_F32 = 197e12 / 4.0
VPU_F32 = 3.8e12


def measure(fn, *args, n=20):
    import jax
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main(P=512, cfg_path="cfg/ackerman.cfg"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from phdslam_tpu.config import load_config
    from phdslam_tpu.filters import phd
    from phdslam_tpu.ops import ekf
    from phdslam_tpu.ops.gm_merge import merge_batch_dispatch

    cfg = load_config(cfg_path)
    cfg.n_particles = P
    K, M, cap = cfg.max_features, cfg.max_measurements, cfg.merge_candidate_cap
    key = jax.random.PRNGKey(0)
    mean = jax.random.uniform(key, (P, K, 2), minval=-20, maxval=20)
    n_live = max(50, K // 3)
    weight = jnp.broadcast_to(jnp.where(jnp.arange(K) < n_live, 0.5, 0.0),
                              (P, K))
    cov = jnp.broadcast_to(jnp.eye(2) * 0.5, (P, K, 2, 2))
    pose = jnp.zeros((P, 6))
    z = jax.random.uniform(jax.random.PRNGKey(1), (M, 2), minval=0, maxval=8)
    zmask = jnp.arange(M) < min(29, M - 1) + (M // 3 if M > 64 else 0)
    f4 = 4

    rows = []

    def add(name, t, bytes_, flops, note):
        t_bw = bytes_ / HBM_GBS
        t_fl = flops / (MXU_F32 if "MXU" in note else VPU_F32)
        bound = max(t_bw, t_fl)
        rows.append(dict(stage=name, ms=t * 1e3, bound_ms=bound * 1e3,
                         sol=bound / t, gbs=bytes_ / t / 1e9,
                         bound_by="HBM" if t_bw >= t_fl else note, note=note))

    # --- EKF pre-update: per-feature S, S^-1, gain, Joseph cov ------------
    pre_fn = lambda p_, m_, c_: jax.vmap(
        lambda p, m, c: ekf.ekf_preupdate(p, m, c, cfg))(p_, m_, c_)
    t = measure(pre_fn, pose, mean, cov)
    by = P * K * (2 + 4) * f4 + P * K * (4 + 4 + 1 + 4 + 2 + 2 + 3) * f4
    fl = P * K * 120
    add("ekf_preupdate [P,K]", t, by, fl, "VPU")
    pre = jax.jit(pre_fn)(pose, mean, cov)

    # --- detection likelihood grid [P,M,K] --------------------------------
    det_fn = lambda pre_, w_: jax.vmap(
        lambda pr, w: ekf.ekf_detection_linear(pr, w, z))(pre_, w_)
    t = measure(det_fn, pre, weight)
    by = P * K * 7 * f4 + P * M * K * f4          # planes in, pdw out
    fl = P * M * K * 20
    add("detection grid [P,M,K]", t, by, fl, "VPU")

    # --- fused detection + top-T kernel ------------------------------------
    from phdslam_tpu.filters.phd import _detection_planes_single
    from phdslam_tpu.ops.pallas_detect import detection_topT_batch
    planes_fn = lambda p_, m_, c_, w_: jax.vmap(
        lambda p, m, c, w: _detection_planes_single(p, m, c, w, cfg))(
        p_, m_, c_, w_)
    planes = jax.jit(planes_fn)(pose, mean, cov, weight)
    z4 = jnp.stack([z[:, 0], z[:, 1], zmask.astype(jnp.float32),
                    jnp.zeros_like(z[:, 0])], axis=1)
    T_k = cfg.detection_topk
    det_kfn = lambda pl_: detection_topT_batch(
        pl_, z4, T_k, float(cfg.min_feature_weight),
        float(cfg.clutter_density + cfg.birth_weight))
    t = measure(det_kfn, planes)
    by = P * 6 * K * f4 + P * M * (2 * T_k + 2) * f4
    add("fused detect+topT kernel", t, by, P * M * K * (30 + T_k * 3),
        "VPU")

    # --- full pre half (grid + selection + candidate gather) --------------
    full_pre = lambda p_, m_, c_, w_: jax.vmap(
        lambda p, m, c, w: phd._update_single_pre(
            p, m, c, w, z, zmask, cfg))(p_, m_, c_, w_)
    t = measure(full_pre, pose, mean, cov, weight)
    by = (P * K * (2 + 4 + 1) * f4                # map in
          + P * M * K * f4 * 3                    # pdw materialize + 2 passes
          + P * cap * (2 + 4 + 1) * f4)           # candidates out
    fl = P * M * K * 30 + P * cap * K * 16 * 2
    add("update pre-half (fused)", t, by, fl, "VPU")
    pre_out = jax.jit(full_pre)(pose, mean, cov, weight)

    # --- Pallas greedy merge ----------------------------------------------
    from phdslam_tpu.ops.gm_merge import merge_batch_dispatch_packed
    if pre_out["gather"] is not None:
        cand_fn = jax.jit(lambda p_: phd._finish_candidates_packed(p_, 2))
        t = measure(cand_fn, pre_out)
        rows.append(dict(stage="candidate gather (pallas)", ms=t * 1e3,
                         bound_ms=None, sol=None, gbs=None, bound_by="",
                         note="deferred batch gather, packed planes"))
        packed = cand_fn(pre_out)
        mfn = lambda pk: merge_batch_dispatch_packed(pk, 2, cfg, K,
                                                     sorted_prefix=True)
        t = measure(mfn, packed)
        mg = jax.jit(mfn)(packed)
    else:
        cm, cc, cw, ca = pre_out["cand"]
        mfn2 = lambda *a: merge_batch_dispatch(*a, cfg, K)
        t = measure(mfn2, cm, cc, cw, ca)
        mg = jax.jit(mfn2)(cm, cc, cw, ca)
    by = P * 7 * cap * f4 + P * 8 * K * f4
    # VPU work is data-dependent (~clusters x N x ~40 lane-ops); report
    # HBM-roofline + achieved cluster rate instead
    add("pallas greedy merge", t, by, 0, "VPU-loop")
    import numpy as np
    clusters = float(jnp.sum(mg[3]))
    rows[-1]["note"] = (f"data-dep loop: {clusters/P:.0f} clusters/particle, "
                        f"{clusters / t / 1e6:.1f}M clusters/s")

    # --- post half (recombine + top-K compaction) --------------------------
    post = lambda mg_, pre_, m_, c_, w_: jax.vmap(
        lambda t_, p2, m, c, w: phd._update_single_post(
            t_, p2, m, c, w, cfg))(mg_, pre_, m_, c_, w_)
    t = measure(post, mg, pre_out, mean, cov, weight)
    n_all = K + cap
    by = P * n_all * (2 + 4 + 1) * f4 + P * K * (2 + 4 + 1) * f4
    fl = P * K * n_all * 7 * 2                    # one-hot row-move matmuls
    add("update post-half", t, by, fl, "MXU")

    # --- full batched update ------------------------------------------------
    t = measure(lambda p_, m_, c_, w_: phd._batched_update(
        p_, m_, c_, w_, z, zmask, cfg), pose, mean, cov, weight)
    rows.append(dict(stage="FULL GM update", ms=t * 1e3, bound_ms=None,
                     sol=None, gbs=None, bound_by="", note="end-to-end"))

    print(f"\nRoofline @ P={P}, K={K}, M={M}, cap={cap} "
          f"(v5e: {HBM_GBS/1e9:.0f} GB/s HBM)")
    print(f"{'stage':28s} {'ms':>8s} {'bound ms':>9s} {'SoL':>6s} "
          f"{'GB/s':>7s}  bound/note")
    for r in rows:
        sol = f"{r['sol']*100:5.1f}%" if r["sol"] else "     -"
        bnd = f"{r['bound_ms']:9.3f}" if r["bound_ms"] is not None else "        -"
        gbs = f"{r['gbs']:7.1f}" if r["gbs"] else "      -"
        print(f"{r['stage']:28s} {r['ms']:8.3f} {bnd} {sol} {gbs}  "
              f"{r['bound_by']} {r['note']}")
    print(json.dumps({"metric": f"gm_update_ms_P{P}",
                      "value": round(rows[-1]["ms"], 2), "unit": "ms"}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         sys.argv[2] if len(sys.argv) > 2 else "cfg/ackerman.cfg")
