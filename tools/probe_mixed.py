"""Stage profile of the mixed jump-Markov step at scale, on real tensors.

Advances the bench_mixed synthetic protocol ~40 steps at the given P,
then times each sub-stage of _batched_mixed_update as its own jit
(distinct weight-perturbed variants per rep — relay caching) plus the
composed full step via a varying-input scan.

Usage: python tools/probe_mixed.py [P] [K] [M]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phdslam_tpu.filters import mixed as mx
from phdslam_tpu.filters import phd
from phdslam_tpu.filters.phd import phd_step
from phdslam_tpu.ops.pallas_detect import detection_topT_batch
from phdslam_tpu.types import init_state


def timed(fn, variants, reps=3):
    jax.block_until_ready(fn(*variants[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for v in variants[1:]:
            out = fn(*v)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / (len(variants) - 1))
    return best * 1e3


def main(P=10240, K=128, M=32):
    import tools.bench_mixed as bm
    cfg = bm.bench.__wrapped__ if hasattr(bm.bench, "__wrapped__") else None
    # rebuild the bench config inline (bench() builds it locally)
    from phdslam_tpu.config import SlamConfig
    cfg = SlamConfig(
        n_particles=P, max_features=K, max_measurements=M,
        motion_type=0, feature_model=2, filter_type=0,
        vx0=1.5, vyaw0=0.2, ax=0.3, ayaw=0.03,
        max_range=12.0, std_range=0.5, std_bearing=0.02,
        clutter_rate=5.0, pd=0.95, birth_weight=0.05, min_separation=2.0,
        resample_threshold=0.5, particle_weighting=0, tau=0.2,
        cov_vx_birth=0.25, cov_vy_birth=0.25, std_ax_map=0.05,
        std_ay_map=0.05, mixed_fast_path=1, seed=0,
        merge_candidate_cap_dynamic=128)
    state = init_state(cfg)

    rng = np.random.default_rng(0)
    n_real = max(4, M - 8)
    T_adv = 40
    zr = rng.uniform(1.0, 11.0, (T_adv + 1, M)).astype(np.float32)
    zb = rng.uniform(-1.5, 1.5, (T_adv + 1, M)).astype(np.float32)
    z_all = jnp.asarray(np.stack([zr, zb], axis=-1))
    mask = jnp.asarray(np.arange(M) < n_real)
    ctrl = jnp.zeros((2,), jnp.float32)
    step = jax.jit(functools.partial(phd_step, cfg=cfg))
    for t in range(T_adv):
        state, _ = step(state, z_all[t], mask, ctrl, jnp.float32(0.5),
                        jnp.asarray(True))
    jax.block_until_ready(state.pose)
    z = z_all[T_adv]
    z_label = jnp.zeros((M,), jnp.int32)

    gs, gd = state.map_static, state.map_dynamic
    print(f"live static={int(jnp.max(jnp.sum(gs.weight > 0, 1)))} "
          f"dynamic={int(jnp.max(jnp.sum(gd.weight > 0, 1)))}", flush=True)

    def variants_of(*arrs, n=6):
        outs = []
        for i in range(n):
            s = jnp.float32(1.0 + 1e-3 * i)
            outs.append(tuple(a * s if a.dtype == jnp.float32 else a
                              for a in arrs))
        return [tuple(jax.block_until_ready(x) for x in v) for v in outs]

    T = cfg.detection_topk

    # --- stage 1: the two detect kernels (separate vs batched) ----------
    @jax.jit
    def planes_pair(pose, ms, cs, ws, md, cd, wd):
        pl_s = jax.vmap(lambda p, m, c, w: phd._detection_planes_single(
            p, m, c, w, cfg))(pose, ms, cs, ws)
        pl_d = jax.vmap(lambda p, m, c, w: phd._detection_planes_single(
            p, m, c, w, cfg))(pose, md, cd, wd)
        return pl_s, pl_d

    pl_s, pl_d = planes_pair(state.pose, gs.mean, gs.cov, gs.weight,
                             gd.mean, gd.cov, gd.weight)
    z4 = jnp.stack([z[:, 0], z[:, 1], mask.astype(z.dtype),
                    jnp.zeros_like(z[:, 0])], axis=1)

    det2 = jax.jit(lambda a, b: (
        detection_topT_batch(a, z4, T, 0.0, 0.0),
        detection_topT_batch(b, z4, T, 0.0, 0.0)))
    det_b = jax.jit(lambda a, b: detection_topT_batch(
        jnp.concatenate([a, b], axis=0), z4, T, 0.0, 0.0))
    pv = variants_of(pl_s, pl_d)
    print(f"planes pair:        {timed(planes_pair, variants_of(state.pose, gs.mean, gs.cov, gs.weight, gd.mean, gd.cov, gd.weight)):7.2f} ms", flush=True)
    print(f"detect x2 separate: {timed(det2, pv):7.2f} ms", flush=True)
    print(f"detect batched 2P:  {timed(det_b, pv):7.2f} ms", flush=True)

    # --- stage 2: pre vmap ---------------------------------------------
    d_s = detection_topT_batch(pl_s, z4, T, 0.0, 0.0)
    d_d = detection_topT_batch(pl_d, z4, T, 0.0, 0.0)

    @jax.jit
    def pre_fn(pose, ms, cs, ws, md, cd, wd):
        return jax.vmap(
            lambda p, a, b, c, d, e, f, s0, s1, s2, s3, t0, t1, t2, t3:
            mx._update_mixed_pre(p, a, b, c, d, e, f, z, z_label, mask,
                                 cfg, det_s=(s0, s1, s2, s3),
                                 det_d=(t0, t1, t2, t3)))(
            pose, ms, cs, ws, md, cd, wd, *d_s, *d_d)

    pre = pre_fn(state.pose, gs.mean, gs.cov, gs.weight,
                 gd.mean, gd.cov, gd.weight)
    print(f"pre vmap:           {timed(pre_fn, variants_of(state.pose, gs.mean, gs.cov, gs.weight, gd.mean, gd.cov, gd.weight)):7.2f} ms", flush=True)

    # --- stage 3/4: gather+merge per map --------------------------------
    gm_s = jax.jit(lambda g: phd.gather_merge_width_switched(g, 2, cfg, K))
    gm_d = jax.jit(lambda g: phd.gather_merge_width_switched(g, 4, cfg, K))

    def gvar(g, n=6):
        outs = []
        for i in range(n):
            s = jnp.float32(1.0 + 1e-3 * i)
            outs.append(({k: (v * s if v.dtype == jnp.float32 else v)
                          for k, v in g.items()},))
        return outs

    print(f"gather+merge 2D:    {timed(gm_s, gvar(pre['g_s'])):7.2f} ms",
          flush=True)
    print(f"gather+merge 4D:    {timed(gm_d, gvar(pre['g_d'])):7.2f} ms",
          flush=True)

    # --- stage 5: the two post halves -----------------------------------
    mg_s = gm_s(pre["g_s"])
    mg_d = gm_d(pre["g_d"])

    @jax.jit
    def posts(mgs, mgd, ws, wd):
        bits_s = dict(out_m=pre["out_s"], dlog_w=pre["dlog_w"],
                      n_compact=pre["nc_s"], s2=None)
        a = phd._post_compact_batched(mgs, bits_s, gs.mean, gs.cov, ws, cfg)
        bits_d = dict(out_m=jnp.zeros(wd.shape, bool),
                      dlog_w=jnp.zeros(wd.shape[:1], jnp.float32),
                      n_compact=pre["nc_d"], s2=None)
        b = phd._post_compact_batched(mgd, bits_d, gd.mean, gd.cov, wd, cfg)
        return a, b

    mg_vars = []
    for i in range(6):
        s = jnp.float32(1.0 + 1e-3 * i)
        mg_vars.append((jax.tree.map(lambda x: x * s if x.dtype == jnp.float32 else x, mg_s),
                        jax.tree.map(lambda x: x * s if x.dtype == jnp.float32 else x, mg_d),
                        gs.weight * s, gd.weight * s))
    print(f"post x2:            {timed(posts, mg_vars):7.2f} ms", flush=True)

    # --- predict (vehicle + jump-Markov) --------------------------------
    from phdslam_tpu.filters.phd import predict as phd_predict
    pred = jax.jit(lambda st: phd_predict(st, ctrl, jnp.float32(0.5),
                                          cfg, jax.random.PRNGKey(3)))
    st_vars = [(state.replace(rng=jax.random.PRNGKey(i)),) for i in range(6)]
    print(f"predict:            {timed(pred, st_vars):7.2f} ms", flush=True)

    # --- composed step via varying scan ---------------------------------
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_all(st):
        def body(carry, z_t):
            st2, out = phd_step(carry, z_t, mask, ctrl, jnp.float32(0.5),
                                jnp.asarray(True), cfg=cfg)
            return st2, out.n_eff
        return jax.lax.scan(body, st, z_all)

    st0 = init_state(cfg).replace(rng=jax.random.PRNGKey(77))
    jax.block_until_ready(run_all(st0)[1])
    best = float("inf")
    for r_ in range(2):
        stx = init_state(cfg).replace(rng=jax.random.PRNGKey(100 + r_))
        t0 = time.perf_counter()
        _, ne = run_all(stx)
        jax.block_until_ready(ne)
        best = min(best, (time.perf_counter() - t0) / (T_adv + 1))
    print(f"full step (scan):   {best*1e3:7.2f} ms  "
          f"({1.0/best:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    main(P, K, M)
