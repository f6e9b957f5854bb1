"""Probe: where the spatially-tiled merge spends, on REAL dense data.

Runs the dense filter to a mid-run step, captures the packed candidate
planes, slices them to the engaged candidate width, and times:
  - the untiled merge dispatch (merge_spatial_tiles = 0)
  - the tiled dispatch (= 4)
  - the tile rearrangement alone (sort + counts + one-hot gathers)
  - the bare kernel at the untiled width vs the tiled [P*T, ct] layout
Every timing rep uses a distinct weight-perturbed input (relay caching
serves bit-identical dispatches — BENCH.md round-3 protocol).

Usage: python tools/probe_tiles.py [P] [step]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phdslam_tpu.config import load_config
from phdslam_tpu.filters import phd
from phdslam_tpu.ops.gm_merge import (WIDTH_FRACS, _tiled_merge_packed,
                                      merge_batch_dispatch_packed)
from phdslam_tpu.ops.pallas_merge import gm_merge_pallas_batch_packed
from phdslam_tpu.slam import SynthSLAMRunner


def timed(fn, variants, reps=3):
    jax.block_until_ready(fn(variants[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for v in variants[1:]:
            out = fn(v)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / (len(variants) - 1))
    return best * 1e3


def main(P=1024, probe_step=150):
    cfg = load_config("cfg/dense.cfg")
    cfg.n_particles = P
    r = SynthSLAMRunner(cfg, "data/dense")

    @jax.jit
    def pre_fn(state, z, zm):
        pre = jax.vmap(lambda p, m, c, w: phd._update_single_pre(
            p, m, c, w, z, zm, cfg))(
            state.pose, state.map_static.mean, state.map_static.cov,
            state.map_static.weight)
        return phd._finish_candidates_packed(pre, 2, batched=True)

    last_control = jnp.zeros((2,), jnp.float32)
    zeros_z = jnp.zeros((r.m_max, 2), jnp.float32)
    zeros_mask = jnp.zeros((r.m_max,), bool)
    packed = None
    for n, plan in enumerate(r.schedule):
        if plan.c_idx >= 0:
            last_control = r.controls_dev[plan.c_idx]
        z = r.z_dev[plan.z_idx] if plan.z_idx >= 0 else zeros_z
        zm = r.mask_dev[plan.z_idx] if plan.z_idx >= 0 else zeros_mask
        if n >= probe_step and plan.z_idx >= 0:
            packed = pre_fn(r.state, z, zm)
            break
        r.state, out = r.step_fn(r.state, z, zm, last_control,
                                 jnp.float32(plan.dt), plan.do_predict)

    K = cfg.max_features
    cap = packed.shape[-1]
    live = int(jnp.max(jnp.sum((packed[:, 1] > 0.5).astype(jnp.int32),
                               axis=1)))
    widths = sorted({-(-int(cap // f) // 128) * 128
                     for f in WIDTH_FRACS} | {cap})
    W = next(w for w in widths if w >= live)
    pk = packed[:, :, :W]
    print(f"P={P} cap={cap} max live={live} -> engaged width {W}",
          flush=True)

    variants = [pk * jnp.float32(1.0 + 1e-3 * i) for i in range(6)]
    # weight rows only matter; scaling all planes keeps structure valid
    variants = [v.at[:, 1].set(pk[:, 1]) for v in variants]
    variants = [jax.block_until_ready(v) for v in variants]

    cfg0 = dataclasses.replace(cfg, merge_spatial_tiles=0)
    cfg4 = dataclasses.replace(cfg, merge_spatial_tiles=4)

    f_untiled = jax.jit(lambda p_: merge_batch_dispatch_packed(
        p_, 2, cfg0, K, sorted_prefix=True))
    f_tiled = jax.jit(lambda p_: _tiled_merge_packed(
        p_, cfg4, K, False, cfg.merge_r_par, T=4))
    print(f"untiled dispatch: {timed(f_untiled, variants):7.2f} ms",
          flush=True)
    print(f"tiled   dispatch: {timed(f_tiled, variants):7.2f} ms",
          flush=True)

    # bare kernels: untiled at W vs pre-arranged tiled layouts
    for ct in (128, 256):
        Pt = P * 4

        def rearrange(p_, ct=ct):
            # mirror _tiled_merge_packed's branch body (payload sort into
            # tile-major order + ONE Pallas one-hot gather)
            from phdslam_tpu.ops.pallas_select import onehot_cols_batch
            w, act = p_[:, 0], p_[:, 1]
            mx, my = p_[:, 2], p_[:, 3]
            lv = (act > 0.5) & (w > 0)
            lf = lv.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(lf, axis=1), 1.0)
            cx = jnp.sum(lf * mx, axis=1) / cnt
            cy = jnp.sum(lf * my, axis=1) / cnt
            tid = 2 * (mx > cx[:, None]).astype(jnp.int32) \
                + (my > cy[:, None]).astype(jnp.int32)
            tid = jnp.where(lv, tid, 4)
            sorted_ops = jax.lax.sort(
                (tid,) + tuple(p_[:, c] for c in range(7)), num_keys=1,
                dimension=-1)
            pk_sorted = jnp.stack(sorted_ops[1:], axis=1)
            counts = jnp.sum((tid[:, :, None] == jnp.arange(4)[None, None])
                             .astype(jnp.int32), axis=1)
            starts = jnp.cumsum(counts, axis=1) - counts
            base = starts[:, :, None] + jnp.arange(ct, dtype=jnp.int32)
            valid = (jnp.arange(ct)[None, None] < counts[:, :, None])
            flat = jnp.clip(base, 0, W - 1).reshape(P, 4 * ct)
            g = onehot_cols_batch(flat, pk_sorted)
            vm = valid.reshape(P, 1, 4 * ct).astype(g.dtype)
            g = g.at[:, :2].multiply(vm)
            return (g.reshape(P, 7, 4, ct).transpose(0, 2, 1, 3)
                    .reshape(Pt, 7, ct))

        f_re = jax.jit(rearrange)
        tiled_variants = [jax.block_until_ready(f_re(v)) for v in variants]
        for blk in (8, 32):
            f_kt = jax.jit(lambda g_, blk=blk: gm_merge_pallas_batch_packed(
                g_, float(cfg.min_separation), K // 4, interpret=False,
                r_par=cfg.merge_r_par, metric=0, sorted_w=True, block=blk))
            print(f"  kernel tiled ct={ct} blk={blk}: "
                  f"{timed(f_kt, tiled_variants):7.2f} ms", flush=True)
        print(f"  rearrange(ct={ct}):   {timed(f_re, variants):7.2f} ms",
              flush=True)

    for oc in (K, W):
        for blk in (8, 16, 32):
            f_k0 = jax.jit(lambda p_, oc=oc, blk=blk:
                           gm_merge_pallas_batch_packed(
                               p_, float(cfg.min_separation), oc,
                               interpret=False, r_par=cfg.merge_r_par,
                               metric=0, sorted_w=True, block=blk))
            print(f"kernel untiled W={W} out_cap={oc} blk={blk}: "
                  f"{timed(f_k0, variants):7.2f} ms", flush=True)


if __name__ == "__main__":
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    step = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    main(P, step)
