"""Probe: live merge-candidate distribution + merge cost on REAL data.

Runs the P=10240 Ackerman filter and, at selected steps, measures the
per-particle live candidate-lane count entering the merge, plus the merge
kernel's wall time on those real tensors. Motivates (or kills) per-group
width dispatch: if most particles' live counts sit far below the batch
max, sorting particles by live count and merging groups at narrower
static widths cuts the VPU lane sweeps for the majority.

Usage: python tools/probe_live.py [P] [probe_steps...]
"""

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
from phdslam_tpu.ops.gm_merge import merge_batch_dispatch
from phdslam_tpu.slam import SynthSLAMRunner


def main(P=10240, probes=(30, 80, 150, 250, 320), r_par=None):
    cfg = load_config("cfg/ackerman.cfg")
    cfg.n_particles = P
    if r_par:
        cfg.merge_r_par = r_par
    r = SynthSLAMRunner(cfg, "data/ackerman")

    @jax.jit
    def pre_fn(state, z, zm):
        pre = jax.vmap(lambda p, m, c, w: phd._update_single_pre(
            p, m, c, w, z, zm, cfg))(
            state.pose, state.map_static.mean, state.map_static.cov,
            state.map_static.weight)
        return phd._finish_candidates_packed(pre, 2, batched=True)

    from phdslam_tpu.ops.gm_merge import merge_batch_dispatch_packed
    merge_fn = jax.jit(lambda pk: merge_batch_dispatch_packed(
        pk, 2, cfg, cfg.max_features, sorted_prefix=True))

    last_control = jnp.zeros((2,), jnp.float32)
    zeros_z = jnp.zeros((r.m_max, 2), jnp.float32)
    zeros_mask = jnp.zeros((r.m_max,), bool)
    probes = set(probes)

    for n, plan in enumerate(r.schedule):
        if plan.c_idx >= 0:
            last_control = r.controls_dev[plan.c_idx]
        z = r.z_dev[plan.z_idx] if plan.z_idx >= 0 else zeros_z
        zm = r.mask_dev[plan.z_idx] if plan.z_idx >= 0 else zeros_mask
        if n in probes and plan.z_idx >= 0:
            packed = pre_fn(r.state, z, zm)
            live = np.asarray(jnp.sum(
                (packed[:, 1] > 0.5).astype(jnp.int32), axis=1))
            pct = np.percentile(live, [0, 25, 50, 75, 90, 99, 100])
            # merge timing on the real tensors
            mg = jax.block_until_ready(merge_fn(packed))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    mg = merge_fn(packed)
                jax.block_until_ready(mg)
                best = min(best, (time.perf_counter() - t0) / 5)
            clusters = np.asarray(mg[3])
            cpct = np.percentile(clusters, [50, 90, 100])
            print(f"step {n:3d}: live lanes p0/25/50/75/90/99/100 = "
                  f"{pct.astype(int).tolist()}  merge {best*1e3:.1f} ms  "
                  f"clusters p50/90/max = {cpct.astype(int).tolist()}",
                  flush=True)
        r.state, out = r.step_fn(r.state, z, zm, last_control,
                                 jnp.float32(plan.dt), plan.do_predict)
    jax.block_until_ready(out.n_eff)


if __name__ == "__main__":
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    rp = int(sys.argv[2]) if len(sys.argv) > 2 else None
    main(P, r_par=rp)
