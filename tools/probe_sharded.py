"""Bisect the sharded-program 1-device overhead (round-5 item 2).

Times a 10-step varying-input scan of phd_step at dense shapes under
(a) plain jit, (b) jit with NamedSharding in/out on a 1-device mesh —
then toggles the Pallas knobs to locate the pathology.

Usage: python tools/probe_sharded.py [P] [cfgpath]
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

from phdslam_tpu.config import load_config
from phdslam_tpu.filters.phd import phd_step
from phdslam_tpu.parallel import make_mesh
from phdslam_tpu.parallel.sharding import shard_state, state_shardings
from phdslam_tpu.types import init_state

from jax.sharding import NamedSharding, PartitionSpec as P_


def time_scan(fn, state, z_all, mask, reps=2):
    ctrl = jnp.zeros((2,), jnp.float32)

    out = fn(state, z_all)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for r in range(reps):
        st = state.replace(rng=jax.random.PRNGKey(100 + r))
        t0 = time.perf_counter()
        out = fn(st, z_all * (1.0 + 1e-4 * r))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main(P=10240, cfg_path="cfg/dense.cfg"):
    cfg = load_config(cfg_path)
    cfg.n_particles = P
    T = 10
    M = cfg.max_measurements
    rng = np.random.default_rng(0)
    z_all = jnp.asarray(np.stack(
        [rng.uniform(1.0, 14.0, (T, M)), rng.uniform(-3.0, 3.0, (T, M))],
        axis=-1).astype(np.float32))
    mask = jnp.asarray(np.arange(M) < M - 8)
    ctrl = jnp.zeros((2,), jnp.float32)

    def make_run(c):
        step = functools.partial(phd_step, cfg=c)

        def run(st, zs):
            def body(carry, z):
                st2, out = step(carry, z, mask, ctrl, jnp.float32(1.0),
                                jnp.asarray(True))
                return st2, out.n_eff
            return jax.lax.scan(body, st, zs)
        return run

    import dataclasses
    for tag, kw in (("default", {}),
                    ("pallas off", dict(pallas_merge=0, pallas_detect=0)),
                    ("detect off", dict(pallas_detect=0)),
                    ("merge off", dict(pallas_merge=0))):
        c = dataclasses.replace(cfg, **kw)
        run = make_run(c)
        st = init_state(c)
        t_plain = time_scan(jax.jit(run), st, z_all, mask)

        mesh = make_mesh(1)
        st_sh = state_shardings(mesh, st)
        repl = NamedSharding(mesh, P_())
        fn_sh = jax.jit(run, in_shardings=(st_sh, repl),
                        out_shardings=(st_sh, repl))
        t_sh = time_scan(fn_sh, shard_state(mesh, st), z_all, mask)
        print(f"{tag}: plain {t_plain / T * 1e3:7.2f} ms/step | "
              f"sharded(1) {t_sh / T * 1e3:7.2f} ms/step | "
              f"x{t_sh / t_plain:.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10240,
         sys.argv[2] if len(sys.argv) > 2 else "cfg/dense.cfg")
