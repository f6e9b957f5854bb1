"""Stage-level timing of the CPHD update at scale (real TPU).

Times each piece of the CPHD pipeline with on-device lax.scan over VARYING
inputs (CLAUDE.md: never a Python loop of identical dispatches).

Usage: python tools/probe_cphd.py [P]
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

from phdslam_tpu.config import load_config
from phdslam_tpu.filters.cphd import (cphd_constants, cphd_update, log_esf,
                                      log_esf_omit, psi_terms)
from phdslam_tpu.types import init_state


def timeit(fn, *args, reps=8):
    """Device scan over `reps` varied copies; returns ms per iteration."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1000.0


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    cfg = load_config("cfg/ackerman_cphd.cfg")
    cfg.n_particles = P
    C = cfg.max_cardinality
    M = 32
    K = cfg.max_features
    print(f"P={P} K={K} M={M} C={C}")

    rng = np.random.default_rng(0)
    state = init_state(cfg)
    consts = cphd_constants(cfg)
    z = jnp.asarray(rng.uniform(1, 10, (M, 2)), jnp.float32)
    z = z.at[:, 1].set(jnp.asarray(rng.uniform(-3, 3, M), jnp.float32))
    zm = jnp.ones((M,), bool)

    # seed a live map so the update does real work
    mean = jnp.asarray(rng.uniform(-15, 15, (P, K, 2)), jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(2) * 0.2, (P, K, 2, 2)).astype(jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (P, K)), jnp.float32)
    from phdslam_tpu.types import GMState
    state = state.replace(map_static=GMState(mean=mean, cov=cov, weight=w))

    # 1. full cphd_update, scanned x4 with varying z
    zs = jnp.stack([z + 0.01 * i for i in range(4)])

    @jax.jit
    def full(state, zs):
        def body(st, zz):
            st2, ovf = cphd_update(st, zz, zm, consts, cfg)
            return st2, ovf
        return jax.lax.scan(body, state, zs)

    ms = timeit(full, state, zs) / 4
    print(f"full cphd_update: {ms:.1f} ms/call")

    # 2. cardinality machinery alone: lambda -> esf -> esfd -> psi, vmapped
    lam = jnp.asarray(rng.uniform(-2, 2, (P, M)), jnp.float32)
    cn_pred = jnp.asarray(rng.uniform(-5, 0, (P, C + 1)), jnp.float32)

    @jax.jit
    def card(lams):
        def body(_, lam_i):
            def one(ll, cn):
                esf = log_esf(ll, zm)
                esfd = log_esf_omit(ll, zm)
                return psi_terms(consts, esf, esfd, cn,
                                 jnp.float32(-0.5), jnp.float32(1.2), M, zm)
            out = jax.vmap(one)(lam_i, cn_pred)
            return None, jax.tree.map(lambda x: jnp.sum(x), out)
        return jax.lax.scan(body, None, lams)

    lams = jnp.stack([lam + 0.01 * i for i in range(4)])
    ms = timeit(card, lams) / 4
    print(f"esf+esfd+psi (vmapped): {ms:.1f} ms/call")

    # 2b. esfd alone
    @jax.jit
    def esfd_only(lams):
        def body(_, lam_i):
            out = jax.vmap(lambda ll: log_esf_omit(ll, zm))(lam_i)
            return None, jnp.sum(out)
        return jax.lax.scan(body, None, lams)

    ms = timeit(esfd_only, lams) / 4
    print(f"esfd alone: {ms:.1f} ms/call")

    # 2c. psi_terms alone (esf/esfd precomputed)
    esf_all = jax.jit(jax.vmap(lambda ll: log_esf(ll, zm)))(lam)
    esfd_all = jax.jit(jax.vmap(lambda ll: log_esf_omit(ll, zm)))(lam)

    @jax.jit
    def psi_only(esf_a, esfd_a):
        def body(_, i):
            out = jax.vmap(lambda e, ed, cn: psi_terms(
                consts, e + 0.001 * i, ed, cn, jnp.float32(-0.5),
                jnp.float32(1.2), M, zm))(esf_a, esfd_a, cn_pred)
            return None, jax.tree.map(lambda x: jnp.sum(x), out)
        return jax.lax.scan(body, None, jnp.arange(4.0))

    ms = timeit(psi_only, esf_all, esfd_all) / 4
    print(f"psi_terms alone: {ms:.1f} ms/call")


if __name__ == "__main__":
    main()
