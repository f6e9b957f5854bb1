"""Pin the vectorized end-to-end oracle (tools/oracle_filter.py) against
the ragged obviously-correct oracle (tests/oracle.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from phdslam_tpu.config import SlamConfig

import oracle as ragged  # tests/oracle.py
from oracle_filter import greedy_merge_vec, oracle_update


def _case(seed, n_feat=6, n_z=4):
    rng = np.random.default_rng(seed)
    pose = np.array([0.3, -0.2, 0.15, 0, 0, 0])
    Mn = rng.uniform(-9, 9, (n_feat, 2))
    Cv = np.broadcast_to(np.eye(2) * 0.3, (n_feat, 2, 2)).copy()
    W = rng.uniform(0.3, 1.0, n_feat)
    # measurements of the first features + one clutter
    tg = Mn[:n_z - 1] - pose[:2]
    bearings = np.array([ragged.wrap(a) for a in
                         np.arctan2(tg[:, 1], tg[:, 0]) - pose[2]])
    Z = np.stack([np.linalg.norm(tg, axis=1), bearings], -1)
    Z = np.concatenate([Z, [[6.0, 1.0]]])
    return pose, W, Mn, Cv, Z


def test_vectorized_oracle_matches_ragged():
    cfg = SlamConfig(max_range=15.0, std_range=0.3, std_bearing=0.02,
                     clutter_rate=2.0, pd=0.95, birth_weight=0.05,
                     min_separation=2.0, particle_weighting=0,
                     min_feature_weight=1e-5)
    for seed in range(4):
        pose, W, Mn, Cv, Z = _case(seed)
        gm = [(W[i], Mn[i].copy(), Cv[i].copy()) for i in range(len(W))]
        rg, dlw_r = ragged.phd_update_particle(pose, gm, Z, cfg)
        vw, vm, vc, dlw_v = oracle_update(pose, W, Mn, Cv, Z, cfg)

        np.testing.assert_allclose(dlw_v, dlw_r, rtol=1e-10)
        rw = np.array([g[0] for g in rg])
        rm = np.array([g[1] for g in rg])
        # same cluster sets (order may differ: ragged emits greedy order
        # then appends out-of-range; match by weight-sorted order)
        assert len(vw) == len(rw)
        oi, oj = np.argsort(-vw), np.argsort(-rw)
        np.testing.assert_allclose(vw[oi], rw[oj], rtol=1e-9)
        np.testing.assert_allclose(vm[oi], rm[oj], rtol=1e-9, atol=1e-9)


def test_vectorized_merge_matches_ragged():
    rng = np.random.default_rng(1)
    N = 30
    m = rng.uniform(-10, 10, (N, 2))
    c = np.broadcast_to(np.eye(2) * 0.4, (N, 2, 2)).copy()
    w = rng.uniform(0.01, 1.0, N)
    cands = [[w[i], m[i].copy(), c[i].copy()] for i in range(N)]
    rg = ragged.greedy_merge(cands, 2.0)
    vw, vm, vc = greedy_merge_vec(w, m, c, 2.0)
    rw = np.array([g[0] for g in rg])
    rm = np.array([g[1] for g in rg])
    np.testing.assert_allclose(vw, rw, rtol=1e-12)
    np.testing.assert_allclose(vm, rm, rtol=1e-12)


def test_oracle_filter_short_e2e():
    """8 particles, 25 steps of the canonical Ackerman dataset: the oracle
    tracks (sanity gate for the offline evidence runs)."""
    from oracle_filter import run_oracle

    from phdslam_tpu.config import load_config
    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(root, "cfg", "ackerman.cfg"))
    est, map_est, schedule = run_oracle(
        os.path.join(root, "data", "ackerman"), cfg, 8, seed=0,
        max_steps=100, verbose=False)
    gt = np.load(os.path.join(root, "data", "ackerman", "groundtruth.npz"))
    z_steps = [n for n, p in enumerate(schedule) if p.z_idx >= 0]
    T = len(z_steps)
    pe = np.linalg.norm(est[z_steps, :2] - gt["traj"][:T, :2], axis=1)
    assert np.isfinite(pe).all()
    assert pe.mean() < 3.0, pe.mean()
