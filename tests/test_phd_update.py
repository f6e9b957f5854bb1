"""Golden tests: JAX GM-PHD update vs the NumPy oracle (tests/oracle.py),
which is a direct port of the reference semantics (phdfilter.cu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.filters.phd import _update_single
from phdslam_tpu.ops.ekf import ekf_detection_terms, ekf_preupdate
from phdslam_tpu.ops.gm_merge import gm_merge

import oracle


def make_cfg(**kw):
    base = dict(std_range=0.25, std_bearing=0.02, max_range=10.0,
                max_bearing=np.pi, min_range=0.0, pd=0.9,
                clutter_rate=5.0, birth_weight=0.01, birth_noise_factor=1.5,
                min_separation=4.0, min_feature_weight=1e-5,
                particle_weighting=0, max_features=32, feature_model=0)
    base.update(kw)
    return SlamConfig(**base)


def random_scene(seed, n_feat=6, n_meas=4):
    rng = np.random.default_rng(seed)
    pose = np.array([0.5, -0.3, 0.2, 0, 0, 0])
    means = rng.uniform(-8, 8, size=(n_feat, 2))
    covs = []
    for _ in range(n_feat):
        A = rng.normal(size=(2, 2)) * 0.3
        covs.append(A @ A.T + 0.05 * np.eye(2))
    covs = np.array(covs)
    ws = rng.uniform(0.2, 1.0, size=n_feat)
    Z = np.column_stack([rng.uniform(1, 9, n_meas),
                         rng.uniform(-np.pi, np.pi, n_meas)])
    return pose, means, covs, ws, Z


def test_ekf_preupdate_matches_oracle():
    cfg = make_cfg()
    pose, means, covs, ws, Z = random_scene(0)
    pre = ekf_preupdate(jnp.array(pose), jnp.array(means), jnp.array(covs),
                        cfg)
    mean_det, logw, _ = ekf_detection_terms(
        pre, jnp.array(means), jnp.array(ws), jnp.array(Z), cfg)
    for k in range(len(means)):
        r, b, pd, S_inv, det_S, K, cov_upd = oracle.ekf_preupdate_2d(
            pose, means[k], covs[k], cfg)
        assert float(pre.r[k]) == pytest.approx(r, rel=1e-5)
        assert float(pre.pd[k]) == pytest.approx(pd, rel=1e-5)
        np.testing.assert_allclose(np.asarray(pre.S_inv[k]), S_inv,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pre.gain[k]), K, rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pre.cov_upd[k]), cov_upd,
                                   rtol=1e-3, atol=1e-6)
        for m in range(len(Z)):
            innov = np.array([Z[m, 0] - r, oracle.wrap(Z[m, 1] - b)])
            mean_u = means[k] + K @ innov
            np.testing.assert_allclose(np.asarray(mean_det[m, k]), mean_u,
                                       rtol=1e-4, atol=1e-4)
            if pd == 0:
                assert float(logw[m, k]) <= -1e29  # LOG0 sentinel
                continue
            want_logw = (np.log(pd) + np.log(ws[k])
                         - 0.5 * innov @ S_inv @ innov
                         - np.log(2 * np.pi) - 0.5 * np.log(det_S))
            assert float(logw[m, k]) == pytest.approx(want_logw, rel=1e-3,
                                                      abs=1e-2)


def test_gm_merge_matches_oracle():
    rng = np.random.default_rng(3)
    n = 20
    means = rng.uniform(-5, 5, size=(n, 2))
    covs = np.array([np.eye(2) * rng.uniform(0.05, 0.3) for _ in range(n)])
    ws = rng.uniform(0.01, 1.0, size=n)
    want = oracle.greedy_merge(
        [[ws[i], means[i], covs[i]] for i in range(n)], 4.0)

    mg_mean, mg_cov, mg_w, count, dropped = gm_merge(
        jnp.array(means), jnp.array(covs), jnp.array(ws),
        jnp.ones(n, bool), 4.0, n)
    count = int(count)
    assert int(dropped) == 0
    assert count == len(want)
    got = sorted([(float(mg_w[i]), np.asarray(mg_mean[i]),
                   np.asarray(mg_cov[i])) for i in range(count)],
                 key=lambda t: -t[0])
    want = sorted(want, key=lambda t: -t[0])
    for (gw, gm_, gc), (ww, wm, wc) in zip(got, want):
        assert gw == pytest.approx(ww, rel=1e-4)
        np.testing.assert_allclose(gm_, wm, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gc, wc, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("weighting", [0, 1])
@pytest.mark.parametrize("seed", [1, 2, 5])
def test_update_single_matches_oracle(seed, weighting):
    cfg = make_cfg(particle_weighting=weighting, min_range=1.0)
    pose, means, covs, ws, Z = random_scene(seed, n_feat=7, n_meas=5)

    K, M, D = cfg.max_components, 8, 2
    mean_p = np.zeros((K, D)); mean_p[:7] = means
    cov_p = np.tile(np.eye(2), (K, 1, 1)); cov_p[:7] = covs
    w_p = np.zeros(K); w_p[:7] = ws
    z_p = np.zeros((M, 2)); z_p[:5] = Z
    z_mask = np.zeros(M, bool); z_mask[:5] = True

    new_mean, new_cov, new_w, dlog_w, overflow = _update_single(
        jnp.array(pose), jnp.array(mean_p), jnp.array(cov_p),
        jnp.array(w_p), jnp.array(z_p), jnp.array(z_mask), cfg)

    gm = [(ws[i], means[i], covs[i]) for i in range(7)]
    want_gm, want_dlogw = oracle.phd_update_particle(pose, gm, Z, cfg)

    assert int(overflow) == 0
    assert float(dlog_w) == pytest.approx(want_dlogw, rel=2e-3, abs=2e-3)

    got = [(float(new_w[i]), np.asarray(new_mean[i]))
           for i in range(K) if float(new_w[i]) > 0]
    assert len(got) == len(want_gm)
    # match order-insensitively (equal weights may sort differently)
    remaining = list(got)
    for (ww, wm, wc) in want_gm:
        dists = [np.linalg.norm(g[1] - wm) for g in remaining]
        j = int(np.argmin(dists))
        gw, gm_ = remaining.pop(j)
        assert gw == pytest.approx(ww, rel=3e-3, abs=1e-4)
        np.testing.assert_allclose(gm_, wm, rtol=1e-3, atol=2e-3)
