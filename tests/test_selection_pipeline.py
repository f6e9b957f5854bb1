"""Candidate-selection pipeline equivalence (filters/phd.py fast path).

The two-stage selection (tier-A rank compaction -> tier-B heaviest-T ->
global top-cap payload sort) must produce the same update results as the
single-stage top-cap over all K*(M+1)+M lanes whenever no live lanes are
dropped, and must account every dropped live lane in the overflow output.
"""

import copy

import numpy as np
import jax.numpy as jnp
import pytest

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.filters.phd import _batched_update


def make_cfg(**kw):
    base = dict(std_range=0.25, std_bearing=0.02, max_range=12.0,
                max_bearing=np.pi, min_range=0.0, pd=0.9,
                clutter_rate=5.0, birth_weight=0.01, birth_noise_factor=1.5,
                min_separation=4.0, min_feature_weight=1e-5,
                particle_weighting=0, max_features=32, feature_model=0,
                max_measurements=8, merge_candidate_cap=128,
                pallas_merge=0)
    base.update(kw)
    return SlamConfig(**base)


def random_batch(seed, P=4, K=32, M=8, n_live_z=5):
    rng = np.random.default_rng(seed)
    pose = np.zeros((P, 6), np.float32)
    pose[:, :2] = rng.normal(0, 0.2, (P, 2))
    mean = rng.uniform(-8, 8, (P, K, 2)).astype(np.float32)
    A = rng.normal(0, 0.3, (P, K, 2, 2)).astype(np.float32)
    cov = A @ A.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
    w = np.where(rng.uniform(size=(P, K)) < 0.6,
                 rng.uniform(0.1, 1.0, (P, K)), 0.0).astype(np.float32)
    z = np.column_stack([rng.uniform(1, 10, M),
                         rng.uniform(-np.pi, np.pi, M)]).astype(np.float32)
    z_mask = np.arange(M) < n_live_z
    return (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(z_mask))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_stage_matches_single_stage(seed):
    cfg = make_cfg(detection_topk=8)
    cfg0 = copy.deepcopy(cfg)
    cfg0.detection_topk = 0
    pose, mean, cov, w, z, zm = random_batch(seed)
    out_a = _batched_update(pose, mean, cov, w, z, zm, cfg)
    out_b = _batched_update(pose, mean, cov, w, z, zm, cfg0)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_stage1_drops_are_counted():
    # tiny T forces per-measurement drops of live lanes; they must appear
    # in the overflow output rather than vanish
    cfg = make_cfg(detection_topk=2)
    cfg0 = copy.deepcopy(cfg)
    cfg0.detection_topk = 0
    pose, mean, cov, w, z, zm = random_batch(3)
    out_t = _batched_update(pose, mean, cov, w, z, zm, cfg)
    out_f = _batched_update(pose, mean, cov, w, z, zm, cfg0)
    # overflow (index 4) with tiny T >= overflow without stage 1
    assert int(jnp.max(out_t[4])) >= int(jnp.max(out_f[4]))
    # total post-merge weight should not GAIN from dropping lanes
    assert float(jnp.sum(out_t[2])) <= float(jnp.sum(out_f[2])) + 1e-4


def test_stage2_cap_drops_lowest_weight():
    # cap smaller than the live candidate count: the kept lanes must be the
    # heaviest ones, so the total retained weight beats any index-order cut
    cfg = make_cfg(detection_topk=8, merge_candidate_cap=24)
    cfg0 = make_cfg(detection_topk=8, merge_candidate_cap=0)
    pose, mean, cov, w, z, zm = random_batch(4)
    out_c = _batched_update(pose, mean, cov, w, z, zm, cfg)
    out_f = _batched_update(pose, mean, cov, w, z, zm, cfg0)
    assert int(jnp.max(out_c[4])) > 0          # drops happened and were counted
    # retained maps still carry most of the uncapped total weight
    frac = float(jnp.sum(out_c[2])) / max(float(jnp.sum(out_f[2])), 1e-9)
    assert frac > 0.85


@pytest.mark.parametrize("seed", [0, 1])
def test_scheme2_fast_matches_slow(seed):
    """Scheme-2 (single-feature RB) on the fast path: the argmax
    single-object likelihood located on the selected top-T lanes + two GM
    point evaluations must reproduce the slow path's full-grid search
    (phdfilter.cu:3599-3661) whenever selection is lossless (T >= live
    lanes per measurement)."""
    cfg = make_cfg(detection_topk=8, particle_weighting=2,
                   max_features=16, merge_candidate_cap=64)
    cfg0 = make_cfg(detection_topk=8, particle_weighting=2,
                    max_features=16, merge_candidate_cap=0)  # slow full grid

    rng = np.random.default_rng(seed)
    P, K, M = 4, 16, 8
    pose = np.zeros((P, 6), np.float32)
    pose[:, :2] = rng.normal(0, 0.2, (P, 2))
    # a SHARED landmark field (+ small per-particle jitter): measurements
    # generated below must be explained by every particle's map
    mean = (rng.uniform(-8, 8, (1, K, 2))
            + rng.normal(0, 0.05, (P, K, 2))).astype(np.float32)
    A = rng.normal(0, 0.3, (P, K, 2, 2)).astype(np.float32)
    cov = A @ A.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
    # <= T live features so the top-T set contains every valid lane
    w = np.where(np.arange(K)[None, :] < 5,
                 rng.uniform(0.3, 1.0, (P, K)), 0.0).astype(np.float32)
    # measurements AT live feature positions (relative to the origin-ish
    # poses): every measurement's argmax likelihood sits far above the
    # min_feature_weight threshold, so the top-T set provably contains
    # the slow path's full-grid argmax (the lossless regime under test)
    sites = mean[0, :5]
    rr = np.linalg.norm(sites, axis=1)
    bb = np.arctan2(sites[:, 1], sites[:, 0])
    z = np.zeros((M, 2), np.float32)
    z[:5, 0] = rr + rng.normal(0, 0.05, 5)
    z[:5, 1] = bb + rng.normal(0, 0.01, 5)
    zm = np.arange(M) < 5
    args = (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(zm))

    out_fast = _batched_update(*args, cfg)
    out_slow = _batched_update(*args, cfg0)
    # dlog_w (index 3) is the scheme-2 output under test
    np.testing.assert_allclose(np.asarray(out_fast[3]),
                               np.asarray(out_slow[3]),
                               rtol=1e-4, atol=1e-4)
    # maps agree too (lossless selection)
    np.testing.assert_allclose(np.asarray(out_fast[2]),
                               np.asarray(out_slow[2]),
                               rtol=1e-4, atol=1e-4)


def test_fast_variance_matches_slow():
    """compute_variance on the fast path (packed-plane MC over selected
    lanes, extras.mc_variance_packed) converges to the slow full-grid
    estimator's value when selection is lossless: both estimate
    sum_j E[val_j] / E[val_j(1-val_j)] over the same component set; with
    enough samples the MC noise shrinks below a loose tolerance."""
    import jax

    cfg = make_cfg(detection_topk=8, merge_candidate_cap=64,
                   max_features=16, compute_variance=True, n_samples=4096)
    cfg0 = make_cfg(detection_topk=8, merge_candidate_cap=0,
                    max_features=16, compute_variance=True, n_samples=4096)

    rng = np.random.default_rng(7)
    P, K, M = 4, 16, 8
    pose = np.zeros((P, 6), np.float32)
    mean = (rng.uniform(-8, 8, (1, K, 2))
            + rng.normal(0, 0.05, (P, K, 2))).astype(np.float32)
    A = rng.normal(0, 0.3, (P, K, 2, 2)).astype(np.float32)
    cov = A @ A.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
    w = np.where(np.arange(K)[None, :] < 5,
                 rng.uniform(0.3, 1.0, (P, K)), 0.0).astype(np.float32)
    sites = mean[0, :5]
    rr = np.linalg.norm(sites, axis=1)
    bb = np.arctan2(sites[:, 1], sites[:, 0])
    z = np.zeros((M, 2), np.float32)
    z[:5, 0] = rr
    z[:5, 1] = bb
    zm = np.arange(M) < 5
    keys = jax.random.split(jax.random.PRNGKey(0), P)
    args = (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(zm))

    out_fast = _batched_update(*args, cfg, keys=keys)
    out_slow = _batched_update(*args, cfg0, keys=keys)
    assert len(out_fast) == 6 and len(out_slow) == 6
    vf = np.asarray(out_fast[5])
    vs = np.asarray(out_slow[5])
    assert np.isfinite(vf).all()
    # NB val*(1-val) detection terms go NEGATIVE when val = w*N(x) > 1
    # (tight post-update covariances) — sign is data-dependent, only the
    # two estimators' agreement is under test. Independent MC draws:
    # compare expectations, not samples.
    np.testing.assert_allclose(vf, vs, rtol=0.2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scheme2_fast_lossy_regime_typical(seed):
    """Scheme-2 in the LOSSY selection regime (T < live lanes per
    measurement): on realistic scenes (measurements at feature sites,
    weights spread over one decade) the argmax single-object likelihood
    still lands in the heaviest-T pdw lanes, so dlog_w matches the
    full-grid argmax route exactly (advisor, round 3: the lossless-only
    test left this regime unpinned). detection_topk=0 with the same cap
    runs the SAME candidate pipeline with the full-grid argmax — the
    comparison isolates the top-T restriction of the scheme-2 search."""
    K, M, T = 16, 8, 3
    common = dict(particle_weighting=2, max_features=K,
                  max_measurements=M, merge_candidate_cap=64)
    cfg_t = make_cfg(detection_topk=T, **common)
    cfg_f = make_cfg(detection_topk=0, **common)

    rng = np.random.default_rng(seed)
    P = 4
    pose = np.zeros((P, 6), np.float32)
    mean = (rng.uniform(-8, 8, (1, K, 2))
            + rng.normal(0, 0.02, (P, K, 2))).astype(np.float32)
    A = rng.normal(0, 0.2, (P, K, 2, 2)).astype(np.float32)
    cov = A @ A.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
    # ALL K features live with weights spread over a decade: every
    # measurement gates several features, so T=3 < live lanes
    w = rng.uniform(0.1, 1.0, (P, K)).astype(np.float32)
    sites = mean[0, :M]
    rr = np.linalg.norm(sites, axis=1)
    bb = np.arctan2(sites[:, 1], sites[:, 0])
    z = np.column_stack([rr, bb]).astype(np.float32)
    zm = np.ones((M,), bool)
    args = (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(zm))

    out_t = _batched_update(*args, cfg_t)
    out_f = _batched_update(*args, cfg_f)
    np.testing.assert_allclose(np.asarray(out_t[3]), np.asarray(out_f[3]),
                               rtol=1e-4, atol=1e-4)


def test_scheme2_fast_lossy_regime_adversarial():
    """The documented failure mode of the top-T scheme-2 argmax: a
    high-likelihood lane on a LOW-weight feature (like = pdw / (pd w) large
    because w is tiny) can rank below the top-T by pdw and be missed.
    Quantify the dlog_w deviation and pin that the map output itself is
    unaffected (the s2 search only feeds the particle weight)."""
    K, M, T = 8, 2, 1
    # cap must sit BELOW the full lane count K + M*K + M = 26 or use_fast
    # never engages and both configs silently take the slow full-grid path
    common = dict(particle_weighting=2, max_features=K,
                  max_measurements=M, merge_candidate_cap=16,
                  min_feature_weight=1e-8)
    cfg_t = make_cfg(detection_topk=T, **common)
    cfg_f = make_cfg(detection_topk=0, **common)

    P = 2
    pose = np.zeros((P, 6), np.float32)
    mean = np.zeros((P, K, 2), np.float32)
    # feature 0: tiny weight, EXACTLY at the measurement site -> the
    # single-object likelihood argmax; feature 1: heavy weight nearby ->
    # wins the pdw top-1 slot
    mean[:, 0] = [4.0, 0.0]
    mean[:, 1] = [4.3, 0.15]
    mean[:, 2] = [-5.0, 2.0]
    cov = np.broadcast_to(0.04 * np.eye(2, dtype=np.float32),
                          (P, K, 2, 2)).copy()
    w = np.zeros((P, K), np.float32)
    w[:, 0] = 1e-4
    w[:, 1] = 1.0
    w[:, 2] = 1.0
    # two valid measurements: the RB factor's max_like term carries a
    # (m_valid - 1) coefficient, so a single-measurement scene would hide
    # the missed argmax entirely
    # the second measurement sits ~1σ OFF feature 2 so its single-object
    # likelihood stays below feature 0's exact hit — feature 0 (weight
    # 1e-4) remains the global argmax that the pdw top-1 misses
    r2 = np.linalg.norm(mean[0, 2]) + 0.35
    b2 = np.arctan2(mean[0, 2, 1], mean[0, 2, 0])
    z = np.array([[4.0, 0.0], [r2, b2]], np.float32)
    zm = np.array([True, True])
    args = (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(zm))

    out_t = _batched_update(*args, cfg_t)
    out_f = _batched_update(*args, cfg_f)
    # the maps are NEAR-identical: s2 only alters dlog_w; the residual
    # map delta (~2e-4) is the sub-dominant detection lanes (weight ~1e-3)
    # that the top-1 selection drops from the candidate set
    np.testing.assert_allclose(np.asarray(out_t[2]), np.asarray(out_f[2]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_t[0]), np.asarray(out_f[0]),
                               rtol=1e-3, atol=1e-3)
    # dlog_w deviates (the argmax was missed) but boundedly: both routes
    # saw the same normalizers, so the delta is the log-ratio of the RB
    # factors — record its magnitude as the documented deviation
    d = np.abs(np.asarray(out_t[3]) - np.asarray(out_f[3]))
    assert np.isfinite(d).all()
    assert (d > 1e-4).all(), "adversarial scene failed to exercise the miss"
    assert (d < 25.0).all()
