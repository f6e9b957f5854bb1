"""Fused detection+top-T Pallas kernel vs the XLA reference pipeline.

The kernel (ops/pallas_detect.py) must reproduce ekf_detection_linear +
per-measurement normalizer + select_live_topT exactly (interpret mode runs
the same XLA CPU ops, so values match bitwise up to reduction order).
"""

import numpy as np
import jax.numpy as jnp

from phdslam_tpu.ops.gm_merge import select_live_topT
from phdslam_tpu.ops.pallas_detect import detection_topT_batch
from phdslam_tpu.ops.math import wrap_angle

INTERPRET = True


def make_case(seed, P=6, K=32, M=8, T=4, n_valid=6):
    rng = np.random.default_rng(seed)
    r = rng.uniform(1, 10, (P, K)).astype(np.float32)
    bearing = rng.uniform(-np.pi, np.pi, (P, K)).astype(np.float32)
    si00 = rng.uniform(0.5, 4.0, (P, K)).astype(np.float32)
    si01 = rng.uniform(-0.2, 0.2, (P, K)).astype(np.float32)
    si11 = rng.uniform(0.5, 4.0, (P, K)).astype(np.float32)
    pref = np.where(rng.uniform(size=(P, K)) < 0.7,
                    rng.uniform(0.01, 1.0, (P, K)), 0.0).astype(np.float32)
    planes = np.stack([r, bearing, si00, si01, si11, pref], axis=1)
    zr = rng.uniform(1, 10, M).astype(np.float32)
    zb = rng.uniform(-np.pi, np.pi, M).astype(np.float32)
    valid = (np.arange(M) < n_valid).astype(np.float32)
    z4 = np.stack([zr, zb, valid, np.zeros(M, np.float32)], axis=1)
    return jnp.asarray(planes), jnp.asarray(z4)


def reference(planes, z4, T, min_fw, cb):
    """XLA reference: [M, K] grid + select_live_topT per particle."""
    r, bearing = planes[:, 0][:, None, :], planes[:, 1][:, None, :]
    si00, si01 = planes[:, 2][:, None, :], planes[:, 3][:, None, :]
    si11, pref = planes[:, 4][:, None, :], planes[:, 5][:, None, :]
    zr = z4[None, :, 0:1]
    zb = z4[None, :, 1:2]
    valid = z4[None, :, 2:3] > 0.5
    ir = zr - r
    ib = wrap_angle(zb - bearing)
    dist = si00 * ir * ir + 2.0 * si01 * ir * ib + si11 * ib * ib
    pdw = jnp.where(valid, pref * jnp.exp(-0.5 * dist), 0.0)   # [P, M, K]
    norm = jnp.sum(pdw, axis=-1) + cb                          # [P, M]
    count = jnp.sum((pdw >= min_fw * norm[..., None]).astype(jnp.int32),
                    axis=-1)
    import jax
    vals, idx, _, _ = jax.vmap(
        lambda g, t: select_live_topT(g, t, T))(pdw, min_fw * norm)
    return vals, idx, norm, count


def test_fused_detect_matches_reference():
    T, min_fw, cb = 4, 1e-4, 0.05
    planes, z4 = make_case(0)
    kv, ki, kn, kc = detection_topT_batch(planes, z4, T, min_fw, cb,
                                          interpret=INTERPRET)
    rv, ri, rn, rc = reference(planes, z4, T, min_fw, cb)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(rn),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(rc))
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv),
                               rtol=1e-6, atol=1e-9)
    # indices must agree wherever a live lane was selected
    sel = np.asarray(rv) > 0
    np.testing.assert_array_equal(np.asarray(ki)[sel], np.asarray(ri)[sel])


def test_filter_update_det_route_matches_xla():
    """_batched_update with the fused detection kernel (interpret) must
    match the XLA grid + select_live_topT route."""
    import copy

    from phdslam_tpu.config import SlamConfig
    from phdslam_tpu.filters.phd import _batched_update

    cfg = SlamConfig(std_range=0.25, std_bearing=0.02, max_range=12.0,
                     max_bearing=np.pi, min_range=0.0, pd=0.9,
                     clutter_rate=5.0, birth_weight=0.01,
                     birth_noise_factor=1.5, min_separation=4.0,
                     min_feature_weight=1e-5, particle_weighting=0,
                     max_features=32, feature_model=0, max_measurements=8,
                     merge_candidate_cap=128, pallas_merge=0,
                     detection_topk=8, pallas_detect=2)
    cfg0 = copy.deepcopy(cfg)
    cfg0.pallas_detect = 0

    rng = np.random.default_rng(7)
    P, K, M = 4, 32, 8
    pose = np.zeros((P, 6), np.float32)
    pose[:, :2] = rng.normal(0, 0.2, (P, 2))
    mean = rng.uniform(-8, 8, (P, K, 2)).astype(np.float32)
    A = rng.normal(0, 0.3, (P, K, 2, 2)).astype(np.float32)
    cov = A @ A.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32)
    w = np.where(rng.uniform(size=(P, K)) < 0.6,
                 rng.uniform(0.1, 1.0, (P, K)), 0.0).astype(np.float32)
    z = np.column_stack([rng.uniform(1, 10, M),
                         rng.uniform(-np.pi, np.pi, M)]).astype(np.float32)
    zm = np.arange(M) < 5
    args = (jnp.asarray(pose), jnp.asarray(mean), jnp.asarray(cov),
            jnp.asarray(w), jnp.asarray(z), jnp.asarray(zm))
    out_det = _batched_update(*args, cfg)
    out_xla = _batched_update(*args, cfg0)
    for a, b in zip(out_det, out_xla):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_fused_detect_width_switch():
    """M-width switching (valid rows ≤ M/4) must reproduce the full-width
    outputs, including the padded invalid-row values."""
    T, min_fw, cb = 4, 1e-4, 0.05
    planes, z4 = make_case(2, P=6, K=32, M=32, n_valid=5)
    kv, ki, kn, kc = detection_topT_batch(planes, z4, T, min_fw, cb,
                                          interpret=INTERPRET)
    rv, ri, rn, rc = reference(planes, z4, T, min_fw, cb)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(rn),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(rc))
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv),
                               rtol=1e-6, atol=1e-9)
    sel = np.asarray(rv) > 0
    np.testing.assert_array_equal(np.asarray(ki)[sel], np.asarray(ri)[sel])


def test_fused_detect_ragged_block():
    # P smaller than the particle block + all-invalid measurements
    T, min_fw, cb = 3, 1e-3, 0.1
    planes, z4 = make_case(1, P=3, K=16, M=4, n_valid=0)
    kv, ki, kn, kc = detection_topT_batch(planes, z4, T, min_fw, cb,
                                          interpret=INTERPRET)
    assert np.all(np.asarray(kv) == 0.0)
    assert np.all(np.asarray(kc) == 0)
    np.testing.assert_allclose(np.asarray(kn), cb, rtol=1e-6)


def test_adaptive_trips_bitequal_to_static():
    """detect_adaptive=1 (while_loop exit once the block's lanes are
    exhausted) must be BIT-equal to the static T-trip unroll — including
    the (0, 0) emissions for exhausted trips and partially-dead rows."""
    T, min_fw, cb = 8, 1e-3, 0.05   # T > typical live count -> dead trips
    planes, z4 = make_case(3)
    a = detection_topT_batch(planes, z4, T, min_fw, cb,
                             interpret=INTERPRET, adaptive=True)
    s = detection_topT_batch(planes, z4, T, min_fw, cb,
                             interpret=INTERPRET, adaptive=False)
    for x, y, name in zip(a, s, ("vals", "idx", "norm", "count")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
