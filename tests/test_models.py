"""Tests for vehicle/feature/measurement models vs NumPy oracles ported from
the reference equations (phdfilter.cu:785-859, device_math.cuh:608-683,
python/AckermanMotionModel.py:23-41)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.models import feature_motion, measurement, vehicle


def ackerman_oracle(pose, v, alpha, l, h, a, b, dt):
    """python/AckermanMotionModel.py:23-41 == phdPredictKernelAckerman."""
    x, y, th = pose[:3]
    vc = v / (1 - np.tan(alpha) * h / l)
    xc_dot = vc * np.cos(th)
    yc_dot = vc * np.sin(th)
    thc_dot = vc * np.tan(alpha) / l
    x2 = x + dt * (xc_dot - thc_dot * (a * np.sin(th) + b * np.cos(th)))
    y2 = y + dt * (yc_dot + thc_dot * (a * np.cos(th) - b * np.sin(th)))
    th2 = th + dt * thc_dot
    th2 = (th2 + np.pi) % (2 * np.pi) - np.pi
    return np.array([x2, y2, th2, 0, 0, 0])


def test_ackerman_predict_zero_noise():
    pose = jnp.array([[1.0, 2.0, 0.3, 0, 0, 0]] * 4)
    geom = (2.83, 0.76, 3.78, 0.5)
    out = vehicle.ackerman_predict(pose, (3.0, 0.1), geom, (0.0, 0.0), 0.1,
                                   jax.random.PRNGKey(0))
    want = ackerman_oracle(np.array([1.0, 2.0, 0.3]), 3.0, 0.1, *geom, 0.1)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-5, atol=1e-6)


def test_cv_predict_zero_noise():
    pose = jnp.array([[0.0, 0.0, np.pi / 4, 2.0, 0.5, 0.1]])
    out = vehicle.cv_predict(pose, (0.0, 0.0, 0.0), 0.1,
                             jax.random.PRNGKey(0))
    th = np.pi / 4
    want_x = 0.1 * (2.0 * np.cos(th) - 0.5 * np.sin(th))
    want_y = 0.1 * (2.0 * np.sin(th) + 0.5 * np.cos(th))
    got = np.asarray(out[0])
    assert got[0] == pytest.approx(want_x, rel=1e-5)
    assert got[1] == pytest.approx(want_y, rel=1e-5)
    assert got[2] == pytest.approx(th + 0.01, rel=1e-5)
    np.testing.assert_allclose(got[3:], [2.0, 0.5, 0.1], rtol=1e-6)


def test_cv_predict_noise_statistics():
    pose = jnp.zeros((20000, 6))
    dt = 0.1
    out = vehicle.cv_predict(pose, (1.0, 2.0, 0.5), dt,
                             jax.random.PRNGKey(1))
    vx = np.asarray(out[:, 3])
    vy = np.asarray(out[:, 4])
    assert np.std(vx) == pytest.approx(dt * 1.0, rel=0.05)
    assert np.std(vy) == pytest.approx(dt * 2.0, rel=0.05)


def test_classify_in_range():
    cfg = SlamConfig(min_range=2.0, max_range=10.0, max_bearing=np.pi / 2)
    pose = jnp.zeros((6,))
    means = jnp.array([
        [5.0, 0.0],    # in range
        [11.0, 0.0],   # nearly (r < 1.2*max)
        [13.0, 0.0],   # out (r > 1.2*max)
        [1.8, 0.0],    # below min_range but >= 0.8*min -> nearly
        [0.0, 5.0],    # bearing pi/2 -> in range (<=)
        [-5.0, 0.1],   # bearing ~pi -> out
    ])
    w = jnp.ones((6,))
    cls = np.asarray(measurement.classify_in_range(pose, means, w, cfg))
    assert list(cls[:4]) == [1, 2, 0, 2]
    assert cls[4] == 1
    assert cls[5] == 0
    # dead slot -> class 0
    cls2 = np.asarray(measurement.classify_in_range(
        pose, means, jnp.zeros((6,)), cfg))
    assert (cls2 == 0).all()


def test_birth_model_matches_reference_formula():
    """computeBirth 2D (phdfilter.cu:205-242)."""
    cfg = SlamConfig(std_range=0.25, std_bearing=0.0087, birth_noise_factor=1.5)
    pose = jnp.array([1.0, -2.0, 0.4, 0, 0, 0])
    z = jnp.array([[6.0, 0.3]])
    mean, cov = measurement.birth_mean_cov(pose, z, cfg)
    mean, cov = np.asarray(mean)[0], np.asarray(cov)[0]

    theta = 0.4 + 0.3
    dx, dy = 6.0 * np.cos(theta), 6.0 * np.sin(theta)
    np.testing.assert_allclose(mean, [1.0 + dx, -2.0 + dy], rtol=1e-5)
    J = np.array([[dx / 6.0, -dy], [dy / 6.0, dx]])
    R = np.diag([(0.25 * 1.5) ** 2, (0.0087 * 1.5) ** 2])
    np.testing.assert_allclose(cov, J @ R @ J.T, rtol=1e-4, atol=1e-7)

    # 4D variant: zero velocity mean, configured velocity variance
    cfg4 = SlamConfig(std_range=0.25, std_bearing=0.0087,
                      birth_noise_factor=1.5, cov_vx_birth=1.0,
                      cov_vy_birth=2.0)
    mean4, cov4 = measurement.birth_mean_cov_4d(pose, z, cfg4)
    mean4, cov4 = np.asarray(mean4)[0], np.asarray(cov4)[0]
    np.testing.assert_allclose(mean4[:2], mean, rtol=1e-6)
    np.testing.assert_allclose(mean4[2:], 0.0)
    np.testing.assert_allclose(cov4[:2, :2], cov, rtol=1e-6)
    assert cov4[2, 2] == pytest.approx(1.0)
    assert cov4[3, 3] == pytest.approx(2.0)
    assert cov4[0, 2] == 0.0


def test_constant_position_predict():
    mean = jnp.array([[1.0, 2.0]])
    cov = jnp.array([[[0.5, 0.1], [0.1, 0.7]]])
    m2, c2 = feature_motion.constant_position_predict(mean, cov, 3.0, 4.0, 0.1)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean))
    np.testing.assert_allclose(
        np.asarray(c2)[0],
        np.array([[0.5 + 0.09, 0.1], [0.1, 0.7 + 0.16]]), rtol=1e-5)


def test_constant_velocity_predict_matches_kinematics():
    """F P F' + Q oracle for the 4D CV model (device_math.cuh:608-657)."""
    rng = np.random.default_rng(7)
    mean = rng.normal(size=(3, 4))
    A = rng.normal(size=(3, 4, 4))
    cov = A @ np.swapaxes(A, -1, -2) + 0.2 * np.eye(4)
    dt, sx, sy = 0.1, 0.3, 0.6
    m2, c2 = feature_motion.constant_velocity_predict(
        jnp.array(mean), jnp.array(cov), sx, sy, dt)
    F = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]])
    q = np.diag([sx ** 2, sy ** 2])
    G = np.array([[dt ** 2 / 2, 0], [0, dt ** 2 / 2], [dt, 0], [0, dt]])
    Q = G @ q @ G.T
    # the reference's Maple-generated covariance omits the x-y noise
    # cross-terms (cov[1],cov[4] have no noise contribution), i.e. its Q is
    # the diagonal-block version of G q G':
    Q_ref = np.zeros((4, 4))
    Q_ref[0, 0] = dt ** 4 / 4 * sx ** 2
    Q_ref[1, 1] = dt ** 4 / 4 * sy ** 2
    Q_ref[0, 2] = Q_ref[2, 0] = dt ** 3 / 2 * sx ** 2
    Q_ref[1, 3] = Q_ref[3, 1] = dt ** 3 / 2 * sy ** 2
    Q_ref[2, 2] = dt ** 2 * sx ** 2
    Q_ref[3, 3] = dt ** 2 * sy ** 2
    np.testing.assert_allclose(Q_ref, np.where(np.abs(Q) > 0, Q, 0),
                               rtol=1e-6)  # sanity: same nonzero pattern
    np.testing.assert_allclose(np.asarray(m2), mean @ F.T, rtol=1e-5)
    want = F @ cov @ F.T + Q_ref
    np.testing.assert_allclose(np.asarray(c2), want, rtol=1e-4, atol=1e-6)
