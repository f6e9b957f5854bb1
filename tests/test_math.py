"""Golden-value tests for the core math library vs NumPy oracles.

Mirrors the semantics of /root/reference/src/device_math.cuh (see SURVEY.md §4:
the reference has no tests; this is the constructed oracle suite).
"""

import numpy as np
import pytest

from phdslam_tpu.ops import math as pm


def test_wrap_angle_scalar_cases():
    cases = [0.0, 1.0, -1.0, np.pi - 1e-3, -np.pi + 1e-3, 3.5, -3.5,
             7.0, -7.0, 2 * np.pi, -2 * np.pi, 10 * np.pi + 0.1]
    for a in cases:
        got = float(pm.wrap_angle(a))
        # oracle: fmod + shift (device_math.cuh:241-250)
        r = np.fmod(a, 2 * np.pi)
        if r > np.pi:
            r -= 2 * np.pi
        elif r < -np.pi:
            r += 2 * np.pi
        # f32 resolution near |a|~30 is ~2e-6
        assert got == pytest.approx(r, abs=2e-5), a


def test_safe_log():
    assert float(pm.safe_log(1.0)) == 0.0
    assert float(pm.safe_log(np.e)) == pytest.approx(1.0, rel=1e-6)
    assert float(pm.safe_log(0.0)) == np.float32(pm.LOG0)
    assert float(pm.safe_log(-3.0)) == np.float32(pm.LOG0)
    assert np.exp(np.float32(pm.LOG0)) == 0.0


def test_det_inv_2x2():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(10, 2, 2))
    A = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(2)  # SPD
    np.testing.assert_allclose(np.asarray(pm.det2(A)), np.linalg.det(A),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pm.inv2(A)), np.linalg.inv(A),
                               rtol=1e-4)


def test_det_inv_4x4():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 4, 4))
    A = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(4)
    np.testing.assert_allclose(np.asarray(pm.det_nd(A)), np.linalg.det(A),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pm.inv_nd(A)), np.linalg.inv(A),
                               rtol=1e-3, atol=1e-5)


def test_chol2():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(6, 2, 2))
    A = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(2)
    L = np.asarray(pm.chol2(A))
    np.testing.assert_allclose(L @ np.swapaxes(L, -1, -2), A, rtol=1e-4,
                               atol=1e-6)


def test_gaussian_logpdf_matches_scipy_formula():
    rng = np.random.default_rng(3)
    for d in (2, 4):
        mean = rng.normal(size=(d,))
        A = rng.normal(size=(d, d))
        cov = A @ A.T + 0.5 * np.eye(d)
        x = rng.normal(size=(d,))
        got = float(pm.gaussian_logpdf(x, mean, cov))
        diff = x - mean
        want = (-0.5 * diff @ np.linalg.solve(cov, diff)
                - 0.5 * np.linalg.slogdet(cov)[1]
                - 0.5 * d * np.log(2 * np.pi))
        assert got == pytest.approx(want, rel=1e-4)


def test_mahalanobis_matches_reference_formula():
    """computeMahalDist: d' ((A+B)/2)^-1 d (device_math.cuh:308-330)."""
    rng = np.random.default_rng(4)
    for d in (2, 4):
        ma, mb = rng.normal(size=(2, d))
        A = rng.normal(size=(d, d)); A = A @ A.T + 0.3 * np.eye(d)
        B = rng.normal(size=(d, d)); B = B @ B.T + 0.3 * np.eye(d)
        got = float(pm.mahalanobis2(ma, A, mb, B))
        sigma = 0.5 * (A + B)
        diff = ma - mb
        want = diff @ np.linalg.solve(sigma, diff)
        assert got == pytest.approx(want, rel=1e-4)


def test_hellinger_reference_formula_2d():
    """computeHellingerDist 2D (device_math.cuh:372-413)."""
    rng = np.random.default_rng(5)
    ma, mb = rng.normal(size=(2, 2))
    A = rng.normal(size=(2, 2)); A = A @ A.T + 0.3 * np.eye(2)
    B = rng.normal(size=(2, 2)); B = B @ B.T + 0.3 * np.eye(2)
    got = float(pm.hellinger2(ma, A, mb, B))
    sigma = A + B
    diff = ma - mb
    eps = -0.25 * diff @ np.linalg.solve(sigma, diff)
    ratio = np.sqrt(np.linalg.det(A @ B)) / (np.linalg.det(sigma) / 4.0)
    want = 1.0 - np.sqrt(ratio) * np.exp(eps)
    assert got == pytest.approx(want, rel=1e-4)
    # identical Gaussians -> distance 0
    same = float(pm.hellinger2(ma, A, ma, A))
    assert same == pytest.approx(0.0, abs=1e-5)


def test_masked_logsumexp():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(4, 7))
    mask = rng.random((4, 7)) > 0.4
    got = np.asarray(pm.masked_logsumexp(x, mask, axis=-1))
    for i in range(4):
        if mask[i].any():
            want = np.log(np.sum(np.exp(x[i][mask[i]])))
            assert got[i] == pytest.approx(want, rel=1e-5)
        else:
            assert got[i] == pm.LOG0


def test_logistic():
    got = float(pm.logistic(0.5, 0.0, 1.0, 10.0, 0.0))
    want = 1.0 / (1.0 + np.exp(-10.0 * 0.5))
    assert got == pytest.approx(want, rel=1e-5)
