"""Tests for the OSPA metric port and the IO layer."""

import numpy as np
import pytest

from phdslam_tpu.eval.ospa import extract_map_estimate, ospa_distance
from phdslam_tpu.runtime import io


def test_ospa_reference_selftest():
    """The reference's own __main__ test (ospa.py:271-275):
    X = 0..5, Y = [0,-3,-6], p=1, c=10."""
    X = np.arange(6, dtype=float)[:, None]
    Y = np.array([0.0, -3.0, -6.0])[:, None]
    ospa, loc, cn = ospa_distance(X, Y, p=1, c=10)
    # optimal assignment: |0-0|, |1-(-3)|->4? Hungarian picks min-cost
    # pairing of 3 of the 6 points; cardinality err = (10*3/6)
    assert cn == pytest.approx(5.0)
    assert ospa == pytest.approx(loc + cn)


def test_ospa_empty_sets():
    assert ospa_distance(np.zeros((0, 2)), np.zeros((0, 2)), 1, 5) == (0, 0, 0)
    out = ospa_distance(np.zeros((0, 2)), np.ones((3, 2)), 1, 5)
    assert out == (5.0, 0.0, 5.0)


def test_ospa_identical_sets():
    X = np.random.default_rng(0).normal(size=(7, 2))
    ospa, loc, cn = ospa_distance(X, X.copy(), p=1, c=5)
    assert ospa == pytest.approx(0.0, abs=1e-9)


def test_ospa_cutoff():
    X = np.array([[0.0, 0.0]])
    Y = np.array([[100.0, 0.0]])
    ospa, loc, cn = ospa_distance(X, Y, p=1, c=5)
    assert ospa == pytest.approx(5.0)
    assert cn == 0.0


def test_extract_map_estimate():
    w = np.array([0.9, 0.8, 0.2, 0.05, 0.0])
    m = np.arange(10).reshape(5, 2).astype(float)
    est = extract_map_estimate(w, m)
    # round(sum w) = round(1.95) = 2 -> two highest-weight features
    assert est.shape == (2, 2)
    np.testing.assert_allclose(est, m[:2])


def test_load_measurements_pairs(tmp_path):
    p = tmp_path / "measurements.txt"
    p.write_text("% header\n"
                 "1.0 0.5 2.0 -0.5 \n"
                 "\n"
                 "3.0 0.1 \n")
    out = io.load_measurements(str(p))
    assert len(out) == 3
    assert out[0].shape == (2, 2)
    assert out[1].shape[0] == 0
    np.testing.assert_allclose(out[2], [[3.0, 0.1]])


def test_load_controls(tmp_path):
    p = tmp_path / "controls.txt"
    p.write_text("% velocity\tsteering angle\n"
                 "2.77 -0.18\n"
                 " -1.86 0.03\n"
                 "-2.67, 0.177\n")  # comma format (python/controls_synth.txt)
    out = io.load_controls(str(p))
    assert out.shape == (3, 2)
    assert out[2, 0] == pytest.approx(-2.67)


def test_pad_measurements_truncates():
    ms = [np.ones((3, 2)), np.ones((10, 2))]
    z, mask = io.pad_measurements(ms, 4)
    assert z.shape == (2, 4, 2)
    assert mask.sum() == 3 + 4


def test_state_log_roundtrip(tmp_path):
    """write_state_log output must parse with batch_analyze.py's recipe
    (batch_analyze.py:16-36)."""
    K = 4
    w = np.array([0.9, 0.7, 0.0, 0.0])
    m = np.array([[1.0, 2.0], [3.0, 4.0], [0, 0], [0, 0]])
    c = np.tile(np.eye(2) * 0.1, (K, 1, 1))
    io.write_state_log(str(tmp_path), 3, np.arange(6.0), (w, m, c), None,
                       np.full(5, -np.log(5)), np.zeros((5, 6)),
                       np.arange(5), None, 8, 0)
    path = tmp_path / "state_estimate00003.log"
    lines = path.read_text().splitlines()
    assert len(lines) == 7
    est_pose = np.fromstring(lines[0], sep=" ")
    np.testing.assert_allclose(est_pose, np.arange(6.0))
    est_map = np.fromstring(lines[1], sep=" ")
    assert est_map.size == 2 * 7  # 2 live features x (w + mean2 + cov4)
    map_w = est_map[0::7]
    np.testing.assert_allclose(map_w, [0.9, 0.7])
    logw = np.fromstring(lines[3], sep=" ")
    assert logw.size == 5
    cn = np.fromstring(lines[6], sep=" ")
    assert cn.size == 9


def test_write_particles_mat(tmp_path):
    import scipy.io as sio

    from phdslam_tpu.config import SlamConfig
    from phdslam_tpu.runtime.io import write_particles_mat
    from phdslam_tpu.types import init_state

    cfg = SlamConfig(n_particles=4, max_features=8)
    state = init_state(cfg)
    p = str(tmp_path / "particles.mat")
    write_particles_mat(p, state, cfg)
    m = sio.loadmat(p)
    assert m["particles"].shape == (4, 6)
    assert m["maps_mean"].shape == (4, 8, 2)
    assert m["weights"].shape[-1] == 4
