"""Native C++ textio extension vs the pure-Python parsers."""

import importlib
import os

import numpy as np
import pytest

from phdslam_tpu.runtime import io
from phdslam_tpu.runtime.native import textio

pytestmark = pytest.mark.skipif(textio is None,
                                reason="native textio failed to build")

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "ackerman")


def python_load_measurements(path, labeled=False):
    """The pure-Python fallback, with the native path disabled."""
    out = []
    width = 3 if labeled else 2
    with open(path) as fh:
        first = True
        for line in fh:
            if first:
                first = False
                continue
            vals = np.fromstring(line, sep=" ") if line.strip() \
                else np.empty(0)
            n = (len(vals) // width) * width
            out.append(vals[:n].reshape(-1, width).astype(np.float32))
    if out and out[-1].size == 0:
        out.pop()
    return out


def test_measurements_match_python():
    path = os.path.join(DATA, "measurements.txt")
    native = textio.load_measurements(path)
    pure = python_load_measurements(path)
    assert len(native) == len(pure)
    for a, b in zip(native, pure):
        np.testing.assert_array_equal(a, b)


def test_controls_match_python(tmp_path):
    path = os.path.join(DATA, "controls.txt")
    native = textio.load_controls(path)
    with open(path) as fh:
        lines = fh.readlines()[1:]
    pure = np.asarray([[float(x) for x in l.split()[:2]]
                       for l in lines if len(l.split()) >= 2], np.float32)
    np.testing.assert_allclose(native, pure, rtol=1e-6)


def test_labeled_parsing(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("% header\n1.0 0.5 0 2.0 -0.5 1 \n\n3.0 0.1 0 \n")
    sets = textio.load_measurements(str(p), labeled=True)
    assert len(sets) == 3
    assert sets[0].shape == (2, 3)
    assert sets[1].shape == (0, 3)
    np.testing.assert_allclose(sets[2], [[3.0, 0.1, 0.0]])


def test_write_state_lines(tmp_path):
    p = str(tmp_path / "log.txt")
    textio.write_state_lines(p, [np.array([1.5, -2.0, 3e-7]), None,
                                 np.array([42.0])])
    with open(p) as fh:
        lines = fh.read().splitlines()
    assert lines[0].split() == ["1.5", "-2", "3e-07"]
    assert lines[1] == ""
    assert lines[2].split() == ["42"]


def test_native_munkres_optimal_vs_scipy():
    """The native JV solver (runtime/native/munkres.cpp — the compiled-
    assignment role of the reference's munkres_step4.pyx) must return an
    optimal matching: same total cost as scipy's linear_sum_assignment on
    random rectangular instances, and a valid permutation."""
    pytest.importorskip("scipy")
    from scipy.optimize import linear_sum_assignment

    from phdslam_tpu.runtime.native import munkres

    assert munkres is not None, "native munkres failed to build"
    rng = np.random.default_rng(0)
    for trial in range(30):
        m = int(rng.integers(1, 12))
        n = int(rng.integers(m, 15))
        cost = rng.uniform(0, 10, size=(m, n))
        if trial % 3 == 0:  # degenerate ties: the OSPA cutoff saturates
            cost = np.minimum(cost, 5.0)
        r, c = munkres.assign(cost)
        sr, sc = linear_sum_assignment(cost)
        assert sorted(r.tolist()) == list(range(m))
        assert len(set(c.tolist())) == m
        np.testing.assert_allclose(cost[r, c].sum(), cost[sr, sc].sum(),
                                   rtol=1e-12)


def test_native_munkres_edge_cases():
    from phdslam_tpu.runtime.native import munkres

    assert munkres is not None
    r, c = munkres.assign(np.zeros((0, 3)))
    assert len(r) == 0 and len(c) == 0
    r, c = munkres.assign(np.array([[3.0, 1.0, 2.0]]))
    assert r.tolist() == [0] and c.tolist() == [1]
    with pytest.raises(ValueError):
        munkres.assign(np.zeros((3, 2)))  # m > n rejected
    with pytest.raises(ValueError):
        munkres.assign(np.array([[np.nan, 1.0]]))
