"""OSPA set-to-set error metric.

Re-implementation of the reference evaluation oracle
(/root/reference/python/ospa.py:221-269 ``ospa_distance``), with the
Cython Munkres steps (munkres_step4.pyx) replaced by
``scipy.optimize.linear_sum_assignment`` — the same optimal assignment.

Protocol (BASELINE.md): OSPA with p=1, c=5 on extracted map estimates.
"""

from __future__ import annotations

import numpy as np

try:
    from scipy.optimize import linear_sum_assignment
    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False

try:  # native JV solver — the compiled-Munkres role of munkres_step4.pyx
    from ..runtime.native import munkres as _native_munkres
except Exception:  # pragma: no cover
    _native_munkres = None


def _hungarian(cost: np.ndarray):
    if _native_munkres is not None and cost.shape[0] <= cost.shape[1] \
            and np.all(np.isfinite(cost)):
        r, c = _native_munkres.assign(np.ascontiguousarray(cost, np.float64))
        return r, c
    if _HAVE_SCIPY:
        return linear_sum_assignment(cost)
    # tiny fallback: greedy (only used if scipy is unavailable)
    m, n = cost.shape
    rows, cols = [], []
    used = set()
    for i in np.argsort(cost, axis=None):
        r, c = divmod(int(i), n)
        if r in rows or c in used:
            continue
        rows.append(r)
        used.add(c)
        cols.append(c)
        if len(rows) == m:
            break
    return np.array(rows), np.array(cols)


def ospa_distance(X, Y, p: float = 1.0, c: float = 10.0):
    """OSPA(p, c) between point sets X [m, d] and Y [n, d].

    Returns (ospa, localization, cardinality) exactly as ospa.py:221-269:
      err_loc = (sum min(d, c)^p / n)^(1/p) over the optimal assignment
      err_cn  = (c^p (n - m) / n)^(1/p)
      ospa    = ((sum + (n - m) c^p) / n)^(1/p)
    with (m, n) ordered so n >= m.
    """
    X = np.atleast_2d(np.asarray(X, dtype=float))
    Y = np.atleast_2d(np.asarray(Y, dtype=float))
    if X.size == 0 and Y.size == 0:
        return (0.0, 0.0, 0.0)
    if X.size == 0 or Y.size == 0:
        return (float(c), 0.0, float(c))

    m, n = len(X), len(Y)
    if m > n:
        X, Y = Y, X
        m, n = n, m

    diff = X[:, None, :] - Y[None, :, :]
    dists = np.sqrt(np.sum(diff ** 2, axis=-1))
    dists = np.minimum(dists, c)  # cutoff (munkres_step4 compute_cost)

    rows, cols = _hungarian(dists)
    total_loc = float(np.sum(dists[rows, cols] ** p))

    err_cn = (float(c ** p * (n - m)) / n) ** (1.0 / p)
    err_loc = (total_loc / n) ** (1.0 / p)
    ospa = ((total_loc + (n - m) * c ** p) / n) ** (1.0 / p)
    return (ospa, err_loc, err_cn)


def extract_map_estimate(weights, means):
    """Map estimate used for scoring (batch_analyze.py:21-28):
    round(sum w) highest-weight features."""
    weights = np.asarray(weights)
    means = np.asarray(means)
    live = weights > 0
    weights, means = weights[live], means[live]
    if weights.size == 0:
        return np.zeros((0, means.shape[-1] if means.ndim > 1 else 2))
    w_sum = int(round(float(np.sum(weights))))
    order = np.argsort(weights)[::-1]
    return means[order[:w_sum]]
