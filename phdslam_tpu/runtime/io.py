"""Dataset loaders and log writers.

Python implementations of the reference text-format IO
(/root/reference/src/main.cpp:147-283 loaders, :848-954 ``writeLog``).
A C++ fast path for bulk text parsing lives in ``runtime/native`` and is used
automatically when built (the reference's loaders/writers are C++; ours are
too, with this module as the portable fallback and the padding/packing layer).

Format notes (verified against the shipped datasets):
* measurements files: one time step per line, header line first; each
  measurement is a (range, bearing) pair, or (range, bearing, label) when
  ``labeled == True``. The reference's parser always reads triples
  (main.cpp:191-207), which silently garbles the shipped pair-format files —
  a known quirk we do NOT replicate (SURVEY.md §7.3).
* controls files: header line then ``v_encoder alpha`` per line
  (main.cpp:169-189).
* timestamps: one float per line, trailing blank dropped (main.cpp:147-167).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

try:
    from .native import textio as _native_textio  # built lazily
except Exception:  # pragma: no cover - native ext optional
    _native_textio = None


def load_measurements(path: str, labeled: bool = False) -> List[np.ndarray]:
    """Load per-step measurement sets. Returns a list of [n_i, 2] arrays
    (range, bearing) (+labels column when labeled)."""
    if _native_textio is not None:
        return _native_textio.load_measurements(path, labeled)
    out: List[np.ndarray] = []
    width = 3 if labeled else 2
    with open(path) as fh:
        first = True
        for line in fh:
            if first:  # header line (main.cpp:231)
                first = False
                continue
            vals = np.fromstring(line, sep=" ") if line.strip() else np.empty(0)
            n = (len(vals) // width) * width
            out.append(vals[:n].reshape(-1, width).astype(np.float32))
    # the reference drops the trailing empty entry produced by the final
    # newline (main.cpp:239); replicate by dropping a trailing empty line
    if out and out[-1].size == 0:
        out.pop()
    return out


def load_controls(path: str) -> np.ndarray:
    """Load (v_encoder, alpha) controls; [N, 2] (main.cpp:169-189)."""
    if _native_textio is not None:
        return _native_textio.load_controls(path)
    rows = []
    with open(path) as fh:
        first = True
        for line in fh:
            if first:
                first = False
                continue
            line = line.replace(",", " ")
            vals = np.fromstring(line, sep=" ")
            if len(vals) >= 2:
                rows.append(vals[:2])
    return np.asarray(rows, dtype=np.float32) if rows else np.zeros((0, 2),
                                                                    np.float32)


def load_timestamps(path: str) -> np.ndarray:
    """One float per line; trailing entry dropped (main.cpp:147-167)."""
    if not os.path.exists(path):
        return np.zeros((0,), np.float32)
    vals = []
    with open(path) as fh:
        for line in fh:
            s = line.strip()
            if s:
                vals.append(float(s.split()[0]))
    return np.asarray(vals, dtype=np.float32)


def load_trajectory(path: str) -> np.ndarray:
    """[N, 6] CV states; '%'-prefixed header skipped (main.cpp:246-263)."""
    rows = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("%") or not line.strip():
                continue
            vals = np.fromstring(line, sep=" ")
            if len(vals) >= 6:
                rows.append(vals[:6])
    return np.asarray(rows, dtype=np.float32)


def pad_measurements(measurements: List[np.ndarray], m_max: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Pack ragged per-step measurements into fixed [T, M_max, 2] + mask.

    This is the fixed-capacity ingestion boundary (SURVEY.md §5 failure
    detection): steps with more than m_max measurements are truncated (the
    reference clamps at 256, phdfilter.cu:3389-3394).
    """
    T = len(measurements)
    z = np.zeros((T, m_max, 2), dtype=np.float32)
    mask = np.zeros((T, m_max), dtype=bool)
    for t, zt in enumerate(measurements):
        n = min(len(zt), m_max)
        if n > 0:
            z[t, :n] = zt[:n, :2]
            mask[t, :n] = True
    return z, mask


# ----------------------------------------------------------------------------
# state_estimate log writer (main.cpp:848-954) — drop-in compatible with
# python/batch_analyze.py's parser.
# ----------------------------------------------------------------------------

def write_state_log(outdir: str, t: int, expected_pose, static_map,
                    dynamic_map, particle_log_weights, particle_poses,
                    resample_idx, cardinality, max_cardinality: int,
                    filter_type: int = 0):
    """Write ``state_estimateXXXXX.log`` (6-line format, main.cpp:848-954).

    static_map / dynamic_map: (weights[K], means[K,D], covs[K,D,D]) with
    weight>0 marking live features, or None.
    """
    path = os.path.join(outdir, "state_estimate%05d.log" % t)
    if _native_textio is not None:
        lines = [np.asarray(expected_pose, np.float64)]
        for gm, D in ((static_map, 2), (dynamic_map, 4)):
            if gm is None:
                lines.append(None)
                continue
            w, m, c = (np.asarray(x) for x in gm)
            live = w > 0
            if live.any():
                row = np.concatenate(
                    [w[live, None], m[live, :D],
                     c[live, :D, :D].reshape(live.sum(), -1)], axis=1)
                lines.append(row.reshape(-1).astype(np.float64))
            else:
                lines.append(None)
        lines.append(np.asarray(particle_log_weights, np.float64))
        lines.append(np.asarray(particle_poses, np.float64).reshape(-1))
        lines.append(np.asarray(resample_idx, np.float64))
        if filter_type == 1 and cardinality is not None:
            lines.append(np.asarray(cardinality,
                                    np.float64)[: max_cardinality + 1])
        else:
            lines.append(np.zeros(max_cardinality + 1))
        _native_textio.write_state_lines(path, lines)
        return
    with open(path, "a") as fh:
        fh.write(" ".join("%g" % v for v in np.asarray(expected_pose))
                 + " \n")
        for gm, D in ((static_map, 2), (dynamic_map, 4)):
            if gm is not None:
                w, m, c = gm
                w = np.asarray(w); m = np.asarray(m); c = np.asarray(c)
                parts = []
                for i in range(len(w)):
                    if w[i] <= 0:
                        continue
                    parts.append("%g" % w[i])
                    parts.extend("%g" % v for v in m[i, :D])
                    # reference writes cov in its flat (column-major-ish)
                    # struct order; for symmetric matrices row/col order match
                    parts.extend("%g" % v for v in c[i, :D, :D].reshape(-1))
                if parts:
                    fh.write(" ".join(parts) + " ")
            fh.write("\n")
        fh.write(" ".join("%g" % v for v in np.asarray(particle_log_weights))
                 + " \n")
        poses = np.asarray(particle_poses)
        fh.write(" ".join("%g" % v for v in poses.reshape(-1)) + " \n")
        fh.write(" ".join("%d" % v for v in np.asarray(resample_idx)) + " \n")
        if filter_type == 1 and cardinality is not None:
            fh.write(" ".join("%g" % v for v in np.asarray(cardinality)
                              [: max_cardinality + 1]) + " \n")
        else:
            fh.write(" ".join(["0"] * (max_cardinality + 1)) + " \n")


def write_particles_mat(path: str, state, cfg, map_estimate=None,
                        variances=None):
    """Full particle dump as a .mat file (writeParticlesMat,
    main.cpp:594-713): particle poses, weights, per-particle maps, variance
    estimates and the extracted map estimate."""
    import scipy.io as sio
    data = {
        "weights": np.asarray(state.log_weight),
        "particles": np.asarray(state.pose),
        "resample_idx": np.asarray(state.resample_idx),
        "maps_mean": np.asarray(state.map_static.mean),
        "maps_cov": np.asarray(state.map_static.cov),
        "maps_weight": np.asarray(state.map_static.weight),
        "maps_dynamic_mean": np.asarray(state.map_dynamic.mean),
        "maps_dynamic_cov": np.asarray(state.map_dynamic.cov),
        "maps_dynamic_weight": np.asarray(state.map_dynamic.weight),
        "vars": np.asarray(variances if variances is not None
                           else state.variance),
    }
    if state.cardinality is not None:
        data["cardinalities"] = np.asarray(state.cardinality)
    if map_estimate is not None:
        w, m, c = map_estimate
        data["map_estimate_weight"] = np.asarray(w)
        data["map_estimate_mean"] = np.asarray(m)
        data["map_estimate_cov"] = np.asarray(c)
    sio.savemat(path, data)


def write_disparity_particles_mat(path: str, state):
    """Full disparity-particle dump as a .mat file — the reference's
    per-step DEBUG writeParticlesMat call in the disparity loop
    (main.cpp:1397-1400): camera poses, log weights, per-feature particle
    clouds and feature weights."""
    import scipy.io as sio
    sio.savemat(path, {
        "weights": np.asarray(state.log_weight),
        "particles": np.asarray(state.cam_pose),
        "resample_idx": np.asarray(state.resample_idx),
        "clouds": np.asarray(state.cloud),
        "feature_weights": np.asarray(state.feat_weight),
    })
