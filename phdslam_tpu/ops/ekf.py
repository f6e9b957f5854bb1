"""Batched EKF pre-update for range-bearing measurements.

TPU-native equivalent of the reference's per-(feature x measurement) EKF
pre-update kernels: ``preUpdateSynthKernel`` 2D (phdfilter.cu:1824-1925) and 4D
(:1927-2058), and the inline ``computePreUpdate`` 2D/4D (:301-521).

Key structural property preserved from the reference: the innovation
covariance S, Kalman gain K and Joseph-form updated covariance are computed
ONCE per feature (they do not depend on the measurement); only the updated
means and the partially-updated log-weights are per-(measurement, feature)
(phdfilter.cu:1890-1894). This keeps the memory footprint at
O(K * D^2 + M * K * D) instead of O(M * K * D^2).

Everything is batched over a leading feature axis K (and vmap-ed over
particles by the caller). The measurement matrix is H = [J | 0] where J is
the 2x2 range-bearing Jacobian wrt position, so one implementation covers
both the 2D (static) and 4D (dynamic) feature models.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.math import safe_log, sym, wrap_angle
from ..models.measurement import (detection_probability, measurement_jacobian,
                                  predict_measurement)


class PreUpdate(NamedTuple):
    """Per-feature EKF quantities (batched over K)."""
    r: jnp.ndarray          # [K] predicted range
    bearing: jnp.ndarray    # [K] predicted bearing
    pd: jnp.ndarray         # [K] detection probability
    S: jnp.ndarray          # [K, 2, 2] innovation covariance
    S_inv: jnp.ndarray      # [K, 2, 2]
    det_S: jnp.ndarray      # [K]
    gain: jnp.ndarray       # [K, D, 2] Kalman gain
    cov_upd: jnp.ndarray    # [K, D, D] Joseph-form updated covariance


def ekf_preupdate(pose, mean, cov, cfg) -> PreUpdate:
    """Compute measurement-independent EKF quantities for each feature."""
    dtype = mean.dtype
    D = mean.shape[-1]
    r, bearing, dx, dy, r2 = predict_measurement(pose, mean)
    pd = detection_probability(r, bearing, cfg).astype(dtype)

    # Clamp the range used in the Jacobians: empty GM slots sit at the origin
    # and can coincide with the vehicle, and masked lanes must stay NaN-free.
    r_safe = jnp.maximum(r, 1e-6)
    r2_safe = jnp.maximum(r2, 1e-12)
    J = measurement_jacobian(dx, dy, r_safe, r2_safe)  # [K, 2, 2]
    # H = [J | 0] : [K, 2, D]
    if D == 2:
        H = J
    else:
        H = jnp.concatenate(
            [J, jnp.zeros(J.shape[:-1] + (D - 2,), dtype=dtype)], axis=-1)

    R = jnp.array([[cfg.std_range ** 2, 0.0],
                   [0.0, cfg.std_bearing ** 2]], dtype=dtype)

    PHt = jnp.einsum("...ij,...kj->...ik", cov, H)   # [K, D, 2]
    S = jnp.einsum("...ij,...jk->...ik", H, PHt) + R  # [K, 2, 2]
    S = sym(S)                                        # ref enforces symmetry (:341-343)
    det_S = S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]
    S_inv = jnp.stack(
        [jnp.stack([S[..., 1, 1], -S[..., 0, 1]], axis=-1),
         jnp.stack([-S[..., 1, 0], S[..., 0, 0]], axis=-1)], axis=-2
    ) / det_S[..., None, None]

    gain = jnp.einsum("...ij,...jk->...ik", PHt, S_inv)  # [K, D, 2]

    # Joseph form: (I - K H) P (I - K H)' + K R K'  (phdfilter.cu:360-364)
    I = jnp.eye(D, dtype=dtype)
    IKH = I - jnp.einsum("...ij,...jk->...ik", gain, H)
    cov_upd = jnp.einsum("...ij,...jk,...lk->...il", IKH, cov, IKH) \
        + jnp.einsum("...ij,jk,...lk->...il", gain, R, gain)

    return PreUpdate(r=r, bearing=bearing, pd=pd, S=S, S_inv=S_inv,
                     det_S=det_S, gain=gain, cov_upd=cov_upd)


def ekf_detection_logw(pre: PreUpdate, weight, z, cfg):
    """Per-(measurement, feature) partial log-weights only (no means).

    z: [M, 2] (range, bearing) padded measurements.
    Returns (log_w_partial[M, K], log_like[M, K]).

    log_w_partial = log(pd) + log(w) - 0.5 d'S^-1 d - log(2 pi)
                    - 0.5 log det S     (phdfilter.cu:1916-1922)

    The Mahalanobis form is expanded elementwise so XLA fuses the [M, K]
    innovation grid into the likelihood without materializing an [M, K, 2]
    tensor in HBM (the updated means — the only O(M K D) output — are
    produced separately, and the fast path computes them post-compaction
    for surviving lanes only).
    """
    innov_r = z[:, None, 0] - pre.r[None, :]                      # [M, K]
    innov_b = wrap_angle(z[:, None, 1] - pre.bearing[None, :])    # [M, K]

    s00 = pre.S_inv[..., 0, 0][None, :]
    s01 = pre.S_inv[..., 0, 1][None, :]
    s10 = pre.S_inv[..., 1, 0][None, :]
    s11 = pre.S_inv[..., 1, 1][None, :]
    dist = (s00 * innov_r * innov_r + (s01 + s10) * innov_r * innov_b
            + s11 * innov_b * innov_b)
    log_like = -0.5 * dist - jnp.log(2.0 * jnp.pi) \
        - 0.5 * safe_log(pre.det_S)[None, :]
    log_w_partial = safe_log(pre.pd)[None, :] + safe_log(weight)[None, :] \
        + log_like
    return log_w_partial, log_like


def ekf_detection_linear(pre: PreUpdate, weight, z):
    """Linear-domain detection terms: pd * w * N(z; h(x), S) per lane.

    Returns [M, K]. This matches the reference's normalizer arithmetic
    exactly — ``phdUpdateKernel`` sums ``exp(w_partial)`` linearly
    (phdfilter.cu:2190-2223) — and costs ONE transcendental per lane
    (the log-domain route needs exp + the logsumexp max pass).
    Lanes that underflow f32 contribute 0, as in the reference.
    """
    innov_r = z[:, None, 0] - pre.r[None, :]                      # [M, K]
    innov_b = wrap_angle(z[:, None, 1] - pre.bearing[None, :])    # [M, K]
    s00 = pre.S_inv[..., 0, 0][None, :]
    s01 = pre.S_inv[..., 0, 1][None, :]
    s10 = pre.S_inv[..., 1, 0][None, :]
    s11 = pre.S_inv[..., 1, 1][None, :]
    dist = (s00 * innov_r * innov_r + (s01 + s10) * innov_r * innov_b
            + s11 * innov_b * innov_b)
    # per-feature prefactor: pd * w / (2 pi sqrt(det S))
    pref = pre.pd * weight / (2.0 * jnp.pi
                              * jnp.sqrt(jnp.maximum(pre.det_S, 1e-30)))
    return pref[None, :] * jnp.exp(-0.5 * dist)


def ekf_detection_means(pre: PreUpdate, mean, z):
    """Full [M, K, D] grid of EKF-updated means (preUpdateSynthKernel's
    per-(measurement, feature) mean writes, phdfilter.cu:1898-1906)."""
    innov_r = z[:, None, 0] - pre.r[None, :]                      # [M, K]
    innov_b = wrap_angle(z[:, None, 1] - pre.bearing[None, :])    # [M, K]
    innov = jnp.stack([innov_r, innov_b], axis=-1)                # [M, K, 2]
    return mean[None] + jnp.einsum("...ij,m...j->m...i",
                                   pre.gain, innov)               # [M, K, D]


def ekf_detection_means_at(pre: PreUpdate, mean, z, m_src, k_src):
    """EKF-updated means for selected (measurement, feature) lane pairs only.

    m_src/k_src: [C] integer indices. Returns [C, D]. Used by the compacted
    fast path so the O(M K D) mean grid never hits HBM.
    """
    zr = z[m_src, 0]
    zb = z[m_src, 1]
    innov = jnp.stack([zr - pre.r[k_src],
                       wrap_angle(zb - pre.bearing[k_src])], axis=-1)  # [C,2]
    return mean[k_src] + jnp.einsum("cij,cj->ci", pre.gain[k_src], innov)


def ekf_detection_terms(pre: PreUpdate, mean, weight, z, cfg):
    """Per-(measurement, feature) updated means and partial log-weights.

    z: [M, 2] (range, bearing) padded measurements.
    Returns (mean_upd[M, K, D], log_w_partial[M, K], log_like[M, K]).
    """
    log_w_partial, log_like = ekf_detection_logw(pre, weight, z, cfg)
    mean_upd = ekf_detection_means(pre, mean, z)
    return mean_upd, log_w_partial, log_like
