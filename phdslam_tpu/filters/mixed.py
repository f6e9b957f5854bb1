"""Joint static+dynamic (jump-Markov mixed) GM-PHD measurement update.

TPU-native rebuild of ``phdUpdateKernelMixed`` (/root/reference/src/
phdfilter.cu:2323-2635) and its orchestration in ``phdUpdateSynth``
(:3412-3461, merge/copy-back :3703-3726): the per-measurement normalizer sums
detection terms over BOTH the 2D static and 4D dynamic maps plus clutter and
one birth weight per map (two when measurements are unlabeled, one when
labeled — the mismatching map's birth has weight 0, computeBirth :238-241,
:296-299).

Reference quirks NOT replicated (SURVEY.md §7.3):
* the predicted-cardinality accumulation indexes particle 0's weights
  (``features_predict_static[feature_idx]`` without ``predict_offset``,
  :2412-2413); we use the current particle's weights.
* ``~is_static`` bitwise-not on a bool (:2515) — harmless there, meaningless
  here.

Out-of-range handling (mergeAndCopyMaps :3311-3318, :3714-3719): static
out-of-range features are re-attached untouched; dynamic out-of-range
features are dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..models import measurement
from ..ops import ekf
from ..ops.gm_merge import compact_candidates, merge_dispatch
from ..ops.math import LOG0, logsumexp, safe_log
from ..types import FilterState, GMState

STATIC_MEASUREMENT = 0
DYNAMIC_MEASUREMENT = 1


def _classify(pose, mean, weight, cfg):
    cls = measurement.classify_in_range(pose, mean, weight, cfg)
    return (cls == measurement.IN_RANGE,
            cls == measurement.NEARLY_IN_RANGE,
            (cls == measurement.OUT_OF_RANGE) & (weight > 0))


def _merge_map(mean, cov, weight, mean_det, cov_upd, w_det, det_valid,
               w_nd, in_m, near_m, out_keep, b_mean, b_cov, w_birth,
               birth_valid, cfg, K):
    """Prune + merge + recombine for one map (shared by static/dynamic)."""
    M = w_det.shape[0]
    D = mean.shape[-1]
    dtype = mean.dtype
    min_fw = cfg.min_feature_weight

    act_a = (in_m & (w_nd >= min_fw)) | near_m
    w_a = jnp.where(in_m, w_nd, jnp.where(near_m, weight, 0.0))
    act_b = det_valid & (w_det >= min_fw)
    act_c = birth_valid & (w_birth >= min_fw)

    cand_mean = jnp.concatenate(
        [mean, mean_det.reshape(M * K, D), b_mean], axis=0)
    cand_cov = jnp.concatenate(
        [cov, jnp.broadcast_to(cov_upd[None], (M, K, D, D)).reshape(
            M * K, D, D), b_cov], axis=0)
    cand_w = jnp.concatenate([w_a, w_det.reshape(M * K), w_birth], axis=0)
    cand_act = jnp.concatenate([act_a, act_b.reshape(M * K), act_c], axis=0)

    eye = jnp.eye(D, dtype=dtype)
    cand_mean = jnp.where(cand_act[:, None], cand_mean, 0.0)
    cand_cov = jnp.where(cand_act[:, None, None], cand_cov, eye)
    cand_w = jnp.where(cand_act, cand_w, 0.0)

    cand_mean, cand_cov, cand_w, cand_act, n_compact = compact_candidates(
        cand_mean, cand_cov, cand_w, cand_act, cfg.merge_candidate_cap)
    mg_mean, mg_cov, mg_w, _, n_dropped = merge_dispatch(
        cand_mean, cand_cov, cand_w, cand_act, cfg, K)
    n_dropped = n_dropped + n_compact

    all_mean = jnp.concatenate([mg_mean, mean], axis=0)
    all_cov = jnp.concatenate([mg_cov, cov], axis=0)
    all_w = jnp.concatenate([mg_w, jnp.where(out_keep, weight, 0.0)], axis=0)

    _, order = jax.lax.top_k(all_w, K)
    new_mean = all_mean[order]
    new_cov = all_cov[order]
    new_w = all_w[order]
    empty = new_w <= 0
    new_cov = jnp.where(empty[:, None, None], eye, new_cov)
    new_mean = jnp.where(empty[:, None], 0.0, new_mean)
    new_w = jnp.where(empty, 0.0, new_w)
    overflow = jnp.maximum(
        jnp.sum((all_w > 0).astype(jnp.int32)) - K, 0) + n_dropped
    return new_mean, new_cov, new_w, overflow


def _update_mixed_single(pose, mean_s, cov_s, w_s, mean_d, cov_d, w_d,
                         z, z_label, z_mask, cfg: SlamConfig):
    """Single-particle mixed update. Returns new static map, new dynamic map,
    dlog_w, overflow."""
    Ks = mean_s.shape[0]
    Kd = mean_d.shape[0]
    M = z.shape[0]
    dtype = mean_s.dtype

    in_s, near_s, out_s = _classify(pose, mean_s, w_s, cfg)
    in_d, near_d, out_d = _classify(pose, mean_d, w_d, cfg)

    pre_s = ekf.ekf_preupdate(pose, mean_s, cov_s, cfg)
    pre_d = ekf.ekf_preupdate(pose, mean_d, cov_d, cfg)
    mdet_s, lw_s, _ = ekf.ekf_detection_terms(pre_s, mean_s, w_s, z, cfg)
    mdet_d, lw_d, _ = ekf.ekf_detection_terms(pre_d, mean_d, w_d, z, cfg)

    dv_s = z_mask[:, None] & in_s[None, :]
    dv_d = z_mask[:, None] & in_d[None, :]
    lw_s = jnp.where(dv_s, lw_s, LOG0)
    lw_d = jnp.where(dv_d, lw_d, LOG0)

    # birth weights per measurement/label (computeBirth :238-241, :296-299)
    if cfg.labeled_measurements:
        bw_s = jnp.where(z_label == STATIC_MEASUREMENT, cfg.birth_weight, 0.0)
        bw_d = jnp.where(z_label == DYNAMIC_MEASUREMENT, cfg.birth_weight, 0.0)
        n_birth_terms = 1.0
    else:
        bw_s = jnp.full((M,), cfg.birth_weight, dtype=dtype)
        bw_d = jnp.full((M,), cfg.birth_weight, dtype=dtype)
        n_birth_terms = 2.0

    # per-measurement normalizer: sum of static+dynamic detections + clutter
    # + birth weight(s) (:2480-2505)
    log_terms = jnp.concatenate([
        lw_s, lw_d,
        jnp.full((M, 1), safe_log(cfg.clutter_density), dtype=dtype),
        jnp.full((M, 1),
                 safe_log(cfg.birth_weight) + jnp.log(n_birth_terms),
                 dtype=dtype)], axis=1)
    mmax = jnp.max(log_terms, axis=1, keepdims=True)
    log_norm = jnp.squeeze(mmax, 1) + jnp.log(
        jnp.sum(jnp.exp(log_terms - mmax), axis=1))               # [M]

    w_nd_s = jnp.where(in_s, w_s * (1.0 - pre_s.pd), 0.0)
    w_nd_d = jnp.where(in_d, w_d * (1.0 - pre_d.pd), 0.0)
    wdet_s = jnp.where(dv_s, jnp.exp(lw_s - log_norm[:, None]), 0.0)
    wdet_d = jnp.where(dv_d, jnp.exp(lw_d - log_norm[:, None]), 0.0)

    b_mean_s, b_cov_s = measurement.birth_mean_cov(pose, z, cfg)
    b_mean_d, b_cov_d = measurement.birth_mean_cov_4d(pose, z, cfg)
    wb_s = jnp.where(z_mask, jnp.exp(safe_log(bw_s) - log_norm), 0.0)
    wb_d = jnp.where(z_mask, jnp.exp(safe_log(bw_d) - log_norm), 0.0)

    n_valid_z = jnp.sum(z_mask.astype(dtype))

    if cfg.particle_weighting == 0:
        # cluster-process (:2448-2456, 2548-2556): predicted cardinality is
        # pd-scaled persistent weights only (no birth terms, unlike the
        # static-only kernel)
        card_pred = jnp.sum(jnp.where(in_s, pre_s.pd * w_s, 0.0)) \
            + jnp.sum(jnp.where(in_d, pre_d.pd * w_d, 0.0))
        dlog_w = jnp.sum(jnp.where(z_mask, log_norm, 0.0)) - card_pred
    else:
        # Vo empty-map (:2558-2582)
        cn_predict = jnp.sum(jnp.where(in_s, w_s, 0.0)) \
            + jnp.sum(jnp.where(in_d, w_d, 0.0)) \
            + n_valid_z * cfg.birth_weight
        cn_update = jnp.sum(w_nd_s) + jnp.sum(wdet_s) + jnp.sum(wb_s) \
            + jnp.sum(w_nd_d) + jnp.sum(wdet_d) + jnp.sum(wb_d)
        dlog_w = n_valid_z * cfg.clutter_density + cn_update - cn_predict \
            - cfg.clutter_rate

    new_s = _merge_map(mean_s, cov_s, w_s, mdet_s, pre_s.cov_upd, wdet_s,
                       dv_s, w_nd_s, in_s, near_s, out_s, b_mean_s, b_cov_s,
                       wb_s, z_mask & (bw_s > 0), cfg, Ks)
    # dynamic out-of-range features are killed (:3714-3719): out_keep = False
    new_d = _merge_map(mean_d, cov_d, w_d, mdet_d, pre_d.cov_upd, wdet_d,
                       dv_d, w_nd_d, in_d, near_d,
                       jnp.zeros_like(out_d), b_mean_d, b_cov_d,
                       wb_d, z_mask & (bw_d > 0), cfg, Kd)

    overflow = new_s[3] + new_d[3]
    return new_s[:3], new_d[:3], dlog_w, overflow


def mixed_update(state: FilterState, z, z_mask, cfg: SlamConfig,
                 z_label=None):
    """Mixed-model measurement update over all particles."""
    if z_label is None:
        z_label = jnp.zeros(z.shape[:-1], jnp.int32)
    gs, gd = state.map_static, state.map_dynamic
    upd = jax.vmap(
        lambda p, ms, cs, ws, md, cd, wd: _update_mixed_single(
            p, ms, cs, ws, md, cd, wd, z, z_label, z_mask, cfg)
    )(state.pose, gs.mean, gs.cov, gs.weight, gd.mean, gd.cov, gd.weight)
    (sm, sc, sw), (dm, dc, dw), dlog_w, overflow = upd

    log_w = state.log_weight + dlog_w
    log_w = log_w - logsumexp(log_w, axis=0)
    state = state.replace(
        map_static=GMState(mean=sm, cov=sc, weight=sw),
        map_dynamic=GMState(mean=dm, cov=dc, weight=dw),
        log_weight=log_w)
    return state, jnp.max(overflow)
