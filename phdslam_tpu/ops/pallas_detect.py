"""Fused Pallas TPU kernel: detection-likelihood grid + per-measurement
top-T selection + normalizers.

This fuses the three stage-1 ops of the fast update path —
``ops.ekf.ekf_detection_linear`` (the [M, K] grid), the per-measurement
normalizer sum, and ``ops.gm_merge.select_live_topT`` — into one kernel
whose [K, M] grid lives only in VMEM. Under XLA the same pipeline is
HBM-bound: the [P, M, K] grid materializes (335 MB at P=10240) and every
selection strategy then needs multiple passes over it (payload sort 31 ms,
one-hot rank einsum 27 ms, iterative argmax sweeps 30 ms — all measured);
the fused kernel's HBM traffic is 6 input planes + [2T+2, M] outputs per
particle.

Semantics preserved exactly (f32 reassociation aside):
  pdw[m, k]  = pref[k] * exp(-0.5 * d' S^-1 d)   (phdfilter.cu:2190-2223
               linear-domain normalizer arithmetic; pref pre-folds
               pd * w / (2 pi sqrt(det S)) and the in-range mask)
  norm[m]    = sum_k pdw + clutter_density + birth_weight
  live       = pdw >= min_feature_weight * norm  (and measurement valid)
  vals/idx   = the T heaviest live lanes per measurement, ties by lowest
               feature index (== select_live_topT's stable sort order)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# measurement-width switch fractions (module-level for A/B)
M_FRACS = (4, 2)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8


def _wrap_angle(a):
    """wrap to [-pi, pi] matching ops.math.wrap_angle (C fmod semantics)."""
    two_pi = 2.0 * jnp.pi
    r = a - two_pi * jnp.floor(a / two_pi)     # mod, sign of divisor
    r = jnp.where((a < 0) & (r > 0), r - two_pi, r)
    r = jnp.where(r > jnp.pi, r - two_pi, r)
    r = jnp.where(r < -jnp.pi, r + two_pi, r)
    return r


def _detect_kernel(planes_ref, z_ref, out_ref, cons_ref=None, *, n_feat,
                   n_meas, top_t, min_fw, cb, block, min_sep=0.0,
                   adaptive=False):
    """planes [B, 6, K]: r, bearing, si00, si01, si11, pref (pd * w /
    (2 pi sqrt det S), zeroed for out-of-range features).
    z [M, 4]: zr, zb, valid, pad (broadcast across particles).
    out [B, M, 2T + 2]: vals (T) | idx-as-f32 (T) | norm | live count.

    The grid lives as [M, K] (measurements in sublanes, features in lanes)
    so every reduction runs along the LANE axis with keepdims — Mosaic
    does not lower sublane-axis multi_reductions to 1-D outputs.

    With ``cons_ref`` (same-source pre-consolidation, the parallel first
    greedy step — see filters/phd.py): planes carries 7 extra rows (wp =
    the gated persistent candidate weight, q00/q01/q11 = the copy-copy
    Mahalanobis quadratic G' cov_upd^-1 G, p00/p01/p11 = the copy-
    persistent quadratic G' ((cov + cov_upd)/2)^-1 G), and the kernel
    additionally collapses, per feature COLUMN of the [M, K] grid, the
    detection copies within ``min_sep`` of the column's greedy head onto
    one cluster: member copies are EXCLUDED from the top-T selection and
    their innovation moments (about the head) are emitted in
    cons [B, 10, K]: Sw | Sdu_r | Sdu_b | Sduu_rr | Sduu_rb | Sduu_bb |
    c_r | c_b | n_members | pers_in. The caller moment-matches these into
    the persistent lane. Consolidation is skipped for a column whose
    persistent copy is live but NOT within ``min_sep`` of the head
    (keeping it exact would need two output lanes per feature), so the
    deviation from sequential greedy is only the cross-feature
    association order.
    """
    K, M, T = n_feat, n_meas, top_t
    B = block
    z = z_ref[:]                                   # [M, 4]
    zr = z[:, 0:1][None]                           # [1, M, 1]
    zb = z[:, 1:2][None]
    zvalid = z[:, 2:3][None] > 0.5
    # tpu.iota only produces integers; cast to f32 for the index min-reduce
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, M, K), 2).astype(
        jnp.float32)
    k_end = float(K)

    # whole block at once — a per-particle loop of [M, K] ops is
    # issue-bound (measured 22 ms at P=10240 vs ~6 ms vectorized)
    planes = planes_ref[:]                         # [B, 6 or 13, K]
    r = planes[:, 0, :][:, None, :]                # [B, 1, K]
    bearing = planes[:, 1, :][:, None, :]
    si00 = planes[:, 2, :][:, None, :]
    si01 = planes[:, 3, :][:, None, :]
    si11 = planes[:, 4, :][:, None, :]
    pref = planes[:, 5, :][:, None, :]

    ir = zr - r                                    # [B, M, K]
    ib = _wrap_angle(zb - bearing)
    dist = si00 * ir * ir + 2.0 * si01 * ir * ib + si11 * ib * ib
    pdw = pref * jnp.exp(-0.5 * dist)
    pdw = jnp.where(zvalid, pdw, 0.0)

    norm = jnp.sum(pdw, axis=-1, keepdims=True) + cb           # [B, M, 1]
    # the pdw > 0 conjunct is a no-op for the PHD path (min_fw * norm > 0)
    # but gives the CPHD min_fw=0 mode a meaningful live count (pdw > 0
    # lanes; thresholding happens post-hoc once the Psi scale is known)
    live = (pdw >= (min_fw * norm)) & (pdw > 0)

    if cons_ref is not None:
        wp = planes[:, 6, :][:, None, :]
        q00 = planes[:, 7, :][:, None, :]
        q01 = planes[:, 8, :][:, None, :]
        q11 = planes[:, 9, :][:, None, :]
        p00 = planes[:, 10, :][:, None, :]
        p01 = planes[:, 11, :][:, None, :]
        p11 = planes[:, 12, :][:, None, :]

        w_det = pdw / norm                          # normalized weights
        wdl = jnp.where(live, w_det, 0.0)
        colmax = jnp.max(wdl, axis=1, keepdims=True)           # [B, 1, K]
        has_copy = colmax > 0.0
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (B, M, K), 1).astype(
            jnp.float32)
        am = jnp.min(jnp.where((wdl == colmax) & live, iota_m, float(M)),
                     axis=1, keepdims=True)
        is_head = live & (iota_m == am)
        uh_r = jnp.sum(jnp.where(is_head, ir, 0.0), axis=1, keepdims=True)
        uh_b = jnp.sum(jnp.where(is_head, ib, 0.0), axis=1, keepdims=True)
        # greedy head of the column = heaviest of {persistent, copies};
        # ties go to the persistent lane (lower flat lane id)
        head_p = (wp >= colmax) & (wp > 0.0)
        c_r = jnp.where(head_p, 0.0, uh_r)          # head innovation coords
        c_b = jnp.where(head_p, 0.0, uh_b)
        du_r = ir - c_r
        du_b = ib - c_b
        quad_q = q00 * du_r * du_r + 2.0 * q01 * du_r * du_b \
            + q11 * du_b * du_b
        quad_p = p00 * du_r * du_r + 2.0 * p01 * du_r * du_b \
            + p11 * du_b * du_b
        # copy-vs-head distance: both covariances are cov_upd when the
        # head is a copy (Q form); persistent head mixes cov and cov_upd
        # (P form)
        quad = jnp.where(head_p, quad_p, quad_q)
        pers_near = p00 * uh_r * uh_r + 2.0 * p01 * uh_r * uh_b \
            + p11 * uh_b * uh_b                     # [B, 1, K]
        # boolean algebra, not jnp.where-on-bools: Mosaic rejects select_n
        # with i1 payloads ("Unsupported target bitwidth for truncation")
        pers_in = (wp > 0.0) & (head_p | (pers_near < min_sep)) & has_copy
        flag = has_copy & ((wp <= 0.0) | pers_in)
        member = live & (quad < min_sep) & flag
        wm = jnp.where(member, w_det, 0.0)
        ssum = lambda x: jnp.sum(x, axis=1, keepdims=True)
        cons_ref[:] = jnp.concatenate([
            ssum(wm), ssum(wm * du_r), ssum(wm * du_b),
            ssum(wm * du_r * du_r), ssum(wm * du_r * du_b),
            ssum(wm * du_b * du_b), c_r, c_b,
            ssum(member.astype(jnp.float32)),
            pers_in.astype(jnp.float32)], axis=1)   # [B, 10, K]
        live = live & ~member

    count = jnp.sum(live.astype(jnp.float32), axis=-1, keepdims=True)
    work = jnp.where(live, pdw, -1.0)

    if adaptive:
        # Adaptive trip count: the top-T extraction dominates the kernel
        # (T trips x ~4 [B, M, K] passes; the grid eval is ~15 passes
        # total) while live lanes per measurement are typically a small
        # fraction of T at reference thresholds. A while_loop exits once
        # every lane of the block is extracted — EXACTLY the static
        # unroll's output: a trip over exhausted work emits
        # (val 0, idx 0) there (max = -1 -> am = first lane = 0,
        # val = max(-1, 0)), which is the skipped-trip initialization
        # here, and a partially-dead row inside a still-live block emits
        # the same (0, 0) per trip on both paths.
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (B, M, T), 2)

        def trip(state):
            t, wk, vals, idx = state
            mx = jnp.max(wk, axis=-1, keepdims=True)           # [B, M, 1]
            am = jnp.min(jnp.where(wk == mx, iota_k, k_end),
                         axis=-1, keepdims=True)
            hit = iota_t == t
            vals = jnp.where(hit, jnp.maximum(mx, 0.0), vals)
            idx = jnp.where(hit, am, idx)
            wk = jnp.where(iota_k == am, -1.0, wk)
            return t + 1, wk, vals, idx

        def more(state):
            return (state[0] < T) & (jnp.max(state[1]) > 0.0)

        _, _, vals, idx = jax.lax.while_loop(
            more, trip,
            (jnp.int32(0), work, jnp.zeros((B, M, T), jnp.float32),
             jnp.zeros((B, M, T), jnp.float32)))
        out_ref[:] = jnp.concatenate([vals, idx, norm, count], axis=-1)
        return

    vals_cols, idx_cols = [], []
    for t in range(T):
        mx = jnp.max(work, axis=-1, keepdims=True)             # [B, M, 1]
        # lowest index among ties == select_live_topT's stable order
        am = jnp.min(jnp.where(work == mx, iota_k, k_end),
                     axis=-1, keepdims=True)                   # [B, M, 1]
        vals_cols.append(jnp.maximum(mx, 0.0))
        idx_cols.append(am)
        work = jnp.where(iota_k == am, -1.0, work)

    out_ref[:] = jnp.concatenate(
        vals_cols + idx_cols + [norm, count], axis=-1)         # [B, M, 2T+2]


def _pick_block(P, M, K, T, planes_per=9):
    """Largest particle block whose live VMEM fits the ~16 MB scoped limit.

    The base kernel holds ~9 [B, M, K] f32-equivalent values at once (pdw,
    work, iota, live/tie masks and their temporaries — 21.18 MB measured
    at B=8, M=72, K=1024 ≈ 9 planes); the consolidating variant ~16. At
    the reference shapes (K=128) this still picks B=8; dense worlds
    (K=1024, cfg/dense.cfg) drop to B=4/2.
    """
    budget = 13 * 1024 * 1024
    # measured NON-monotone VMEM at narrow K (v5e, M=72, T=32): K=256/B=8
    # needs 16.6M stack (over the 16M scoped limit) while K=512/B=8 and
    # K=1024/B=4 fit — Mosaic's scheduling keeps more live copies per
    # block at 2-lane-tile widths. Halve the block in the 193..511 band
    # (128-wide kernels have run at B=8 since round 1).
    cap_b = 4 if 192 < K < 512 and M * T >= 1024 else _BLOCK
    for B in (min(_BLOCK, cap_b), 4, 2):
        if B <= P and planes_per * B * M * K * 4 + B * 13 * K * 4 <= budget:
            return B
    return 1


def _detect_call(planes, z4, top_t, min_fw, cb, interpret, min_sep=0.0,
                 adaptive=False):
    """One pallas_call at a fixed measurement width M = z4.shape[0].
    Consolidating variant (13 plane rows) when min_sep > 0."""
    P, C, K = planes.shape
    M = z4.shape[0]
    T = top_t
    cons = min_sep > 0.0
    assert C == (13 if cons else 6)
    ppl = 16 if cons else 9
    B = _pick_block(P, M, K, T, ppl) if P >= _BLOCK else P
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        planes = jnp.concatenate(
            [planes, jnp.zeros((P_pad - P, C, K), planes.dtype)], axis=0)

    out_shapes = [jax.ShapeDtypeStruct((P_pad, M, 2 * T + 2), jnp.float32)]
    out_specs = [pl.BlockSpec((B, M, 2 * T + 2), lambda p: (p, 0, 0),
                              memory_space=pltpu.VMEM)]
    if cons:
        out_shapes.append(jax.ShapeDtypeStruct((P_pad, 10, K), jnp.float32))
        out_specs.append(pl.BlockSpec((B, 10, K), lambda p: (p, 0, 0),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_detect_kernel, n_feat=K, n_meas=M, top_t=T,
                          min_fw=float(min_fw), cb=float(cb), block=B,
                          min_sep=float(min_sep), adaptive=adaptive),
        out_shape=tuple(out_shapes) if cons else out_shapes[0],
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, C, K), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((M, 4), lambda p: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs) if cons else out_specs[0],
        interpret=interpret,
    )(planes, z4)
    if cons:
        return res[0][:P], res[1][:P]
    return res[:P]


@functools.partial(jax.jit, static_argnames=("top_t", "min_fw", "cb",
                                             "interpret", "min_sep",
                                             "adaptive"))
def detection_topT_batch(planes, z4, top_t, min_fw, cb, interpret=False,
                         min_sep=0.0, adaptive=False):
    """Batched fused detection + top-T selection.

    planes [P, 6, K] f32, z4 [M, 4] f32 (zr, zb, valid, pad) ->
    (vals [P, M, T], idx [P, M, T] int32, norm [P, M], count [P, M] int32).

    With ``min_sep > 0`` (same-source pre-consolidation): planes is
    [P, 13, K] (see :func:`_detect_kernel`) and a fifth output
    cons [P, 10, K] carries the per-feature member moment sums; member
    lanes are excluded from vals/idx/count (their mass re-enters through
    the consolidated persistent lane).

    Valid measurements occupy a PREFIX of the M rows (the loader pads at
    the end), so the wrapper lax.switches between M/4-, M/2- and M-row
    kernel builds on the valid count — exact: rows past the valid prefix
    come back as the kernel's own invalid-row outputs (vals/idx/count 0,
    norm = clutter + birth), which is what the padding restores; invalid
    rows contribute nothing to the consolidation sums.
    """
    M = z4.shape[0]
    T = top_t
    cons = min_sep > 0.0
    widths = []
    for frac in M_FRACS:
        w = -(-M // frac // 8) * 8                  # ceil to sublane tile
        if 0 < w < M and w not in widths:
            widths.append(w)
    widths.append(M)

    if len(widths) > 1:
        n_valid = jnp.sum((z4[:, 2] > 0.5).astype(jnp.int32))
        sel = sum((n_valid > w).astype(jnp.int32) for w in widths[:-1])

        def make_branch(w):
            def branch(pl_, z_):
                o = _detect_call(pl_, z_[:w], top_t, min_fw, cb, interpret,
                                 min_sep, adaptive=adaptive)
                o, cns = o if cons else (o, None)
                if w != M:
                    P = o.shape[0]
                    pad = jnp.zeros((P, M - w, 2 * T + 2), o.dtype)
                    pad = pad.at[:, :, 2 * T].set(cb)  # norm of empty row
                    o = jnp.concatenate([o, pad], axis=1)
                return (o, cns) if cons else o
            return branch

        out = jax.lax.switch(sel, [make_branch(w) for w in widths],
                             planes, z4)
    else:
        out = _detect_call(planes, z4, top_t, min_fw, cb, interpret,
                           min_sep, adaptive=adaptive)
    out, cns = out if cons else (out, None)

    vals = out[..., :T]                                        # [P, M, T]
    idx = out[..., T:2 * T].astype(jnp.int32)
    norm = out[..., 2 * T]                                     # [P, M]
    count = out[..., 2 * T + 1].astype(jnp.int32)
    if cons:
        return vals, idx, norm, count, cns
    return vals, idx, norm, count
