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


def _detect_kernel(planes_ref, z_ref, out_ref, *, n_feat, n_meas, top_t,
                   min_fw, cb, block):
    """planes [B, 6, K]: r, bearing, si00, si01, si11, pref (pd * w /
    (2 pi sqrt det S), zeroed for out-of-range features).
    z [M, 4]: zr, zb, valid, pad (broadcast across particles).
    out [B, M, 2T + 2]: vals (T) | idx-as-f32 (T) | norm | live count.

    The grid lives as [M, K] (measurements in sublanes, features in lanes)
    so every reduction runs along the LANE axis with keepdims — Mosaic
    does not lower sublane-axis multi_reductions to 1-D outputs.
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
    planes = planes_ref[:]                         # [B, 6, K]
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
    count = jnp.sum(live.astype(jnp.float32), axis=-1, keepdims=True)
    work = jnp.where(live, pdw, -1.0)

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


def _pick_block(P, M, K, T):
    """Largest particle block whose live VMEM fits the ~16 MB scoped limit.

    The kernel holds ~9 [B, M, K] f32-equivalent values at once (pdw, work,
    iota, live/tie masks and their temporaries — 21.18 MB measured at
    B=8, M=72, K=1024 ≈ 9 planes). At the reference shapes (K=128) this
    still picks B=8; dense worlds (K=1024, cfg/dense.cfg) drop to B=4/2.
    """
    budget = 13 * 1024 * 1024
    for B in (_BLOCK, 4, 2):
        if B <= P and 9 * B * M * K * 4 + B * 6 * K * 4 <= budget:
            return B
    return 1


def _detect_call(planes, z4, top_t, min_fw, cb, interpret):
    """One pallas_call at a fixed measurement width M = z4.shape[0]."""
    P, _, K = planes.shape
    M = z4.shape[0]
    T = top_t
    B = _pick_block(P, M, K, T) if P >= _BLOCK else P
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        planes = jnp.concatenate(
            [planes, jnp.zeros((P_pad - P, 6, K), planes.dtype)], axis=0)

    out = pl.pallas_call(
        functools.partial(_detect_kernel, n_feat=K, n_meas=M, top_t=T,
                          min_fw=float(min_fw), cb=float(cb), block=B),
        out_shape=jax.ShapeDtypeStruct((P_pad, M, 2 * T + 2), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 6, K), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((M, 4), lambda p: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, M, 2 * T + 2), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, z4)
    return out[:P]


@functools.partial(jax.jit, static_argnames=("top_t", "min_fw", "cb",
                                             "interpret"))
def detection_topT_batch(planes, z4, top_t, min_fw, cb, interpret=False):
    """Batched fused detection + top-T selection.

    planes [P, 6, K] f32, z4 [M, 4] f32 (zr, zb, valid, pad) ->
    (vals [P, M, T], idx [P, M, T] int32, norm [P, M], count [P, M] int32).

    Valid measurements occupy a PREFIX of the M rows (the loader pads at
    the end), so the wrapper lax.switches between M/4-, M/2- and M-row
    kernel builds on the valid count — exact: rows past the valid prefix
    come back as the kernel's own invalid-row outputs (vals/idx/count 0,
    norm = clutter + birth), which is what the padding restores.
    """
    M = z4.shape[0]
    T = top_t
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
                o = _detect_call(pl_, z_[:w], top_t, min_fw, cb, interpret)
                if w == M:
                    return o
                P = o.shape[0]
                pad = jnp.zeros((P, M - w, 2 * T + 2), o.dtype)
                pad = pad.at[:, :, 2 * T].set(cb)   # norm of an empty row
                return jnp.concatenate([o, pad], axis=1)
            return branch

        out = jax.lax.switch(sel, [make_branch(w) for w in widths],
                             planes, z4)
    else:
        out = _detect_call(planes, z4, top_t, min_fw, cb, interpret)

    vals = out[..., :T]                                        # [P, M, T]
    idx = out[..., T:2 * T].astype(jnp.int32)
    norm = out[..., 2 * T]                                     # [P, M]
    count = out[..., 2 * T + 1].astype(jnp.int32)
    return vals, idx, norm, count
