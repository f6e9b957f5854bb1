"""Pallas TPU kernel for the greedy Gaussian-mixture merge (2D features).

The bounded ``lax.while_loop`` merge (ops/gm_merge.py, the rebuild of
``phdUpdateMergeKernel``, /root/reference/src/phdfilter.cu:2707-2898)
dominates the filter step on TPU: the vmapped HLO while pays per-iteration
dispatch/gather overhead (~26 ms/step at P=200, N=512, K=128 — see BENCH
notes). This kernel runs the same algorithm per particle on-core: the
candidate SoA lives in VMEM, each greedy iteration is a handful of
N-lane VPU ops, and cluster emission is a masked K-lane select.

Layout (SoA planes, f32):
  input  [P, 7, N]: w, act, mean_x, mean_y, cov00, cov01, cov11
  output [P, 8, K]: w, mean_x, mean_y, cov00, cov01, cov11, n_unmerged
                    (plane 6 broadcasts the leftover-candidate count), pad

Kernels cover D = 2 (Mahalanobis + Hellinger metrics), D = 3 (disparity
features) and D = 4 (dynamic CV features), Mahalanobis for D > 2; callers
fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# particle block size (sweep knob; read ONCE at import — a value read
# inside a jitted function is frozen at first trace anyway). Round-5:
# default 32 — bit-equal at any block (test_merge_block_size_equivalent)
# and measured faster end-to-end on EVERY driver row (ackerman P=10240
# +15%, CPHD P=10240 +11%, mixed P=10240 +8%, dense +6%, P=512 rows +2%;
# BENCH.md round-5): fewer Mosaic grid programs at the same total element
# work amortizes the ~550-cycle per-trip control overhead.
_MERGE_BLOCK = int(os.environ.get("PHDSLAM_MERGE_BLOCK", "32"))


def _lane_cumsum(x, n):
    """Inclusive prefix sum along the last (lane) axis via Hillis-Steele
    shifted adds — Mosaic has no cumsum lowering. O(log n) roll+add passes;
    wrapped lanes from the circular roll are masked off."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis=x.ndim - 1)  # out[i] = x[i - d]
        x = x + jnp.where(iota >= d, shifted, 0.0)
        d *= 2
    return x


def _merge_kernel(in_ref, out_ref, *, n_cand, out_cap, min_separation,
                  block, r_par, metric=0, sorted_w=False, par_assign=False):
    """Greedy merge for a BLOCK of particles, R principals per iteration.

    All per-iteration work is [B, N]-shaped so the VPU's 8x128 lanes are
    filled across particles, not just candidates. The per-cluster compute is
    tiny (~200 cycles of VPU work) while the while-loop carries ~550 cycles
    of control overhead per trip, so the kernel extracts ``r_par`` clusters
    per trip — EXACTLY reproducing sequential greedy order:

      * tentative principals = the R highest-weight unmerged candidates;
      * tentative r is VALID iff no valid higher-weight principal lies
        within ``min_separation`` of it (in true greedy such a principal
        would have absorbed it first);
      * each candidate joins the highest-weight valid principal that covers
        it (in true greedy earlier clusters claim candidates first).

    Induction on the true greedy sequence shows the valid principals and
    their clusters match the sequential loop exactly.
    """
    x = in_ref[:]                      # [B, 7, N]
    _merge_core_2d(x[:, 0, :], x[:, 1, :], x[:, 2, :], x[:, 3, :],
                   x[:, 4, :], x[:, 5, :], x[:, 6, :], out_ref,
                   n_cand=n_cand, out_cap=out_cap,
                   min_separation=min_separation, block=block,
                   r_par=r_par, metric=metric, sorted_w=sorted_w,
                   par_assign=par_assign)


def _merge_core_2d(w, act, mx, my, c00, c01, c11, out_ref, *, n_cand,
                   out_cap, min_separation, block, r_par, metric=0,
                   sorted_w=False, par_assign=False):
    """The [B, N]-plane greedy-merge loop shared by the packed-input kernel
    (:func:`_merge_kernel`) and the fused gather+merge kernel
    (:func:`_merge_tables_kernel`).

    ``par_assign``: prefix-claim assignment — the R per-trip cluster
    extractions become INDEPENDENT reduction chains instead of a serial
    ``unassigned`` recurrence (sel_r = unmerged & cover_r & ~(cover_0 |
    ... | cover_{r-1}), identical sets to the sequential claim order since
    a candidate is always claimed by its first covering principal), so
    the ~6 moment reductions per cluster overlap across the R principals.
    Output is bit-equal: same lanes, same summation order per cluster.
    """
    B = block
    R = r_par

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n_cand), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, out_cap), 1)

    def pair_dist(dx, dy, a00, a01, a11, b00, b01, b11):
        """Distance of Gaussians (a, b) separated by (dx, dy)."""
        if metric == 0:
            # Mahalanobis^2 with averaged covariance (computeMahalDist,
            # device_math.cuh:308-363)
            s00 = 0.5 * (a00 + b00)
            s01 = 0.5 * (a01 + b01)
            s11 = 0.5 * (a11 + b11)
            det = jnp.maximum(s00 * s11 - s01 * s01, 1e-30)
            return (dx * dx * s11 - 2.0 * dx * dy * s01
                    + dy * dy * s00) / det
        # Hellinger (device_math.cuh:372-413; mirrors ops.math.hellinger2
        # incl. its tiny-determinant identity fallback)
        s00 = a00 + b00
        s01 = a01 + b01
        s11 = a11 + b11
        det_s = s00 * s11 - s01 * s01
        ok = det_s > 1.1754944e-38
        det_safe = jnp.where(ok, det_s, 1.0)
        quad_inv = (dx * dx * s11 - 2.0 * dx * dy * s01
                    + dy * dy * s00) / det_safe
        quad_eye = dx * dx + dy * dy
        eps = -0.25 * jnp.where(ok, quad_inv, quad_eye)
        det_half = det_s / 4.0
        det_prod = (a00 * a11 - a01 * a01) * (b00 * b11 - b01 * b01)
        ratio = jnp.sqrt(jnp.maximum(det_prod, 0.0)) \
            / jnp.maximum(det_half, 1e-30)
        return 1.0 - jnp.sqrt(jnp.maximum(ratio, 0.0)) * jnp.exp(eps)

    def body(state):
        c, unmerged, ow, omx, omy, o00, o01, o11 = state

        # --- R tentative principals in weight order ------------------------
        ohs, hass = [], []
        pmx, pmy, p00, p01, p11 = [], [], [], [], []
        if sorted_w:
            # active lanes are weight-DESCENDING (top-cap-compacted sets):
            # principal r = the (r+1)-th unmerged lane, so ONE lane cumsum
            # replaces R sequential (argmax + max) reductions per trip.
            # Argmax ties resolve to the lowest index, which in sorted
            # order is exactly the first unmerged lane — identical cluster
            # structure. (A full [B, R, N]-batched restructure of moments/
            # membership was measured 25% SLOWER on real data — the 3D
            # intermediates cost more than the saved reductions.)
            unm = unmerged > 0.5
            rank = _lane_cumsum(unmerged, n_cand)             # [B, N]
            total = jnp.max(rank, axis=-1, keepdims=True)     # [B, 1]
            for r in range(R):
                ohs.append(unm & (rank == float(r + 1)))
                hass.append(total > float(r))
        else:
            w_act = jnp.where(unmerged > 0.5, w, -1.0)
            for _ in range(R):
                imax = jnp.argmax(w_act, axis=-1)[:, None]    # [B, 1]
                hass.append((jnp.max(w_act, axis=-1) > 0.0)[:, None])
                ohs.append(iota_n == imax)                    # [B, N] bool
                w_act = jnp.where(ohs[-1], -1.0, w_act)
        for r in range(R):
            ohf = ohs[r].astype(jnp.float32)
            # principal moments via one-hot reductions (no dynamic gather)
            pmx.append(jnp.sum(ohf * mx, axis=-1, keepdims=True))
            pmy.append(jnp.sum(ohf * my, axis=-1, keepdims=True))
            p00.append(jnp.sum(ohf * c00, axis=-1, keepdims=True))
            p01.append(jnp.sum(ohf * c01, axis=-1, keepdims=True))
            p11.append(jnp.sum(ohf * c11, axis=-1, keepdims=True))

        # --- distance of every candidate to each principal ------------------
        dists = []
        for r in range(R):
            dists.append(pair_dist(pmx[r] - mx, pmy[r] - my,
                                   c00, c01, c11, p00[r], p01[r], p11[r]))

        # --- validity chain -------------------------------------------------
        # valid[r]: not covered by any valid higher principal. Principal
        # pair distances come straight from the extracted [B, 1] moments
        # (same formula, no full-width reductions).
        valid = [hass[0]]
        for r in range(1, R):
            v = hass[r]
            for s in range(r):
                d_sr = pair_dist(pmx[s] - pmx[r], pmy[s] - pmy[r],
                                 p00[r], p01[r], p11[r],
                                 p00[s], p01[s], p11[s])      # [B, 1]
                covered = valid[s] & (d_sr < min_separation)
                v = v & ~covered
            valid.append(v)

        # --- assignment + moment matching + emission ------------------------
        if par_assign:
            # slots/budget: [B, 1] scalar chain (cheap); claims: R-deep
            # elementwise prefix-OR; the expensive moment reductions then
            # run as R INDEPENDENT chains the scheduler can interleave
            n_emit = jnp.zeros((B, 1), jnp.int32)
            slots, can_emits = [], []
            for r in range(R):
                ce = valid[r] & (c + n_emit < out_cap)
                slots.append(c + n_emit)
                can_emits.append(ce)
                n_emit = n_emit + ce.astype(jnp.int32)
            sels = []
            claimed = jnp.zeros_like(unmerged, dtype=jnp.bool_)
            unm_b = unmerged > 0.5
            for r in range(R):
                cov_r = ((dists[r] < min_separation) | ohs[r]) \
                    & can_emits[r]
                sels.append(unm_b & cov_r & ~claimed)
                claimed = claimed | cov_r
            any_sel = jnp.zeros_like(unmerged)
            for r in range(R):
                self_f = sels[r].astype(jnp.float32)
                any_sel = any_sel + self_f
                sw = self_f * w
                W = jnp.sum(sw, axis=-1, keepdims=True)       # [B, 1]
                W_safe = jnp.maximum(W, 1e-30)
                mu_x = jnp.sum(sw * mx, axis=-1, keepdims=True) / W_safe
                mu_y = jnp.sum(sw * my, axis=-1, keepdims=True) / W_safe
                ddx = mu_x - mx
                ddy = mu_y - my
                m00 = jnp.sum(sw * (c00 + ddx * ddx), axis=-1,
                              keepdims=True) / W_safe
                m01 = jnp.sum(sw * (c01 + ddx * ddy), axis=-1,
                              keepdims=True) / W_safe
                m11 = jnp.sum(sw * (c11 + ddy * ddy), axis=-1,
                              keepdims=True) / W_safe
                emit = (iota_k == slots[r]) & can_emits[r]    # [B, K]
                ow = jnp.where(emit, W, ow)
                omx = jnp.where(emit, mu_x, omx)
                omy = jnp.where(emit, mu_y, omy)
                o00 = jnp.where(emit, m00, o00)
                o01 = jnp.where(emit, m01, o01)
                o11 = jnp.where(emit, m11, o11)
            unassigned = unmerged * (1.0 - any_sel)
        else:
            unassigned = unmerged
            n_emit = jnp.zeros((B, 1), jnp.int32)
            for r in range(R):
                slot = c + n_emit                             # [B, 1]
                can_emit = valid[r] & (slot < out_cap)
                sel = (unassigned > 0.5) \
                    & ((dists[r] < min_separation) | ohs[r])
                sel = sel & can_emit
                self_f = sel.astype(jnp.float32)

                sw = self_f * w
                W = jnp.sum(sw, axis=-1, keepdims=True)       # [B, 1]
                W_safe = jnp.maximum(W, 1e-30)
                mu_x = jnp.sum(sw * mx, axis=-1, keepdims=True) / W_safe
                mu_y = jnp.sum(sw * my, axis=-1, keepdims=True) / W_safe
                ddx = mu_x - mx
                ddy = mu_y - my
                m00 = jnp.sum(sw * (c00 + ddx * ddx), axis=-1,
                              keepdims=True) / W_safe
                m01 = jnp.sum(sw * (c01 + ddx * ddy), axis=-1,
                              keepdims=True) / W_safe
                m11 = jnp.sum(sw * (c11 + ddy * ddy), axis=-1,
                              keepdims=True) / W_safe

                emit = (iota_k == slot) & can_emit            # [B, K]
                ow = jnp.where(emit, W, ow)
                omx = jnp.where(emit, mu_x, omx)
                omy = jnp.where(emit, mu_y, omy)
                o00 = jnp.where(emit, m00, o00)
                o01 = jnp.where(emit, m01, o01)
                o11 = jnp.where(emit, m11, o11)

                unassigned = unassigned * (1.0 - self_f)
                n_emit = n_emit + can_emit.astype(jnp.int32)

        # guaranteed progress: a row with budget left that emitted nothing
        # has no usable principal (all remaining weights NaN or <= 0 —
        # jnp.max(w_act) > 0 is False) and would spin the while_loop
        # forever; drop its remaining lanes (the NaN surfaces in the
        # particle weights where the debug mode catches it)
        stalled = (n_emit == 0) & (c < out_cap)               # [B, 1]
        unassigned = jnp.where(stalled, 0.0, unassigned)
        return (c + n_emit, unassigned, ow, omx, omy, o00, o01, o11)

    def cond(state):
        c, unmerged = state[0], state[1]
        # early exit once every block particle's candidates are merged or its
        # per-particle cluster budget is spent — the greedy loop typically
        # emits far fewer than out_cap clusters (the reference's while(true)
        # exits the same way, phdfilter.cu:2739-2747)
        live = unmerged * (c < out_cap).astype(jnp.float32)
        return jnp.max(live) > 0.5

    if sorted_w:
        # the rank-based principal pick has no positive-weight check (the
        # argmax path's max > 0 does); sorted callers guarantee active =>
        # w > 0, but pre-mask degenerate (w <= 0 / NaN) lanes anyway so a
        # garbage lane can never become a principal
        unmerged0 = jnp.where(w > 0, act, 0.0)
    else:
        unmerged0 = act
    zk = jnp.zeros((B, out_cap), jnp.float32)
    state = (jnp.zeros((B, 1), jnp.int32), unmerged0, zk, zk, zk, zk, zk, zk)
    _, unmerged, ow, omx, omy, o00, o01, o11 = jax.lax.while_loop(
        cond, body, state)

    n_left = jnp.sum(unmerged, axis=-1, keepdims=True)        # [B, 1]
    out_ref[:, 0, :] = ow
    out_ref[:, 1, :] = omx
    out_ref[:, 2, :] = omy
    out_ref[:, 3, :] = o00
    out_ref[:, 4, :] = o01
    out_ref[:, 5, :] = o11
    out_ref[:, 6, :] = jnp.broadcast_to(n_left, (B, out_cap))
    out_ref[:, 7, :] = zk


def pallas_available() -> bool:
    """True when the default backend can compile Mosaic TPU kernels."""
    return jax.default_backend() in ("tpu", "axon")


def gm_merge_pallas_one(mean, cov, weight, active, min_separation, out_cap,
                        interpret=False, r_par=8, metric=0):
    """Single-particle variant (mean [N, 2], ...) — vmap-able drop-in for
    ops.gm_merge.gm_merge. Returns (mean[K,2], cov[K,2,2], w[K], n_merged,
    n_dropped)."""
    om, oc, ow, nm, nd = gm_merge_pallas_batch(
        mean[None], cov[None], weight[None], active[None],
        min_separation, out_cap, interpret, r_par, metric)
    return om[0], oc[0], ow[0], nm[0], nd[0]


def gm_merge_pallas_batch(mean, cov, weight, active, min_separation,
                          out_cap, interpret=False, r_par=8, metric=0,
                          sorted_w=False, block=None):
    """Drop-in replacement for gm_merge_batch (D == 2, Mahalanobis).

    mean [P, N, 2], cov [P, N, 2, 2], weight [P, N], active [P, N] ->
    (out_mean [P, K, 2], out_cov [P, K, 2, 2], out_w [P, K],
     n_merged [P], n_dropped [P])
    """
    P, N, D = mean.shape
    assert D == 2
    packed = jnp.stack([
        weight, active.astype(jnp.float32),
        mean[..., 0], mean[..., 1],
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]], axis=1)  # [P, 7, N]
    return gm_merge_pallas_batch_packed(packed, min_separation, out_cap,
                                        interpret, r_par, metric, sorted_w,
                                        block)


@functools.partial(jax.jit, static_argnames=("out_cap", "min_separation",
                                             "interpret", "r_par", "metric",
                                             "sorted_w", "block",
                                             "par_assign"))
def gm_merge_pallas_batch_packed(packed, min_separation, out_cap,
                                 interpret=False, r_par=8, metric=0,
                                 sorted_w=False, block=None,
                                 par_assign=False):
    """2D merge on pre-packed SoA planes [P, 7, N]: w, act, mx, my, c00,
    c01, c11. Callers that already hold per-component planes (the deferred
    candidate gather) avoid ever materializing [P, N, 2]/[P, N, 2, 2]
    arrays, whose 2-wide minor dims pad 64x under (8, 128) tiling.

    ``block`` overrides the 8-row particle block: at NARROW lane widths
    the greedy loop is trip-LATENCY bound (measured: tiled [4P, 128]
    lanes at block 8 cost the same as [P, 384] — blocks x trips is
    invariant), so batch-folded callers (the spatially-tiled dispatch)
    pack 32 rows per program to cut the sequential trip count."""
    P, C, N = packed.shape
    assert C == 7

    # Particle-block vectorization: fill the VPU's sublanes with 8 particles
    # per program instead of one. Pad P up to a block multiple with inert
    # (act = 0) particles.
    B = block or (_MERGE_BLOCK if P >= _MERGE_BLOCK else P)
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((P_pad - P, 7, N), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(_merge_kernel, n_cand=N, out_cap=out_cap,
                          min_separation=float(min_separation), block=B,
                          r_par=max(1, r_par), metric=metric,
                          sorted_w=sorted_w, par_assign=par_assign),
        out_shape=jax.ShapeDtypeStruct((P_pad, 8, out_cap), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 7, N), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 8, out_cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)
    return _merge_out_2d(out, P)


def _merge_out_2d(out, P):
    """[P_pad, 8, K] kernel output planes -> (mean, cov, w, n_merged,
    n_dropped) in array form, empty slots sanitized to (0, I)."""
    out = out[:P]
    out_w = out[:, 0, :]
    out_mean = jnp.stack([out[:, 1, :], out[:, 2, :]], axis=-1)
    o00, o01, o11 = out[:, 3, :], out[:, 4, :], out[:, 5, :]
    out_cov = jnp.stack([
        jnp.stack([o00, o01], axis=-1),
        jnp.stack([o01, o11], axis=-1)], axis=-2)
    # empty slots: identity covariance (matches gm_merge)
    empty = out_w <= 0
    eye = jnp.eye(2, dtype=out_cov.dtype)
    out_cov = jnp.where(empty[..., None, None], eye, out_cov)
    out_mean = jnp.where(empty[..., None], 0.0, out_mean)
    n_merged = jnp.sum((out_w > 0).astype(jnp.int32), axis=-1)
    n_dropped = out[:, 6, 0].astype(jnp.int32)
    return out_mean, out_cov, out_w, n_merged, n_dropped


def _merge_tables_kernel(ints_ref, flts_ref, tk_ref, tm_ref, out_ref,
                         scratch_ref, *, n_cand, out_cap, min_separation,
                         block, r_par, metric=0, sorted_w=False):
    """FUSED candidate gather + combine + greedy merge (D = 2).

    Builds the merge-candidate planes in VMEM straight from the deferred-
    gather tables (ops.ekf.candidate_tables_T + candidate_gather_indices)
    and runs :func:`_merge_core_2d` on them — the packed [P, 7, cap]
    intermediate of the two-kernel route (ops/pallas_select.py one-hot
    gather -> combine_selected_planes -> merge) never exists, in VMEM or
    HBM, and one kernel launch replaces three.

    Inputs per block:
      ints [B, 4, N] int32: k_eff, m_eff, is_p, is_d
      flts [B, 2, N] f32:  cand_w, sel_act
      tk   [B, Ck, K] f32: mean | cov row-major | cov_upd | gain | r | bear
      tm   [B, Cm, M] f32: zr | zb | birth mean | birth cov row-major
    """
    from .pallas_detect import _wrap_angle

    B = block
    ints = ints_ref[:]
    flts = flts_ref[:]
    k_eff = ints[:, 0, :]                          # [B, N]
    m_eff = ints[:, 1, :]
    is_p = ints[:, 2, :] > 0
    is_d = ints[:, 3, :] > 0
    w = flts[:, 0, :]
    sel = flts[:, 1, :] > 0.5

    tk = tk_ref[:]                                 # [B, Ck, K]
    tm = tm_ref[:]                                 # [B, Cm, M]
    Kf, Mf = tk.shape[2], tm.shape[2]

    # one-hot row fetch on the MXU (exact copies: one f32 term per output),
    # chunked along lanes so the one-hot's VMEM footprint stays bounded at
    # dense shapes (see ops/pallas_select.py _OH_CHUNK)
    def fetch(tab, eff_row, n_rows):
        chunk = 512
        cols = []
        for lo in range(0, n_cand, chunk):
            hi = min(lo + chunk, n_cand)
            # slice the REF per chunk: lane-slicing a loaded value at a
            # non-zero offset lowers to an unsupported Mosaic gather
            eff_c = ints_ref[:, eff_row, lo:hi]    # [B, chunk] int32
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (B, n_rows, hi - lo), 1)
            oh = (eff_c[:, None, :] == iota).astype(jnp.float32)
            cols.append(jnp.stack([
                jnp.dot(tab[b], oh[b], preferred_element_type=jnp.float32)
                for b in range(B)]))
        return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)

    r_k = fetch(tk, 0, Kf)                         # [B, Ck, N]
    r_m = fetch(tm, 1, Mf)                         # [B, Cm, N]

    # combine (== ops.ekf.combine_selected_planes for D=2, has_birth=True;
    # row offsets: cov@2, cov_upd@6, gain@10, r@14, bearing@15 / birth
    # mean@2, birth cov@4)
    tkc = lambda c: r_k[:, c, :]
    tmc = lambda c: r_m[:, c, :]
    innov_r = tmc(0) - tkc(14)
    innov_b = _wrap_angle(tmc(1) - tkc(15))
    means = []
    for i in range(2):
        mk = tkc(i)
        md = mk + tkc(10 + 2 * i) * innov_r + tkc(11 + 2 * i) * innov_b
        mp = jnp.where(is_p, mk, jnp.where(is_d, md, tmc(2 + i)))
        means.append(jnp.where(sel, mp, 0.0))
    covs = []
    for a, b2 in ((0, 0), (0, 1), (1, 1)):
        cp = jnp.where(is_p, tkc(2 + a * 2 + b2),
                       jnp.where(is_d, tkc(6 + a * 2 + b2),
                                 tmc(4 + a * 2 + b2)))
        covs.append(jnp.where(sel, cp, 1.0 if a == b2 else 0.0))

    # stage the combined planes through VMEM scratch: the dot-derived
    # values carry a matmul-output layout that _lane_cumsum's pltpu.roll
    # cannot relayout ("Not implemented: Lane broadcast" in Mosaic); a
    # write+read round-trip through the scratch ref makes them canonical
    scratch_ref[:, 0, :] = jnp.where(sel, w, 0.0)
    scratch_ref[:, 1, :] = sel.astype(jnp.float32)
    scratch_ref[:, 2, :] = means[0]
    scratch_ref[:, 3, :] = means[1]
    scratch_ref[:, 4, :] = covs[0]
    scratch_ref[:, 5, :] = covs[1]
    scratch_ref[:, 6, :] = covs[2]
    x = scratch_ref[:]
    _merge_core_2d(x[:, 0, :], x[:, 1, :], x[:, 2, :], x[:, 3, :],
                   x[:, 4, :], x[:, 5, :], x[:, 6, :], out_ref,
                   n_cand=n_cand, out_cap=out_cap,
                   min_separation=min_separation, block=B, r_par=r_par,
                   metric=metric, sorted_w=sorted_w)


@functools.partial(jax.jit, static_argnames=("out_cap", "min_separation",
                                             "interpret", "r_par", "metric",
                                             "sorted_w"))
def gm_merge_pallas_batch_tables(ints, flts, t_k, t_m, min_separation,
                                 out_cap, interpret=False, r_par=8,
                                 metric=0, sorted_w=False):
    """Fused gather+combine+merge entry point (D = 2).

    ints [P, 4, N] int32 (k_eff, m_eff, is_p, is_d), flts [P, 2, N] f32
    (cand_w, sel_act), t_k [P, Ck, K], t_m [P, Cm, M] — the deferred-gather
    payload of filters.phd._update_single_pre. Returns the same
    (mean [P, K', 2], cov, w, n_merged, n_dropped) as
    gm_merge_pallas_batch_packed.
    """
    P, _, N = ints.shape
    Ck, Kf = t_k.shape[1], t_k.shape[2]
    Cm, Mf = t_m.shape[1], t_m.shape[2]
    # shrink the particle block when the prologue's chunked one-hot fetch
    # (~2.5 one-hot-sized f32 values per chunk) + tables + planes would
    # overflow scoped VMEM at dense shapes (mirror of
    # pallas_select._pick_gather_block)
    chunk = min(N, 512)
    budget = 12 * 1024 * 1024
    B = 1
    for cand in (_MERGE_BLOCK, 4, 2):
        live = cand * 4 * (int(2.5 * max(Kf, Mf) * chunk)
                           + Ck * Kf + Cm * Mf + 13 * N + 8 * out_cap)
        if cand <= P and live <= budget:
            B = cand
            break
    if P < B:
        B = P
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((P_pad - P,) + x.shape[1:], x.dtype)], axis=0)
        ints, flts, t_k, t_m = pad(ints), pad(flts), pad(t_k), pad(t_m)
    out = pl.pallas_call(
        functools.partial(_merge_tables_kernel, n_cand=N, out_cap=out_cap,
                          min_separation=float(min_separation), block=B,
                          r_par=max(1, r_par), metric=metric,
                          sorted_w=sorted_w),
        out_shape=jax.ShapeDtypeStruct((P_pad, 8, out_cap), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 4, N), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, 2, N), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, Ck, Kf), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, Cm, Mf), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 8, out_cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, 7, N), jnp.float32)],
        interpret=interpret,
    )(ints, flts, t_k, t_m)
    return _merge_out_2d(out, P)


# -----------------------------------------------------------------------------
# 3D variant (disparity / SC-PHD Gaussian3D features, phdfilter.cu:4977-4983)
# -----------------------------------------------------------------------------

def _merge_kernel_3d(in_ref, out_ref, *, n_cand, out_cap, min_separation,
                     block, r_par, sorted_w=False):
    """3D-feature greedy merge — same algorithm and R-way exact-greedy
    parallelization as :func:`_merge_kernel`, with closed-form symmetric
    3x3 inverses for the Mahalanobis metric (matches ops.math.mahalanobis2
    = computeMahalDist semantics, device_math.cuh:308-363).

    Layout (SoA planes, f32):
      input  [P, 11, N]: w, act, mx, my, mz, c00, c01, c02, c11, c12, c22
      output [P, 12, K]: w, mx, my, mz, c00, c01, c02, c11, c12, c22,
                         n_unmerged (broadcast), pad
    """
    B = block
    R = r_par
    x = in_ref[:]                      # [B, 11, N]
    w = x[:, 0, :]
    act = x[:, 1, :]
    m = [x[:, 2, :], x[:, 3, :], x[:, 4, :]]
    c = [x[:, 5, :], x[:, 6, :], x[:, 7, :],     # c00 c01 c02
         x[:, 8, :], x[:, 9, :], x[:, 10, :]]    # c11 c12 c22

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n_cand), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, out_cap), 1)

    def mahal3(d0, d1, d2, s00, s01, s02, s11, s12, s22):
        det = (s00 * (s11 * s22 - s12 * s12)
               - s01 * (s01 * s22 - s12 * s02)
               + s02 * (s01 * s12 - s11 * s02))
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        i00 = (s11 * s22 - s12 * s12) / det
        i01 = (s02 * s12 - s01 * s22) / det
        i02 = (s01 * s12 - s02 * s11) / det
        i11 = (s00 * s22 - s02 * s02) / det
        i12 = (s01 * s02 - s00 * s12) / det
        i22 = (s00 * s11 - s01 * s01) / det
        return (d0 * d0 * i00 + d1 * d1 * i11 + d2 * d2 * i22
                + 2.0 * (d0 * d1 * i01 + d0 * d2 * i02 + d1 * d2 * i12))

    def body(state):
        cnt, unmerged, ow, om, oc = state

        ohs, hass, pm, pc = [], [], [], []
        if sorted_w:
            # weight-DESCENDING active lanes: principal r = (r+1)-th
            # unmerged lane via ONE cumsum (see the 2D kernel)
            unm = unmerged > 0.5
            rank = _lane_cumsum(unmerged, n_cand)
            total = jnp.max(rank, axis=-1, keepdims=True)
            for r in range(R):
                ohs.append(unm & (rank == float(r + 1)))
                hass.append(total > float(r))
        else:
            w_act = jnp.where(unmerged > 0.5, w, -1.0)
            for _ in range(R):
                imax = jnp.argmax(w_act, axis=-1)[:, None]    # [B, 1]
                hass.append((jnp.max(w_act, axis=-1) > 0.0)[:, None])
                ohs.append(iota_n == imax)
                w_act = jnp.where(ohs[-1], -1.0, w_act)
        for r in range(R):
            ohf = ohs[r].astype(jnp.float32)
            pm.append([jnp.sum(ohf * mi, axis=-1, keepdims=True)
                       for mi in m])
            pc.append([jnp.sum(ohf * ci, axis=-1, keepdims=True)
                       for ci in c])

        dists = []
        for r in range(R):
            s = [0.5 * (ci + pci) for ci, pci in zip(c, pc[r])]
            d = [pmi - mi for pmi, mi in zip(pm[r], m)]
            dists.append(mahal3(d[0], d[1], d[2], *s))

        valid = [hass[0]]
        for r in range(1, R):
            v = hass[r]
            for s_ in range(r):
                q = [0.5 * (pc[s_][i] + pc[r][i]) for i in range(6)]
                qd = [pm[s_][i] - pm[r][i] for i in range(3)]
                d_sr = mahal3(qd[0], qd[1], qd[2], *q)
                v = v & ~(valid[s_] & (d_sr < min_separation))
            valid.append(v)

        unassigned = unmerged
        n_emit = jnp.zeros((B, 1), jnp.int32)
        for r in range(R):
            slot = cnt + n_emit
            can_emit = valid[r] & (slot < out_cap)
            sel = (unassigned > 0.5) & ((dists[r] < min_separation) | ohs[r])
            sel = sel & can_emit
            self_f = sel.astype(jnp.float32)

            sw = self_f * w
            W = jnp.sum(sw, axis=-1, keepdims=True)
            W_safe = jnp.maximum(W, 1e-30)
            mu = [jnp.sum(sw * mi, axis=-1, keepdims=True) / W_safe
                  for mi in m]
            dd = [mui - mi for mui, mi in zip(mu, m)]
            pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
            mc = [jnp.sum(sw * (c[i] + dd[a] * dd[b]), axis=-1,
                          keepdims=True) / W_safe
                  for i, (a, b) in enumerate(pairs)]

            emit = (iota_k == slot) & can_emit
            ow = jnp.where(emit, W, ow)
            om = [jnp.where(emit, mu[i], om[i]) for i in range(3)]
            oc = [jnp.where(emit, mc[i], oc[i]) for i in range(6)]

            unassigned = unassigned * (1.0 - self_f)
            n_emit = n_emit + can_emit.astype(jnp.int32)

        # guaranteed progress (see the 2D kernel): rows with budget left
        # that emitted nothing have no usable principal — drop their lanes
        stalled = (n_emit == 0) & (cnt < out_cap)             # [B, 1]
        unassigned = jnp.where(stalled, 0.0, unassigned)
        return (cnt + n_emit, unassigned, ow, om, oc)

    def cond(state):
        cnt, unmerged = state[0], state[1]
        live = unmerged * (cnt < out_cap).astype(jnp.float32)
        return jnp.max(live) > 0.5

    zk = jnp.zeros((B, out_cap), jnp.float32)
    act0 = jnp.where(w > 0, act, 0.0) if sorted_w else act
    state = (jnp.zeros((B, 1), jnp.int32), act0, zk,
             [zk, zk, zk], [zk, zk, zk, zk, zk, zk])
    _, unmerged, ow, om, oc = jax.lax.while_loop(cond, body, state)

    n_left = jnp.sum(unmerged, axis=-1, keepdims=True)
    out_ref[:, 0, :] = ow
    for i in range(3):
        out_ref[:, 1 + i, :] = om[i]
    for i in range(6):
        out_ref[:, 4 + i, :] = oc[i]
    out_ref[:, 10, :] = jnp.broadcast_to(n_left, (B, out_cap))
    out_ref[:, 11, :] = zk


def gm_merge_pallas_one_3d(mean, cov, weight, active, min_separation,
                           out_cap, interpret=False, r_par=8):
    """Single-particle 3D variant — drop-in for ops.gm_merge.gm_merge."""
    om, oc, ow, nm, nd = gm_merge_pallas_batch_3d(
        mean[None], cov[None], weight[None], active[None],
        min_separation, out_cap, interpret, r_par)
    return om[0], oc[0], ow[0], nm[0], nd[0]


@functools.partial(jax.jit, static_argnames=("out_cap", "min_separation",
                                             "interpret", "r_par",
                                             "sorted_w", "block"))
def gm_merge_pallas_batch_3d(mean, cov, weight, active, min_separation,
                             out_cap, interpret=False, r_par=8,
                             sorted_w=False, block=None):
    """Batch 3D merge: mean [P, N, 3], cov [P, N, 3, 3], weight/active
    [P, N] -> (out_mean [P,K,3], out_cov [P,K,3,3], out_w [P,K],
    n_merged [P], n_dropped [P]). ``block`` as in
    :func:`gm_merge_pallas_batch_packed`."""
    P, N, D = mean.shape
    assert D == 3
    packed = jnp.stack([
        weight, active.astype(jnp.float32),
        mean[..., 0], mean[..., 1], mean[..., 2],
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=1)

    B = block or (_MERGE_BLOCK if P >= _MERGE_BLOCK else P)
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((P_pad - P, 11, N), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(_merge_kernel_3d, n_cand=N, out_cap=out_cap,
                          min_separation=float(min_separation), block=B,
                          r_par=max(1, r_par), sorted_w=sorted_w),
        out_shape=jax.ShapeDtypeStruct((P_pad, 12, out_cap), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 11, N), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 12, out_cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)
    out = out[:P]

    out_w = out[:, 0, :]
    out_mean = jnp.stack([out[:, 1, :], out[:, 2, :], out[:, 3, :]], axis=-1)
    o = {k: out[:, 4 + i, :] for i, k in enumerate(
        ["00", "01", "02", "11", "12", "22"])}
    out_cov = jnp.stack([
        jnp.stack([o["00"], o["01"], o["02"]], axis=-1),
        jnp.stack([o["01"], o["11"], o["12"]], axis=-1),
        jnp.stack([o["02"], o["12"], o["22"]], axis=-1)], axis=-2)
    empty = out_w <= 0
    eye = jnp.eye(3, dtype=out_cov.dtype)
    out_cov = jnp.where(empty[..., None, None], eye, out_cov)
    out_mean = jnp.where(empty[..., None], 0.0, out_mean)
    n_merged = jnp.sum((out_w > 0).astype(jnp.int32), axis=-1)
    n_dropped = out[:, 10, 0].astype(jnp.int32)
    return out_mean, out_cov, out_w, n_merged, n_dropped


# -----------------------------------------------------------------------------
# 4D variant (dynamic CV features of the mixed jump-Markov model,
# phdfilter.cu:2323-2635; reference 4x4 closed-form inverse device_math:87-106)
# -----------------------------------------------------------------------------

_PAIRS4 = ((0, 0), (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3),
           (2, 2), (2, 3), (3, 3))


def _merge_kernel_4d(in_ref, out_ref, *, n_cand, out_cap, min_separation,
                     block, r_par, sorted_w=False, par_assign=False):
    """4D-feature greedy merge — same algorithm and R-way exact-greedy
    parallelization as :func:`_merge_kernel`. The Mahalanobis quadratic
    form uses the symmetric 2x2-block Schur identity
    d'S^-1 d = p'A^-1 p + (B'A^-1 p - q)' (C - B'A^-1 B)^-1 (B'A^-1 p - q)
    (S = [[A, B], [B', C]], d = (p, q)) so only 2x2 closed-form inverses
    appear.

    Layout (SoA planes, f32):
      input  [P, 16, N]: w, act, m0..m3, c00 c01 c02 c03 c11 c12 c13 c22
                         c23 c33
      output [P, 16, K]: w, m0..m3, (10 cov planes), n_unmerged (broadcast)
    """
    B = block
    R = r_par
    x = in_ref[:]                      # [B, 16, N]
    w = x[:, 0, :]
    act = x[:, 1, :]
    m = [x[:, 2 + i, :] for i in range(4)]
    c = [x[:, 6 + i, :] for i in range(10)]
    # c indices: 0:00 1:01 2:02 3:03 4:11 5:12 6:13 7:22 8:23 9:33

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n_cand), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, out_cap), 1)

    def mahal4(d, s):
        # s: 10 planes in _PAIRS4 order; d: 4 planes
        s00, s01, s02, s03, s11, s12, s13, s22, s23, s33 = s
        detA = s00 * s11 - s01 * s01
        detA = jnp.where(jnp.abs(detA) > 1e-30, detA, 1e-30)
        ai00 = s11 / detA
        ai01 = -s01 / detA
        ai11 = s00 / detA
        # G = A^-1 B (B = [[s02, s03], [s12, s13]])
        g00 = ai00 * s02 + ai01 * s12
        g01 = ai00 * s03 + ai01 * s13
        g10 = ai01 * s02 + ai11 * s12
        g11 = ai01 * s03 + ai11 * s13
        # Mblk = C - B' G
        m00 = s22 - (s02 * g00 + s12 * g10)
        m01 = s23 - (s02 * g01 + s12 * g11)
        m11 = s33 - (s03 * g01 + s13 * g11)
        detM = m00 * m11 - m01 * m01
        detM = jnp.where(jnp.abs(detM) > 1e-30, detM, 1e-30)
        mi00 = m11 / detM
        mi01 = -m01 / detM
        mi11 = m00 / detM
        # quadratic form
        v0 = ai00 * d[0] + ai01 * d[1]
        v1 = ai01 * d[0] + ai11 * d[1]
        pap = d[0] * v0 + d[1] * v1
        u0 = s02 * v0 + s12 * v1 - d[2]
        u1 = s03 * v0 + s13 * v1 - d[3]
        return pap + (u0 * u0 * mi00 + 2.0 * u0 * u1 * mi01
                      + u1 * u1 * mi11)

    def body(state):
        cnt, unmerged, ow, om, oc = state

        ohs, hass, pm, pc = [], [], [], []
        if sorted_w:
            # weight-DESCENDING active lanes: principal r = (r+1)-th
            # unmerged lane via ONE cumsum (see the 2D kernel)
            unm = unmerged > 0.5
            rank = _lane_cumsum(unmerged, n_cand)
            total = jnp.max(rank, axis=-1, keepdims=True)
            for r in range(R):
                ohs.append(unm & (rank == float(r + 1)))
                hass.append(total > float(r))
        else:
            w_act = jnp.where(unmerged > 0.5, w, -1.0)
            for _ in range(R):
                imax = jnp.argmax(w_act, axis=-1)[:, None]    # [B, 1]
                hass.append((jnp.max(w_act, axis=-1) > 0.0)[:, None])
                ohs.append(iota_n == imax)
                w_act = jnp.where(ohs[-1], -1.0, w_act)
        for r in range(R):
            ohf = ohs[r].astype(jnp.float32)
            pm.append([jnp.sum(ohf * mi, axis=-1, keepdims=True)
                       for mi in m])
            pc.append([jnp.sum(ohf * ci, axis=-1, keepdims=True)
                       for ci in c])

        dists = []
        for r in range(R):
            s = [0.5 * (ci + pci) for ci, pci in zip(c, pc[r])]
            d = [pmi - mi for pmi, mi in zip(pm[r], m)]
            dists.append(mahal4(d, s))

        valid = [hass[0]]
        for r in range(1, R):
            v = hass[r]
            for s_ in range(r):
                q = [0.5 * (pc[s_][i] + pc[r][i]) for i in range(10)]
                qd = [pm[s_][i] - pm[r][i] for i in range(4)]
                d_sr = mahal4(qd, q)
                v = v & ~(valid[s_] & (d_sr < min_separation))
            valid.append(v)

        if par_assign:
            # prefix-claim assignment: identical cluster sets, independent
            # per-principal moment chains (see _merge_core_2d)
            n_emit = jnp.zeros((B, 1), jnp.int32)
            slots, can_emits = [], []
            for r in range(R):
                ce = valid[r] & (cnt + n_emit < out_cap)
                slots.append(cnt + n_emit)
                can_emits.append(ce)
                n_emit = n_emit + ce.astype(jnp.int32)
            sels = []
            claimed = jnp.zeros_like(unmerged, dtype=jnp.bool_)
            unm_b = unmerged > 0.5
            for r in range(R):
                cov_r = ((dists[r] < min_separation) | ohs[r]) \
                    & can_emits[r]
                sels.append(unm_b & cov_r & ~claimed)
                claimed = claimed | cov_r
            any_sel = jnp.zeros_like(unmerged)
            for r in range(R):
                self_f = sels[r].astype(jnp.float32)
                any_sel = any_sel + self_f
                sw = self_f * w
                W = jnp.sum(sw, axis=-1, keepdims=True)
                W_safe = jnp.maximum(W, 1e-30)
                mu = [jnp.sum(sw * mi, axis=-1, keepdims=True) / W_safe
                      for mi in m]
                dd = [mui - mi for mui, mi in zip(mu, m)]
                mc = [jnp.sum(sw * (c[i] + dd[a] * dd[b]), axis=-1,
                              keepdims=True) / W_safe
                      for i, (a, b) in enumerate(_PAIRS4)]
                emit = (iota_k == slots[r]) & can_emits[r]
                ow = jnp.where(emit, W, ow)
                om = [jnp.where(emit, mu[i], om[i]) for i in range(4)]
                oc = [jnp.where(emit, mc[i], oc[i]) for i in range(10)]
            unassigned = unmerged * (1.0 - any_sel)
        else:
            unassigned = unmerged
            n_emit = jnp.zeros((B, 1), jnp.int32)
            for r in range(R):
                slot = cnt + n_emit
                can_emit = valid[r] & (slot < out_cap)
                sel = (unassigned > 0.5) \
                    & ((dists[r] < min_separation) | ohs[r])
                sel = sel & can_emit
                self_f = sel.astype(jnp.float32)

                sw = self_f * w
                W = jnp.sum(sw, axis=-1, keepdims=True)
                W_safe = jnp.maximum(W, 1e-30)
                mu = [jnp.sum(sw * mi, axis=-1, keepdims=True) / W_safe
                      for mi in m]
                dd = [mui - mi for mui, mi in zip(mu, m)]
                mc = [jnp.sum(sw * (c[i] + dd[a] * dd[b]), axis=-1,
                              keepdims=True) / W_safe
                      for i, (a, b) in enumerate(_PAIRS4)]

                emit = (iota_k == slot) & can_emit
                ow = jnp.where(emit, W, ow)
                om = [jnp.where(emit, mu[i], om[i]) for i in range(4)]
                oc = [jnp.where(emit, mc[i], oc[i]) for i in range(10)]

                unassigned = unassigned * (1.0 - self_f)
                n_emit = n_emit + can_emit.astype(jnp.int32)

        # guaranteed progress (see the 2D kernel)
        stalled = (n_emit == 0) & (cnt < out_cap)             # [B, 1]
        unassigned = jnp.where(stalled, 0.0, unassigned)
        return (cnt + n_emit, unassigned, ow, om, oc)

    def cond(state):
        cnt, unmerged = state[0], state[1]
        live = unmerged * (cnt < out_cap).astype(jnp.float32)
        return jnp.max(live) > 0.5

    zk = jnp.zeros((B, out_cap), jnp.float32)
    act0 = jnp.where(w > 0, act, 0.0) if sorted_w else act
    state = (jnp.zeros((B, 1), jnp.int32), act0, zk,
             [zk] * 4, [zk] * 10)
    _, unmerged, ow, om, oc = jax.lax.while_loop(cond, body, state)

    n_left = jnp.sum(unmerged, axis=-1, keepdims=True)
    out_ref[:, 0, :] = ow
    for i in range(4):
        out_ref[:, 1 + i, :] = om[i]
    for i in range(10):
        out_ref[:, 5 + i, :] = oc[i]
    out_ref[:, 15, :] = jnp.broadcast_to(n_left, (B, out_cap))


def gm_merge_pallas_one_4d(mean, cov, weight, active, min_separation,
                           out_cap, interpret=False, r_par=8):
    """Single-particle 4D variant — drop-in for ops.gm_merge.gm_merge."""
    om, oc, ow, nm, nd = gm_merge_pallas_batch_4d(
        mean[None], cov[None], weight[None], active[None],
        min_separation, out_cap, interpret, r_par)
    return om[0], oc[0], ow[0], nm[0], nd[0]


def gm_merge_pallas_batch_4d(mean, cov, weight, active, min_separation,
                             out_cap, interpret=False, r_par=8,
                             sorted_w=False, block=None):
    """Batch 4D merge: mean [P, N, 4], cov [P, N, 4, 4] -> (out_mean
    [P,K,4], out_cov [P,K,4,4], out_w [P,K], n_merged [P], n_dropped [P])."""
    P, N, D = mean.shape
    assert D == 4
    planes = [weight, active.astype(jnp.float32)] \
        + [mean[..., i] for i in range(4)] \
        + [cov[..., a, b] for a, b in _PAIRS4]
    packed = jnp.stack(planes, axis=1)                  # [P, 16, N]
    return gm_merge_pallas_batch_packed_4d(packed, min_separation, out_cap,
                                           interpret, r_par, sorted_w,
                                           block)


@functools.partial(jax.jit, static_argnames=("out_cap", "min_separation",
                                             "interpret", "r_par",
                                             "sorted_w", "block",
                                             "par_assign"))
def gm_merge_pallas_batch_packed_4d(packed, min_separation, out_cap,
                                    interpret=False, r_par=8,
                                    sorted_w=False, block=None,
                                    par_assign=False):
    """4D merge on pre-packed SoA planes [P, 16, N]: w, act, m0..m3, then
    the 10 upper-triangle covariance planes in _PAIRS4 order. ``block``
    as in :func:`gm_merge_pallas_batch_packed` (trip-latency
    amortization at narrow widths)."""
    P, C, N = packed.shape
    assert C == 16

    B = block or (_MERGE_BLOCK if P >= _MERGE_BLOCK else P)
    P_pad = ((P + B - 1) // B) * B
    if P_pad != P:
        packed = jnp.concatenate(
            [packed, jnp.zeros((P_pad - P, 16, N), jnp.float32)], axis=0)

    out = pl.pallas_call(
        functools.partial(_merge_kernel_4d, n_cand=N, out_cap=out_cap,
                          min_separation=float(min_separation), block=B,
                          r_par=max(1, r_par), sorted_w=sorted_w,
                          par_assign=par_assign),
        out_shape=jax.ShapeDtypeStruct((P_pad, 16, out_cap), jnp.float32),
        grid=(P_pad // B,),
        in_specs=[pl.BlockSpec((B, 16, N), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 16, out_cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)
    out = out[:P]

    out_w = out[:, 0, :]
    out_mean = jnp.stack([out[:, 1 + i, :] for i in range(4)], axis=-1)
    full = [[None] * 4 for _ in range(4)]
    for i, (a, b) in enumerate(_PAIRS4):
        full[a][b] = out[:, 5 + i, :]
        full[b][a] = out[:, 5 + i, :]
    out_cov = jnp.stack(
        [jnp.stack(row, axis=-1) for row in full], axis=-2)
    empty = out_w <= 0
    eye = jnp.eye(4, dtype=out_cov.dtype)
    out_cov = jnp.where(empty[..., None, None], eye, out_cov)
    out_mean = jnp.where(empty[..., None], 0.0, out_mean)
    n_merged = jnp.sum((out_w > 0).astype(jnp.int32), axis=-1)
    n_dropped = out[:, 15, 0].astype(jnp.int32)
    return out_mean, out_cov, out_w, n_merged, n_dropped
