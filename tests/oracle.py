"""NumPy oracle implementations of the reference algorithms.

Direct functional ports of the reference semantics (phdfilter.cu,
gm_reduce.cpp) used as golden references for the JAX implementations.
Ragged / python-loop style on purpose — slow but obviously-correct.
"""

import numpy as np


def wrap(a):
    r = np.fmod(a, 2 * np.pi)
    if r > np.pi:
        r -= 2 * np.pi
    elif r < -np.pi:
        r += 2 * np.pi
    return r


def ekf_preupdate_2d(pose, mean, cov, cfg):
    """computePreUpdate 2D (phdfilter.cu:301-395) measurement-independent part."""
    dx = mean[0] - pose[0]
    dy = mean[1] - pose[1]
    r2 = dx * dx + dy * dy
    r = np.sqrt(r2)
    bearing = wrap(np.arctan2(dy, dx) - pose[2])
    pd = cfg.pd if (r <= cfg.max_range and abs(bearing) <= cfg.max_bearing) else 0.0

    J = np.array([[dx / r, dy / r], [-dy / r2, dx / r2]])
    R = np.diag([cfg.std_range ** 2, cfg.std_bearing ** 2])
    S = J @ cov @ J.T + R
    S = 0.5 * (S + S.T)
    det_S = np.linalg.det(S)
    S_inv = np.linalg.inv(S)
    K = cov @ J.T @ S_inv
    IKH = np.eye(2) - K @ J
    cov_upd = IKH @ cov @ IKH.T + K @ R @ K.T
    return r, bearing, pd, S_inv, det_S, K, cov_upd


def phd_update_particle(pose, gm, Z, cfg):
    """Single-particle static-model PHD update + merge.

    gm: list of (w, mean[2], cov[2,2]); Z: [M,2] array.
    Returns (new_gm list, dlog_w).
    Mirrors phdUpdateSynth (phdfilter.cu:3336-3761) with
    prepareUpdateInputs/computeInRange/preUpdate/phdUpdateKernel/prune/merge.
    """
    M = len(Z)
    # in-range classification (phdfilter.cu:1324-1346)
    cls = []
    for (w, m, c) in gm:
        dx, dy = m[0] - pose[0], m[1] - pose[1]
        r = np.hypot(dx, dy)
        b = wrap(np.arctan2(dy, dx) - pose[2])
        if cfg.min_range <= r <= cfg.max_range and abs(b) <= cfg.max_bearing:
            cls.append(1)
        elif (r >= 0.8 * cfg.min_range and r <= 1.2 * cfg.max_range
              and abs(b) <= 1.2 * cfg.max_bearing):
            cls.append(2)
        else:
            cls.append(0)

    gm_in = [g for g, c in zip(gm, cls) if c == 1]
    gm_near = [g for g, c in zip(gm, cls) if c == 2]
    gm_out = [g for g, c in zip(gm, cls) if c == 0]

    # pre-update
    pres = [ekf_preupdate_2d(pose, m, c, cfg) for (w, m, c) in gm_in]

    update_terms = []  # (weight_linear, mean, cov) — all update-array entries
    # non-detect terms
    for (w, m, c), pre in zip(gm_in, pres):
        update_terms.append([w * (1 - pre[2]), m.copy(), c.copy()])

    log_norms = []
    det_terms_all = []
    for mi in range(M):
        z = Z[mi]
        logws = []
        terms = []
        for (w, m, c), pre in zip(gm_in, pres):
            r, bearing, pd, S_inv, det_S, K, cov_upd = pre
            innov = np.array([z[0] - r, wrap(z[1] - bearing)])
            mean_u = m + K @ innov
            dist = innov @ S_inv @ innov
            logw = (np.log(pd) if pd > 0 else -1e30) + \
                (np.log(w) if w > 0 else -1e30) - 0.5 * dist \
                - np.log(2 * np.pi) - 0.5 * np.log(det_S)
            logws.append(logw)
            terms.append([logw, mean_u, cov_upd.copy()])
        norm = np.sum(np.exp(logws)) + cfg.clutter_density + cfg.birth_weight
        log_norm = np.log(norm)
        log_norms.append(log_norm)
        for t in terms:
            t[0] = np.exp(t[0] - log_norm)
        det_terms_all.extend(terms)
        # birth term (computeBirth :205-242)
        theta = pose[2] + z[1]
        dx, dy = z[0] * np.cos(theta), z[0] * np.sin(theta)
        bmean = np.array([pose[0] + dx, pose[1] + dy])
        J = np.array([[dx / z[0], -dy], [dy / z[0], dx]])
        R = np.diag([(cfg.std_range * cfg.birth_noise_factor) ** 2,
                     (cfg.std_bearing * cfg.birth_noise_factor) ** 2])
        bcov = J @ R @ J.T
        bw = np.exp(np.log(cfg.birth_weight) - log_norm)
        det_terms_all.append([bw, bmean, bcov])

    update_terms.extend(det_terms_all)

    # particle weight (phdfilter.cu:2256-2280)
    if cfg.particle_weighting == 0:
        card_pred = sum(pre[2] * w for (w, m, c), pre in zip(gm_in, pres)) \
            + M * cfg.birth_weight
        dlog_w = float(np.sum(log_norms)) - card_pred
    else:
        cn_predict = sum(w for (w, m, c) in gm_in)
        cn_update = sum(t[0] for t in update_terms)
        dlog_w = M * cfg.clutter_density + cn_update - cn_predict \
            - cfg.clutter_rate

    # prune (phdfilter.cu:2307-2319, 3134-3137)
    update_terms = [t for t in update_terms if t[0] >= cfg.min_feature_weight]

    # merge candidates = pruned update terms + nearly-in-range
    cands = [[w, m.copy(), c.copy()] for (w, m, c) in
             [(t[0], t[1], t[2]) for t in update_terms]]
    cands += [[w, m.copy(), c.copy()] for (w, m, c) in gm_near]

    merged = greedy_merge(cands, cfg.min_separation)

    # re-append out-of-range untouched (phdfilter.cu:3311-3318)
    out = merged + [[w, m.copy(), c.copy()] for (w, m, c) in gm_out]
    return [(w, m, c) for (w, m, c) in out], dlog_w


def greedy_merge(cands, min_sep):
    """phdUpdateMergeKernel (phdfilter.cu:2707-2898) oracle."""
    cands = [list(c) for c in cands]
    unmerged = [True] * len(cands)
    out = []
    while True:
        best, bw = -1, -1.0
        for i, u in enumerate(unmerged):
            if u and cands[i][0] > bw:
                best, bw = i, cands[i][0]
        if best < 0 or bw <= 0:
            break
        w0, m0, c0 = cands[best]
        sel = []
        for i, u in enumerate(unmerged):
            if not u:
                continue
            sigma = 0.5 * (c0 + cands[i][2])
            d = m0 - cands[i][1]
            dist = d @ np.linalg.solve(sigma, d)
            if dist < min_sep:
                sel.append(i)
        W = sum(cands[i][0] for i in sel)
        mu = sum(cands[i][0] * cands[i][1] for i in sel) / W
        cov = np.zeros_like(c0)
        for i in sel:
            diff = mu - cands[i][1]
            cov += cands[i][0] * (cands[i][2] + np.outer(diff, diff))
        cov /= W
        cov = 0.5 * (cov + cov.T)
        out.append([W, mu, cov])
        for i in sel:
            unmerged[i] = False
    return out
