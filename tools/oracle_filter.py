"""End-to-end reference-semantics oracle filter (NumPy, float64).

An independent, host-only implementation of the reference filter loop
(/root/reference/src/main.cpp:1075-1322) built on the same semantics as
the ragged golden oracle in tests/oracle.py — ragged per-particle maps,
no capacity caps, no top-T/top-cap selection, sequential greedy merge.
The per-particle update vectorizes the inner feature/measurement loops in
float64 numpy for speed; its equivalence to the obviously-correct ragged
tests/oracle.py update is pinned by
tests/test_oracle_filter.py::test_vectorized_oracle_matches_ragged.

Purpose (round-1 verdict item 3): convert "0.40-0.51 m is the parity
band" and "any filter drifts in the CV information desert" from
assertions into evidence, by running the SPEC itself end-to-end on the
canonical datasets and scoring it with the same analyzer as the engine.

Usage:
  python tools/oracle_filter.py data/ackerman cfg/ackerman.cfg --particles 64
  python tools/oracle_filter.py data/cv cfg/cv.cfg --particles 64
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phdslam_tpu.config import load_config
from phdslam_tpu.eval.ospa import extract_map_estimate, ospa_distance
from phdslam_tpu.runtime import io
from phdslam_tpu.slam import build_schedule


def wrap(a):
    """C-fmod wrap to [-pi, pi] (device_math.cuh wrapAngle), elementwise."""
    r = np.fmod(a, 2 * np.pi)
    r = np.where(r > np.pi, r - 2 * np.pi, r)
    r = np.where(r < -np.pi, r + 2 * np.pi, r)
    return r


def oracle_update(pose, W, Mn, Cv, Z, cfg):
    """One particle's static GM-PHD update, reference semantics
    (phdUpdateSynth, phdfilter.cu:3336-3761). Ragged in/out: W [K] > 0,
    Mn [K, 2], Cv [K, 2, 2], Z [M, 2]. float64. Returns (W', Mn', Cv',
    dlog_w). Vectorized restatement of tests/oracle.py::phd_update_particle
    (equivalence pinned by tests/test_oracle_filter.py)."""
    M = len(Z)
    K = len(W)
    # in-range classification (phdfilter.cu:1324-1346)
    if K:
        dx = Mn[:, 0] - pose[0]
        dy = Mn[:, 1] - pose[1]
        r2 = dx * dx + dy * dy
        r = np.sqrt(r2)
        b = wrap(np.arctan2(dy, dx) - pose[2])
        in_m = (r >= cfg.min_range) & (r <= cfg.max_range) \
            & (np.abs(b) <= cfg.max_bearing)
        near_m = (~in_m) & (r >= 0.8 * cfg.min_range) \
            & (r <= 1.2 * cfg.max_range) & (np.abs(b) <= 1.2 * cfg.max_bearing)
        out_m = ~(in_m | near_m)
    else:
        in_m = near_m = out_m = np.zeros((0,), bool)

    Wi, Mi, Ci = W[in_m], Mn[in_m], Cv[in_m]
    Ki = len(Wi)

    # EKF pre-update per in-range feature (computePreUpdate :301-395)
    if Ki:
        dx, dy = Mi[:, 0] - pose[0], Mi[:, 1] - pose[1]
        r2 = dx * dx + dy * dy
        r = np.sqrt(r2)
        bear = wrap(np.arctan2(dy, dx) - pose[2])
        pd = np.where((r <= cfg.max_range) & (np.abs(bear) <= cfg.max_bearing),
                      cfg.pd, 0.0)
        J = np.stack([np.stack([dx / r, dy / r], -1),
                      np.stack([-dy / r2, dx / r2], -1)], 1)   # [K, 2, 2]
        R = np.diag([cfg.std_range ** 2, cfg.std_bearing ** 2])
        S = J @ Ci @ np.swapaxes(J, 1, 2) + R
        S = 0.5 * (S + np.swapaxes(S, 1, 2))
        det_S = S[:, 0, 0] * S[:, 1, 1] - S[:, 0, 1] * S[:, 1, 0]
        S_inv = np.stack([
            np.stack([S[:, 1, 1], -S[:, 0, 1]], -1),
            np.stack([-S[:, 1, 0], S[:, 0, 0]], -1)], 1) / det_S[:, None,
                                                                 None]
        Kg = Ci @ np.swapaxes(J, 1, 2) @ S_inv
        IKH = np.eye(2) - Kg @ J
        cov_upd = IKH @ Ci @ np.swapaxes(IKH, 1, 2) \
            + Kg @ R @ np.swapaxes(Kg, 1, 2)

        # detection grid (phdUpdateKernel :2083-2321)
        innov = np.stack([Z[:, None, 0] - r[None, :],
                          wrap(Z[:, None, 1] - bear[None, :])], -1)  # [M,K,2]
        dist = np.einsum("mki,kij,mkj->mk", innov, S_inv, innov)
        with np.errstate(divide="ignore"):
            logw = np.log(pd)[None, :] + np.log(Wi)[None, :] - 0.5 * dist \
                - np.log(2 * np.pi) - 0.5 * np.log(det_S)[None, :]
        mean_u = Mi[None, :, :] + np.einsum("kij,mkj->mki", Kg, innov)
    else:
        logw = np.zeros((M, 0))
        pd = np.zeros((0,))

    norms = np.exp(logw).sum(axis=1) + cfg.clutter_density + cfg.birth_weight
    log_norms = np.log(norms)

    terms_w, terms_m, terms_c = [], [], []
    # non-detect
    if Ki:
        terms_w.append(Wi * (1.0 - pd))
        terms_m.append(Mi)
        terms_c.append(Ci)
        # detections
        w_det = np.exp(logw - log_norms[:, None])            # [M, K]
        terms_w.append(w_det.reshape(-1))
        terms_m.append(mean_u.reshape(-1, 2))
        terms_c.append(np.broadcast_to(cov_upd[None], (M, Ki, 2, 2))
                       .reshape(-1, 2, 2))
    # births (computeBirth :205-242)
    theta = pose[2] + Z[:, 1]
    bdx, bdy = Z[:, 0] * np.cos(theta), Z[:, 0] * np.sin(theta)
    bmean = np.stack([pose[0] + bdx, pose[1] + bdy], -1)
    Jb = np.stack([np.stack([bdx / Z[:, 0], -bdy], -1),
                   np.stack([bdy / Z[:, 0], bdx], -1)], 1)
    Rb = np.diag([(cfg.std_range * cfg.birth_noise_factor) ** 2,
                  (cfg.std_bearing * cfg.birth_noise_factor) ** 2])
    bcov = Jb @ Rb @ np.swapaxes(Jb, 1, 2)
    terms_w.append(np.exp(np.log(cfg.birth_weight) - log_norms))
    terms_m.append(bmean)
    terms_c.append(bcov)

    uw = np.concatenate(terms_w)
    um = np.concatenate(terms_m)
    uc = np.concatenate(terms_c)

    # particle weight (phdfilter.cu:2256-2280)
    if cfg.particle_weighting == 0:
        card_pred = float((pd * Wi).sum()) + M * cfg.birth_weight
        dlog_w = float(log_norms.sum()) - card_pred
    else:
        cn_predict = float(Wi.sum())
        cn_update = float(uw.sum())
        dlog_w = M * cfg.clutter_density + cn_update - cn_predict \
            - cfg.clutter_rate

    # prune (:2307-2319) + nearly-in-range merge candidates (:3271-3273)
    keep = uw >= cfg.min_feature_weight
    cw = np.concatenate([uw[keep], W[near_m]])
    cm = np.concatenate([um[keep], Mn[near_m]])
    cc = np.concatenate([uc[keep], Cv[near_m]])

    mw, mm, mc = greedy_merge_vec(cw, cm, cc, cfg.min_separation)

    # re-attach out-of-range untouched (:3311-3318)
    nw = np.concatenate([mw, W[out_m]])
    nm = np.concatenate([mm, Mn[out_m]])
    nc = np.concatenate([mc, Cv[out_m]])
    return nw, nm, nc, dlog_w


def greedy_merge_vec(w, m, c, min_sep):
    """phdUpdateMergeKernel (phdfilter.cu:2707-2898): sequential greedy
    clusters, distances vectorized (closed-form 2x2 solve)."""
    w = w.copy()
    unmerged = w > 0
    ow, om, oc = [], [], []
    while unmerged.any():
        i = int(np.argmax(np.where(unmerged, w, -1.0)))
        if w[i] <= 0:
            break
        sig = 0.5 * (c[i][None] + c)                        # [N, 2, 2]
        d = m[i][None, :] - m                               # [N, 2]
        det = sig[:, 0, 0] * sig[:, 1, 1] - sig[:, 0, 1] * sig[:, 1, 0]
        dist = (sig[:, 1, 1] * d[:, 0] ** 2
                - 2.0 * sig[:, 0, 1] * d[:, 0] * d[:, 1]
                + sig[:, 0, 0] * d[:, 1] ** 2) / det
        sel = unmerged & (dist < min_sep)
        sel[i] = True
        Wsum = w[sel].sum()
        mu = (w[sel, None] * m[sel]).sum(0) / Wsum
        diff = mu[None, :] - m[sel]
        cov = (w[sel, None, None]
               * (c[sel] + diff[:, :, None] * diff[:, None, :])).sum(0) / Wsum
        ow.append(Wsum)
        om.append(mu)
        oc.append(0.5 * (cov + cov.T))
        unmerged &= ~sel
    if not ow:
        return (np.zeros((0,)), np.zeros((0, 2)), np.zeros((0, 2, 2)))
    return np.asarray(ow), np.asarray(om), np.asarray(oc)


def predict_ackerman(poses, control, cfg, rng, dt):
    """phdfilter.cu:785-825 (float64 numpy)."""
    P = len(poses)
    ve = control[0] + rng.normal(0, cfg.std_encoder, P)
    alpha = control[1] + rng.normal(0, cfg.std_alpha, P)
    tan_a = np.tan(alpha)
    vc = ve / (1.0 - tan_a * cfg.h / cfg.l)
    th = poses[:, 2]
    thc_dot = vc * tan_a / cfg.l
    s, co = np.sin(th), np.cos(th)
    out = np.zeros_like(poses)
    out[:, 0] = poses[:, 0] + dt * (vc * co - thc_dot
                                    * (cfg.a * s + cfg.b * co))
    out[:, 1] = poses[:, 1] + dt * (vc * s + thc_dot
                                    * (cfg.a * co - cfg.b * s))
    out[:, 2] = wrap(th + dt * thc_dot)
    return out


def predict_cv(poses, cfg, rng, dt):
    """phdfilter.cu:827-859 with the host's 3x accel noise (:1113-1117)."""
    P = len(poses)
    ax = rng.normal(0, 3.0 * cfg.ax, P)
    ay = rng.normal(0, 3.0 * cfg.ay, P)
    ath = rng.normal(0, 3.0 * cfg.ayaw, P)
    px, py, th = poses[:, 0], poses[:, 1], poses[:, 2]
    vx, vy, vth = poses[:, 3], poses[:, 4], poses[:, 5]
    c, s = np.cos(th), np.sin(th)
    out = np.empty_like(poses)
    out[:, 0] = px + dt * (vx * c - vy * s) + 0.5 * dt * dt * (ax * c - ay * s)
    out[:, 1] = py + dt * (vx * s + vy * c) + 0.5 * dt * dt * (ax * s + ay * c)
    out[:, 2] = wrap(th + dt * vth + 0.5 * dt * dt * ath)
    out[:, 3] = vx + dt * ax
    out[:, 4] = vy + dt * ay
    out[:, 5] = vth + dt * ath
    return out


def run_oracle(data_dir, cfg, n_particles, seed=0, max_steps=0,
               verbose=True, n_predict_particles=1, shotgun_mode="persist"):
    """main.cpp:1075-1322 loop: schedule, predict, update, resample.

    ``n_predict_particles`` > 1 enables particle shotgunning (prior
    duplication with independent prediction noise, phdfilter.cu:1185-1238).
    ``shotgun_mode``:
      "persist"  — the reference's semantics: the expanded set persists
                   until an nEff- or 5x-overflow-triggered resample
                   contracts it back to ``n_particles``
                   (main.cpp:1281-1297);
      "contract" — the engine's static-shape semantics: forced systematic
                   contraction P*k -> P at the END of every step
                   (filters/phd.py::phd_step). This A/B isolates whether
                   the forced per-step resampling costs accuracy.
    """
    measurements = io.load_measurements(
        os.path.join(data_dir, "measurements.txt"))
    cpath = os.path.join(data_dir, "controls.txt")
    controls = (io.load_controls(cpath) if os.path.exists(cpath)
                else np.zeros((0, 2)))
    mt = io.load_timestamps(os.path.join(data_dir, "measurement_times.txt"))
    ct = io.load_timestamps(os.path.join(data_dir, "control_times.txt"))
    schedule = build_schedule(len(measurements), len(controls), mt, ct,
                              cfg.dt, max_steps)

    rng = np.random.default_rng(seed)
    P = n_particles
    poses = np.zeros((P, 6))
    poses[:, 0] = cfg.x0
    poses[:, 1] = cfg.y0
    poses[:, 2] = cfg.yaw0
    poses[:, 3] = cfg.vx0
    poses[:, 5] = cfg.vyaw0
    log_w = np.full((P,), -np.log(P))
    maps = [(np.zeros((0,)), np.zeros((0, 2)), np.zeros((0, 2, 2)))
            for _ in range(P)]

    est_poses = np.zeros((len(schedule), 6))
    map_est = [None] * len(schedule)
    last_ctrl = np.zeros((2,))
    t0 = time.time()
    k_shot = max(1, n_predict_particles)
    for n, plan in enumerate(schedule):
        if plan.c_idx >= 0:
            last_ctrl = controls[plan.c_idx]
        if plan.do_predict and n > 0:
            if k_shot > 1:
                # shotgun prior duplication (phdfilter.cu:1185-1238)
                poses = np.repeat(poses, k_shot, axis=0)
                log_w = np.repeat(log_w, k_shot) - np.log(k_shot)
                maps = [tuple(a.copy() for a in m)
                        for m in maps for _ in range(k_shot)]
            if cfg.motion_type == 1:
                poses = predict_ackerman(poses, last_ctrl, cfg, rng, plan.dt)
            else:
                poses = predict_cv(poses, cfg, rng, plan.dt)
        if plan.z_idx >= 0 and len(measurements[plan.z_idx]):
            Z = np.asarray(measurements[plan.z_idx], np.float64)
            for p in range(len(poses)):
                W, Mn, Cv = maps[p]
                W2, M2, C2, dlw = oracle_update(poses[p], W, Mn, Cv, Z, cfg)
                maps[p] = (W2, M2, C2)
                log_w[p] += dlw
            log_w -= np.logaddexp.reduce(log_w)
        # extraction (recoverSlamState, main.cpp:318-451)
        wlin = np.exp(log_w)
        est_poses[n] = (wlin[:, None] * poses).sum(0)
        best = int(np.argmax(log_w))
        map_est[n] = maps[best]
        # resample (main.cpp:1281-1297): nEff trigger, plus the 5x-target
        # overflow trigger for the persisting shotgun set; "contract" mode
        # forces the engine's end-of-step P*k -> P contraction instead
        Pc = len(poses)
        n_eff = 1.0 / np.sum(wlin * wlin) / Pc
        force = (shotgun_mode == "contract" and Pc > P) or Pc > 5 * P
        if force or (plan.z_idx >= 0 and n_eff <= cfg.resample_threshold):
            u = (rng.uniform() + np.arange(P)) / P
            anc = np.searchsorted(np.cumsum(wlin), u)
            anc = np.clip(anc, 0, Pc - 1)
            poses = poses[anc]
            maps = [tuple(a.copy() for a in maps[a_i]) for a_i in anc]
            log_w = np.full((P,), -np.log(P))
        if verbose and n % 50 == 0:
            print(f"  step {n}/{len(schedule)} nEff={n_eff:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return est_poses, map_est, schedule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("config")
    ap.add_argument("--particles", type=int, default=64)
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ospa-every", type=int, default=10)
    ap.add_argument("--shotgun", type=int, default=1,
                    help="n_predict_particles (prior duplication factor)")
    ap.add_argument("--shotgun-mode", default="persist",
                    choices=["persist", "contract"],
                    help="persist = reference semantics (expanded set "
                         "lives until an nEff/5x resample); contract = "
                         "the engine's forced per-step contraction")
    args = ap.parse_args()

    cfg = load_config(args.config)
    est, map_est, schedule = run_oracle(
        args.data_dir, cfg, args.particles, args.seed, args.steps,
        n_predict_particles=args.shotgun, shotgun_mode=args.shotgun_mode)
    gt = np.load(os.path.join(args.data_dir, "groundtruth.npz"))
    traj, landmarks = gt["traj"], gt["landmarks"]
    # align estimate steps to trajectory steps (measurement steps only)
    z_steps = [n for n, p in enumerate(schedule) if p.z_idx >= 0]
    T = min(len(z_steps), len(traj))
    pe = np.linalg.norm(est[z_steps[:T], :2] - traj[:T, :2], axis=1)
    ospas = []
    for k in range(0, T, args.ospa_every):
        W, Mn, _ = map_est[z_steps[k]]
        est_map = extract_map_estimate(np.asarray(W), np.asarray(Mn))
        seen = np.zeros(len(landmarks), bool)
        for t in range(k + 1):
            seen |= np.linalg.norm(landmarks - traj[t, :2],
                                   axis=1) <= cfg.max_range
        o, _, _ = ospa_distance(landmarks[seen], est_map, p=1, c=5)
        ospas.append(o)
    tag = (f" shotgun k={args.shotgun} [{args.shotgun_mode}]"
           if args.shotgun > 1 else "")
    print(f"oracle {args.data_dir} P={args.particles}{tag}: "
          f"mean ATE {pe.mean():.3f} m, max {pe.max():.3f} m, "
          f"final {pe[-1]:.3f} m, OSPA(1,5) {np.mean(ospas):.2f} "
          f"(final {ospas[-1]:.2f})")


if __name__ == "__main__":
    main()
