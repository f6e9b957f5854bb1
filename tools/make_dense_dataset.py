"""Generate the large-scale 'dense' benchmark dataset.

BASELINE.md's large-scale config target is >=10k particles with >=1k GM
components per particle-map. The reference's canonical worlds carry only
42-80 landmarks (SynthSetup2.m:77), which can never populate a 1k-component
map, so this tool builds a dense world in the reference's own input format
(generate_simdata.py:56-73 text layout): several hundred landmarks over a
wide field, an Ackerman sweep through it, range-bearing measurements with
clutter.

Usage: python tools/make_dense_dataset.py [outdir] (default data/dense)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phdslam_tpu.eval.simdata import (AckermanParams, SensorParams,
                                      ackerman_motion, noisy_measurements)


def main(out="data/dense", seed=0):
    rng = np.random.default_rng(seed)
    n_landmarks = 800
    extent = 70.0
    n_steps = 200
    dt = 1.0

    landmarks = rng.uniform(-extent, extent, size=(n_landmarks, 2))

    mp = AckermanParams(l=2.83, h=0.76, a=3.78, b=0.5)
    sp = SensorParams(max_range=15.0, std_range=0.5, std_bearing=0.0349,
                      pd=0.95, clutter_rate=20.0)

    # outward spiral sweep so the map keeps growing with fresh landmarks
    controls = np.zeros((n_steps - 1, 2))
    controls[:, 0] = 4.0
    controls[:, 1] = 0.35 / (1.0 + 0.02 * np.arange(n_steps - 1))

    traj = np.zeros((n_steps, 3))
    traj[0] = (0.0, -30.0, 0.0)
    for t in range(1, n_steps):
        traj[t] = ackerman_motion(traj[t - 1], controls[t - 1, 0],
                                  controls[t - 1, 1], mp, dt)

    measurements = [noisy_measurements(traj[t], landmarks, sp, rng)
                    for t in range(n_steps)]
    n_per = [len(z) for z in measurements]

    # per-step cumulative observed-landmark counts for OSPA scoring
    seen = np.zeros(n_landmarks, bool)
    cum = []
    for t in range(n_steps):
        d = np.linalg.norm(landmarks - traj[t, :2], axis=1)
        seen |= d <= sp.max_range
        cum.append(int(seen.sum()))
    # landmarks must be ordered so landmarks[:cum[t]] is the observed set
    first_seen = np.full(n_landmarks, n_steps)
    for t in range(n_steps - 1, -1, -1):
        d = np.linalg.norm(landmarks - traj[t, :2], axis=1)
        first_seen[d <= sp.max_range] = t
    order = np.argsort(first_seen, kind="stable")
    landmarks = landmarks[order]

    os.makedirs(out, exist_ok=True)
    # A zero control at time 0 keeps every measurement paired with a control
    # at the SAME timestamp: the reference's interleaver (main.cpp:1192-1229)
    # otherwise consumes the t=0 scan as a measurement-only step whose dt is
    # taken from the NEXT control time, which permanently lags the filter one
    # control behind ground truth (measured 6 m offset by step 20 here).
    with open(os.path.join(out, "controls.txt"), "w") as fh:
        fh.write("% velocity\tsteering angle\n")
        fh.write("0 0\n")
        for u in controls:
            fh.write("%.9g %.9g\n" % (u[0], u[1]))
    with open(os.path.join(out, "control_times.txt"), "w") as fh:
        for k in range(0, n_steps):
            fh.write("%.9g\n" % (k * dt))
    with open(os.path.join(out, "measurements.txt"), "w") as fh:
        fh.write("% range bearing pairs, one time step per line\n")
        for z in measurements:
            fh.write(" ".join("%.9g %.9g" % (r, b) for r, b in z) + " \n")
    with open(os.path.join(out, "measurement_times.txt"), "w") as fh:
        for k in range(n_steps):
            fh.write("%.9g\n" % (k * dt))
    np.savez(os.path.join(out, "groundtruth.npz"), traj=traj,
             landmarks=landmarks, cumulative_counts=np.asarray(cum))
    print(f"wrote {out}: {n_steps} steps, {n_landmarks} landmarks, "
          f"{cum[-1]} observed, {np.mean(n_per):.1f} meas/step "
          f"(max {max(n_per)})")


if __name__ == "__main__":
    main(*sys.argv[1:])
