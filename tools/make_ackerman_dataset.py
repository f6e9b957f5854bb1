"""Rebuild data/ackerman from the reference's simData2_ackerman.mat.

The .mat is self-consistent: sim.control[k] = {u: (v, alpha), dt: 1.0}
dead-reckons exactly onto sim.traj, and sim.data[k].measurements are the
noisy range-bearing scans of sim.groundTruth at sim.traj[k]. (The text files
matlab/controls_synth.txt belong to a DIFFERENT trajectory - pairing them
with these measurements, as an earlier revision did, breaks the odometry.)

Writes: controls.txt (v alpha per step, k = 1..N-1), control_times.txt
(t = k), measurements.txt (from sim.data), measurement_times.txt (t = 0..N-1),
groundtruth.npz (traj [N, 3], landmarks, cumulative_counts).
"""
import os
import sys

import numpy as np
import scipy.io as sio

mat_path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/matlab/simData2_ackerman.mat"
out = sys.argv[2] if len(sys.argv) > 2 else "data/ackerman"

m = sio.loadmat(mat_path, squeeze_me=True, struct_as_record=False)
sim = m["sim"]
traj = np.asarray(sim.traj).T                      # [N, 3]
N = traj.shape[0]
controls = np.asarray([np.asarray(c.u, float).ravel()[:2]
                       for c in sim.control])      # [N-1, 2]
dts = np.asarray([float(np.asarray(c.dt).ravel()[0]) for c in sim.control])
assert np.allclose(dts, dts[0]), "non-uniform dt"
dt = float(dts[0])

measurements = []
for k in range(N):
    z = np.asarray(sim.data[k].measurements, float)
    if z.size == 0:
        measurements.append(np.zeros((0, 2)))
    else:
        measurements.append(z.T if z.ndim == 2 else z.reshape(1, 2))

# landmark set + per-step observed-landmark counts for per-step true maps
# (sim.groundTruth[k] holds the features observed up to step k)
lm_all = []
cum = []
seen = set()
for k in range(N):
    g = sim.groundTruth[k]
    pts = np.asarray(g.loc, float)          # observed landmark locations
    if pts.size == 0:
        cum.append(len(lm_all))
        continue
    if pts.ndim == 1:
        pts = pts.reshape(2, 1)
    pts = pts.T
    for p in pts:
        key = (round(float(p[0]), 6), round(float(p[1]), 6))
        if key not in seen:
            seen.add(key)
            lm_all.append([p[0], p[1]])
    cum.append(len(lm_all))
landmarks = np.asarray(lm_all)

os.makedirs(out, exist_ok=True)
with open(os.path.join(out, "controls.txt"), "w") as fh:
    fh.write("% velocity\tsteering angle\n")
    for u in controls:
        fh.write("%.9g %.9g\n" % (u[0], u[1]))
with open(os.path.join(out, "control_times.txt"), "w") as fh:
    for k in range(1, N):
        fh.write("%.9g\n" % (k * dt))
with open(os.path.join(out, "measurements.txt"), "w") as fh:
    fh.write("% range bearing pairs, one time step per line\n")
    for z in measurements:
        fh.write(" ".join("%.9g %.9g" % (r, b) for r, b in z) + " \n")
with open(os.path.join(out, "measurement_times.txt"), "w") as fh:
    for k in range(N):
        fh.write("%.9g\n" % (k * dt))
np.savez(os.path.join(out, "groundtruth.npz"), traj=traj,
         landmarks=landmarks, cumulative_counts=np.asarray(cum))
print(f"wrote {out}: {N} steps, dt={dt}, {len(controls)} controls, "
      f"{len(landmarks)} landmarks")
