"""Dense large-scale dataset tooling (tools/make_dense_dataset.py).

Checks the generated files parse through the standard IO layer and — the
regression that motivated the time-0 control — that the timestamp
interleaver pairs every measurement step with the control that produced the
matching ground-truth motion (reference interleaver semantics,
main.cpp:1192-1229, lag one control without the t=0 pairing).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dense_generator_schedule_pairing(tmp_path):
    out = str(tmp_path / "dense")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "make_dense_dataset.py"),
                    out], check=True, cwd=REPO)

    from phdslam_tpu.runtime import io
    from phdslam_tpu.slam import build_schedule

    z = io.load_measurements(os.path.join(out, "measurements.txt"))
    controls = io.load_controls(os.path.join(out, "controls.txt"))
    zt = io.load_timestamps(os.path.join(out, "measurement_times.txt"))
    ct = io.load_timestamps(os.path.join(out, "control_times.txt"))
    gt = np.load(os.path.join(out, "groundtruth.npz"))

    assert len(z) == len(gt["traj"]) == len(zt)
    assert len(controls) == len(ct) == len(z)  # t=0 zero control included

    plans = build_schedule(len(z), len(controls), zt, ct, 1.0, 0)
    # every step: measurement k paired with control k at the same timestamp
    assert len(plans) == len(z)
    for k, p in enumerate(plans):
        assert p.z_idx == k and p.c_idx == k
        assert p.dt == (0.0 if k == 0 else 1.0)

    # replaying the paired controls through the generator's motion model
    # must reproduce the ground-truth trajectory exactly (no one-step lag)
    from phdslam_tpu.eval.simdata import AckermanParams, ackerman_motion
    mp = AckermanParams(l=2.83, h=0.76, a=3.78, b=0.5)
    pose = gt["traj"][0]
    for k, p in enumerate(plans[1:], start=1):
        u = controls[p.c_idx]
        pose = ackerman_motion(pose, u[0], u[1], mp, p.dt)
        np.testing.assert_allclose(pose[:2], gt["traj"][k][:2], atol=1e-4)

    # observed-landmark ordering: landmarks[:cum[t]] is the set seen by t
    cum = gt["cumulative_counts"]
    assert cum[-1] <= len(gt["landmarks"])
    assert np.all(np.diff(cum) >= 0)
